package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full declared query inventory, in module order. */
  def defs: Seq[QueryDef] =
    operators.Relational.all ++ operators.TextAnalysis.all ++
      operators.Dedup.all ++ operators.Similarity.all ++
      operators.Pipeline.all ++ operators.Multimodal.all ++
      operators.Extended.all ++ operators.Reshape.all ++
      operators.Stats.all ++ operators.Corpus.all ++ operators.Quality.all ++
      operators.Recipe.all ++ operators.Lifecycle.all ++
      operators.Classify.all ++ operators.Graph.all ++
      operators.Layout.all ++ operators.Bloom.all ++
      operators.WebCorpus.all ++ operators.CorpusBuild.all ++
      operators.ReplayedStreams.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q04JoinMultiway.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(defs.map(d => d.name -> d.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(defs.flatMap(d => d.oracle.map(sql => d.name -> sql)): _*)
}

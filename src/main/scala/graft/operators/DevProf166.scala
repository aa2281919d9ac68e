package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: q166 phase timing (package-private access to the semantic
  * dedup internals). */
object DevProf166 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PH $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { it =>
      println(s"--- iter $it ---")
      val emb = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val k = Similarity.semanticK(Tables.metaCount(spark, dir,
        "embeddings"))
      val cents = time("train(cached)")(
        Similarity.lloydCentroids(emb, Similarity.KmeansIters, k))
      val pairs = Dedup.semanticPairs(emb, cents)
      time("pairs.count")(pairs.count())
      val comp = time("cc")(
        Corpus.connectedComponents(pairs, "va", "vb").count())
      time("full q166")(
        graft.SparkEntry.queries("q166_semantic_dedup_fresh")(
          spark, dir).count())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only: formatted plans for INTERNAL pipeline stages that never
  * reach a declared query's final action (they run as intermediate jobs
  * inside a loop, so [[Explain]] cannot show them). Same session
  * extensions as Bench; writes `<SPARK_GRAFT_EXPLAIN_DIR>/<name>.txt`
  * or prints to stdout, like Explain.
  *
  * Stages:
  *  - `q166_semanticpairs_stage_after`  — the shipped in-row PairGen
  *    form of [[graft.operators.Dedup.semanticPairs]]
  *  - `q166_semanticpairs_stage_before` — the self-join form it
  *    replaced ([[graft.operators.Dedup.semanticPairsJoinSpec]], kept
  *    as the executable spec), for the round-18 plan diff
  */
object StagePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    outDir.foreach(d => new java.io.File(d).mkdirs())

    val emb = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val k = graft.operators.Similarity.semanticK(
      graft.Tables.metaCount(spark, dir, "embeddings"))
    val cents = graft.operators.Similarity.lloydCentroids(
      emb, graft.operators.Similarity.KmeansIters, k)

    val stages = Seq(
      "q166_semanticpairs_stage_after" ->
        graft.operators.Dedup.semanticPairs(emb, cents),
      "q166_semanticpairs_stage_before" ->
        graft.operators.Dedup.semanticPairsJoinSpec(emb, cents))
    stages.foreach { case (n, df) =>
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      outDir match {
        case Some(d) =>
          val w = new java.io.PrintWriter(s"$d/$n.txt")
          try w.println(plan) finally w.close()
          println(s"[stageplans] wrote $d/$n.txt")
        case None =>
          println(s"===== $n =====")
          println(plan)
      }
    }
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: prints the formatted physical plan of selected
  * queries so scale properties (pushdown, pruning, broadcast, TakeOrdered)
  * can be inspected. Runs with the SAME session extensions as Bench
  * (native functions + the TopKPerKey rewrite) so the audited plan is the
  * benched plan. SPARK_GRAFT_SF_DIR picks the data dir (plan shapes with
  * AQE are size-dependent at the margins); SPARK_GRAFT_EXPLAIN_DIR, when
  * set, writes each query's plan to `<dir>/<name>.txt` instead of stdout
  * (the plans/rNN deliverable). */
object Explain {
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
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q02_topk_customers", "q03_join_broadcast", "q04_join_multiway",
      "q07_filter_project")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      outDir match {
        case Some(d) =>
          val w = new java.io.PrintWriter(s"$d/$n.txt")
          try w.println(plan) finally w.close()
          println(s"[explain] wrote $d/$n.txt")
        case None =>
          println(s"===== $n =====")
          println(plan)
      }
    }
    spark.stop()
  }
}

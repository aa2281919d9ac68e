package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: prints the formatted physical plan of selected
  * queries so scale properties (pushdown, pruning, broadcast, TakeOrdered)
  * can be inspected. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q02_topk_customers", "q03_join_broadcast", "q04_join_multiway",
      "q07_filter_project")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

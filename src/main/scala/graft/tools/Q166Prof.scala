package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: q166 phase/job accounting. */
object Q166Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })
    val fn = SparkEntry.queries("q166_semantic_dedup_fresh")
    fn(spark, "/root/testdata/sf0.001").count() // warm
    (1 to 3).foreach { it =>
      jobs = 0
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"Q166 iter$it: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        s"jobs=$jobs")
    }
    spark.stop()
  }
}

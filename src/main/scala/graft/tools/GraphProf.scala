package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: job/stage accounting for the PageRank loop variants, plus a
  * probe of whether Dataset.observe metrics fire under an eager
  * localCheckpoint (the one-action-per-round fuse). Delete-safe scratch.
  */
object GraphProf {
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
    @volatile var stages = 0
    @volatile var verbose = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1
        if (verbose) println(s"  JOB ${js.jobId}: " +
          js.properties.getProperty("spark.job.description", "?") +
          s" stages=${js.stageInfos.size}")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages += 1
    })

    // probe: does observe() deliver metrics through localCheckpoint?
    val obs = new Observation("probe")
    val probed = spark.range(1000).observe(obs, sum(col("id")).as("s"))
      .localCheckpoint()
    probed.queryExecution // touch
    val waiter = new Thread(() => {
      try println(s"OBSERVE_VIA_CKPT: ${obs.get}")
      catch { case t: Throwable => println(s"OBSERVE_VIA_CKPT: FAIL $t") }
    })
    waiter.setDaemon(true)
    waiter.start()
    waiter.join(10000)
    if (waiter.isAlive) println("OBSERVE_VIA_CKPT: TIMEOUT (no metrics)")

    def run(label: String, q: String, conf: (String, String)*): Unit = {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val fn = SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.001").count() // warm
      val times = (1 to 3).map { _ =>
        jobs = 0; stages = 0
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, jobs, stages)
      }
      val best = times.minBy(_._1)
      println(f"GPROF $label: min=${best._1}%.3f jobs=${best._2} " +
        f"stages=${best._3} all=${times.map(t => f"${t._1}%.3f").mkString(",")}")
      conf.foreach { case (k, _) => spark.conf.unset(k) }
    }

    run("q132_default", "q132_pagerank")
    run("q132_fused", "q132_pagerank", "spark.graft.pagerank.ckptEvery" -> "0")
    run("q134_default", "q134_pagerank_dangling")
    spark.stop()
  }
}

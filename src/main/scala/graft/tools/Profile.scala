package graft.tools

import graft.Tables
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only min-of-3 profiler for the heavy queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    Tables.names.foreach { n => try Tables(spark, dir, n).count() catch { case _: Throwable => () } }
    def min3(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $label: min=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    min3("q59")(Corpus.q59DedupComponents.fn(spark, dir).count())
    min3("q19")(Dedup.q19DedupMinhashLsh.fn(spark, dir).count())
    min3("q21")(Dedup.q21DedupSimhashPairs.fn(spark, dir).count())
    min3("q37")(Extended.q37NgramJaccard.fn(spark, dir).count())
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    min3("q48_train") { Similarity.lloydCentroids(emb, 2); 0L }
    min3("q48_full")(Similarity.q48AnnKmeansIvf.fn(spark, dir).count())
    spark.stop()
  }
}

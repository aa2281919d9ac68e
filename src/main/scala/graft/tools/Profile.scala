package graft.tools

import graft.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    val HashP = 562949953421311L
    // formulation A: dictionary-hash + broadcast join + min-agg (current)
    min3("q19 current")(Dedup.q19DedupMinhashLsh.fn(spark, dir).count)
    // formulation B: per-row md5, no dict
    def sigB: DataFrame = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(Mirror.shingleGen(col("text"))).as("s"))
      .select(col("doc_id"), Mirror.hash60(col("s")).as("h1"), Mirror.hash60b(col("s")).as("h2"))
      .groupBy(col("doc_id")).agg(min(col("h1")).as("mh_0"),
        (1 until 16).map(j => min(col("h1") + lit(j.toLong) * (col("h2") % HashP)).as(s"mh_$j")): _*)
    min3("sigB rowmd5")(sigB.count)
    // formulation C: in-array lambda (original)
    def sigC: DataFrame = {
      val sh = Tables(spark, dir, "documents").select(col("doc_id"), Mirror.shingles3(col("text")).as("sh"))
      val hs = sh.select(col("doc_id"), transform(col("sh"), s => struct(Mirror.hash60(s).as("h1"), Mirror.hash60b(s).as("h2"))).as("hs"))
      hs.select(col("doc_id") +: (0 until 16).map { j =>
        array_min(transform(col("hs"), p => p.getField("h1") + lit(j.toLong) * (p.getField("h2") % HashP))).as(s"mh_$j")
      }: _*)
    }
    min3("sigC lambda")(sigC.count)
    // formulation A sig only
    def sigA: DataFrame = {
      val rows = Tables(spark, dir, "documents").select(col("doc_id"), explode(Mirror.shingleGen(col("text"))).as("s"))
      val dict = rows.select(col("s")).distinct().select(col("s"), Mirror.hash60(col("s")).as("h1"), Mirror.hash60b(col("s")).as("h2"))
      rows.join(broadcast(dict), "s").groupBy(col("doc_id")).agg(min(col("h1")).as("mh_0"),
        (1 until 16).map(j => min(col("h1") + lit(j.toLong) * (col("h2") % HashP)).as(s"mh_$j")): _*)
    }
    min3("sigA dict")(sigA.count)
    min3("q21 current")(Dedup.q21DedupSimhashPairs.fn(spark, dir).count)
    min3("q37 current")(Extended.q37NgramJaccard.fn(spark, dir).count)
    spark.stop()
  }
}

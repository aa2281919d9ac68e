package graft.tools

import graft.Tables
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROF $label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val sh = Tables(spark, dir, "documents")
      .select(col("doc_id"), Mirror.shingles3(col("text")).as("sh"))
    time("sh.count")(sh.count)
    val hs = sh.select(col("doc_id"), transform(col("sh"), s =>
      struct(Mirror.hash60(s).as("h1"),
        Mirror.hash60(concat(s, lit("!"))).as("h2"))).as("hs"))
    time("hs")(hs.select(max(hash(col("hs")))).collect())
    val HashP = 562949953421311L
    val mhCols = (0 until 16).map { j =>
      array_min(transform(col("hs"), p =>
        p.getField("h1") + lit(j.toLong) * (p.getField("h2") % HashP)))
        .as(s"mh_$j")
    }
    val sig = hs.select(col("doc_id") +: mhCols: _*)
    time("sig")(sig.select(max(col("mh_0"))).collect())
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band_idx"),
        md5(concat_ws(",",
          (0 until 4).map(r => col(s"mh_${b * 4 + r}")): _*)).as("band_hash"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"),
        col("band.band_hash").as("band_hash"))
    time("banded")(banded.count)
    val cand = banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(Mirror.pairs(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    time("cand")(cand.count)
    time("q19 full")(Dedup.q19DedupMinhashLsh.fn(spark, dir).count)
    time("q19 again")(Dedup.q19DedupMinhashLsh.fn(spark, dir).count)
    time("q21 full")(Dedup.q21DedupSimhashPairs.fn(spark, dir).count)
    time("q37 full")(Extended.q37NgramJaccard.fn(spark, dir).count)
    time("q37 again")(Extended.q37NgramJaccard.fn(spark, dir).count)
    // alternative q37: persisted inverted-index self-join
    locally {
      import org.apache.spark.sql.types.{DoubleType, LongType}
      val sh2 = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          (col("n_chars") / 100).cast(LongType).as("len_bucket"),
          Mirror.shingles3(col("text")).as("sh"))
      val ex = sh2.select(col("lang"), col("len_bucket"), col("doc_id"),
        size(col("sh")).as("n"), explode(col("sh")).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = ex.select(col("lang"), col("len_bucket"), col("s"), col("doc_id").as("doc_a"), col("n").as("n_a"))
      val b = ex.select(col("lang"), col("len_bucket"), col("s"), col("doc_id").as("doc_b"), col("n").as("n_b"))
      val inter = a.join(b, Seq("lang", "len_bucket", "s"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("inter"))
      val res = inter.select(col("doc_a"), col("doc_b"),
          (col("inter").cast(DoubleType) / ((col("n_a") + col("n_b")).cast(DoubleType) - col("inter").cast(DoubleType))).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
      time("q37 join+persist")(res.count)
      time("q37 join+persist warm")(res.count)
      ex.unpersist()
    }
    val shp = Tables(spark, dir, "documents").select(col("doc_id"), Mirror.shingles3(col("text")).as("sh"))
    time("shingles pass")(shp.select(max(size(col("sh")))).collect())
    val exp2 = shp.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    time("explode+groupBy")(exp2.groupBy(col("s")).agg(count(lit(1))).select(max("count(1)")).collect())
    spark.stop()
  }
}

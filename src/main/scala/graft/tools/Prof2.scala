package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate q48 assignment cost — fresh literals (new codegen) vs
  * repeated literals (cached codegen) vs codegen disabled. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    emb.count()
    val rnd = new scala.util.Random(42)
    def cents(seed: Int) = Array.tabulate(8)(i =>
      ((i + 1).toLong, Array.fill(64)(rnd.nextDouble())))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF2 $label: ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val fixed = cents(0)
    time("assign_fresh1") {
      emb.select(Similarity.nearestCellLit(col("embedding"), fixed)).count()
    }
    time("assign_same") {
      emb.select(Similarity.nearestCellLit(col("embedding"), fixed)).count()
    }
    time("assign_fresh2") {
      emb.select(Similarity.nearestCellLit(col("embedding"), cents(1))).count()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("assign_fresh_nocodegen") {
      emb.select(Similarity.nearestCellLit(col("embedding"), cents(2))).count()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")

    // one full Lloyd step, decomposed
    import org.apache.spark.sql.types.{DoubleType, LongType}
    import graft.operators.Mirror.foldSum
    val c = cents(3)
    time("explode_after_assign") {
      emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")),
        Similarity.nearestCellLit(col("embedding"), c).as("cell")).count()
    }
    time("assign_then_explode") {
      emb.select(col("vec_id"), col("embedding"),
        Similarity.nearestCellLit(col("embedding"), c).as("cell"))
        .select(col("cell"), col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "x"))).count()
    }
    time("full_step_foldmean") {
      emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")),
        Similarity.nearestCellLit(col("embedding"), c).as("cell"))
        .groupBy(col("cell"), col("pos").cast(LongType).as("pos"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("x")))).as("vs"))
        .select(col("cell"), col("pos"),
          (foldSum(transform(col("vs"), v => v.getField("x").cast(DoubleType)))
            / size(col("vs")).cast(DoubleType)).as("cx"))
        .groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("pos"), col("cx")))).as("cs"))
        .select(col("cell"),
          transform(col("cs"), s => s.getField("cx")).as("cvec"))
        .collect()
    }
    def step(cs: Array[(Long, Array[Double])]) =
      emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")),
        Similarity.nearestCellLit(col("embedding"), cs).as("cell"))
        .groupBy(col("cell"), col("pos").cast(LongType).as("pos"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("x")))).as("vs"))
        .select(col("cell"), col("pos"),
          (foldSum(transform(col("vs"), v => v.getField("x").cast(DoubleType)))
            / size(col("vs")).cast(DoubleType)).as("cx"))
    time("step_repeat_same_lits") { step(c).count() }
    time("agg_only_no_fold") {
      emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")),
        Similarity.nearestCellLit(col("embedding"), cents(4)).as("cell"))
        .groupBy(col("cell"), col("pos").cast(LongType).as("pos"))
        .agg(count(lit(1)).as("n")).count()
    }
    time("agg_collectlist_no_hof") {
      emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")),
        Similarity.nearestCellLit(col("embedding"), cents(5)).as("cell"))
        .groupBy(col("cell"), col("pos").cast(LongType).as("pos"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("x")))).as("vs"))
        .count()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("full_step_nocodegen") { step(cents(6)).count() }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")

    // q19 stage decomposition
    import graft.operators.Mirror.{hash60, hash60b, shingleGen}
    val docs = Tables(spark, dir, "documents")
    docs.count()
    def min3(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF2 $label: min=${ts.min}%.2f")
    }
    val hs = docs
      .select(col("doc_id"), explode(shingleGen(col("text"))).as("s"))
      .select(col("doc_id"), hash60(col("s")).as("h1"), hash60b(col("s")).as("h2"))
    min3("q19_hashes_only")(hs.count())
    val P = 562949953421311L
    val sig = hs.groupBy(col("doc_id"))
      .agg(min(col("h1") + lit(0L) * (col("h2") % P)).as("mh_0"),
        (1 until 16).map(j => min(col("h1") + lit(j.toLong) * (col("h2") % P)).as(s"mh_$j")): _*)
    min3("q19_sig_agg")(sig.count())
    min3("q19_full")(graft.operators.Dedup.q19DedupMinhashLsh.fn(spark, dir).count())
    spark.stop()
  }
}

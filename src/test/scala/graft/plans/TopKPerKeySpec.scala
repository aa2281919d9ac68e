package graft.plans

import graft.covid.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native top-k operator must return exactly what the window form
  * returns (same rows, same ranks) while planning without a Sort of the
  * input. */
class TopKPerKeySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def randomRows(n: Int) = {
    val rnd = new scala.util.Random(11)
    (0 until n).map(i =>
      (i.toLong, rnd.nextInt(10), math.round(rnd.nextDouble() * 1e6) / 100.0))
      .toDF("id", "grp", "score")
  }

  test("matches the row_number window form exactly") {
    val df = randomRows(5000).repartition(7)
    val native = TopK.perKey(df, 3, Seq("grp"),
      Seq(("score", false), ("id", true)))
      .select(col("grp"), col("id"), col("score"), col("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id"))
    val windowed = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("grp"), col("id"), col("score"), col("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(native == windowed)
  }

  test("keys with fewer than k rows keep all rows") {
    val df = Seq((1L, 1, 5.0), (2L, 1, 3.0), (3L, 2, 1.0))
      .toDF("id", "grp", "score")
    val out = TopK.perKey(df, 10, Seq("grp"), Seq(("score", false)))
      .collect()
    assert(out.length == 3)
  }

  test("adversarial key cardinality: spill fallback matches the window form") {
    // every row its own key ⇒ distinct keys ≈ rows; a 50-key budget forces
    // the mid-partition fallback to the accounted spillable sort on every
    // partition, and the result must stay EXACTLY the window form's
    val rnd = new scala.util.Random(13)
    val df = (0 until 20000).map(i =>
      (i.toLong, rnd.nextInt(5000), math.round(rnd.nextDouble() * 1e6) / 100.0))
      .toDF("id", "grp", "score").repartition(5)
    spark.conf.set("spark.graft.topk.maxKeysPerPartition", "50")
    try {
      val native = TopK.perKey(df, 2, Seq("grp"),
        Seq(("score", false), ("id", true)))
        .select(col("grp"), col("id"), col("score"), col("rank"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("score").desc, col("id"))
      val windowed = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 2)
        .select(col("grp"), col("id"), col("score"), col("rank"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      assert(native == windowed)
      assert(native.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.maxKeysPerPartition")
  }

  test("fallback under a tiny task-memory cap still completes (spills, no OOM)") {
    // the point of the accounted sorter: a key-heavy partition under severe
    // memory pressure must spill to disk and finish, not OOM. Exercise the
    // same fallback with a much larger row count than the budget.
    val df = (0 until 50000).map(i => (i.toLong, i, i.toDouble))
      .toDF("id", "grp", "score").repartition(2)
    spark.conf.set("spark.graft.topk.maxKeysPerPartition", "10")
    try {
      val out = TopK.perKey(df, 1, Seq("grp"), Seq(("score", false)))
      assert(out.count() == 50000) // every key distinct ⇒ one row each
    } finally spark.conf.unset("spark.graft.topk.maxKeysPerPartition")
  }

  test("map-side partial pass: same result as partial-off, and planned") {
    val df = randomRows(5000).repartition(7)
    def run() = TopK.perKey(df, 3, Seq("grp"),
      Seq(("score", false), ("id", true)))
      .select(col("grp"), col("id"), col("score"), col("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    spark.conf.set("spark.graft.topk.partial", "true")
    val withPartial =
      try {
        val res = run()
        // planned: the executed plan carries the partial node below the final
        val planned = TopK.perKey(df, 3, Seq("grp"), Seq(("score", false),
          ("id", true)))
        planned.collect()
        val plan = planned.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(plan.contains("TopKPartial"), plan)
        res
      } finally spark.conf.unset("spark.graft.topk.partial")
    spark.conf.set("spark.graft.topk.partial", "false")
    try {
      val without = run()
      assert(withPartial == without)
      assert(withPartial.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.partial")
  }

  test("partial auto gate: off below minBytes, on above (size-adaptive)") {
    // default `auto` + a tiny input: the partial is pure overhead when the
    // shuffle is small, so it must NOT plan; with the threshold forced to
    // zero the same query must plan it — the 100 TB posture, where any
    // corpus-scale child passes the byte gate
    val df = randomRows(5000).repartition(7)
    def planOf() = {
      val q = TopK.perKey(df, 3, Seq("grp"), Seq(("score", false),
        ("id", true)))
      q.collect()
      q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    assert(!planOf().contains("TopKPartial"),
      "tiny input must skip the partial pass under auto")
    spark.conf.set("spark.graft.topk.partial.minBytes", "0")
    try assert(planOf().contains("TopKPartial"),
      "minBytes=0 must plan the partial pass under auto")
    finally spark.conf.unset("spark.graft.topk.partial.minBytes")
  }

  test("partial pass key-budget overflow passes rows through unchanged") {
    // near-unique keys + a 10-key partial budget: the partial must stream
    // the remainder through and the final result must still equal the
    // window form exactly
    val rnd = new scala.util.Random(17)
    val df = (0 until 20000).map(i =>
      (i.toLong, rnd.nextInt(8000), math.round(rnd.nextDouble() * 1e6) / 100.0))
      .toDF("id", "grp", "score").repartition(5)
    spark.conf.set("spark.graft.topk.partial", "true")
    spark.conf.set("spark.graft.topk.partial.maxKeys", "10")
    try {
      val native = TopK.perKey(df, 2, Seq("grp"),
        Seq(("score", false), ("id", true)))
        .select(col("grp"), col("id"), col("score"), col("rank"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("score").desc, col("id"))
      val windowed = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 2)
        .select(col("grp"), col("id"), col("score"), col("rank"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      assert(native == windowed)
      assert(native.nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.topk.partial.maxKeys")
      spark.conf.unset("spark.graft.topk.partial")
    }
  }

  test("plans without sorting the input") {
    val df = randomRows(1000)
    val native = TopK.perKey(df, 3, Seq("grp"),
      Seq(("score", false), ("id", true)))
    native.collect()
    val plan = native.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), plan) // no Sort operator anywhere
  }
}

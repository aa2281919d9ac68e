package graft.operators

import graft.covid.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q138 HLL cardinality sketch: accuracy in the standard regime, the
  * associative register-merge property that makes it a 100 TB distinct
  * count, and the shared-subtree plan shape. Value-level oracle parity
  * is the driver gate's job (DuckDB, `tools/check.py`). */
class StatsSketchSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = graft.Tables(spark, sfDir, "documents")

  test("q138: every source sits in the standard regime and the estimate " +
    "lands inside the ~1.04/sqrt(m) error band") {
    val rows = Stats.q138HllCardinality.fn(spark, sfDir).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      // no empty registers: the shingle domain keeps HLL out of the
      // linear-counting regime (the documented reason the query has no
      // ln()-based small-range branch)
      assert(r.getAs[Long]("n_zero_regs") == 0L, src)
      // 1.04/sqrt(64) = 13% std error; 4 sigma = 52%
      assert(r.getAs[Long]("err_pm") < 520000L,
        s"$src err ${r.getAs[Long]("err_pm")}ppm outside 4 sigma")
      // the estimate is the closed form of its own reported inputs
      val est = r.getAs[Double]("est_raw")
      val alpha = 0.7213 / (1.0 + 1.079 / 64.0)
      assert(est == alpha * 4096.0 / r.getAs[Double]("sum_terms"), src)
    }
    // exact side cross-check against an independent distinct count
    val exact = docs
      .select(col("source"),
        explode(Mirror.shingleGenSpec(col("text"))).as("sh"))
      .groupBy(col("source"))
      .agg(countDistinct(col("sh")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(
      r.getAs[Long]("exact_distinct") == exact(r.getAs[String]("source"))))
  }

  test("q138: registers MERGE — per-bucket max of two disjoint slices " +
    "equals the registers of the whole corpus") {
    val a = Stats.hllRegistersOf(
      Stats.hllShingles(docs.filter(col("doc_id") % 2 === 0)))
    val b = Stats.hllRegistersOf(
      Stats.hllShingles(docs.filter(col("doc_id") % 2 === 1)))
    val merged = a.unionByName(b)
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("rho")).toMap
    val full = Stats.hllRegistersOf(Stats.hllShingles(docs))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("rho")).toMap
    assert(merged == full,
      "sliced-and-merged registers differ from whole-corpus registers")
  }

  test("q138 plan: the sketch and exact branches share one distinct " +
    "subtree (reused exchange), and nothing goes cartesian") {
    val df = Stats.q138HllCardinality.fn(spark, sfDir)
    df.collect() // AQE finalizes reuse at runtime — materialize first
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("ReusedExchange"),
      s"the (source, sh) distinct exchange must be computed once:\n$plan")
  }
}

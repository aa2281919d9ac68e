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

  test("q139: the Count-Min estimate is one-sided for EVERY key and the " +
    "observed overcount respects the e/w error bound") {
    val occ = docs
      .select(explode(Mirror.shingleGen(col("text"))).as("sh"))
    val cm = Stats.cmsCounters(occ).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
    val byKey = occ.groupBy(col("sh")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = byKey.map(_._2).sum
    // imperative probe of every key (not just the query's top 20)
    val md = java.security.MessageDigest.getInstance("MD5")
    byKey.foreach { case (sh, exact) =>
      val hex = md.digest(sh.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
      val est = (0L until 4L).map(i => cm((i, (h1 + i * h2) % 256))).min
      assert(est >= exact, s"one-sided guarantee broken for '$sh'")
      // e/w * N at w=256; deterministic data, so a stable assertion
      assert(est - exact <= (2718 * n) / (1000 * 256) + 1,
        s"'$sh' overcount ${est - exact} above the eN/w bound")
    }
    // and the query's own output agrees with the imperative probe
    val out = Stats.q139CountMin.fn(spark, sfDir).collect()
    assert(out.length == 20)
    val exactOf = byKey.toMap
    out.foreach { r =>
      assert(r.getAs[Long]("exact_n") ==
        exactOf(r.getAs[String]("shingle")))
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("cms_est") - r.getAs[Long]("exact_n"))
    }
  }

  test("q139: the per-key-derived counter build equals the occurrence-" +
    "stream build cell for cell") {
    val occ = docs
      .select(explode(Mirror.shingleGen(col("text"))).as("sh"))
    val fromOcc = Stats.cmsCounters(occ).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
    val fromKeys = Stats.cmsCountersFromCounts(
      occ.groupBy(col("sh")).agg(count(lit(1)).as("n"))).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
    assert(fromKeys == fromOcc,
      "per-key counter derivation differs from the occurrence stream")
  }

  test("q139: counters MERGE — element-wise sum of two disjoint slices " +
    "equals the counters of the whole stream") {
    def occOf(f: org.apache.spark.sql.Column) = docs.filter(f)
      .select(explode(Mirror.shingleGen(col("text"))).as("sh"))
    val merged = Stats.cmsCounters(occOf(col("doc_id") % 2 === 0))
      .unionByName(Stats.cmsCounters(occOf(col("doc_id") % 2 === 1)))
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("c")).as("c"))
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
    val full = Stats.cmsCounters(
      docs.select(explode(Mirror.shingleGen(col("text"))).as("sh")))
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("c")).toMap
    assert(merged == full,
      "sliced-and-summed counters differ from whole-stream counters")
  }

  test("q149: the KMV estimate is the closed form of its own inputs and " +
    "lands inside the ~1/sqrt(k-1) error band") {
    val rows = Stats.q149KmvDistinct.fn(spark, sfDir).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val est = r.getAs[Double]("est_raw")
      if (r.getAs[Long]("n_k") == 32L) {
        // est = (k-1) * 2^60 / kth — recomputed imperatively
        assert(est == 31.0 * (1L << 60).toDouble
          / r.getAs[Long]("kth_min").toDouble, src)
        // 1/sqrt(31) = 18% std error; 4 sigma = 72%
        assert(r.getAs[Long]("err_pm") < 720000L,
          s"$src err ${r.getAs[Long]("err_pm")}ppm outside 4 sigma")
      } else {
        // undersized sketch degrades to the exact count
        assert(est == r.getAs[Long]("exact_distinct").toDouble, src)
      }
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

  test("q149: KMV sketches MERGE — k-smallest of the union of two " +
    "slices' sketches equals the k-smallest of the whole corpus, and " +
    "the merge is idempotent under slice overlap") {
    def valuesOf(f: org.apache.spark.sql.Column) =
      Stats.kmvValues(docs.filter(f))
    def setOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("h"))).toSet
    val a = Stats.kmvSketchOf(valuesOf(col("doc_id") % 2 === 0))
    val b = Stats.kmvSketchOf(valuesOf(col("doc_id") % 2 === 1))
    val merged = setOf(Stats.kmvSketchOf(a.unionByName(b)))
    val full = setOf(Stats.kmvSketchOf(Stats.kmvValues(docs)))
    assert(merged == full,
      "sliced-and-merged KMV sketches differ from whole-corpus sketch")
    // overlapping re-merge (the at-least-once redelivery shape) is a
    // no-op: min-union over SETS is naturally idempotent
    val again = setOf(Stats.kmvSketchOf(
      a.unionByName(b).unionByName(a)))
    assert(again == full, "KMV merge is not idempotent under overlap")
  }

  test("q150: the KMV Jaccard estimate tracks the exact pairwise " +
    "Jaccard within the 4-sigma absolute band, and the exact side " +
    "matches an independent per-pair recount") {
    val rows = Stats.q150KmvOverlap.fn(spark, sfDir).collect()
    // 20 sources -> 190 unordered pairs
    assert(rows.length > 10)
    // independent exact recount over driver-side shingle sets
    val bySource = docs
      .select(col("source"),
        explode(Mirror.shingleGenSpec(col("text"))).as("sh"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getString(1)).toSet }
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(sa < sb, s"pair order: $sa !< $sb")
      val (xa, xb) = (bySource(sa), bySource(sb))
      assert(r.getAs[Long]("exact_inter") == (xa & xb).size.toLong,
        s"$sa-$sb inter")
      assert(r.getAs[Long]("exact_union") == (xa | xb).size.toLong,
        s"$sa-$sb union")
      // KMV Jaccard std error <= sqrt(0.25/k) = 8.8%; 4 sigma = 36% abs
      assert(r.getAs[Long]("err_pm") <= 360000L,
        s"$sa-$sb jaccard err ${r.getAs[Long]("err_pm")}ppm")
      // the intersection estimate is est_jaccard x the union estimate,
      // recomputed imperatively from the reported theta (every pair's
      // union has >= k values at this SF, so the (k-1)*2^60/theta branch
      // is the one in effect)
      val estUnion =
        31.0 * (1L << 60).toDouble / r.getAs[Long]("theta").toDouble
      assert(r.getAs[Double]("est_inter") ==
        r.getAs[Double]("est_jaccard") * estUnion,
        s"$sa-$sb est_inter factorization")
    }
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
    // q139: counter + top-k branches must share ONE per-key rollup
    val df139 = Stats.q139CountMin.fn(spark, sfDir)
    df139.collect()
    val p139 = df139.queryExecution.executedPlan.toString
    assert(p139.contains("ReusedExchange"),
      s"q139's branches must share the (sh) rollup exchange:\n$p139")
    assert(!p139.contains("CartesianProduct"), p139)
  }

  test("session_window boundary contract the q56 oracle replays: an " +
    "exactly-gap-sized gap MERGES; duplicate timestamps are one session") {
    // Pins Spark's closed-at-the-end merge rule, found when the 10x
    // synthetic sweep's second-granularity timestamps produced exact
    // 30-min gaps (driver data's microsecond jitter never does): two
    // events exactly 30:00 apart are ONE session ending at +60 min.
    // The q56 oracle's gaps-and-islands replay (split only when the
    // gap EXCEEDS 30 min, ties ordered by event_id) and the streaming
    // twin's `<= gapMs` merge both encode this; if a Spark upgrade
    // flips the boundary, this is the test that says so.
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:30:00"),
      (2L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:30:00.000001"),
      (3L, "2024-01-01 00:05:00"), (3L, "2024-01-01 00:05:00")
    ).toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val sess = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.end").as("e"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(sess.toSeq == Seq(
      (1L, "2024-01-01 01:00:00.0", 2L), // exact gap merged, end = +60
      (2L, "2024-01-01 00:30:00.0", 1L), // 1 us past the gap: split
      (2L, "2024-01-01 01:00:00.000001", 1L),
      (3L, "2024-01-01 00:35:00.0", 2L)), // duplicate ts: one session
      sess.toSeq.toString)
  }
}

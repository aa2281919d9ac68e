package graft.operators

import graft.covid.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The materialized near-dup pair artifact must be a pure cache: every
  * consumer reads EXACTLY what the uncached pipeline computes — same rows,
  * same doubles, bit for bit — and disabling the conf restores the
  * pre-artifact compute path. */
class PairCacheSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def withCache[A](on: Boolean)(body: => A): A =
    try {
      spark.conf.set("spark.graft.paircache", on.toString)
      body
    } finally spark.conf.unset("spark.graft.paircache")

  test("q19 pairs: cached artifact identical to the computed pipeline") {
    val computed = withCache(on = false) {
      Dedup.nearDupPairs(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val cached = withCache(on = true) {
      Dedup.nearDupPairs(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(computed.nonEmpty, "fixture must contain near-dup pairs")
    // exact double equality: the artifact stores the verified stats, not
    // re-derived approximations — jaccard must match bit for bit
    assert(cached == computed)
    // second read must come from the published artifact and still agree
    val again = withCache(on = true) {
      Dedup.nearDupPairs(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(again == computed)
  }

  test("q83 containment: cached artifact identical to the computed pipeline") {
    def run() = Dedup.q83Containment.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val computed = withCache(on = false)(run())
    val cached = withCache(on = true)(run())
    assert(computed.nonEmpty)
    assert(cached == computed)
  }
}

package graft.operators

import java.io.File

import graft.covid.SparkTestSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SimHash verified-pair artifact must be a pure cache: q109 reads
  * EXACTLY what the uncached pipeline computes — same rows, same doubles,
  * bit for bit — and disabling `spark.graft.simpaircache` restores the
  * inline compute path. (The store-protocol edge cases — pruning, lost
  * pointers, stamps — are pinned once in PairCacheSpec; both caches run
  * the same [[ArtifactStore]] code.) */
class SimPairCacheSpec extends AnyFunSuite with SparkTestSession
    with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private val localRoot =
    new File(sys.props("java.io.tmpdir"), "graft-simpaircache-spec")

  override def beforeAll(): Unit = {
    deleteRec(localRoot)
    sys.props("graft.simpaircache.dir") = "file:" + localRoot.getAbsolutePath
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.simpaircache.dir")
    deleteRec(localRoot)
    super.afterAll()
  }

  private def deleteRec(f: File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec)
    f.delete(); ()
  }

  private def withCache[A](on: Boolean)(body: => A): A =
    try {
      spark.conf.set("spark.graft.simpaircache", on.toString)
      body
    } finally spark.conf.unset("spark.graft.simpaircache")

  private def q109Rows(): Seq[(Long, Long, Double, Long, Double)] =
    Dedup.q109SimhashCalibration.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4))).toSeq

  test("q109 calibration: cached artifact identical to computed pipeline") {
    val computed = withCache(on = false)(q109Rows())
    val cached = withCache(on = true)(q109Rows())
    assert(computed.nonEmpty, "fixture must produce hamming bins")
    assert(cached == computed)
    // second read serves from the published artifact and still agrees
    val again = withCache(on = true)(q109Rows())
    assert(again == computed)
  }

  test("raw stats table: cached rows equal computed rows bit for bit") {
    def rows(on: Boolean) = withCache(on) {
      SimPairCache.stats(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
    }
    val computed = rows(on = false)
    val cached = rows(on = true)
    assert(computed.nonEmpty)
    assert(cached == computed)
  }
}

package graft.operators

import java.io.File

import graft.covid.SparkTestSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The persisted reference LM must be a pure cache: the loaded count
  * tables and vocabulary size equal what fresh training computes, the
  * second load resolves without re-publishing, disabling the conf
  * bypasses the store, and q153 (cached) ≡ q154 (fresh bypass) row for
  * row. Runs against a scheme-qualified `file:` URI (the BpeCacheSpec
  * portability posture). */
class LmCacheSpec extends AnyFunSuite with SparkTestSession
    with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private val localRoot =
    new File(sys.props("java.io.tmpdir"), "graft-lmcache-spec")

  override def beforeAll(): Unit = {
    deleteRec(localRoot)
    sys.props("graft.lmcache.dir") = "file:" + localRoot.getAbsolutePath
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.lmcache.dir")
    deleteRec(localRoot)
    super.afterAll()
  }

  private def deleteRec(f: File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec)
    f.delete(); ()
  }

  private def c2Set(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => r.getAs[Long]("h2") -> r.getAs[Long]("n2")).toSet
  private def c1Set(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => r.getAs[Long]("h1") -> r.getAs[Long]("n1")).toSet

  test("cached model == freshly trained model (both count tables AND " +
    "the vocabulary size); the second load hits the committed artifact " +
    "without re-publishing") {
    val (fc2, fc1, fv) = Quality.lmRefCounts(spark, sfDir)
    val (wantC2, wantC1) = (c2Set(fc2), c1Set(fc1))

    val pubBefore = ArtifactStore.published.get()
    val first = LmCache.counts(spark, sfDir) // trains + publishes
    assert(ArtifactStore.published.get() == pubBefore + 1)
    assert(c2Set(first._1) == wantC2, "cached c2 != trained c2")
    assert(c1Set(first._2) == wantC1, "cached c1 != trained c1")
    assert(first._3 == fv, "cached V != trained V")

    val second = LmCache.counts(spark, sfDir) // pure artifact read
    assert(ArtifactStore.published.get() == pubBefore + 1,
      "second load must not re-publish")
    assert(c2Set(second._1) == wantC2)
    assert(second._3 == fv)
    assert(Option(localRoot.listFiles()).getOrElse(Array.empty)
      .count(_.isDirectory) == 1, "exactly one fingerprint dir expected")
  }

  test("spark.graft.lmcache=false bypasses the store entirely, and " +
    "q153 (cached) == q154 (fresh bypass) row for row") {
    val cachedRows = Quality.q153PerplexityBuckets.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    try {
      spark.conf.set("spark.graft.lmcache", "false")
      val filesBefore = Option(localRoot.listFiles())
        .getOrElse(Array.empty).length
      val disabledRows = Quality.q153PerplexityBuckets.fn(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(disabledRows == cachedRows,
        "disabled-cache path must compute identical rows")
      assert(Option(localRoot.listFiles()).getOrElse(Array.empty)
        .length == filesBefore, "disabled cache must not touch the store")
    } finally spark.conf.unset("spark.graft.lmcache")
    val bypassRows = Quality.q154PerplexityTrainPipeline.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(bypassRows == cachedRows, "q154 (fresh) != q153 (cached)")
  }
}

package graft.operators

import java.io.File

import graft.covid.SparkTestSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The persisted SEMANTIC component-label artifact must be a pure cache:
  * the loaded table equals what the inline pair stage + label propagation
  * computes row for row, disabling the conf restores inline compute, and
  * the q166 fresh bypass equals the cached q73 output exactly. Runs
  * against a scheme-qualified `file:` URI so every operation exercises
  * the Hadoop `FileSystem` surface (the HDFS/S3A portability contract). */
class SemCacheSpec extends AnyFunSuite with SparkTestSession
    with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private val localRoot =
    new File(sys.props("java.io.tmpdir"), "graft-semcache-spec")

  override def beforeAll(): Unit = {
    deleteRec(localRoot)
    sys.props("graft.semcache.dir") = "file:" + localRoot.getAbsolutePath
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.semcache.dir")
    deleteRec(localRoot)
    super.afterAll()
  }

  private def deleteRec(f: File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec)
    f.delete(); ()
  }

  private def labelSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("component"))
      .toSet

  test("cached labels == freshly computed labels, and the second load " +
    "hits the SAME committed artifact") {
    val fresh = labelSet(Dedup.semanticComponents(spark, sfDir))
    assert(fresh.nonEmpty)

    val first = labelSet(SemCache.components(spark, sfDir)) // publishes
    assert(first == fresh, "cached labels != computed labels")
    val committed = Option(localRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    assert(committed.length == 1, "exactly one fingerprint dir expected")

    val second = labelSet(SemCache.components(spark, sfDir)) // pure read
    assert(second == fresh)
    assert(Option(localRoot.listFiles()).getOrElse(Array.empty)
      .count(_.isDirectory) == 1, "second load must not re-publish")
  }

  test("spark.graft.semcache=false bypasses the store entirely") {
    deleteRec(localRoot)
    try {
      spark.conf.set("spark.graft.semcache", "false")
      val labels = labelSet(SemCache.components(spark, sfDir))
      assert(labels.nonEmpty)
      assert(!localRoot.exists() || localRoot.listFiles().isEmpty,
        "disabled cache must not write the store")
    } finally spark.conf.unset("spark.graft.semcache")
  }

  test("q166 (fresh-compute bypass) == q73 (cached) row for row") {
    deleteRec(localRoot)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Long]("component"), r.getAs[Boolean]("is_survivor"))).toSeq
    val cached = rows(Dedup.q73SemanticDedup.fn(spark, sfDir))
    val fresh = rows(Dedup.q166SemanticDedupFresh.fn(spark, sfDir))
    assert(cached.nonEmpty)
    assert(cached == fresh, "cached q73 and bypass q166 disagree")
    // and the cached run actually published the artifact it served
    assert(Option(localRoot.listFiles()).getOrElse(Array.empty)
      .count(_.isDirectory) == 1)
  }
}

package graft.operators

import java.io.File

import graft.covid.SparkTestSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The persisted component-label artifact must be a pure cache: the
  * loaded table equals what fresh label propagation computes row for
  * row, disabling the conf restores inline compute, and the q59 bypass
  * query stays equal to the cached consumers' labels. Runs against a
  * scheme-qualified `file:` URI so every operation exercises the Hadoop
  * `FileSystem` surface (the HDFS/S3A portability contract). */
class CcCacheSpec extends AnyFunSuite with SparkTestSession
    with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private val localRoot =
    new File(sys.props("java.io.tmpdir"), "graft-cccache-spec")

  override def beforeAll(): Unit = {
    deleteRec(localRoot)
    sys.props("graft.cccache.dir") = "file:" + localRoot.getAbsolutePath
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.cccache.dir")
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

  test("cached labels == freshly propagated labels, and the second " +
    "load hits the SAME committed artifact") {
    val fresh = labelSet(Corpus.connectedComponents(
      Dedup.nearDupPairs(spark, sfDir), "doc_a", "doc_b"))
    assert(fresh.nonEmpty)

    val first = labelSet(CcCache.components(spark, sfDir)) // publishes
    assert(first == fresh, "cached labels != computed labels")
    val committed = Option(localRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    assert(committed.length == 1, "exactly one fingerprint dir expected")

    val second = labelSet(CcCache.components(spark, sfDir)) // pure read
    assert(second == fresh)
    assert(Option(localRoot.listFiles()).getOrElse(Array.empty)
      .count(_.isDirectory) == 1, "second load must not re-publish")
  }

  test("concurrent first-use resolves race to exactly ONE published " +
    "artifact, and every caller reads identical labels") {
    deleteRec(localRoot)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((1 to 4).map(_ => Future {
        labelSet(CcCache.components(spark, sfDir))
      })), 5.minutes)
    assert(results.distinct.size == 1, "racing callers disagree")
    assert(results.head.nonEmpty)
    assert(Option(localRoot.listFiles()).getOrElse(Array.empty)
      .count(_.isDirectory) == 1,
      "the race must publish exactly one fingerprint dir")
  }

  test("spark.graft.cccache=false bypasses the store entirely") {
    deleteRec(localRoot)
    try {
      spark.conf.set("spark.graft.cccache", "false")
      val labels = labelSet(CcCache.components(spark, sfDir))
      assert(labels.nonEmpty)
      assert(!localRoot.exists() || localRoot.listFiles().isEmpty,
        "disabled cache must not write the store")
    } finally spark.conf.unset("spark.graft.cccache")
  }

  test("q59 (fresh-compute bypass) agrees with a cached consumer (q94) " +
    "on every cluster size") {
    // q59 labels every doc (singletons included); q94 reads the cache.
    // Cross-check the size distribution both ways.
    val q59 = Corpus.q59DedupComponents.fn(spark, sfDir).collect()
    val sizesFromQ59 = q59.groupBy(_.getAs[Long]("component"))
      .map { case (_, rows) => rows.length.toLong }
      .groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    val q94 = Corpus.q94ClusterSizeDist.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("comp_size") -> r.getAs[Long]("n_clusters"))
      .toMap
    assert(q94 == sizesFromQ59.toMap,
      s"bypass vs cached size distribution: $sizesFromQ59 vs $q94")
  }
}

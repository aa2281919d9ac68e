package graft.operators

import java.io.File

import graft.covid.SparkTestSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The persisted per-doc stage-signal artifact must be a pure cache: the
  * loaded table equals what [[CorpusBuild.docFlags]] computes row for
  * row, disabling the conf restores inline compute, and the composed
  * q161 funnel over the artifact equals the funnel over fresh flags.
  * Runs against a scheme-qualified `file:` URI so every operation
  * exercises the Hadoop `FileSystem` surface. */
class ManifestCacheSpec extends AnyFunSuite with SparkTestSession
    with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private val localRoot =
    new File(sys.props("java.io.tmpdir"), "graft-manifestcache-spec")

  override def beforeAll(): Unit = {
    deleteRec(localRoot)
    sys.props("graft.manifestcache.dir") =
      "file:" + localRoot.getAbsolutePath
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.manifestcache.dir")
    deleteRec(localRoot)
    super.afterAll()
  }

  private def deleteRec(f: File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec)
    f.delete(); ()
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("t_ex"),
        (1 to 8).map(i => r.getAs[Boolean](s"f$i")).toList)
    }.toSet

  test("cached flags == freshly computed flags, and the second load " +
    "hits the SAME committed artifact") {
    val fresh = rows(CorpusBuild.docFlags(spark, sfDir))
    assert(fresh.nonEmpty)

    val first = rows(ManifestCache.flags(spark, sfDir)) // publishes
    assert(first == fresh, "cached flags != computed flags")
    assert(Option(localRoot.listFiles()).getOrElse(Array.empty)
      .count(_.isDirectory) == 1, "exactly one fingerprint dir expected")

    val second = rows(ManifestCache.flags(spark, sfDir)) // pure read
    assert(second == fresh)
    assert(Option(localRoot.listFiles()).getOrElse(Array.empty)
      .count(_.isDirectory) == 1, "second load must not re-publish")
  }

  test("spark.graft.manifestcache=false bypasses the store entirely") {
    deleteRec(localRoot)
    try {
      spark.conf.set("spark.graft.manifestcache", "false")
      val flags = rows(ManifestCache.flags(spark, sfDir))
      assert(flags.nonEmpty)
      assert(!localRoot.exists() || localRoot.listFiles().isEmpty,
        "disabled cache must not write the store")
    } finally spark.conf.unset("spark.graft.manifestcache")
  }
}

package graft.operators

import java.io.File

import graft.covid.SparkTestSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The persisted BPE model must be a pure cache: the loaded merge table
  * and segmented vocabulary equal what fresh training computes, bit for
  * bit, and disabling the conf restores the inline-training path. Runs
  * the store against a scheme-qualified `file:` URI so every operation
  * exercises the Hadoop `FileSystem` surface (the HDFS/S3A portability
  * contract), not `java.io.File`. */
class BpeCacheSpec extends AnyFunSuite with SparkTestSession
    with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private val localRoot =
    new File(sys.props("java.io.tmpdir"), "graft-bpecache-spec")

  override def beforeAll(): Unit = {
    deleteRec(localRoot)
    sys.props("graft.bpecache.dir") = "file:" + localRoot.getAbsolutePath
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.bpecache.dir")
    deleteRec(localRoot)
    super.afterAll()
  }

  private def deleteRec(f: File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec)
    f.delete(); ()
  }

  private def vocabSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("freq"),
      r.getAs[scala.collection.Seq[String]]("syms").toList)).toSet

  test("cached model == freshly trained model (merges AND vocabulary), " +
    "and the second load hits the SAME committed artifact") {
    val fresh = TextAnalysis.bpeTrain(
      graft.Tables(spark, sfDir, "documents"))
    val freshVocab = vocabSet(fresh._1)
    fresh._1.unpersist(false)

    val first = BpeCache.trained(spark, sfDir) // trains + publishes
    assert(first._2 == fresh._2, "cached merges != trained merges")
    assert(vocabSet(first._1) == freshVocab, "cached vocab != trained")

    val committed = Option(localRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    assert(committed.length == 1, "exactly one fingerprint dir expected")

    val second = BpeCache.trained(spark, sfDir) // pure artifact read
    assert(second._2 == fresh._2)
    assert(vocabSet(second._1) == freshVocab)
    assert(Option(localRoot.listFiles()).getOrElse(Array.empty)
      .count(_.isDirectory) == 1, "second load must not re-publish")
  }

  test("spark.graft.bpecache=false bypasses the store entirely") {
    val marker = new File(localRoot, "probe-disabled")
    deleteRec(localRoot)
    try {
      spark.conf.set("spark.graft.bpecache", "false")
      val (vocab, merges) = BpeCache.trained(spark, sfDir)
      assert(merges.nonEmpty)
      vocab.unpersist(false)
      assert(!localRoot.exists() || localRoot.listFiles().isEmpty,
        "disabled cache must not write the store")
      assert(!marker.exists())
    } finally spark.conf.unset("spark.graft.bpecache")
  }

  test("q95 (cached) and q135 (bypass) produce identical results") {
    val a = TextAnalysis.q95BpeMerges.fn(spark, sfDir).collect().toSeq
    val b = TextAnalysis.q135BpeTrainPipeline.fn(spark, sfDir)
      .collect().toSeq
    assert(a == b)
  }
}

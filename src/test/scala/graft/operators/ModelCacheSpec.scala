package graft.operators

import java.io.{DataOutputStream, File, FileOutputStream}

import graft.Tables
import graft.covid.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The trained-quantizer disk tier: a cold session (simulated by dropping
  * the per-JVM memo) must serve the PERSISTED model bit-exactly instead of
  * retraining, and the kill switch must restore plain training. Runs
  * against a scheme-qualified `file:` store root (Hadoop FileSystem API
  * surface, as PairCacheSpec). */
class ModelCacheSpec extends AnyFunSuite with SparkTestSession
    with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private val localRoot =
    new File(sys.props("java.io.tmpdir"), "graft-modelcache-spec")

  override def beforeAll(): Unit = {
    deleteRec(localRoot)
    sys.props("graft.modelcache.dir") = "file:" + localRoot.getAbsolutePath
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.modelcache.dir")
    deleteRec(localRoot)
    // entries memoized against the spec-local store are still valid models;
    // drop them anyway so later suites repopulate against the default root
    Similarity.clearModelMemoForTest()
    super.afterAll()
  }

  private def deleteRec(f: File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec)
    f.delete(); ()
  }

  private def emb =
    Tables(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))

  private def sameModel(a: Array[(Long, Array[Double])],
      b: Array[(Long, Array[Double])]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((c1, v1), (c2, v2)) =>
      c1 == c2 && java.util.Arrays.equals(v1, v2) // bit-exact doubles
    }

  /** The committed centroids.bin files currently in the store. */
  private def payloadFiles: Seq[File] =
    Option(localRoot.listFiles()).getOrElse(Array.empty[File]).toSeq
      .flatMap { fp =>
        val ptr = new File(fp, "_COMMITTED")
        if (!ptr.exists()) Nil
        else {
          val att = java.nio.file.Files.readString(ptr.toPath).trim
          val bin = new File(new File(fp, att), "centroids.bin")
          if (bin.exists()) Seq(bin) else Nil
        }
      }

  test("cold session reuses the persisted model bit-exactly; kill switch " +
    "restores training") {
    Similarity.clearModelMemoForTest()
    val trained = Similarity.lloydCentroids(emb, Similarity.KmeansIters)
    assert(payloadFiles.nonEmpty, "training must persist the model")

    // cold session: memo dropped, disk artifact present → reload, bit-exact
    Similarity.clearModelMemoForTest()
    val reloaded = Similarity.lloydCentroids(emb, Similarity.KmeansIters)
    assert(sameModel(trained, reloaded))

    // PROOF the reload came from disk, not retraining: poison the
    // persisted payload with a sentinel model and observe it served
    val sentinel = trained.map { case (c, v) => (c + 1000L, v.map(_ + 1.0)) }
    payloadFiles.foreach { bin =>
      // drop the Hadoop local-FS checksum sibling: the poison write below
      // bypasses the FileSystem API, and a stale .crc would make the read
      // fail checksum → self-heal by retraining (masking what we test)
      new File(bin.getParentFile, "." + bin.getName + ".crc").delete()
      val out = new DataOutputStream(new FileOutputStream(bin))
      try {
        out.writeInt(sentinel.length)
        sentinel.foreach { case (cell, vec) =>
          out.writeLong(cell)
          out.writeInt(vec.length)
          vec.foreach(d =>
            out.writeLong(java.lang.Double.doubleToLongBits(d)))
        }
      } finally out.close()
    }
    Similarity.clearModelMemoForTest()
    val poisoned = Similarity.lloydCentroids(emb, Similarity.KmeansIters)
    assert(sameModel(poisoned, sentinel),
      "a cold session must serve the DISK model (memo bypassed)")

    // kill switch: disk tier off → trains fresh, ignores the poisoned file
    Similarity.clearModelMemoForTest()
    try {
      spark.conf.set("spark.graft.modelcache", "false")
      val fresh = Similarity.lloydCentroids(emb, Similarity.KmeansIters)
      assert(sameModel(fresh, trained),
        "kill switch must retrain (deterministic ≡ original), not read disk")
    } finally spark.conf.unset("spark.graft.modelcache")

    // repair the store for any later consumer of this root
    deleteRec(localRoot)
    Similarity.clearModelMemoForTest()
  }
}

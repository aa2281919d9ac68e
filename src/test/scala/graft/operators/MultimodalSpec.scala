package graft.operators

import graft.covid.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  import Media._

  private val files = Seq(
    MediaFile(1L, "text/plain", "hello world".getBytes("UTF-8")),
    MediaFile(2L, "text/plain", Array.fill[Byte](256)(7)),
    MediaFile(3L, "text/plain", Array.emptyByteArray))

  test("decode stub is deterministic and partition-shaped") {
    val out = decodeImages(files.toDS().repartition(2))
      .collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(d => d.width >= 64 && d.width < 192))
    assert(out.forall(_.channels == 3))
    // same bytes -> same decode, regardless of partitioning
    val again = decodeImages(files.toDS().repartition(3))
      .collect().sortBy(_.doc_id)
    assert(out.toSeq == again.toSeq)
    // meanLuma of constant payload is the constant
    assert(out(1).meanLuma == 7.0)
    assert(out(2).meanLuma == 0.0)
  }

  test("resize downsamples payloads preserving ids") {
    val out = resize(files.toDS(), 4).collect().sortBy(_.doc_id)
    assert(out(1).media.length == 64)
    assert(out(0).media.toSeq ==
      "hello world".getBytes("UTF-8").grouped(4).map(_.head).toSeq)
  }

  test("binary columns survive a shuffle untouched") {
    val ds = files.toDS().repartition(4, $"doc_id")
    val back = ds.collect().sortBy(_.doc_id)
    assert(back(0).media.toSeq == "hello world".getBytes("UTF-8").toSeq)
  }

  test("q148: clusters respect Hamming-1 adjacency, survivors are the " +
    "per-cluster min doc_id, and signature-space merging is non-vacuous") {
    import org.apache.spark.sql.functions.col
    val rows = Multimodal.q148MediaClusters.fn(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val byCluster = rows.groupBy(_._3)
    // exactly one survivor per cluster: the min doc_id
    byCluster.foreach { case (c, ms) =>
      val survivors = ms.filter(_._5).map(_._1)
      assert(survivors.toSeq == Seq(ms.map(_._1).min),
        s"cluster $c: ${survivors.toSeq}")
      assert(ms.forall(_._4 == ms.length), s"cluster $c size mismatch")
    }
    // same-or-Hamming-1 phashes always share a cluster
    val clusterOf = rows.map(m => m._2 -> m._3).toMap // phash -> cluster
    clusterOf.keys.foreach { p =>
      (0 until 16).foreach { j =>
        val q = p ^ (1L << j)
        clusterOf.get(q).foreach(cq =>
          assert(cq == clusterOf(p), s"$p and $q split across clusters"))
      }
    }
    // non-vacuous: some cluster merges >= 2 DISTINCT signatures
    assert(byCluster.exists(_._2.map(_._2).distinct.length >= 2),
      "fixture must produce at least one multi-signature cluster")
  }
}

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
}

package graft.streaming

import graft.covid.SparkTestSession
import graft.operators.WebCorpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

final case class UrlDoc(doc_id: Long, source: String, n_chars: Long)

/** Streaming URL canonicalization ([[WebCorpusStream]]): the accumulated
  * canonical-URL table must be row-identical to the batch pass over
  * everything ingested, and the read-time rollup/cap must equal the
  * batch q159/q160 outputs — under overlapping batch splits,
  * fresh-lineage redelivery, and compaction. The cap test is the
  * interesting one: its keep set is a function of the WHOLE row set, so
  * stream ≡ batch here proves the derive-at-read-time design (a
  * forwarded per-epoch keep decision could not satisfy it — late
  * arrivals evict earlier keeps). */
class WebCorpusStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docRows: Seq[UrlDoc] =
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect()
      .map(r => UrlDoc(r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq

  private def rowsOf(df: DataFrame) =
    df.collect().map(_.toString).toList

  private def urlsOf(df: DataFrame) = df.collect()
    .map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("raw_url"), r.getAs[String]("url"),
        r.getAs[String]("host"))).toMap

  private def run(dir: java.nio.file.Path, ckpt: String,
      bs: Seq[Seq[UrlDoc]]): Seq[(Long, Long)] = {
    val stream = MemoryStream[UrlDoc](spark)
    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = WebCorpusStream.start(stream.toDF(),
      dir.resolve("state").toString, dir.resolve(ckpt).toString) {
      (e, n) => reports += ((e, n))
    }
    try bs.foreach { b =>
      stream.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    reports.toSeq
  }

  test("streamed rollup and cap equal batch q159/q160 over the same " +
    "corpus, under overlapping batch splits; fresh-lineage redelivery " +
    "gates to zero and compaction changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("urlstream")
    val rows = docRows
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    // batch 2 redelivers the tail of batch 1 — the id gate must absorb it
    run(dir, "ckpt", Seq(b1, b1.takeRight(15) ++ b2, b3))
    val state = dir.resolve("state").toString

    val wantUrls = urlsOf(WebCorpus.canonicalized(
      graft.Tables(spark, sfDir, "documents")))
    val wantRollup = rowsOf(WebCorpus.q159UrlCanon.fn(spark, sfDir))
    val wantCap = rowsOf(WebCorpus.q160HostCap.fn(spark, sfDir))
    assert(urlsOf(WebCorpusStream.urls(spark, state)) == wantUrls,
      "streamed canonical-URL table != batch pass")
    assert(rowsOf(WebCorpusStream.rollup(spark, state)) == wantRollup,
      "streamed rollup != batch q159")
    assert(rowsOf(WebCorpusStream.cap(spark, state)) == wantCap,
      "streamed cap != batch q160")

    // fresh-lineage redelivery of batch 1: the id gate yields an empty
    // delta under a NEW checkpoint; state is unchanged
    val rep = run(dir, "ckpt2", Seq(b1))
    assert(rep.map(_._2) == Seq(0L), s"redelivery must gate to zero: $rep")
    assert(urlsOf(WebCorpusStream.urls(spark, state)) == wantUrls)

    WebCorpusStream.compactState(spark, state)
    assert(urlsOf(WebCorpusStream.urls(spark, state)) == wantUrls,
      "compaction changed the URL table")
    assert(rowsOf(WebCorpusStream.rollup(spark, state)) == wantRollup,
      "compaction changed the rollup")
    assert(rowsOf(WebCorpusStream.cap(spark, state)) == wantCap,
      "compaction changed the cap verdict")
  }

  test("the cap verdict legitimately CHANGES as better docs arrive — the " +
    "non-local property that forces derive-at-read-time") {
    val dir = java.nio.file.Files.createTempDirectory("urlevict")
    // 6 docs of one host block (doc_ids 0..5 share doc_id div 16 = 0,
    // hence one host); n_chars grow with doc_id so the LAST arrival
    // outranks every earlier keep
    def doc(i: Long, chars: Long) = UrlDoc(i, "src0", chars)
    val early = (0L to 4L).map(i => doc(i, 100 + i))
    val late = Seq(doc(5L, 10000L))
    val stream = MemoryStream[UrlDoc](spark)
    val state = dir.resolve("state").toString
    val q = WebCorpusStream.start(stream.toDF(), state,
      dir.resolve("ckpt").toString)()
    try {
      stream.addData(early.toIndexedSeq: _*)
      q.processAllAvailable()
      val before = WebCorpusStream.cap(spark, state).collect()
      assert(before.head.getAs[Long]("n_dropped") == 0L) // 5 docs, k=5
      stream.addData(late.toIndexedSeq: _*)
      q.processAllAvailable()
      val after = WebCorpusStream.cap(spark, state).collect()
      assert(after.head.getAs[Long]("n_docs") == 6L)
      assert(after.head.getAs[Long]("n_dropped") == 1L,
        "the 6th doc must push one doc over the cap")
      // the evictee is the SHORTEST early doc — chars_kept contains the
      // late giant, proving the verdict re-ranked rather than appended
      assert(after.head.getAs[Long]("chars_kept") ==
        (10000L + (101 to 104).sum),
        s"late long doc must enter the keep set: ${after.head}")
    } finally q.stop()
  }
}

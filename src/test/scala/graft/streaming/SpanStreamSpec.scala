package graft.streaming

import graft.covid.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class SpanDoc(doc_id: Long, text: String)

/** Streaming exact-substring span maintenance ([[SpanStream]]): the
  * accumulated positioned-shingle index must yield batch q143's span
  * table row for row — under overlapping batch splits, fresh-lineage
  * redelivery, and compaction — and the affected-docs signal must be
  * complete (unaffected documents' spans are byte-identical across an
  * epoch). */
class SpanStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docRows: Seq[SpanDoc] =
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => SpanDoc(r.getLong(0), r.getString(1))).toSeq

  private def run(dir: java.nio.file.Path, ckpt: String,
      bs: Seq[Seq[SpanDoc]]): Seq[(Long, Long)] = {
    val stream = MemoryStream[SpanDoc](spark)
    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = SpanStream.start(stream.toDF(),
      dir.resolve("state").toString, dir.resolve(ckpt).toString) {
      (e, n) => reports += ((e, n))
    }
    try bs.foreach { b =>
      stream.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    reports.toSeq
  }

  private def spansOf(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  test("accumulated spans == batch q143 under overlapping splits and " +
    "redelivery; compaction preserves; affected-docs is complete") {
    val dir = java.nio.file.Files.createTempDirectory("spanstream")
    val rows = docRows
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val state = dir.resolve("state").toString

    // epochs 0..1, capturing the span table between them for the
    // affected-docs check (batch 2 redelivers a tail of batch 1)
    val r1 = run(dir, "ckpt1", Seq(b1))
    val before = spansOf(SpanStream.spans(spark, state))
    val r2 = run(dir, "ckpt2", Seq(b1.takeRight(20) ++ b2, b3))
    assert((r1 ++ r2).map(_._2).sum == rows.length,
      "every doc must land exactly once (gate absorbs the overlap)")

    val got = spansOf(SpanStream.spans(spark, state))
    val want = spansOf(graft.operators.Corpus.q143SubstringSpans
      .fn(spark, sfDir))
    assert(got == want, s"stream spans ${got.size} != batch ${want.size}")

    // affected-docs completeness for epoch 1 (the b1-tail + b2 batch,
    // under ckpt2's lineage the first new epoch): docs NOT in the
    // affected set must have byte-identical spans before and after
    val e1 = r2.head._1
    val affected = SpanStream.affectedDocs(spark, state, e1)
      .collect().map(_.getLong(0)).toSet
    assert(affected.nonEmpty && affected.size < rows.length,
      s"affected must be a proper subset: ${affected.size}/${rows.length}")
    // note: `before` is pre-epoch-1 AND pre-epoch-2; restrict both sides
    // to docs unaffected by BOTH later epochs
    val e2 = r2(1)._1
    val affected2 = SpanStream.affectedDocs(spark, state, e2)
      .collect().map(_.getLong(0)).toSet
    val untouched = (b1.map(_.doc_id).toSet -- affected) -- affected2
    assert(untouched.nonEmpty, "need untouched docs for the check")
    assert(got.filter(s => untouched(s._1)) ==
      before.filter(s => untouched(s._1)),
      "unaffected docs' spans must not move across epochs")
    // and affected docs resolve to exactly the global table's rows
    assert(got.filter(s => affected(s._1)) ==
      want.filter(s => affected(s._1)))

    // fresh-lineage redelivery gates to zero, spans unchanged
    val rep = run(dir, "ckpt3", Seq(b2))
    assert(rep.map(_._2) == Seq(0L), s"redelivery must gate: $rep")
    assert(spansOf(SpanStream.spans(spark, state)) == want)

    // compaction (shared crash-safe protocol) preserves the table
    SpanStream.compactState(spark, state)
    assert(spansOf(SpanStream.spans(spark, state)) == want,
      "compaction changed the span table")
    val occEpochs = EpochState.fs(spark, state)
      .listStatus(new org.apache.hadoop.fs.Path(s"$state/occ"))
      .map(_.getPath.getName).count(_.startsWith("epoch="))
    assert(occEpochs == 1, s"occ must fold to one generation: $occEpochs")
  }
}

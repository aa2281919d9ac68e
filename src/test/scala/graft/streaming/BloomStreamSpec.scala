package graft.streaming

import graft.covid.SparkTestSession
import graft.operators.{Bloom, Mirror}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

final case class EvalDoc(doc_id: Long, source: String, text: String)

/** Streaming Bloom-filter maintenance ([[BloomFilterStream]]): the
  * streamed filter must equal the batch filter over the same eval docs
  * with NO dedup gate — OR-idempotence absorbs duplicates, overlaps,
  * and fresh-lineage redeliveries — and probing with it must reproduce
  * q142's candidate stage. */
class BloomStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.1"
  private def docs = graft.Tables(spark, sfDir, "documents")
  private def isEval =
    pmod(Mirror.hash60b(col("doc_id").cast("string")), lit(50L)) === 0

  private def evalRows: Seq[EvalDoc] = docs.filter(isEval)
    .select(col("doc_id"), col("source"), col("text")).collect()
    .map(r => EvalDoc(r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def filterOf(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits")).toMap

  private def run(dir: java.nio.file.Path, ckpt: String,
      bs: Seq[Seq[EvalDoc]]): Unit = {
    val stream = MemoryStream[EvalDoc](spark)
    val q = BloomFilterStream.start(stream.toDF(),
      dir.resolve("state").toString, dir.resolve(ckpt).toString)()
    try bs.foreach { b =>
      stream.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
  }

  test("streamed filter == batch filter under duplicated, overlapping " +
    "deliveries — with NO id gate (OR-idempotence)") {
    val dir = java.nio.file.Files.createTempDirectory("bloomstream")
    val rows = evalRows
    assert(rows.size > 10, s"fixture too small: ${rows.size} eval docs")
    val (b1, b2) = rows.splitAt(rows.size / 2)
    // batch 2 redelivers ALL of batch 1 on top of its own half
    run(dir, "ckpt1", Seq(b1, b1 ++ b2))
    val state = dir.resolve("state").toString
    val batchFilter = filterOf(Bloom.filterWords(docs.filter(isEval)
      .select(explode(Mirror.shingle5Gen(col("text"))).as("sh"))
      .distinct()))
    assert(filterOf(BloomFilterStream.filter(spark, state)) == batchFilter,
      "streamed filter != batch filter")
    // fresh-lineage redelivery of EVERYTHING: still equal, no gate
    run(dir, "ckpt2", Seq(rows))
    assert(filterOf(BloomFilterStream.filter(spark, state)) == batchFilter,
      "full redelivery changed the filter")
    // compaction is the merge itself
    BloomFilterStream.compactState(spark, state)
    assert(filterOf(BloomFilterStream.filter(spark, state)) == batchFilter)
  }

  test("probing the streamed filter reproduces q142's candidate stage") {
    val dir = java.nio.file.Files.createTempDirectory("bloomprobe")
    run(dir, "ckpt", Seq(evalRows))
    val corpus = docs.filter(!isEval)
    val streamed = BloomFilterStream.probe(spark,
      dir.resolve("state").toString, corpus).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    val batch = Bloom.candidates(corpus,
      Bloom.filterWords(docs.filter(isEval)
        .select(explode(Mirror.shingle5Gen(col("text"))).as("sh"))
        .distinct())).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(streamed == batch, "streamed probe != batch candidate set")
    assert(batch.nonEmpty, "fixture: candidate set is empty")
  }
}

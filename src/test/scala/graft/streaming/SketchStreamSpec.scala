package graft.streaming

import graft.covid.SparkTestSession
import graft.operators.{Mirror, Stats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

final case class SketchDoc(doc_id: Long, source: String, text: String)

/** Streaming sketch profiler ([[SketchStream]]): the accumulated HLL
  * register and Count-Min counter state must equal the batch operators'
  * output over the same documents — under arbitrary batch splits,
  * duplicate deliveries, fresh-lineage redelivery, and compaction. */
class SketchStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docRows: Seq[SketchDoc] =
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => SketchDoc(r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  private def regsOf(df: DataFrame) = df.collect()
    .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
      r.getAs[Long]("rho")).toMap
  private def cmOf(df: DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("i"), r.getAs[Long]("bucket")) ->
      r.getAs[Long]("c")).toMap

  private def run(dir: java.nio.file.Path, ckpt: String,
      bs: Seq[Seq[SketchDoc]]): Seq[(Long, Long)] = {
    val stream = MemoryStream[SketchDoc](spark)
    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = SketchStream.start(stream.toDF(),
      dir.resolve("state").toString, dir.resolve(ckpt).toString) {
      (e, n) => reports += ((e, n))
    }
    try bs.foreach { b =>
      stream.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    reports.toSeq
  }

  private def batchState = {
    val docs = graft.Tables(spark, sfDir, "documents")
    (regsOf(Stats.hllRegistersOf(Stats.hllShingles(docs))),
      cmOf(Stats.cmsCounters(
        docs.select(explode(Mirror.shingleGen(col("text"))).as("sh")))))
  }

  test("streamed registers and counters equal the batch sketches over " +
    "the same corpus, under overlapping batch splits") {
    val dir = java.nio.file.Files.createTempDirectory("sketch")
    val rows = docRows
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    // batch 2 redelivers the tail of batch 1 — the id gate must absorb it
    run(dir, "ckpt", Seq(b1, b1.takeRight(20) ++ b2, b3))
    val (bRegs, bCm) = batchState
    assert(regsOf(SketchStream.registers(spark,
      dir.resolve("state").toString)) == bRegs,
      "streamed HLL registers != batch registers")
    assert(cmOf(SketchStream.counters(spark,
      dir.resolve("state").toString)) == bCm,
      "streamed CMS counters != batch counters")
  }

  test("fresh-lineage redelivery adds nothing (sum-merge stays exact), " +
    "compaction preserves both tables, and the stream then progresses") {
    val dir = java.nio.file.Files.createTempDirectory("sketch-replay")
    val rows = docRows
    val (b1, b2) = rows.splitAt(rows.length / 2)
    run(dir, "ckpt1", Seq(b1))
    val state = dir.resolve("state").toString
    val (r1, c1) = (regsOf(SketchStream.registers(spark, state)),
      cmOf(SketchStream.counters(spark, state)))
    // redeliver batch 1 under a NEW checkpoint: the id gate yields an
    // empty delta — without it, every counter would double
    val rep = run(dir, "ckpt2", Seq(b1))
    assert(rep.map(_._2) == Seq(0L), s"redelivery must gate to zero: $rep")
    assert(cmOf(SketchStream.counters(spark, state)) == c1)
    assert(regsOf(SketchStream.registers(spark, state)) == r1)
    SketchStream.compactState(spark, state)
    assert(cmOf(SketchStream.counters(spark, state)) == c1,
      "compaction changed the counters")
    assert(regsOf(SketchStream.registers(spark, state)) == r1)
    run(dir, "ckpt3", Seq(b2))
    val (bRegs, bCm) = batchState
    assert(regsOf(SketchStream.registers(spark, state)) == bRegs)
    assert(cmOf(SketchStream.counters(spark, state)) == bCm)
  }
}

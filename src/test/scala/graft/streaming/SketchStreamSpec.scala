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

  private def kmvOf(df: DataFrame) = df.collect()
    .map(r => (r.getAs[String]("source"), r.getAs[Long]("h"))).toSet

  private def batchState = {
    val docs = graft.Tables(spark, sfDir, "documents")
    (regsOf(Stats.hllRegistersOf(Stats.hllShingles(docs))),
      cmOf(Stats.cmsCounters(
        docs.select(explode(Mirror.shingleGen(col("text"))).as("sh")))),
      kmvOf(Stats.kmvSketchOf(Stats.kmvValues(docs))))
  }

  test("streamed registers and counters equal the batch sketches over " +
    "the same corpus, under overlapping batch splits") {
    val dir = java.nio.file.Files.createTempDirectory("sketch")
    val rows = docRows
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    // batch 2 redelivers the tail of batch 1 — the id gate must absorb it
    run(dir, "ckpt", Seq(b1, b1.takeRight(20) ++ b2, b3))
    val (bRegs, bCm, bKmv) = batchState
    assert(regsOf(SketchStream.registers(spark,
      dir.resolve("state").toString)) == bRegs,
      "streamed HLL registers != batch registers")
    assert(cmOf(SketchStream.counters(spark,
      dir.resolve("state").toString)) == bCm,
      "streamed CMS counters != batch counters")
    assert(kmvOf(SketchStream.kmv(spark,
      dir.resolve("state").toString)) == bKmv,
      "streamed KMV sketch != batch sketch")
  }

  test("fresh-lineage redelivery adds nothing (sum-merge stays exact), " +
    "compaction preserves both tables, and the stream then progresses") {
    val dir = java.nio.file.Files.createTempDirectory("sketch-replay")
    val rows = docRows
    val (b1, b2) = rows.splitAt(rows.length / 2)
    run(dir, "ckpt1", Seq(b1))
    val state = dir.resolve("state").toString
    val (r1, c1, k1) = (regsOf(SketchStream.registers(spark, state)),
      cmOf(SketchStream.counters(spark, state)),
      kmvOf(SketchStream.kmv(spark, state)))
    // redeliver batch 1 under a NEW checkpoint: the id gate yields an
    // empty delta — without it, every counter would double
    val rep = run(dir, "ckpt2", Seq(b1))
    assert(rep.map(_._2) == Seq(0L), s"redelivery must gate to zero: $rep")
    assert(cmOf(SketchStream.counters(spark, state)) == c1)
    assert(regsOf(SketchStream.registers(spark, state)) == r1)
    assert(kmvOf(SketchStream.kmv(spark, state)) == k1)
    SketchStream.compactState(spark, state)
    assert(cmOf(SketchStream.counters(spark, state)) == c1,
      "compaction changed the counters")
    assert(regsOf(SketchStream.registers(spark, state)) == r1)
    assert(kmvOf(SketchStream.kmv(spark, state)) == k1,
      "compaction changed the KMV sketch")
    run(dir, "ckpt3", Seq(b2))
    val (bRegs, bCm, bKmv) = batchState
    assert(regsOf(SketchStream.registers(spark, state)) == bRegs)
    assert(cmOf(SketchStream.counters(spark, state)) == bCm)
    assert(kmvOf(SketchStream.kmv(spark, state)) == bKmv)
  }

  test("a crashed compaction never double-counts the SUM-merged counters: " +
    "mid-fold crash leaves originals authoritative, fold-committed crash " +
    "leaves the folded generation authoritative, compactState repairs") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("sketch-crash")
    val rows = docRows
    val (b1, b2) = rows.splitAt(rows.length / 2)
    run(dir, "ckpt1", Seq(b1, b2)) // ≥ 2 epoch partitions per table
    val state = dir.resolve("state").toString
    val c0 = cmOf(SketchStream.counters(spark, state))
    val r0 = regsOf(SketchStream.registers(spark, state))
    val root = s"$state/counters"
    val fs = EpochState.fs(spark, root)
    val epochs = fs.listStatus(new Path(root)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong)
    assert(epochs.length >= 2, s"need multiple epochs, got $epochs")
    val next = epochs.min - 1

    // --- crash point 1: marker PUT, fold crashed mid-write (no _SUCCESS).
    // Readers must treat the partial folded dir as invisible.
    val out = fs.create(new Path(root, "_compacting"), true)
    try out.write(s"$next;${epochs.mkString(";")}".getBytes("UTF-8"))
    finally out.close()
    spark.read.parquet(root).filter(col("epoch") =!= lit(next))
      .drop("epoch").limit(5)
      .write.mode("overwrite").parquet(s"$root/epoch=$next")
    fs.delete(new Path(s"$root/epoch=$next/_SUCCESS"), false) // torn write
    assert(cmOf(SketchStream.counters(spark, state)) == c0,
      "mid-fold crash: originals must stay authoritative")

    // --- crash point 2: fold fully committed (its _SUCCESS on disk) but
    // the covered epoch dirs were NOT deleted — the double-count hazard
    // the round-12 advice flagged. Readers must count exactly once.
    spark.read.parquet(root).filter(col("epoch") =!= lit(next))
      .drop("epoch").groupBy(col("i"), col("bucket"))
      .agg(sum(col("c")).as("c"))
      .write.mode("overwrite").parquet(s"$root/epoch=$next")
    assert(fs.exists(new Path(s"$root/epoch=$next/_SUCCESS")))
    assert(cmOf(SketchStream.counters(spark, state)) == c0,
      "fold-committed crash: both generations on disk must read ONCE")

    // --- repair: compactState completes the interrupted compaction and
    // leaves one generation, no marker, identical state
    SketchStream.compactState(spark, state)
    assert(!fs.exists(new Path(root, "_compacting")),
      "repair must clear the marker")
    val after = fs.listStatus(new Path(root)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("epoch="))
    assert(after == Seq(s"epoch=$next"),
      s"repair must leave only the folded generation, got $after")
    assert(cmOf(SketchStream.counters(spark, state)) == c0)
    assert(regsOf(SketchStream.registers(spark, state)) == r0)
  }
}

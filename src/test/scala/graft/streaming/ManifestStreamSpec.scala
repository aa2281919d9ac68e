package graft.streaming

import graft.covid.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class MDoc(doc_id: Long, source: String, text: String,
    n_chars: Long)

/** Streaming corpus-build manifest ([[ManifestStream]]): the funnel over
  * the accumulated state must equal batch q161 row for row — under
  * overlapping batch splits, fresh-lineage redelivery, and compaction —
  * with the same telescoping invariant BuildManifestSpec pins, and text
  * must be read only at ingest (the read-time derivation scans no
  * documents.parquet). */
class ManifestStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docRows: Seq[MDoc] =
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => MDoc(r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  private def run(dir: java.nio.file.Path, ckpt: String,
      bs: Seq[Seq[MDoc]]): Seq[(Long, Long)] = {
    val stream = MemoryStream[MDoc](spark)
    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = ManifestStream.start(stream.toDF(),
      dir.resolve("state").toString, dir.resolve(ckpt).toString) {
      (e, n) => reports += ((e, n))
    }
    try bs.foreach { b =>
      stream.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    reports.toSeq
  }

  private def funnelRows(df: DataFrame): Seq[(Long, String, Long, Long,
      Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)

  test("stream funnel == batch q161 row for row under overlapping " +
    "splits and redelivery; telescopes; compaction preserves; " +
    "fresh-lineage redelivery gates to zero") {
    val dir = java.nio.file.Files.createTempDirectory("manifeststream")
    val state = dir.resolve("state").toString
    val rows = docRows
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    // deliver with an overlap (batch 2 redelivers a tail of batch 1)
    val r1 = run(dir, "ckpt1", Seq(b1))
    val r2 = run(dir, "ckpt2", Seq(b1.takeRight(20) ++ b2, b3))
    assert((r1 ++ r2).map(_._2).sum == rows.length,
      "every doc must land exactly once (gate absorbs the overlap)")

    // the batch reference: q161 computed INLINE on the same documents
    // (every artifact tier off, so nothing persisted leaks across tests)
    val got = funnelRows(ManifestStream.funnel(spark, state))
    val want = try {
      Seq("manifestcache", "cccache", "lmcache", "paircache")
        .foreach(c => spark.conf.set(s"spark.graft.$c", "false"))
      funnelRows(graft.operators.CorpusBuild.q161CorpusManifest
        .fn(spark, sfDir))
    } finally Seq("manifestcache", "cccache", "lmcache", "paircache")
      .foreach(c => spark.conf.unset(s"spark.graft.$c"))
    assert(got == want, s"stream funnel != batch q161:\n$got\nvs\n$want")

    // the BuildManifestSpec telescoping invariant holds on the stream side
    assert(got.map(_._1) == (0L to 8L))
    got.sliding(2).foreach { case Seq(prev, cur) =>
      assert(cur._3 <= prev._3 && cur._4 <= prev._4)
      assert(cur._5 == prev._3 - cur._3 && cur._6 == prev._4 - cur._4,
        s"stage ${cur._2} must telescope")
    }

    // text is read only at ingest: the read-time plan scans state
    // parquet, never documents.parquet
    val flagsDf = ManifestStream.flags(spark, state)
    flagsDf.collect()
    val scans = flagsDf.queryExecution.executedPlan.toString
    assert(!scans.contains("documents.parquet"),
      "read-time derivation must not rescan text")

    // compaction preserves the funnel exactly
    ManifestStream.compactState(spark, state)
    assert(funnelRows(ManifestStream.funnel(spark, state)) == want,
      "compaction changed the funnel")

    // fresh-lineage redelivery of an already-seen batch gates to zero
    val rep = run(dir, "ckpt3", Seq(b2))
    assert(rep.map(_._2).sum == 0, "fresh-lineage redelivery must gate")
    assert(funnelRows(ManifestStream.funnel(spark, state)) == want)

    // mid-epoch crash: state partitions land but the commit marker (the
    // LAST write of an epoch) does not. Simulate by cloning a committed
    // epoch's partitions under an unmarked epoch number — duplicate
    // token-level rows that an unbarriered reader would double-count.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val statePath = new org.apache.hadoop.fs.Path(state)
    val firstEpoch = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$state/docsig")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong).min
    Seq("docsig", "occ", "bg", "tok", "bands", "shingles").foreach { t =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$state/$t/epoch=$firstEpoch"),
        fs, new org.apache.hadoop.fs.Path(s"$state/$t/epoch=999999"),
        false, spark.sparkContext.hadoopConfiguration)
    }
    assert(funnelRows(ManifestStream.funnel(spark, state)) == want,
      "an uncommitted (partial) epoch must be invisible to readers")
    // compaction's repair pass deletes the orphan partitions outright
    ManifestStream.compactState(spark, state)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$state/occ/epoch=999999")), "compactState must sweep orphans")
    assert(funnelRows(ManifestStream.funnel(spark, state)) == want)
    assert(fs.exists(statePath))
  }

  test("crash between the seen-partition write and the commit marker, " +
    "then a fresh-lineage restart: the batch re-ingests whole and " +
    "nothing double-counts") {
    // The exact r15 crash window: `seen/epoch=N` landed (the LAST state
    // write before the marker) but `commits/epoch=N` did not. A reader
    // of the raw seen table would gate the redelivered batch to zero and
    // LOSE it (its state epochs are uncommitted = invisible); a reader
    // that ignores epochs would double-count. The barrier contract is:
    // the whole epoch is invisible — seen partition included — so a
    // fresh lineage re-ingests the batch whole, exactly once.
    val dir = java.nio.file.Files.createTempDirectory("manifestcrash")
    val state = dir.resolve("state").toString
    val rows = docRows.take(120)
    val (b1, b2) = rows.splitAt(60)
    run(dir, "ckptA", Seq(b1))
    run(dir, "ckptB", Seq(b2))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // simulate the crash ordering by deleting the LAST epoch's marker:
    // on disk this is indistinguishable from dying right before the PUT
    val lastEpoch = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$state/commits")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong).max
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$state/commits/epoch=$lastEpoch"), false))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$state/seen/epoch=$lastEpoch")),
      "precondition: the crashed epoch's seen partition must exist")
    // fresh lineage redelivers the same batch (new checkpoint = the
    // restart path where streaming offsets are gone)
    val rep = run(dir, "ckptC", Seq(b2))
    assert(rep.map(_._2).sum == b2.size,
      "the uncommitted seen partition must NOT gate the redelivery — " +
        "that would lose the batch")
    // reference: the same two batches through one clean lineage
    val dir2 = java.nio.file.Files.createTempDirectory("manifestclean")
    val state2 = dir2.resolve("state").toString
    run(dir2, "ckptR", Seq(b1, b2))
    val got = funnelRows(ManifestStream.funnel(spark, state))
    val want = funnelRows(ManifestStream.funnel(spark, state2))
    assert(got == want,
      s"crash-window restart must not change any funnel count " +
        s"(docs or tokens):\n$got\nvs\n$want")
  }
}

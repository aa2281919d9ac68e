package graft.streaming

import graft.covid.SparkTestSession
import graft.operators.{Lifecycle, Mirror}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** q133 is documented as "the batch twin of the RecrawlStream →
  * StreamingDedup ingest path" — this spec PROVES the twin-ship: the same
  * simulated recrawl delta, pushed through the two streaming operators as
  * micro-batches, reproduces q133's delta accounting and dedup-gate
  * columns exactly.
  *
  *  - delta accounting: RecrawlStream sees the OLD snapshot as epoch 0 and
  *    the NEW snapshot as epoch 1 (changed docs' text edited, so the
  *    fingerprint actually moves); its epoch-1 report must equal q133's
  *    n_added / n_changed per source.
  *  - dedup gate: StreamingDedup probes the added docs — split across TWO
  *    micro-batches to exercise batch independence — against the carried
  *    base; its matches must equal q133's n_dup per source.
  */
class IncrementalBuildSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** (doc_id, source, text, hid, hid2) rows of the shared simulation. */
  private def docs = graft.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("source"), col("text"),
      (Mirror.hash60(col("doc_id").cast("string")) % 10).as("hid"),
      (Mirror.hash60b(col("doc_id").cast("string")) % 4).as("hid2"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getLong(4)))

  private def q133BySource =
    Lifecycle.q133IncrementalBuild.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap

  test("RecrawlStream's epoch-1 report equals q133's delta accounting") {
    val dir = java.nio.file.Files.createTempDirectory("incr-recrawl")
    val all = docs
    val oldSnap = all.filter(_._4 < 8)
      .map(d => CrawlDoc(d._1, d._2, d._3))
    // the NEW snapshot: carried + added, with changed docs' content
    // actually edited so the md5 fingerprint moves like q126's simulation
    val newSnap = all.filter(_._4 >= 2).map { d =>
      val changed = d._4 <= 7 && d._5 == 0
      CrawlDoc(d._1, d._2, if (changed) d._3 + " :rev2" else d._3)
    }
    val stream = MemoryStream[CrawlDoc](spark)
    val reports = ArrayBuffer.empty[(Long, Map[String, (Long, Long, Long)])]
    val q = RecrawlStream.start(stream.toDF(),
      dir.resolve("index").toString, dir.resolve("ckpt").toString) {
      (report, epochId) =>
        reports += ((epochId, report.collect().map(r =>
          r.getAs[String]("source") -> ((r.getAs[Long]("n_added"),
            r.getAs[Long]("n_changed"), r.getAs[Long]("n_unchanged"))))
          .toMap))
    }
    try {
      stream.addData(oldSnap.toIndexedSeq: _*)
      q.processAllAvailable()
      stream.addData(newSnap.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val epoch1 = reports.find(_._1 == 1L).get._2
    val expect = q133BySource
    expect.foreach { case (src, r) =>
      val (a, c, _) = epoch1.getOrElse(src, (0L, 0L, 0L))
      assert(a == r.getAs[Long]("n_added"), s"$src n_added stream=$a")
      assert(c == r.getAs[Long]("n_changed"), s"$src n_changed stream=$c")
    }
    // and the stream saw real churn, or the equality is vacuous
    assert(epoch1.values.map(_._1).sum > 0)
    assert(epoch1.values.map(_._2).sum > 0)
  }

  test("StreamingDedup's matches over the added docs (two micro-batches) " +
    "equal q133's dedup gate") {
    val dir = java.nio.file.Files.createTempDirectory("incr-dedup")
    val all = docs
    val srcById = all.map(d => d._1 -> d._2).toMap
    val base = all.filter(d => d._4 >= 2 && d._4 <= 7)
      .map(d => Doc(d._1, d._3))
    val added = all.filter(_._4 >= 8).map(d => Doc(d._1, d._3))
    // two micro-batches: batch independence against the static base is
    // part of the claim (each added doc matches the BASE, so the split
    // cannot change the union of matches)
    val (b1, b2) = added.splitAt(added.length / 2)
    val baseDf = base.toSeq.toDF("doc_id", "text")
    val stream = MemoryStream[Doc](spark)
    val matched = ArrayBuffer.empty[Long]
    val q = StreamingDedup.start(stream.toDF(), baseDf,
      dir.resolve("ckpt").toString) { (matches, _) =>
      matched ++= matches.select(col("doc_id")).collect().map(_.getLong(0))
    }
    try {
      stream.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      stream.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamDupBySrc = matched.groupBy(srcById).map { case (s, xs) =>
      s -> xs.size.toLong }
    q133BySource.foreach { case (src, r) =>
      assert(streamDupBySrc.getOrElse(src, 0L) == r.getAs[Long]("n_dup"),
        s"$src n_dup stream=${streamDupBySrc.getOrElse(src, 0L)} " +
          s"batch=${r.getAs[Long]("n_dup")}")
    }
    assert(matched.nonEmpty, "fixture produced no dedup matches")
  }
}

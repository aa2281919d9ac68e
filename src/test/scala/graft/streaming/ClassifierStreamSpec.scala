package graft.streaming

import graft.covid.SparkTestSession
import graft.operators.Classify
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

final case class ClsDoc(doc_id: Long, text: String)

/** Streaming classifier scorer ([[ClassifierStream]]): with the model
  * trained once at start from the batch training slice, the accumulated
  * score table must be row-identical to the batch scorer over
  * everything ingested, and the read-time calibration/sweep must equal
  * the batch q157/q158 outputs over the same corpus — under overlapping
  * batch splits, fresh-lineage redelivery, and compaction. */
class ClassifierStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docRows: Seq[ClsDoc] =
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => ClsDoc(r.getLong(0), r.getString(1))).toSeq

  private def scoresOf(df: DataFrame) = df.collect()
    .map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("split"), r.getAs[Boolean]("label_good"),
        r.getAs[Long]("score_pt"))).toMap

  private def rowsOf(df: DataFrame) = df.collect().map(_.toString).toList

  private def run(dir: java.nio.file.Path, ckpt: String,
      bs: Seq[Seq[ClsDoc]]): Seq[(Long, Long)] = {
    val stream = MemoryStream[ClsDoc](spark)
    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = ClassifierStream.start(stream.toDF(),
      graft.Tables(spark, sfDir, "documents"),
      dir.resolve("state").toString, dir.resolve(ckpt).toString) {
      (e, n) => reports += ((e, n))
    }
    try bs.foreach { b =>
      stream.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    reports.toSeq
  }

  test("streamed calibration and sweep equal batch q157/q158 over the " +
    "same corpus, under overlapping batch splits; fresh-lineage " +
    "redelivery gates to zero and compaction changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("clsstream")
    val rows = docRows
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    // batch 2 redelivers the tail of batch 1 — the id gate must absorb it
    run(dir, "ckpt", Seq(b1, b1.takeRight(15) ++ b2, b3))
    val state = dir.resolve("state").toString

    val wantCal = rowsOf(Classify.q157ClassifierCalibration.fn(spark, sfDir))
    val wantSweep = rowsOf(Classify.q158ThresholdSweep.fn(spark, sfDir))
    val wantScores = {
      val docs = Classify.labeledDocs(
        graft.Tables(spark, sfDir, "documents"))
      scoresOf(Classify.scoredDocs(docs,
        Classify.trainModel(docs.filter(col("split") === "train"))))
    }
    assert(scoresOf(ClassifierStream.scores(spark, state)) == wantScores,
      "streamed score table != batch scorer")
    assert(rowsOf(ClassifierStream.calibration(spark, state)) == wantCal,
      "streamed calibration != batch q157")
    assert(rowsOf(ClassifierStream.sweep(spark, state)) == wantSweep,
      "streamed sweep != batch q158")

    // fresh-lineage redelivery of batch 1: the id gate yields an empty
    // delta under a NEW checkpoint; state is unchanged
    val rep = run(dir, "ckpt2", Seq(b1))
    assert(rep.map(_._2) == Seq(0L), s"redelivery must gate to zero: $rep")
    assert(scoresOf(ClassifierStream.scores(spark, state)) == wantScores)

    ClassifierStream.compactState(spark, state)
    assert(scoresOf(ClassifierStream.scores(spark, state)) == wantScores,
      "compaction changed the scores")
    assert(rowsOf(ClassifierStream.calibration(spark, state)) == wantCal,
      "compaction changed the calibration")
    assert(rowsOf(ClassifierStream.sweep(spark, state)) == wantSweep,
      "compaction changed the sweep")
  }

  test("frozen-model purity: an early epoch's partition holds exactly " +
    "its batch's docs, scored identically to the batch scorer despite " +
    "later corpus growth") {
    val dir = java.nio.file.Files.createTempDirectory("clsfrozen")
    val rows = docRows
    val (b1, b2) = rows.splitAt(20) // tiny first epoch
    run(dir, "ckpt", Seq(b1, b2))
    val state = dir.resolve("state").toString
    val e0 = spark.read.parquet(s"$state/scores/epoch=0")
    assert(e0.count() == b1.length.toLong)
    val docs = Classify.labeledDocs(graft.Tables(spark, sfDir, "documents"))
    val model = Classify.trainModel(docs.filter(col("split") === "train"))
    val want = scoresOf(Classify.scoredDocs(
      docs.filter(col("doc_id").isin(b1.map(_.doc_id): _*)), model))
    assert(scoresOf(e0.select(col("doc_id"), col("split"),
      col("label_good"), col("score_pt"))) == want)
  }
}

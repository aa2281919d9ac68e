package graft.streaming

import graft.covid.SparkTestSession
import graft.operators.Quality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

final case class PplDoc(doc_id: Long, source: String, text: String)

/** Streaming perplexity filter ([[PerplexityStream]]): with the
  * reference model frozen at start, the accumulated score table must be
  * row-identical to the batch scorer over everything ingested, and the
  * read-time buckets must equal the batch q153 output over the same
  * corpus — under overlapping batch splits, fresh-lineage redelivery,
  * and compaction. */
class PerplexityStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docRows: Seq[PplDoc] =
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => PplDoc(r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  private def refDocs: DataFrame = {
    val docs = graft.Tables(spark, sfDir, "documents")
    docs.join(Quality.funnelMetrics(docs).filter(Quality.keepAll)
      .select(col("doc_id")), "doc_id")
  }

  private def scoresOf(df: DataFrame) = df.collect()
    .map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("source"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("score_ppm"))).toMap

  private def bucketsOf(df: DataFrame) = df.collect()
    .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap

  private def run(dir: java.nio.file.Path, ckpt: String,
      bs: Seq[Seq[PplDoc]]): Seq[(Long, Long)] = {
    val stream = MemoryStream[PplDoc](spark)
    val reports = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = PerplexityStream.start(stream.toDF(), refDocs,
      dir.resolve("state").toString, dir.resolve(ckpt).toString) {
      (e, n) => reports += ((e, n))
    }
    try bs.foreach { b =>
      stream.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    reports.toSeq
  }

  test("streamed scores and buckets equal the batch q153 over the same " +
    "corpus, under overlapping batch splits; fresh-lineage redelivery " +
    "gates to zero and compaction changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("pplstream")
    val rows = docRows
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    // batch 2 redelivers the tail of batch 1 — the id gate must absorb it
    run(dir, "ckpt", Seq(b1, b1.takeRight(15) ++ b2, b3))
    val state = dir.resolve("state").toString

    val batchQ153 = Quality.q153PerplexityBuckets.fn(spark, sfDir)
    val wantScores = scoresOf(batchQ153)
    val wantBuckets = bucketsOf(batchQ153)
    assert(scoresOf(PerplexityStream.scores(spark, state)) == wantScores,
      "streamed scores != batch scores")
    assert(bucketsOf(PerplexityStream.buckets(spark, state)) == wantBuckets,
      "streamed buckets != batch buckets")

    // fresh-lineage redelivery of batch 1: the id gate yields an empty
    // delta under a NEW checkpoint; state is unchanged
    val rep = run(dir, "ckpt2", Seq(b1))
    assert(rep.map(_._2) == Seq(0L), s"redelivery must gate to zero: $rep")
    assert(scoresOf(PerplexityStream.scores(spark, state)) == wantScores)

    PerplexityStream.compactState(spark, state)
    assert(scoresOf(PerplexityStream.scores(spark, state)) == wantScores,
      "compaction changed the scores")
    assert(bucketsOf(PerplexityStream.buckets(spark, state)) == wantBuckets,
      "compaction changed the buckets")
  }

  test("the frozen reference model is what makes replay value-identical: " +
    "a doc scored in an early epoch scores the same as the batch scorer " +
    "even though later epochs grew the ingested corpus") {
    val dir = java.nio.file.Files.createTempDirectory("pplfrozen")
    val rows = docRows
    val (b1, b2) = rows.splitAt(20) // tiny first epoch
    run(dir, "ckpt", Seq(b1, b2))
    val state = dir.resolve("state").toString
    // per-epoch partitions: epoch 0 holds exactly b1's docs, scored
    // identically to the batch scorer (frozen counts — no drift as the
    // corpus grows)
    val e0 = spark.read.parquet(s"$state/scores/epoch=0")
    assert(e0.count() == b1.length.toLong)
    val (c2, c1, v) = Quality.lmCounts(refDocs)
    val want = scoresOf(Quality.lmScores(
      graft.Tables(spark, sfDir, "documents")
        .filter(col("doc_id").isin(b1.map(_.doc_id): _*)), c2, c1, v))
    assert(scoresOf(e0.select(col("doc_id"), col("source"),
      col("n_bigrams"), col("score_ppm"))) == want)
  }
}

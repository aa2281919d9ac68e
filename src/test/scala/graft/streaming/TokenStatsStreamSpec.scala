package graft.streaming

import graft.covid.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class TokenStatsStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def asMap(rows: Array[Row]): Map[(String, String), (Long, Long)] =
    rows.map { r =>
      (r.getAs[String]("source"), r.getAs[String]("word")) ->
        ((r.getAs[Long]("occurrences"), r.getAs[Long]("docs")))
    }.toMap

  test("cumulative streamed token stats equal the from-scratch batch " +
    "aggregation, and survive compaction") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text", "source").as[QDoc].collect().sortBy(_.doc_id)
    val batches = docs.grouped(math.max(1, docs.length / 3 + 1)).toSeq
    val stream = MemoryStream[QDoc](spark)
    val dir = java.nio.file.Files.createTempDirectory("token-stats")
    val indexDir = dir.resolve("index").toString
    val query = TokenStatsStream.start(stream.toDF(), indexDir,
      dir.resolve("ckpt").toString)
    try {
      batches.foreach { bt =>
        stream.addData(bt.toIndexedSeq: _*)
        query.processAllAvailable()
      }
    } finally query.stop()
    val perEpoch = spark.read.parquet(indexDir)
    assert(perEpoch.select("epoch").distinct().count() == batches.size)
    val expected = asMap(TokenStatsStream.batchStats(
      graft.Tables(spark, sfDir, "documents")).collect())
    val got = asMap(TokenStatsStream.totals(spark, indexDir).collect())
    assert(got == expected,
      "summed per-epoch stats must equal the batch aggregation")
    // vocab is a pure consumer of totals: spot-check determinism + order
    val v = TokenStatsStream.vocab(spark, indexDir, 5).collect()
    assert(v.length == 5)
    assert(v.map(_.getAs[Long]("occurrences")).toSeq
      .sliding(2).forall(p => p.head >= p.last), "vocab not count-desc")
    // compaction folds epochs without changing totals
    TokenStatsStream.compact(spark, indexDir)
    val folded = spark.read.parquet(indexDir)
    assert(folded.select("epoch").distinct().count() == 1)
    assert(asMap(TokenStatsStream.totals(spark, indexDir).collect())
      == expected, "compaction changed totals")
  }

  test("a replayed epoch overwrites its partition instead of " +
    "double-counting") {
    val docs = Seq(
      QDoc(1L, "alpha beta alpha", "s"),
      QDoc(2L, "beta gamma", "s"))
    val dir = java.nio.file.Files.createTempDirectory("token-replay")
    val indexDir = dir.resolve("index").toString
    def run(ckpt: String): Unit = {
      val stream = MemoryStream[QDoc](spark)
      val q = TokenStatsStream.start(stream.toDF(), indexDir,
        dir.resolve(ckpt).toString)
      stream.addData(docs: _*)
      try q.processAllAvailable() finally q.stop()
    }
    run("ckpt1")
    val first = asMap(TokenStatsStream.totals(spark, indexDir).collect())
    run("ckpt2") // fresh checkpoint replays the same data as epoch 0
    val second = asMap(TokenStatsStream.totals(spark, indexDir).collect())
    assert(first == second, "at-least-once replay must stay exactly-once")
    assert(first(("s", "alpha")) == ((2L, 1L)))
    assert(first(("s", "beta")) == ((2L, 2L)))
  }
}

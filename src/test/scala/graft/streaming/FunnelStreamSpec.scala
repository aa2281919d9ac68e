package graft.streaming

import java.sql.Timestamp
import graft.covid.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming funnel must converge to EXACTLY the batch q87 assignment
  * when batches arrive in event-time order — stream/batch parity on the
  * shared events fixture, the same proof pattern as StreamingDedupSpec. */
class FunnelStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("stream over ordered micro-batches equals the batch q87 funnel") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = graft.Tables(spark, sfDir, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .as[Click].collect().sortBy(_.ts.getTime)
      val input = MemoryStream[Click](spark)
      val query = FunnelStream.stages(input.toDS())
        .writeStream.format("memory").queryName("funnel")
        .outputMode("update").start()
      try {
        // three event-time-ordered micro-batches
        events.grouped((events.length + 2) / 3).foreach { batch =>
          input.addData(batch.toIndexedSeq: _*)
          query.processAllAvailable()
        }
        // final state per user = last emitted snapshot (highest stage wins:
        // state is monotone)
        val streamed = spark.sql(
          "SELECT user_id, max(stage) AS stage FROM funnel GROUP BY user_id")
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        // batch oracle: stage counts from q87
        val batchCounts = graft.operators.Stats.q87FunnelStages
          .fn(spark, sfDir)
          .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
        val streamCounts = (1 to 3).map { s =>
          s -> streamed.values.count(_ >= s).toLong
        }.toMap
        assert(streamCounts == batchCounts,
          s"stream $streamCounts vs batch $batchCounts")
      } finally query.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("out-of-order within a batch is repaired; across batches is monotone") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      val input = MemoryStream[Click](spark)
      val query = FunnelStream.stages(input.toDS())
        .writeStream.format("memory").queryName("funnel2")
        .outputMode("update").start()
      try {
        // batch 1 arrives out of order: click BEFORE view in arrival order,
        // but event time has view first — the in-batch sort must still
        // produce stage 2
        input.addData(
          Click(1L, ts("2024-01-01 10:30:00"), "click", 0.0),
          Click(1L, ts("2024-01-01 10:00:00"), "view", 0.0))
        query.processAllAvailable()
        // batch 2: a LATE earlier view (09:00) arrives after stage 1 locked
        // at 10:00 — monotone state must ignore it, and a purchase within
        // the window after the locked click still advances to stage 3
        input.addData(
          Click(1L, ts("2024-01-01 09:00:00"), "view", 0.0),
          Click(1L, ts("2024-01-01 11:00:00"), "purchase", 0.0))
        query.processAllAvailable()
        val last = spark.sql(
          "SELECT stage, t1_us FROM funnel2 ORDER BY stage DESC LIMIT 1")
          .collect().head
        assert(last.getInt(0) == 3)
        // t1 stayed at the first-processed view, not the late 09:00 one
        val t1Expected = ts("2024-01-01 10:00:00").getTime * 1000L
        assert(last.getLong(1) == t1Expected)
      } finally query.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}

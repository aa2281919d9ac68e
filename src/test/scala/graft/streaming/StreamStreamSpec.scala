package graft.streaming

import java.sql.Timestamp
import graft.covid.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream attribution join across batches with late data") {
    val imps = MemoryStream[Impression](spark)
    val clicks = MemoryStream[Click](spark)
    val out = StreamStream.attribute(imps.toDS(), clicks.toDS())
    val query = out.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      // batch 1: impression for u1; click 10 min later arrives in-batch
      imps.addData(Impression(100L, 1L, ts("2024-01-01 12:00:00")))
      clicks.addData(Click(1L, ts("2024-01-01 12:10:00"), "click", 1.0))
      query.processAllAvailable()
      // batch 2: LATE click (12:05, watermark is 12:00) — still admissible,
      // must join the buffered impression from batch 1
      clicks.addData(Click(1L, ts("2024-01-01 12:05:00"), "click", 2.0))
      query.processAllAvailable()
      // batch 3: click outside the 30-min attribution window → no join;
      // also advances both watermarks far ahead
      clicks.addData(Click(1L, ts("2024-01-01 14:00:00"), "click", 3.0))
      imps.addData(Impression(101L, 2L, ts("2024-01-01 14:00:00")))
      query.processAllAvailable()
      val rows = spark.table("attr").collect()
        .map(r => (r.getLong(0), r.getTimestamp(3), r.getDouble(5)))
        .sortBy(_._2.getTime)
      assert(rows.length == 2, s"got ${rows.toSeq}")
      assert(rows(0) == ((100L, ts("2024-01-01 12:05:00"), 2.0)))
      assert(rows(1) == ((100L, ts("2024-01-01 12:10:00"), 1.0)))
    } finally query.stop()
  }

  test("left-outer attribution emits unmatched impressions after the watermark") {
    val imps = MemoryStream[Impression](spark)
    val clicks = MemoryStream[Click](spark)
    val out = StreamStream.attribute(imps.toDS(), clicks.toDS(),
      joinType = "left_outer")
    val query = out.writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").start()
    try {
      // u1's impression gets a click; u3's never does
      imps.addData(
        Impression(200L, 1L, ts("2024-01-01 12:00:00")),
        Impression(201L, 3L, ts("2024-01-01 12:00:00")))
      clicks.addData(Click(1L, ts("2024-01-01 12:10:00"), "click", 1.0))
      query.processAllAvailable()
      // push both watermarks far past imp_ts + window + lateness so the
      // unmatched impression's null row can be finalized
      imps.addData(Impression(999L, 9L, ts("2024-01-01 20:00:00")))
      clicks.addData(Click(9L, ts("2024-01-01 20:00:01"), "click", 0.0))
      query.processAllAvailable()
      imps.addData(Impression(998L, 9L, ts("2024-01-01 23:00:00")))
      clicks.addData(Click(9L, ts("2024-01-01 23:00:01"), "click", 0.0))
      query.processAllAvailable()
      val rows = spark.table("attr_outer").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(3))))
      assert(rows.contains((200L, Some(ts("2024-01-01 12:10:00")))))
      // the unmatched impression surfaced exactly once, with a null click
      assert(rows.count(r => r._1 == 201L) == 1)
      assert(rows.find(_._1 == 201L).get._2.isEmpty)
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses re-delivery across batches") {
    val input = MemoryStream[Click](spark)
    val query = StreamStream.dedupWithinWatermark(input.toDS())
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      // batch 1: a row delivered twice (at-least-once source retry)
      input.addData(
        Click(1L, ts("2024-01-01 12:00:00"), "view", 1.0),
        Click(1L, ts("2024-01-01 12:00:00"), "view", 1.0),
        Click(2L, ts("2024-01-01 12:01:00"), "view", 5.0))
      query.processAllAvailable()
      // batch 2: same key re-delivered within the watermark horizon
      input.addData(Click(1L, ts("2024-01-01 12:02:00"), "view", 9.0))
      query.processAllAvailable()
      // batch 3: different event_type is a different key → passes
      input.addData(Click(1L, ts("2024-01-01 12:03:00"), "buy", 7.0))
      query.processAllAvailable()
      val rows = spark.table("dedup_wm").as[Click].collect()
      assert(rows.count(c => c.user_id == 1L && c.event_type == "view") == 1)
      assert(rows.count(c => c.user_id == 2L) == 1)
      assert(rows.count(c => c.event_type == "buy") == 1)
      // first arrival won: the suppressed 12:02 re-delivery (value 9) is absent
      assert(!rows.exists(_.value == 9.0))
    } finally query.stop()
  }
}

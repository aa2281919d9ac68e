package graft.streaming

import java.sql.Timestamp
import graft.covid.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap sessionization closes sessions in-batch and on timeout") {
    val input = MemoryStream[Click](spark)
    val out = Sessions.sessionize(input.toDS(), gapMs = 30 * 60 * 1000)
    val query = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // one user: two events 5 min apart (one session), then an in-batch gap
      // of 90 min (splits immediately)
      input.addData(
        Click(1L, ts("2024-01-01 12:00:00"), "view", 1.0),
        Click(1L, ts("2024-01-01 12:05:00"), "view", 2.0),
        Click(1L, ts("2024-01-01 13:35:00"), "buy", 5.0))
      query.processAllAvailable()
      val afterBatch1 = spark.table("sessions").as[Session].collect()
      assert(afterBatch1.length == 1) // the 12:00-12:05 session closed in-batch
      assert(afterBatch1.head.n_events == 2L)
      assert(afterBatch1.head.sum_value == 3.0)
      assert(afterBatch1.head.session_end == ts("2024-01-01 12:05:00"))

      // advance the watermark far past 13:35 + gap: timeout closes the
      // open session
      input.addData(Click(2L, ts("2024-01-01 18:00:00"), "view", 1.0))
      query.processAllAvailable()
      input.addData(Click(2L, ts("2024-01-01 23:00:00"), "view", 1.0))
      query.processAllAvailable()
      val all = spark.table("sessions").as[Session].collect()
      val u1 = all.filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(u1.length == 2)
      assert(u1(1).session_start == ts("2024-01-01 13:35:00"))
      assert(u1(1).n_events == 1L)
    } finally query.stop()
  }

  test("late-but-accepted event merges an interval a naive close would have emitted") {
    // gap 30 min, watermark delay 10 min. Batch 1: events at 12:00 and
    // 12:31 — an in-batch gap of 31 min. An eager close would emit
    // [12:00,12:00] now; but a 12:25 event is still admissible (watermark
    // after batch 1 is 12:21) and by gap semantics all three events are ONE
    // session. The watermark-guarded close must hold the interval open.
    val input = MemoryStream[Click](spark)
    val query = Sessions.sessionize(input.toDS(), gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      input.addData(
        Click(1L, ts("2024-01-01 12:00:00"), "view", 1.0),
        Click(1L, ts("2024-01-01 12:31:00"), "view", 2.0))
      query.processAllAvailable()
      // nothing is sealable yet: 12:00+30m = 12:30 > watermark 12:21
      assert(spark.table("sessions_late").isEmpty)
      // late event inside the would-be-closed interval's gap window
      input.addData(Click(1L, ts("2024-01-01 12:25:00"), "view", 4.0))
      query.processAllAvailable()
      // advance watermark far past 12:31 + gap
      input.addData(Click(2L, ts("2024-01-01 20:00:00"), "view", 0.0))
      query.processAllAvailable()
      input.addData(Click(2L, ts("2024-01-01 23:00:00"), "view", 0.0))
      query.processAllAvailable()
      val u1 = spark.table("sessions_late").as[Session].collect()
        .filter(_.user_id == 1L)
      assert(u1.length == 1, s"expected one merged session, got ${u1.toSeq}")
      assert(u1.head.session_start == ts("2024-01-01 12:00:00"))
      assert(u1.head.session_end == ts("2024-01-01 12:31:00"))
      assert(u1.head.n_events == 3L)
      assert(u1.head.sum_value == 7.0)
    } finally query.stop()
  }

  test("sessions are independent per user") {
    val input = MemoryStream[Click](spark)
    val query = Sessions.sessionize(input.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    try {
      input.addData(
        Click(1L, ts("2024-01-01 10:00:00"), "a", 1.0),
        Click(2L, ts("2024-01-01 10:01:00"), "a", 1.0),
        Click(1L, ts("2024-01-01 10:30:00"), "a", 1.0)) // in-batch gap u1
      query.processAllAvailable()
      // u1's first session closes on the in-batch gap; u2's closes by
      // timeout (the 10:30 event advances the watermark to 10:20, past
      // u2's 10:01+gap=10:11) — states never mix across users
      val s = spark.table("sessions2").as[Session].collect()
        .sortBy(_.user_id)
      assert(s.length == 2)
      assert(s(0).user_id == 1L &&
        s(0).session_start == ts("2024-01-01 10:00:00") &&
        s(0).session_end == ts("2024-01-01 10:00:00"))
      assert(s(1).user_id == 2L && s(1).n_events == 1L)
    } finally query.stop()
  }
}

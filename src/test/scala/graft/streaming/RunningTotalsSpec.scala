package graft.streaming

import java.sql.Timestamp
import graft.covid.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class RunningTotalsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("state accumulates across micro-batches per user") {
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Click](spark)
      val query = RunningTotals.totals(input.toDS())
        .writeStream.format("memory").queryName("totals")
        .outputMode("update").start()
      try {
        input.addData(
          Click(1L, ts("2024-01-01 10:00:00"), "a", 10.0),
          Click(1L, ts("2024-01-01 10:01:00"), "a", 5.0),
          Click(2L, ts("2024-01-01 10:02:00"), "b", 7.0))
        query.processAllAvailable()
        input.addData(Click(1L, ts("2024-01-01 11:00:00"), "a", 1.0))
        query.processAllAvailable()
        val rows = spark.sql(
          "SELECT * FROM totals ORDER BY user_id, n_events")
          .as[UserTotals].collect()
        // user 1: snapshot after batch 1 (2 events) and batch 2 (3 events)
        val u1 = rows.filter(_.user_id == 1L)
        assert(u1.map(_.n_events).toSeq == Seq(2L, 3L))
        assert(u1.last.sum_value == 16.0)
        assert(u1.last.last_ts == ts("2024-01-01 11:00:00"))
        val u2 = rows.filter(_.user_id == 2L)
        assert(u2.map(_.n_events).toSeq == Seq(1L))
      } finally query.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}

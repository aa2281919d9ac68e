package graft.streaming

import java.sql.Timestamp
import graft.covid.SparkTestSession
import graft.operators.{Exact, Relational}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q92's scaladoc claims the hopping-window aggregation is the SAME
  * expression on a watermarked stream (SURVEY §2.9 T4) — prove it: the
  * streamed closed windows over the shared events fixture must equal the
  * batch q92 result row for row. */
class HoppingWindowSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("watermarked streaming hopping windows equal the batch q92 rows") {
    val sfDir = "/root/testdata/sf0.001"
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Click].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[Click](spark)
    // the q92 expression, unchanged, on an unbounded stream
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val query = agg.writeStream.format("memory").queryName("hopping")
      .outputMode("append").start()
    try {
      input.addData(events.toIndexedSeq: _*)
      query.processAllAvailable()
      // a sentinel far past the watermark horizon closes every fixture
      // window; its own two windows stay open and are never emitted
      val sentinel = Click(0L,
        new Timestamp(events.last.ts.getTime + 24L * 3600 * 1000),
        "view", 0.0)
      input.addData(sentinel)
      query.processAllAvailable()
      val streamed = spark.sql(
        "SELECT w_start, event_type, n_events, sum_value FROM hopping")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val batch = Relational.q92HoppingWindow.fn(spark, sfDir)
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(streamed == batch,
        s"streamed ${streamed.size} rows vs batch ${batch.size}")
    } finally query.stop()
  }

  test("a row older than the watermark is provably DROPPED: the closed " +
    "window's emitted rows don't change and the state operator counts it") {
    val sfDir = "/root/testdata/sf0.001"
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Click].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[Click](spark)
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Exact.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val query = agg.writeStream.format("memory").queryName("hopping_late")
      .outputMode("append").start()
    try {
      input.addData(events.toIndexedSeq: _*)
      query.processAllAvailable()
      val sentinel = Click(0L,
        new Timestamp(events.last.ts.getTime + 24L * 3600 * 1000),
        "view", 0.0)
      input.addData(sentinel) // watermark now 24h - 10min past the fixture
      query.processAllAvailable()
      val snapshot = spark.sql(
        "SELECT w_start, event_type, n_events, sum_value FROM hopping_late")
        .collect().map(_.toSeq).toSet
      assert(snapshot.nonEmpty)
      // a poison row aimed at an already-closed window: if it were NOT
      // dropped it would re-open state and eventually emit a duplicate
      // window row with this unmistakable value
      input.addData(Click(999L, events.head.ts, "view", 1.0e9))
      query.processAllAvailable()
      val after = spark.sql(
        "SELECT w_start, event_type, n_events, sum_value FROM hopping_late")
        .collect().map(_.toSeq).toSet
      assert(after == snapshot,
        "late row past the watermark changed the emitted output")
      // and the drop is observable, not inferred: the watermark operator
      // reports exactly this row as dropped
      val dropped = query.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L,
        s"expected numRowsDroppedByWatermark >= 1, got $dropped")
    } finally query.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user running totals snapshot (emitted every micro-batch the user
  * appears in). */
final case class UserTotals(
    user_id: Long,
    n_events: Long,
    sum_value: Double,
    last_ts: java.sql.Timestamp)

/** Spark 4's `transformWithState` arbitrary-state API (the successor to
  * flatMapGroupsWithState used in [[Sessions]]): typed ValueState in the
  * RocksDB state store, explicit TTL support, timer registration.
  *
  * The processor keeps one running aggregate per user and emits the
  * updated snapshot for each key touched by a batch — the shape of a
  * continuously-maintained feature store. State size is O(users); the
  * RocksDB provider (required by this API) spills it off-heap.
  */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, Click, UserTotals] {

  @transient private var totals: ValueState[UserTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserTotals]("totals",
      Encoders.product[UserTotals], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Click],
      timerValues: TimerValues): Iterator[UserTotals] = {
    val prev =
      if (totals.exists()) totals.get()
      else UserTotals(key, 0L, 0.0, new java.sql.Timestamp(0L))
    val updated = rows.foldLeft(prev) { (acc, c) =>
      // a malformed record with a null timestamp must not kill the query
      val newer = c.ts != null && c.ts.after(acc.last_ts)
      UserTotals(key, acc.n_events + 1, acc.sum_value + c.value,
        if (newer) c.ts else acc.last_ts)
    }
    totals.update(updated)
    Iterator.single(updated)
  }
}

object RunningTotals {

  /** Continuously-maintained per-user totals over a click stream. The
    * session must run the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), which
    * transformWithState requires. */
  def totals(events: Dataset[Click]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user funnel progress (epoch-micros; -1 = stage not reached). Emitted
  * only on change, so the downstream sink sees one row per advancement. */
final case class FunnelProgress(
    user_id: Long,
    stage: Int,
    t1_us: Long,
    t2_us: Long,
    t3_us: Long)

/** The continuously-maintained version of the q87 batch funnel
  * ([[graft.operators.Stats.q87FunnelStages]]): per user, the first 'view',
  * the first 'click' within the conversion window after it, and the first
  * 'purchase' within the window after that — kept as O(1) state per user in
  * the RocksDB store via Spark 4's `transformWithState`, advancing as
  * micro-batches arrive instead of re-scanning history.
  *
  * Ordering contract: stage decisions are first-touch in EVENT TIME, so the
  * processor sorts within each batch and assumes cross-batch event-time
  * order per user (the producer/watermark contract; the spec drives batches
  * in order). An event arriving out of order ACROSS batches — after a later
  * event already locked a stage — cannot retroactively rewrite that stage:
  * state is monotone, matching the at-least-once posture the reference
  * takes for late data (SURVEY §2.9 T4/T5). Under in-order delivery the
  * final states are EXACTLY the batch q87 assignment, which
  * FunnelStreamSpec proves on the shared events fixture.
  *
  * Scale story: state is three longs per user (bounded by |users|, not
  * events), each batch touches only its own keys, and the shuffle is one
  * hash exchange on user_id per micro-batch — the same key the batch
  * funnel's three join passes use, but amortized incrementally.
  */
class FunnelProcessor(windowUs: Long)
    extends StatefulProcessor[Long, Click, FunnelProgress] {

  @transient private var st: ValueState[FunnelProgress] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[FunnelProgress]("funnel",
      Encoders.product[FunnelProgress], TTLConfig.NONE)

  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  override def handleInputRows(key: Long, rows: Iterator[Click],
      timerValues: TimerValues): Iterator[FunnelProgress] = {
    val prev =
      if (st.exists()) st.get() else FunnelProgress(key, 0, -1L, -1L, -1L)
    // in-batch arrival order is not event-time order; stage decisions are
    // first-touch in event time, so order the batch before folding
    val ordered = rows.filter(_.ts != null).toArray.sortBy(c => us(c.ts))
    val next = ordered.foldLeft(prev) { (s, c) =>
      val t = us(c.ts)
      if (s.t1_us < 0 && c.event_type == "view")
        s.copy(stage = 1, t1_us = t)
      else if (s.t1_us >= 0 && s.t2_us < 0 && c.event_type == "click" &&
        t > s.t1_us && t <= s.t1_us + windowUs)
        s.copy(stage = 2, t2_us = t)
      else if (s.t2_us >= 0 && s.t3_us < 0 && c.event_type == "purchase" &&
        t > s.t2_us && t <= s.t2_us + windowUs)
        s.copy(stage = 3, t3_us = t)
      else s
    }
    if (next == prev) Iterator.empty
    else { st.update(next); Iterator.single(next) }
  }
}

object FunnelStream {

  /** q87's 2-hour conversion window in micros. */
  val DefaultWindowUs: Long = 2L * 3600 * 1000 * 1000

  /** Continuously-maintained per-user funnel stages over a click stream.
    * Requires the RocksDB state store provider (the transformWithState
    * contract). */
  def stages(events: Dataset[Click],
      windowUs: Long = DefaultWindowUs): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(windowUs),
        TimeMode.None(), OutputMode.Update())
  }
}

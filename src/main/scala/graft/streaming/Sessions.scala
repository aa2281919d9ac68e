package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An input click/event (the `events` table shape, typed). */
final case class Click(
    user_id: Long,
    ts: Timestamp,
    event_type: String,
    value: Double)

/** One open-session interval kept in the state store. */
final case class SessionState(
    startMs: Long,
    lastMs: Long,
    nEvents: Long,
    sumValue: Double)

/** The per-user state: every interval the watermark has not yet sealed.
  * A list, not a single session: an earlier interval must stay amendable
  * until `lastMs + gap` falls behind the watermark, because a
  * late-but-accepted event (late ≤ watermark delay < gap) arriving in a
  * later batch can still land in its gap window and merge it. */
final case class SessionBuf(sessions: List[SessionState])

/** A closed session. */
final case class Session(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    sum_value: Double)

/** Custom cross-batch state (SURVEY §2.9-T6, absent in the reference):
  * gap-based sessionization with `flatMapGroupsWithState` — the Structured
  * Streaming primitive for state the built-in windows can't express.
  *
  * State lives in the state store keyed by user: the list of open
  * intervals. An interval is emitted closed ONLY once
  * `lastMs + gap <= watermark` — the point after which any event that could
  * still merge with it would be older than the watermark and hence dropped
  * by the late filter. Closing earlier (as a naive in-batch gap split does)
  * double-counts sessions when a late-but-accepted event bridges the gap in
  * a later batch. At scale this is one hash exchange on user_id per
  * micro-batch and O(open intervals) store entries — intervals per user are
  * bounded by (watermark delay / gap) + 2, and the RocksDB state-store
  * backend handles spill.
  */
object Sessions {

  val DefaultGapMs: Long = 30L * 60 * 1000

  def sessionize(events: Dataset[Click],
      gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Click], state: GroupState[SessionBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val carried = state.getOption.map(_.sessions).getOrElse(Nil)
          // Interval merge: carried-over intervals and incoming events,
          // sorted by start, merging neighbors within the gap — correct for
          // any interleaving of late and in-order events within the
          // watermark bound.
          val items = (carried ++
            it.map(c => SessionState(c.ts.getTime, c.ts.getTime, 1L,
              c.value)))
            .sortBy(_.startMs)
          val merged = items.foldLeft(List.empty[SessionState]) {
            case (h :: tl, s) if s.startMs - h.lastMs <= gapMs =>
              SessionState(h.startMs, math.max(h.lastMs, s.lastMs),
                h.nEvents + s.nEvents, h.sumValue + s.sumValue) :: tl
            case (acc, s) => s :: acc
          }.reverse
          // Watermark-guarded close: seal exactly the intervals no
          // still-acceptable event can reach. Handles the timeout call the
          // same way (it arrives with an empty iterator).
          val (sealed_, live) = merged.partition(_.lastMs + gapMs <= wm)
          if (live.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessionBuf(live))
            // Fire when the earliest live interval becomes sealable. The
            // eviction watermark may already sit past that point when a
            // late-but-accepted event arrives (the late filter uses the
            // PREVIOUS batch's watermark) — an unclamped timestamp would
            // throw and kill the query; the clamped timer fires on the next
            // watermark advance, closing the interval as intended.
            state.setTimeoutTimestamp(
              math.max(live.map(_.lastMs).min + gapMs, wm + 1))
          }
          sealed_.map(close(user, _)).iterator
      }
  }

  private def close(user: Long, s: SessionState): Session =
    Session(user, new Timestamp(s.startMs), new Timestamp(s.lastMs),
      s.nEvents, s.sumValue)
}

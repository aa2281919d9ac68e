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

/** Open-session accumulator kept in the state store. */
final case class SessionState(
    startMs: Long,
    lastMs: Long,
    nEvents: Long,
    sumValue: Double)

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
  * State lives in the state store keyed by user: one `SessionState` per open
  * session, closed either by an in-batch gap or an event-time timeout once
  * the watermark passes last-event + gap. At scale this is one hash
  * exchange on user_id per micro-batch and O(open sessions) store entries —
  * the RocksDB state-store backend handles spill.
  */
object Sessions {

  val DefaultGapMs: Long = 30L * 60 * 1000

  def sessionize(events: Dataset[Click],
      gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Click], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: close the open session
            val s = state.get
            state.remove()
            Iterator(close(user, s))
          } else {
            // Interval merge: treat the carried-over open session and every
            // incoming event as intervals sorted by start, merging neighbors
            // within the gap — correct for any interleaving of late and
            // in-order events. The last merged interval stays open; earlier
            // ones can never grow again (anything nearer than a gap would
            // have merged) and are emitted closed.
            val items = (state.getOption.toSeq ++
              it.map(c => SessionState(c.ts.getTime, c.ts.getTime, 1L,
                c.value)))
              .sortBy(_.startMs)
            val merged = items.foldLeft(List.empty[SessionState]) {
              case (h :: tl, s) if s.startMs - h.lastMs <= gapMs =>
                SessionState(h.startMs, math.max(h.lastMs, s.lastMs),
                  h.nEvents + s.nEvents, h.sumValue + s.sumValue) :: tl
              case (acc, s) => s :: acc
            }.reverse
            val open = merged.last
            state.update(open)
            // The eviction watermark may already sit past lastMs + gap when
            // a late-but-accepted event arrives (the late filter uses the
            // PREVIOUS batch's watermark) — an unclamped timestamp would
            // throw and kill the query; the clamped timer fires on the next
            // watermark advance, closing the session as intended.
            state.setTimeoutTimestamp(
              math.max(open.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
            merged.init.map(close(user, _)).iterator
          }
      }
  }

  private def close(user: Long, s: SessionState): Session =
    Session(user, new Timestamp(s.startMs), new Timestamp(s.lastMs),
      s.nEvents, s.sumValue)
}

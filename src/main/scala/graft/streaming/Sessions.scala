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
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { c =>
              val t = c.ts.getTime
              open match {
                case Some(s) if t - s.lastMs > gapMs =>
                  // gap after the open session: close it, start fresh
                  closed += close(user, s)
                  open = Some(SessionState(t, t, 1L, c.value))
                case Some(s) if s.startMs - t > gapMs =>
                  // late event more than a gap BEFORE the open session: it
                  // can only belong to an earlier, already-gapped session —
                  // emit it as its own closed session, keep the open one
                  closed += Session(user, new Timestamp(t), new Timestamp(t),
                    1L, c.value)
                case Some(s) =>
                  // within a gap of the session (possibly before its start:
                  // extend both edges)
                  open = Some(SessionState(math.min(s.startMs, t),
                    math.max(s.lastMs, t), s.nEvents + 1, s.sumValue + c.value))
                case None =>
                  open = Some(SessionState(t, t, 1L, c.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  private def close(user: Long, s: SessionState): Session =
    Session(user, new Timestamp(s.startMs), new Timestamp(s.lastMs),
      s.nEvents, s.sumValue)
}

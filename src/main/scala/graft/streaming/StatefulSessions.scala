package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful processing via flatMapGroupsWithState — the
  * "stateful processing" capability the reference README claims
  * (reference ReadMe.md:119-121) with no implementation behind it
  * (SURVEY.md §2.5). Typed Dataset API with case-class encoders.
  *
  * Emits one record per CLOSED session (30-minute inactivity gap,
  * enforced by event-time timeout against the watermark) — state per
  * in-flight session is O(1): (start, last, count), not the event list.
  * At scale state is hash-partitioned by user across executors and
  * checkpointed incrementally (RocksDB state store in production
  * configs).
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, count: Long)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, event_count: Long)

  val GapMs: Long = 30 * 60 * 1000L

  def updateSessions(userId: Long, events: Iterator[Event],
                     state: GroupState[SessionState]): Iterator[ClosedSession] = {
    def close(s: SessionState): ClosedSession =
      ClosedSession(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.last), s.count)

    if (state.hasTimedOut) {
      val closed = state.getOption.map(close).toIterator
      state.remove()
      closed
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[ClosedSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          // within the gap of the session's SPAN (both directions):
          // a late-but-within-watermark event may precede the current
          // start — the span extends backwards (start = min)
          case Some(s) if t >= s.start - GapMs && t <= s.last + GapMs =>
            cur = Some(SessionState(math.min(s.start, t),
              math.max(s.last, t), s.count + 1))
          case Some(s) if t > s.last + GapMs =>
            closed ::= close(s)
            cur = Some(SessionState(t, t, 1))
          case Some(_) =>
            // older than start - gap: belongs to an already-gone prior
            // session; emit it as its own closed singleton (its
            // neighbors, if any, were in earlier watermark horizons)
            closed ::= ClosedSession(userId, new java.sql.Timestamp(t),
              new java.sql.Timestamp(t), 1)
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // time out (close) the session once the watermark passes last+gap
        state.setTimeoutTimestamp(s.last + GapMs)
      }
      closed.reverseIterator
    }
  }

  /** Wire over an event stream; the watermark bounds state and drives
    * the event-time timeouts that close idle sessions. (In batch
    * execution timeouts never fire — open sessions are not emitted —
    * so this op is for streams; the batch twin is
    * graft.queries.Events.q17UserSessions.) */
  def sessionize(events: Dataset[Event],
                 watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    implicit val se = Encoders.product[SessionState]
    implicit val ce = Encoders.product[ClosedSession]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateSessions)
  }
}

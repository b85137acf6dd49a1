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
  /** Control-aware event for the RTBF eviction path (q223): `erase`
    * rows are erasure requests riding the SAME keyed stream as data —
    * they clear the key's state instead of folding into it. */
  case class CEvent(user_id: Long, ts: java.sql.Timestamp, erase: Boolean)
  /** start/last are epoch MICROseconds: the gap comparison must run at
    * the event-time column's native precision — 999/1000 driver
    * testdata events carry sub-ms micros, and an ms-truncated diff can
    * merge a pair whose true gap exceeds 30min by <1ms, silently
    * drifting from the batch sessionization (q17, micro-exact). */
  case class SessionState(start: Long, last: Long, count: Long)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, event_count: Long)

  val GapMs: Long = 30 * 60 * 1000L
  val GapUs: Long = GapMs * 1000L

  /** Timestamp → epoch micros without ms truncation (getTime is ms;
    * getNanos carries the full sub-second fraction). */
  def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** The pure per-batch merge both stateful APIs share: fold a
    * batch's event times (any order) into the open session, emitting
    * every session the batch closes, oldest first. */
  def mergeBatch(cur0: Option[SessionState],
                 times: Seq[Long]): (List[SessionState], Option[SessionState]) = {
    var closed = List.empty[SessionState]
    var cur = cur0
    times.sorted.foreach { t =>
      cur match {
        // within the gap of the session's SPAN (both directions):
        // a late-but-within-watermark event may precede the current
        // start — the span extends backwards (start = min)
        case Some(s) if t >= s.start - GapUs && t <= s.last + GapUs =>
          cur = Some(SessionState(math.min(s.start, t),
            math.max(s.last, t), s.count + 1))
        case Some(s) if t > s.last + GapUs =>
          closed ::= s
          cur = Some(SessionState(t, t, 1))
        case Some(_) =>
          // older than start - gap: belongs to an already-gone prior
          // session; emit it as its own closed singleton (its
          // neighbors, if any, were in earlier watermark horizons)
          closed ::= SessionState(t, t, 1)
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    (closed.reverse, cur)
  }

  def asClosed(userId: Long, s: SessionState): ClosedSession = {
    def ts(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    ClosedSession(userId, ts(s.start), ts(s.last), s.count)
  }

  /** Timer timestamp (ms) for a micro-state session: ceil to the next
    * ms so the timer can never fire before the watermark truly passes
    * last+gap. */
  private def timeoutMs(s: SessionState): Long =
    math.floorDiv(s.last + GapUs + 999L, 1000L)

  def updateSessions(userId: Long, events: Iterator[Event],
                     state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val closed = state.getOption.map(asClosed(userId, _)).iterator
      state.remove()
      closed
    } else {
      val (closed, cur) =
        mergeBatch(state.getOption, events.map(e => micros(e.ts)).toSeq)
      cur.foreach { s =>
        state.update(s)
        // time out (close) the session once the watermark passes last+gap
        state.setTimeoutTimestamp(timeoutMs(s))
      }
      closed.iterator.map(asClosed(userId, _))
    }
  }

  /** [[updateSessions]] with the control branch (the classic-API twin
    * of [[TwsSessionizerCore]]'s eviction): an erase row removes the
    * key's state — GroupState.remove() drops the value AND its timeout
    * — and swallows the batch's own rows for the key. Semantics
    * otherwise identical to [[updateSessions]] via the shared
    * [[mergeBatch]] fold. */
  def updateSessionsCtl(userId: Long, events: Iterator[CEvent],
                        state: GroupState[SessionState]): Iterator[ClosedSession] =
    if (state.hasTimedOut) {
      val closed = state.getOption.map(asClosed(userId, _)).iterator
      state.remove()
      closed
    } else {
      val evs = events.toSeq
      if (evs.exists(_.erase)) {
        state.remove() // value + timeout, gone together
        Iterator.empty
      } else {
        val (closed, cur) =
          mergeBatch(state.getOption, evs.map(e => micros(e.ts)))
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(timeoutMs(s))
        }
        closed.iterator.map(asClosed(userId, _))
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

  /** [[sessionize]] over a control-aware stream (q223). */
  def sessionizeCtl(events: Dataset[CEvent],
                    watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    implicit val se = Encoders.product[SessionState]
    implicit val ce = Encoders.product[ClosedSession]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateSessionsCtl)
  }

  /** The same sessionizer on the NEW arbitrary-state API
    * (transformWithState, Spark 4): named state variables instead of
    * one opaque state object, explicit event-time timers instead of
    * setTimeoutTimestamp, per-variable TTL available. Semantics are
    * pinned to the classic path through the shared [[mergeBatch]] —
    * StreamsSpec runs both over the same input and diffs the outputs.
    * The processor keeps exactly one timer per key (registered at
    * last+gap, re-registered on extension), so timer state is O(1)
    * per in-flight session, like the value state.
    *
    * [[TwsSessionizerCore]] carries the whole machine generically over
    * the input type; [[TwsSessionizer]] (plain events, q214) and
    * [[TwsSessionizerCtl]] (control-aware, q223's RTBF eviction) are
    * its two instantiations — one fold, no drift between them.
    */
  sealed abstract class TwsSessionizerCore[I]
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, I, ClosedSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}

    /** Is this row an erasure request for its key? */
    protected def eraseOf(i: I): Boolean
    protected def tsOf(i: I): java.sql.Timestamp

    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[I],
                                 tv: TimerValues): Iterator[ClosedSession] = {
      val evs = rows.toSeq
      if (evs.exists(eraseOf)) {
        // RTBF eviction (q223): the subject's OPEN session is erased —
        // value state cleared AND its live timer deleted (a leftover
        // timer would keep firing against empty state forever), and
        // the batch's own rows for the key vanish with it. Nothing is
        // emitted: erasure means the session never happened, not that
        // it closed. Point-in-time semantics — the operator keeps no
        // per-key tombstone memory (that would be unbounded state
        // growth); KEEPING the subject out is the write-path gate's
        // job (q199), exactly as for landed artifacts.
        if (state.exists()) {
          getHandle.deleteTimer(timeoutMs(state.get()))
          state.clear()
        }
        Iterator.empty
      } else {
        val prev = if (state.exists()) Some(state.get()) else None
        val (closed, cur) = mergeBatch(prev, evs.map(e => micros(tsOf(e))))
        cur.foreach { s =>
          // one live timer per key: drop the stale one before arming
          prev.filter(_.last != s.last)
            .foreach(p => getHandle.deleteTimer(timeoutMs(p)))
          state.update(s)
          if (prev.forall(_.last != s.last))
            getHandle.registerTimer(timeoutMs(s))
        }
        closed.iterator.map(asClosed(key, _))
      }
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val closing = (if (state.exists()) Some(state.get()) else None)
        // a stale timer may fire after the session extended past it —
        // only close when this timer is the session's live one
        .filter(s => timeoutMs(s) == info.getExpiryTimeInMs())
      closing.foreach(_ => state.clear())
      closing.map(asClosed(key, _)).iterator
    }
  }

  class TwsSessionizer extends TwsSessionizerCore[Event] {
    protected def eraseOf(i: Event): Boolean = false
    protected def tsOf(i: Event): java.sql.Timestamp = i.ts
  }

  /** Control-aware twin for the RTBF path (q223). */
  class TwsSessionizerCtl extends TwsSessionizerCore[CEvent] {
    protected def eraseOf(i: CEvent): Boolean = i.erase
    protected def tsOf(i: CEvent): java.sql.Timestamp = i.ts
  }

  /** [[sessionize]] on transformWithState — identical output contract. */
  def sessionizeTws(events: Dataset[Event],
                    watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.TimeMode
    implicit val ce = Encoders.product[ClosedSession]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TwsSessionizer,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[sessionizeCtl]] on transformWithState — identical output
    * contract, eviction via named-state clear() + timer delete. */
  def sessionizeCtlTws(events: Dataset[CEvent],
                       watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.TimeMode
    implicit val ce = Encoders.product[ClosedSession]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TwsSessionizerCtl,
        TimeMode.EventTime(), OutputMode.Append())
  }
}

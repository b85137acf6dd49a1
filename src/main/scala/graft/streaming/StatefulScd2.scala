package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SCD2 dimension maintenance at ingest via flatMapGroupsWithState —
  * the streaming twin of the batch gaps-and-islands build
  * (graft.queries.Temporal.q194Scd2Intervals). The warehouse shape:
  * per subject (user), consecutive events with the same state collapse
  * into one validity interval [effective_from, effective_to); a state
  * CHANGE closes the current interval at the changing event's
  * timestamp and opens the next. The keyed carry is O(1) per user —
  * (current state, from_us, last_us/id) — so an interval spanning any
  * number of events and micro-batches costs one state row, never a
  * buffer of events.
  *
  * OPEN intervals (each user's live run — by definition never closed
  * by data) are emitted through an ABSOLUTE event-time flush timer:
  * the caller passes a quiesce point `flushUs`, every update arms the
  * timer there, and when the watermark passes it each key emits its
  * open interval with `to_us` NULL and clears. That is the streaming
  * spelling of "snapshot the open runs at a quiesce point" — a
  * production deployment would instead read the live state store (or
  * keep running); the harness needs the open rows in the sink to
  * census them. The timer is clamped above the current watermark so a
  * key touched AFTER the flush point (the second sentinel) re-arms
  * legally rather than throwing.
  *
  * Ordering contract: within a batch rows fold in (µs, event_id)
  * order, the q194/q139 attribution rule. Cross-batch disorder
  * (late-but-within-watermark rows older than the carry's last event)
  * folds at arrival position: the affected boundary edges can differ
  * from the batch build — exactly the O(1)-state divergence bound
  * documented on [[StatefulTransitions.foldBatch]]; the staged
  * ts-range feed replays in order, so the oracle path never exercises
  * it. Rows older than the WATERMARK are dropped by Spark before the
  * operator, as everywhere.
  */
object StatefulScd2 {

  import StatefulSessions.micros

  case class SEvent(user_id: Long, ts: java.sql.Timestamp,
                    event_type: String, event_id: Long)
  /** Control-aware event for the RTBF eviction path (q226): an
    * `erase` row clears the key's open RUN instead of folding. */
  case class CSEvent(user_id: Long, ts: java.sql.Timestamp,
                     event_type: String, event_id: Long, erase: Boolean)
  /** The O(1) carry: the open run. */
  case class RunState(cur_type: String, from_us: Long, last_us: Long,
                      last_id: Long)
  /** One validity interval; `to_us` None = still open at flush. */
  case class Interval(user_id: Long, event_type: String, from_us: Long,
                      to_us: Option[Long])

  /** Pure per-batch fold shared with the spec's in-memory replay:
    * fold a batch's (µs, id, type) rows (any order — sorted here)
    * into the carried run, emitting every interval the batch CLOSES,
    * oldest first. */
  def foldBatch(cur0: Option[RunState],
                rows: Seq[(Long, Long, String)])
      : (List[Interval], Option[RunState]) = {
    var out = List.empty[Interval]
    var cur = cur0
    rows.sortBy(r => (r._1, r._2)).foreach { case (t, id, ty) =>
      cur match {
        case Some(r) if r.cur_type == ty =>
          cur = Some(r.copy(last_us = math.max(r.last_us, t),
            last_id = id))
        case Some(r) =>
          out ::= Interval(0L, r.cur_type, r.from_us, Some(t))
          cur = Some(RunState(ty, t, t, id))
        case None =>
          cur = Some(RunState(ty, t, t, id))
      }
    }
    (out.reverse, cur)
  }

  /** The absolute quiesce timer, ONE definition for both state APIs:
    * ceil `flushUs` to the next ms (so it can't fire a µs early) and
    * clamp above the live watermark (so a key touched AFTER the flush
    * point re-arms legally instead of throwing). */
  def flushTimerMs(flushUs: Long, watermarkMs: Long): Long =
    math.max(math.floorDiv(flushUs + 999L, 1000L), watermarkMs + 60000L)

  /** flatMapGroupsWithState update: close runs on state change; on
    * timer expiry (watermark past `flushUs`) emit the open run with
    * to_us = None and clear. */
  def updateRuns(flushUs: Long)(userId: Long, events: Iterator[SEvent],
                                state: GroupState[RunState])
      : Iterator[Interval] = {
    if (state.hasTimedOut) {
      val open = state.getOption
        .map(r => Interval(userId, r.cur_type, r.from_us, None)).iterator
      state.remove()
      open
    } else {
      val (closed, cur) = foldBatch(state.getOption,
        events.map(e => (micros(e.ts), e.event_id, e.event_type)).toSeq)
      cur.foreach { r =>
        state.update(r)
        state.setTimeoutTimestamp(
          flushTimerMs(flushUs, state.getCurrentWatermarkMs()))
      }
      closed.iterator.map(_.copy(user_id = userId))
    }
  }

  /** [[updateRuns]] with the control branch (q226's RTBF eviction,
    * the [[StatefulSessions.updateSessionsCtl]] discipline on the
    * dimension machine): an erase row removes the key's open run —
    * `GroupState.remove()` drops the carry AND its flush timeout — and
    * swallows the batch's own rows for the key. The run never
    * happened; it does not flush as "open". */
  def updateRunsCtl(flushUs: Long)(userId: Long, events: Iterator[CSEvent],
                                   state: GroupState[RunState])
      : Iterator[Interval] = {
    if (state.hasTimedOut) {
      val open = state.getOption
        .map(r => Interval(userId, r.cur_type, r.from_us, None)).iterator
      state.remove()
      open
    } else {
      val evs = events.toSeq
      if (evs.exists(_.erase)) {
        state.remove() // carry + flush timeout, gone together
        Iterator.empty
      } else {
        val (closed, cur) = foldBatch(state.getOption,
          evs.map(e => (micros(e.ts), e.event_id, e.event_type)))
        cur.foreach { r =>
          state.update(r)
          state.setTimeoutTimestamp(
            flushTimerMs(flushUs, state.getCurrentWatermarkMs()))
        }
        closed.iterator.map(_.copy(user_id = userId))
      }
    }
  }

  /** Wire over an event stream; `flushUs` is the quiesce point whose
    * watermark passage emits every open interval. */
  def intervals(events: Dataset[SEvent], flushUs: Long,
                watermark: String = "10 minutes"): Dataset[Interval] = {
    implicit val rs = Encoders.product[RunState]
    implicit val ie = Encoders.product[Interval]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[RunState, Interval](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateRuns(flushUs))
  }

  /** The same SCD2 machine on the NEW arbitrary-state API
    * (transformWithState, Spark 4) — the [[StatefulSessions
    * .TwsSessionizer]] pattern, dimension-maintenance edition.
    * Semantics are pinned to the classic path through the shared
    * [[foldBatch]] (StreamsSpec diffs both APIs' sinks and checks
    * each against the batch q194 build). ONE absolute timer per key
    * (the quiesce flush), registered when the key's state is first
    * created — the timer is a constant, so no re-arm churn on run
    * extension, unlike the sessionizer's sliding last+gap timer. */
  /** [[TwsScd2Core]] carries the machine generically over the input
    * type (the [[StatefulSessions.TwsSessionizerCore]] discipline):
    * [[TwsScd2]] (plain, q218) and [[TwsScd2Ctl]] (control-aware,
    * q226's RTBF eviction) are its two instantiations — one fold. */
  sealed abstract class TwsScd2Core[I](flushUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, I, Interval] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}

    protected def eraseOf(i: I): Boolean
    protected def rowOf(i: I): (Long, Long, String) // (us, id, type)

    @transient private var state: ValueState[RunState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunState](
        "run", Encoders.product[RunState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[I],
                                 tv: TimerValues): Iterator[Interval] = {
      val evs = rows.toSeq
      if (evs.exists(eraseOf)) {
        // RTBF eviction (q226): the subject's open RUN is erased —
        // value state cleared AND the armed flush timer(s) deleted
        // via listTimers (robust to the clamp: the timer value armed
        // under an earlier watermark needn't be recomputable), and
        // the batch's own rows vanish with it. Nothing is emitted —
        // the run never happened, it does not flush as "open".
        // Point-in-time semantics; the write-path gate owns re-arrivals.
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        state.clear()
        Iterator.empty
      } else {
        val prev = if (state.exists()) Some(state.get()) else None
        val (closed, cur) = foldBatch(prev, evs.map(rowOf))
        cur.foreach { r =>
          state.update(r)
          if (prev.isEmpty)
            getHandle.registerTimer(
              flushTimerMs(flushUs, tv.getCurrentWatermarkInMs()))
        }
        closed.iterator.map(_.copy(user_id = key))
      }
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Interval] = {
      val open = (if (state.exists()) Some(state.get()) else None)
        .map(r => Interval(key, r.cur_type, r.from_us, None))
      state.clear()
      open.iterator
    }
  }

  class TwsScd2(flushUs: Long) extends TwsScd2Core[SEvent](flushUs) {
    protected def eraseOf(i: SEvent): Boolean = false
    protected def rowOf(i: SEvent): (Long, Long, String) =
      (StatefulSessions.micros(i.ts), i.event_id, i.event_type)
  }

  /** Control-aware twin for the RTBF path (q226). */
  class TwsScd2Ctl(flushUs: Long) extends TwsScd2Core[CSEvent](flushUs) {
    protected def eraseOf(i: CSEvent): Boolean = i.erase
    protected def rowOf(i: CSEvent): (Long, Long, String) =
      (StatefulSessions.micros(i.ts), i.event_id, i.event_type)
  }

  /** [[intervals]] on transformWithState — identical output contract. */
  def intervalsTws(events: Dataset[SEvent], flushUs: Long,
                   watermark: String = "10 minutes"): Dataset[Interval] = {
    import org.apache.spark.sql.streaming.TimeMode
    implicit val ie = Encoders.product[Interval]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TwsScd2(flushUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[intervals]] over a control-aware stream (classic API, q226). */
  def intervalsCtl(events: Dataset[CSEvent], flushUs: Long,
                   watermark: String = "10 minutes"): Dataset[Interval] = {
    implicit val rs = Encoders.product[RunState]
    implicit val ie = Encoders.product[Interval]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[RunState, Interval](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateRunsCtl(flushUs))
  }

  /** [[intervalsCtl]] on transformWithState (q226's registered path). */
  def intervalsCtlTws(events: Dataset[CSEvent], flushUs: Long,
                      watermark: String = "10 minutes"): Dataset[Interval] = {
    import org.apache.spark.sql.streaming.TimeMode
    implicit val ie = Encoders.product[Interval]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TwsScd2Ctl(flushUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

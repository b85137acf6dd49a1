package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful session-transition extraction via flatMapGroupsWithState —
  * the streaming twin of the q139 Markov matrix. Counting transitions
  * needs CONSECUTIVE events, and consecutive events routinely straddle
  * micro-batch boundaries; a per-batch window would silently drop
  * exactly those hand-offs. The keyed state is the minimal carry:
  * the user's last (event-time µs, type) — O(1) per user, the q113
  * discipline — and each batch emits the transitions it completes,
  * including the one whose `from` event arrived in an earlier batch.
  *
  * Gap semantics are pinned to the batch cut: a transition exists iff
  * the µs gap is ≤ 30 min (q139's `new_session` negation, µs-exact —
  * the [[StatefulSessions]] parity contract). Tie order at equal-µs
  * events is (ts, event_id), the q109/q139 attribution rule; the
  * harness feeds event-time order, and the watermark absorbs bounded
  * disorder in a real deployment.
  *
  * State lifecycle: transitions never need a closure event (unlike
  * sessions), so no timeout is required for CORRECTNESS — state is
  * one row per user ever seen. At ingest scale, reclaim idle users
  * with an event-time timeout exactly like [[StatefulSessions]]
  * (expiring a user older than the watermark minus the gap can never
  * lose a transition: any later event would start a new session
  * anyway).
  */
object StatefulTransitions {

  case class TEvent(user_id: Long, ts: java.sql.Timestamp,
                    event_type: String, event_id: Long)
  case class TransState(last_us: Long, last_id: Long, last_type: String)
  case class Transition(user_id: Long, from_type: String, to_type: String)

  import StatefulSessions.{micros, GapUs}

  /** Pure per-batch fold shared with the spec's in-memory replay:
    * fold a batch's (µs, id, type) rows (any order) into the carried
    * state, emitting completed transitions in order. */
  def foldBatch(cur0: Option[TransState],
                rows: Seq[(Long, Long, String)])
      : (List[Transition], Option[TransState]) = {
    var out = List.empty[Transition]
    var cur = cur0
    rows.sortBy(r => (r._1, r._2)).foreach { case (t, id, ty) =>
      cur match {
        case Some(s) if t - s.last_us <= GapUs =>
          out ::= Transition(0L, s.last_type, ty)
        case _ => ()
      }
      cur = Some(TransState(t, id, ty))
    }
    (out.reverse, cur)
  }

  def updateTransitions(userId: Long, events: Iterator[TEvent],
                        state: GroupState[TransState]): Iterator[Transition] = {
    val (emitted, cur) = foldBatch(state.getOption,
      events.map(e => (micros(e.ts), e.event_id, e.event_type)).toSeq)
    cur.foreach(state.update)
    emitted.iterator.map(_.copy(user_id = userId))
  }

  def transitions(events: Dataset[TEvent],
                  watermark: String = "10 minutes"): Dataset[Transition] = {
    implicit val se = Encoders.product[TransState]
    implicit val te = Encoders.product[Transition]
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateTransitions)
  }
}

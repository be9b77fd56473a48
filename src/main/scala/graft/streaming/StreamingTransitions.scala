package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental first-order Markov transitions per user — the streaming
  * twin of the batch `evt_markov_transitions` gate (EventQueries): where
  * batch derives (src, dst) via LEAD over the full history, the stream
  * keeps ONE tuple of state per user (latest event's time/id/type) and
  * emits a transition per arriving event. State is O(users), not
  * O(events); downstream counting is an ordinary streaming aggregate.
  *
  * Ordering contract: within a micro-batch events sort by (event time,
  * event_id); ACROSS batches arrival must respect event time per user
  * (the same in-order-per-key assumption StreamingAnomaly makes) — a
  * straggler older than the retained state would emit its transition out
  * of sequence rather than rewrite history.
  */
object StreamingTransitions {
  case class Ev(eventId: Long, ts: java.sql.Timestamp, userId: Long, eventType: String)
  case class Last(tsMillis: Long, eventId: Long, eventType: String)
  case class Transition(userId: Long, src: String, dst: String)

  def transitions(events: Dataset[Ev]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Ev], state: GroupState[Last]) => {
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            last.foreach(l => out += Transition(uid, l.eventType, e.eventType))
            last = Some(Last(e.ts.getTime, e.eventId, e.eventType))
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous z-score anomaly detection — the streaming twin of the
  * batch `evt_zscore_anomaly` operator (SURVEY §2.11 extension; the
  * reference has no streaming surface). Per event-type running moments
  * (n, Σx, Σx²) live in keyed state; each arrival is judged against the
  * moments of everything that came BEFORE it, then folded in — the
  * standard online shape where the model sharpens as data accretes,
  * with no retrospective re-scoring (batch anomaly detection is the
  * retrospective complement, same math over final moments).
  *
  * Scale shape: state is three numbers per event type — bounded by type
  * cardinality, not event volume — and each micro-batch does one pass
  * over its own rows. A cold start emits nothing until `minN` events of
  * a type have been seen (judging against moments of three points would
  * flag everything); production would add GroupStateTimeout eviction
  * for retired event types, kept NoTimeout here so tests are
  * deterministic.
  */
object StreamingAnomaly {

  case class Ev(eventId: Long, eventType: String, value: Double)
  case class Moments(n: Long, sum: Double, sumSq: Double)
  case class Anomaly(eventId: Long, eventType: String, value: Double, z: Double)

  /** Works on a streaming OR batch Dataset[Ev] (Spark runs
    * flatMapGroupsWithState one-shot in batch mode) — the same
    * one-definition/two-modes property as [[EventStreams]]. */
  def detect(events: Dataset[Ev], minN: Long = 30, zThresh: Double = 3.0)
      : Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.eventType)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Ev], state: GroupState[Moments]) => {
          var m = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
          val out = Seq.newBuilder[Anomaly]
          // arrival order within a micro-batch is nondeterministic —
          // process in eventId order so the emit set is deterministic
          for (e <- it.toSeq.sortBy(_.eventId)) {
            if (m.n >= minN) {
              val mu = m.sum / m.n
              val variance = m.sumSq / m.n - mu * mu
              if (variance > 0) {
                val z = (e.value - mu) / math.sqrt(variance)
                if (math.abs(z) > zThresh) out += Anomaly(e.eventId, key, e.value, z)
              }
            }
            m = Moments(m.n + 1, m.sum + e.value, m.sumSq + e.value * e.value)
          }
          state.update(m)
          out.result().iterator
        })
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY §2.11 extension — the one Structured
  * Streaming join surface the engine's other twins don't touch: state
  * lives on BOTH inputs, and watermarks + the event-time interval bound
  * how long each side's rows wait for a match).
  *
  * Shape: purchases attribute to the touch events (view/click) that
  * preceded them within `horizon`, per user — the stream form of the
  * batch `evt_attribution_linear` join (EventQueries), which calls the
  * same definition here so the two modes cannot drift. In batch the
  * watermarks are no-ops and this is a plain interval join; in streaming
  * the interval condition is what lets Spark derive state eviction for
  * both sides (a buffered touch is dropped once the purchase-side
  * watermark passes `t_ts + horizon`; a buffered purchase once the
  * touch-side watermark passes `p_ts`) — without it, stream-stream state
  * grows forever and Spark refuses the outer-join form outright.
  *
  * At 100 TB-scale ingest the state is keyed by user_id and bounded by
  * horizon × arrival rate per user: it shards horizontally exactly like
  * the groupBy-keyed twins, and the RocksDB store (Engine default)
  * keeps it off-heap.
  */
object StreamingJoin {

  /** Inner interval join: one row per (purchase, preceding touch within
    * horizon). `delay` is each side's late-data allowance. */
  def touchAttribution(touches: DataFrame, purchases: DataFrame,
      horizon: String = "24 hours", delay: String = "1 hour"): DataFrame =
    joined(touches, purchases, horizon, delay, "inner")

  /** Left-outer form: every purchase, with touch columns null when NO
    * touch preceded it within horizon — the "unattributed conversions"
    * stream. Null-padded rows emit once the touch-side watermark has
    * passed the purchase's full match window (only then is "no match" a
    * fact, not an absence-so-far); batch mode emits them immediately. */
  def purchasesWithTouch(touches: DataFrame, purchases: DataFrame,
      horizon: String = "24 hours", delay: String = "1 hour"): DataFrame =
    joined(touches, purchases, horizon, delay, "left_outer")

  private def joined(touches: DataFrame, purchases: DataFrame,
      horizon: String, delay: String, how: String): DataFrame = {
    val t = touches
      .select(col("user_id").as("t_user"), col("event_type").as("touch_type"),
        col("ts").as("t_ts"))
      .withWatermark("t_ts", delay)
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", delay)
    p.join(t,
        col("user_id") === col("t_user") &&
          col("t_ts") <= col("p_ts") &&
          col("t_ts") > col("p_ts") - expr(s"INTERVAL $horizon"),
        how)
      .select(col("p_id"), col("user_id"), col("p_ts"), col("value"),
        col("touch_type"), col("t_ts"))
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream transformations (SURVEY §2.11 — green-field extension:
  * the reference's closest analogue is the scheduled matview refresh job,
  * kv/jobs/MaterializedViewRefreshJob.java; here the same maintenance is
  * expressed Spark-natively and incrementally).
  *
  * Every transformation is source-agnostic: applied to `spark.read` it is
  * a batch analytic; applied to `spark.readStream` (+ [[withLateData]])
  * it is an incremental Structured Streaming query with bounded state.
  * That one-definition/two-modes property is the engine's replacement for
  * the reference's "recompute the whole view on a timer".
  */
object EventStreams {

  /** Watermark for streaming use — bounds state for the windowed
    * aggregations and defines the late-data cutoff. */
  def withLateData(df: DataFrame, delay: String = "1 hour"): DataFrame =
    df.withWatermark("ts", delay)

  /** Exact dedup of at-least-once ingestion with BOUNDED state: a
    * replayed event_id is dropped if it re-arrives within `delay` of
    * the original, and the key's state evicts once the watermark passes
    * — where plain `dropDuplicates` on a non-event-time key NEVER
    * evicts (even under a watermark), so its state grows with the
    * stream's lifetime key cardinality: the classic streaming-dedup
    * OOM at 100-TB ingest. Replays farther apart than `delay` are
    * ingestion bugs, not at-least-once jitter — the window is the
    * honest contract, not a weakening. */
  def dedupExactIngest(df: DataFrame, delay: String = "1 hour"): DataFrame =
    withLateData(df, delay).dropDuplicatesWithinWatermark("event_id")

  /** Tumbling-window counts+sums per event type. */
  def tumbling(df: DataFrame, width: String = "1 hour"): DataFrame =
    df.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("events"), sum(col("value")).as("total"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("events"), col("total"))

  /** Sliding-window counts (width, slide). */
  def sliding(df: DataFrame, width: String, slide: String): DataFrame =
    df.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("events"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("events"))

  /** Session windows per user (gap-based merge) — Spark's native
    * `session_window`, which works identically for batch and streaming
    * (streaming requires the watermark). */
  def sessions(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    df.groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("events"), sum(col("value")).as("total"))
      .select(col("user_id"), col("s.start").as("s_start"), col("s.end").as("s_end"),
        col("events"), col("total"))

  /** Per-session conversion facts: the ENTRY event type (first by time —
    * a lexicographic struct-min, so no second pass over the events) and
    * whether the session converted (contains a purchase), in the same
    * single session_window aggregate. Per-session granularity is the
    * streaming-appropriate output (state evicts with the watermark);
    * the entry-type conversion-rate rollup is one tiny batch aggregate
    * downstream (EventQueries' evt_session_conversion is the batch twin
    * with a DuckDB oracle). */
  def sessionConversion(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    df.groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("entry_type"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"),
        count(lit(1)).as("events"))
      .select(col("user_id"), col("s.start").as("s_start"), col("entry_type"),
        col("converted"), col("events"))
}

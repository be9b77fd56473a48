package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Regression guard for the round-9 events-fixture breakage: the driver
  * regenerated events.parquet with ts as TIMESTAMP(MICROS) while
  * Tables.load still unconditionally applied the nanos-as-long rewrite,
  * failing every events consumer at analysis. Tables.load must normalize
  * BOTH physical layouts to the same session-local TimestampType with the
  * same wall-clock values, gated on the read schema rather than assumed.
  */
class FixtureSchemaSpec extends SparkSpec {

  test("real events fixture loads with ts as session-local timestamp") {
    val df = Tables.load(spark, sf(), "events")
    assert(df.schema("ts").dataType == TimestampType)
    // sanity on values, not just types: timestamps must land in a
    // plausible epoch range (a mis-scaled div/cast lands in 1970 or 5xxxx)
    val (lo, hi) = {
      val r = df.agg(min(year(col("ts"))), max(year(col("ts")))).head()
      (r.getInt(0), r.getInt(1))
    }
    assert(lo >= 1990 && hi <= 2100, s"events.ts years out of range: $lo..$hi")
    assert(df.filter(col("ts").isNull).count() == 0)
  }

  test("Tables.load normalizes both historical ts layouts identically") {
    val base = Files.createTempDirectory("graft-fixture-layouts").toString
    // one known wall-clock instant, expressed in each era's physical form
    val microsSinceEpoch = 1704110400123456L // 2024-01-01 12:00:00.123456 UTC

    // nanos era: legacy.parquet.nanosAsLong surfaced TIMESTAMP(NANOS) as a
    // nanos-since-epoch LongType column — identical read schema to a plain
    // long column, which is what we synthesize here
    val nanosDir = s"$base/nanos"
    spark.range(1).select(
      lit(1L).as("event_id"),
      lit(microsSinceEpoch * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    // micros era (current fixtures): tz-naive TIMESTAMP(MICROS) reads as
    // TIMESTAMP_NTZ
    val microsDir = s"$base/micros"
    spark.range(1).select(
      lit(1L).as("event_id"),
      timestamp_micros(lit(microsSinceEpoch)).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")

    val fromNanos  = Tables.load(spark, nanosDir, "events")
    val fromMicros = Tables.load(spark, microsDir, "events")
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromMicros.schema("ts").dataType == TimestampType)

    def tsMicros(df: org.apache.spark.sql.DataFrame): Long =
      df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(tsMicros(fromNanos) == microsSinceEpoch)
    assert(tsMicros(fromMicros) == microsSinceEpoch)

    // an already-session-local timestamp column passes through untouched
    val ltzDir = s"$base/ltz"
    spark.range(1).select(
      lit(1L).as("event_id"),
      timestamp_micros(lit(microsSinceEpoch)).as("ts"))
      .write.mode("overwrite").parquet(s"$ltzDir/events.parquet")
    val fromLtz = Tables.load(spark, ltzDir, "events")
    assert(fromLtz.schema("ts").dataType == TimestampType)
    assert(tsMicros(fromLtz) == microsSinceEpoch)
  }
}

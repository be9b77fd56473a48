package graft.operators

import graft.{Exact, Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators Spark has no native form for
  * (named in the build brief as the canonical custom-operator cases).
  * Both are COMPOSED from existing operators (preference (a) of the
  * custom-operator ladder): semantics allow it, and the compositions
  * scale — one shuffle on the join key for as-of, bin-equi-join for
  * range — so no custom SparkPlan is warranted.
  *
  * Oracles use DuckDB's native ASOF JOIN / inequality join, so the
  * compositions are checked against a first-class implementation.
  */
object TemporalQueries extends QueryPack {

  val qs: Seq[Q] = Seq(
    // AS-OF JOIN: for each purchase, the same user's latest view at or
    // before it. Composition: tag both sides, union, and take
    // last(value ignoreNulls) over (user ORDER BY ts, side) — the
    // merge-sorted-streams formulation: ONE shuffle on user_id, a sort,
    // no per-row probing. At equal timestamps the view sorts first
    // (side 0), matching ASOF's inclusive l.ts >= r.ts.
    Q(
      "asof_join_events",
      """SELECT p.user_id, p.event_id,
        |       (epoch_us(CAST(p.ts AS TIMESTAMP)) // 1000000) AS purchase_s,
        |       v.value AS last_view_value,
        |       (epoch_us(CAST(v.ts AS TIMESTAMP)) // 1000000) AS view_s
        |FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id < 120) p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("value").as("v_value"), lit(null).cast("long").as("p_event_id"))
      val purchases = ev.filter(col("event_type") === "purchase" && col("user_id") < 120)
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          lit(null).cast("double").as("v_value"), col("event_id").as("p_event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.union(purchases)
        .withColumn("last_view_value", last(col("v_value"), ignoreNulls = true).over(w))
        .withColumn("last_view_ts",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("user_id"), col("p_event_id").as("event_id"),
          unix_timestamp(col("ts")).as("purchase_s"),
          col("last_view_value"),
          unix_timestamp(col("last_view_ts")).as("view_s"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // RANGE JOIN via binning: overlapping value bands joined to events by
    // containment. Composition: quantize each band to the fixed-width
    // bins it spans (explode — band rows only), quantize each event to
    // its bin, EQUI-join on bin, then exact containment filter. Both
    // sides shuffle on the bin key — no nested-loop, which is what makes
    // a big×big interval join feasible; the oracle does the naive
    // inequality join.
    Q(
      "range_join_binned",
      s"""SELECT band_id, COUNT(*) AS n, ${Exact.oSum("e.value")} AS total
         |FROM (VALUES (1, 0.0, 25.0), (2, 20.0, 45.0), (3, 40.0, 65.0),
         |             (4, 60.0, 85.0), (5, 80.0, 100.0)) b(band_id, lo, hi)
         |JOIN events e ON e.value >= b.lo AND e.value < b.hi
         |GROUP BY band_id
         |ORDER BY band_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val binW = 20.0
      val bands = Seq((1, 0.0, 25.0), (2, 20.0, 45.0), (3, 40.0, 65.0),
        (4, 60.0, 85.0), (5, 80.0, 100.0)).toDF("band_id", "lo", "hi")
      val bandBins = bands.select(col("band_id"), col("lo"), col("hi"),
        explode(sequence(floor(col("lo") / binW).cast("int"),
          floor((col("hi") - lit(1e-9)) / binW).cast("int"))).as("bin"))
      val ev = Tables.load(s, dir, "events")
        .select(col("value"), floor(col("value") / binW).cast("int").as("bin"))
      ev.join(bandBins, "bin")
        .filter(col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("total"))
        .orderBy(col("band_id"))
    },

    // SCD Type-2 dimension build — the standard warehouse temporal
    // shape: collapse a change log (orders as per-customer priority
    // changes over time) into versioned rows with [valid_from, valid_to)
    // intervals and an is_current flag. Two windows over ONE shuffle on
    // the dimension key (both partition by o_custkey): LAG detects
    // change points, LEAD closes each interval. Ties on a date are
    // ordered by o_orderkey so version boundaries are deterministic.
    // 100 TB shape: dimension-key-partitioned, corpus-linear, no join.
    Q(
      "scd2_dimension",
      """WITH chg AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
        |         LAG(o_orderpriority) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |starts AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate AS vf, o_orderkey
        |  FROM chg WHERE prev IS NULL OR prev <> o_orderpriority),
        |v AS (
        |  SELECT o_custkey, o_orderpriority, vf,
        |         LEAD(vf) OVER (PARTITION BY o_custkey
        |           ORDER BY vf, o_orderkey) AS vt
        |  FROM starts)
        |SELECT o_custkey, o_orderpriority,
        |       CAST(vf AS DATE) AS valid_from, CAST(vt AS DATE) AS valid_to,
        |       (vt IS NULL) AS is_current
        |FROM v ORDER BY o_custkey, valid_from, o_orderpriority,
        |         valid_to NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      val byKey = Window.partitionBy(col("o_custkey"))
      val chg = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("o_orderpriority"),
          lag(col("o_orderpriority"), 1).over(
            byKey.orderBy(col("o_orderdate"), col("o_orderkey"))).as("prev"))
      val starts = chg
        .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_orderdate").as("vf"), col("o_orderkey"))
      starts
        .select(col("o_custkey"), col("o_orderpriority"), col("vf"),
          lead(col("vf"), 1).over(
            byKey.orderBy(col("vf"), col("o_orderkey"))).as("vt"))
        .select(col("o_custkey"), col("o_orderpriority"),
          col("vf").cast("date").as("valid_from"),
          col("vt").cast("date").as("valid_to"),
          col("vt").isNull.as("is_current"))
        // valid_to completes the total order: replicated same-date
        // priority flips (the sf1-class fixture) produce rows equal on
        // (custkey, valid_from, priority) that differ only in valid_to,
        // and engines order such ties arbitrarily; NULLS FIRST spelled
        // on both sides (Spark asc default, NOT DuckDB's)
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderpriority"),
          col("valid_to").asc_nulls_first)
    }
  )
}

package graft.operators

import graft.{Exact, Q, QueryPack, Tables}
import graft.streaming.EventStreams
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the `events` table, exercising the same
  * transformations the streaming module runs incrementally
  * (SURVEY §2.11). Oracles replicate Spark's epoch-aligned window
  * bucketing and gap-based sessionization in portable SQL.
  *
  * All window boundaries are emitted as epoch SECONDS (BIGINT): parquet
  * timestamp annotations (adjustedToUTC) make tz-aware vs naive datetime
  * comparisons engine-dependent, while epoch integers are unambiguous.
  */
object EventQueries extends QueryPack {

  // DuckDB: epoch seconds of the nanos-typed ts (floor, matching Spark's
  // unix_timestamp truncation).
  private val oEs = "(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)"

  val qs: Seq[Q] = Seq(
    // Tumbling window: Spark's window() aligns buckets to the epoch, so a
    // 1h bucket start is floor(epoch/3600)*3600.
    Q(
      "evt_tumbling_window",
      s"""SELECT ($oEs // 3600) * 3600 AS w_start_s,
         |       event_type,
         |       COUNT(*) AS events,
         |       ${Exact.oSum("value")} AS total
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY w_start_s, event_type""".stripMargin
    ) { (s, dir) =>
      val df = Tables.load(s, dir, "events")
      df.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("events"), Exact.dsum(col("value")).as("total"))
        .select(unix_timestamp(col("w.start")).as("w_start_s"),
          col("event_type"), col("events"), col("total"))
        .orderBy(col("w_start_s"), col("event_type"))
    },

    // Sliding window 1h/30m: each event lands in 2 overlapping buckets;
    // the oracle explodes the two slide offsets explicitly.
    Q(
      "evt_sliding_window",
      s"""SELECT ($oEs // 1800) * 1800 - i * 1800 AS w_start_s,
         |       event_type, COUNT(*) AS events
         |FROM events CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS i)
         |GROUP BY 1, 2
         |ORDER BY w_start_s, event_type""".stripMargin
    ) { (s, dir) =>
      EventStreams.sliding(Tables.load(s, dir, "events"), "1 hour", "30 minutes")
        .select(unix_timestamp(col("w_start")).as("w_start_s"),
          col("event_type"), col("events"))
        .orderBy(col("w_start_s"), col("event_type"))
    },

    // Gap-based sessionization via Spark's native session_window (30 min
    // inactivity gap); the oracle rebuilds identical sessions with a
    // lag-gap running sum. session_window.end = last event + gap.
    // BOUNDARY SEMANTICS: session_window merges an event at EXACTLY
    // prev + gap (sessions are [start, last+gap) and the merge test is
    // next_start <= prev_end), so the oracle's break condition must be
    // gap > 1800, not >= — the >= form diverged on the first
    // exactly-30:00 gap in the data (seen at sf0.1).
    Q(
      "evt_sessions",
      s"""WITH e AS (
         |  SELECT user_id, $oEs AS es, value,
         |         CASE WHEN $oEs - lag($oEs) OVER (PARTITION BY user_id ORDER BY ts) > 1800
         |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |              THEN 1 ELSE 0 END AS brk
         |  FROM events WHERE user_id < 100),
         |s AS (
         |  SELECT user_id, es, value,
         |         SUM(brk) OVER (PARTITION BY user_id ORDER BY es
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM e)
         |SELECT user_id, MIN(es) AS s_start_s, MAX(es) + 1800 AS s_end_s,
         |       COUNT(*) AS events,
         |       ${Exact.oSum("value")} AS total
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, s_start_s""".stripMargin
    ) { (s, dir) =>
      val df = Tables.load(s, dir, "events").filter(col("user_id") < 100)
      df.groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("events"), Exact.dsum(col("value")).as("total"))
        .select(col("user_id"),
          unix_timestamp(col("sw.start")).as("s_start_s"),
          unix_timestamp(col("sw.end")).as("s_end_s"),
          col("events"), col("total"))
        .orderBy(col("user_id"), col("s_start_s"))
    },

    // Conversion funnel: users whose first view precedes their first
    // click precedes their first purchase — one conditional-aggregation
    // pass, no self-joins.
    Q(
      "evt_funnel",
      s"""SELECT user_id, tv, tc, tp
         |FROM (
         |  SELECT user_id,
         |         MIN(CASE WHEN event_type = 'view' THEN $oEs END) AS tv,
         |         MIN(CASE WHEN event_type = 'click' THEN $oEs END) AS tc,
         |         MIN(CASE WHEN event_type = 'purchase' THEN $oEs END) AS tp
         |  FROM events GROUP BY user_id) t
         |WHERE tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL
         |  AND tv < tc AND tc < tp
         |ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      val es = unix_timestamp(col("ts"))
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", es)).as("tv"),
          min(when(col("event_type") === "click", es)).as("tc"),
          min(when(col("event_type") === "purchase", es)).as("tp"))
        .filter(col("tv").isNotNull && col("tc").isNotNull && col("tp").isNotNull &&
          col("tv") < col("tc") && col("tc") < col("tp"))
        .orderBy(col("user_id"))
    },

    // Per-user running event index + inter-event gap seconds — the
    // lag/window shape of stream feature engineering.
    Q(
      "evt_gaps",
      s"""SELECT user_id, event_id,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
         |  $oEs - lag($oEs) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
         |FROM events WHERE user_id < 40
         |ORDER BY user_id, seq""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .filter(col("user_id") < 40)
        .select(col("user_id"), col("event_id"),
          row_number().over(w).as("seq"),
          (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
            .as("gap_s"))
        .orderBy(col("user_id"), col("seq"))
    },

    // Cohort retention — the product-analytics staple: users cohorted by
    // first-active epoch day, retention = share of the cohort active
    // N days later. Days are epoch-day integers (floor division — no
    // tz-dependent date math). Shapes: one corpus-linear distinct on
    // (user, day), a per-user min, and two small joins — the cohort
    // and size relations are user-/day-cardinality, broadcastable at
    // any event volume.
    Q(
      "evt_cohort_retention",
      s"""WITH days AS (
         |  SELECT DISTINCT user_id, $oEs // 86400 AS day FROM events),
         |cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id),
         |sizes AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_day),
         |act AS (
         |  SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
         |         COUNT(DISTINCT d.user_id) AS active_users
         |  FROM days d JOIN cohorts c ON d.user_id = c.user_id
         |  GROUP BY 1, 2)
         |SELECT a.cohort_day, a.day_offset, a.active_users, s.cohort_size,
         |       CAST(a.active_users AS DOUBLE) / s.cohort_size AS retention
         |FROM act a JOIN sizes s ON a.cohort_day = s.cohort_day
         |ORDER BY a.cohort_day, a.day_offset""".stripMargin
    ) { (s, dir) =>
      val days = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
        .distinct()
      val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val sizes = cohorts.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
      days.join(cohorts, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .join(broadcast(sizes), "cohort_day")
        .select(col("cohort_day"), col("day_offset"), col("active_users"),
          col("cohort_size"),
          (col("active_users").cast("double") / col("cohort_size")).as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },

    // Z-score anomaly detection — flag events whose value is > 3 standard
    // deviations from its event_type's mean. Both moments come from
    // decimal-exact sums (Σx and Σx² accumulate order-independently, so
    // mean and variance are bit-identical across engines); sd and z are
    // then plain IEEE ops on identical doubles. Plan: one corpus-linear
    // two-phase aggregate builds the tiny per-type stats table, which
    // broadcasts back onto the scan — the standard fit-then-apply shape,
    // no shuffle of the events themselves.
    Q(
      "evt_zscore_anomaly",
      """WITH stats AS (
        |  SELECT event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS mu,
        |         CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS ex2
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |       (e.value - s.mu) / sqrt(s.ex2 - s.mu * s.mu) AS z
        |FROM events e JOIN stats s ON e.event_type = s.event_type
        |WHERE abs((e.value - s.mu) / sqrt(s.ex2 - s.mu * s.mu)) > 3.0
        |ORDER BY e.event_id""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val stats = ev.groupBy(col("event_type"))
        .agg(Exact.davg(col("value")).as("mu"),
          (Exact.dsum(col("value") * col("value")) / count(col("value"))).as("ex2"))
      val z = (col("value") - col("mu")) / sqrt(col("ex2") - col("mu") * col("mu"))
      ev.join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"), col("value"), z.as("z"))
        .filter(abs(col("z")) > 3.0)
        .orderBy(col("event_id"))
    },

    // Time-series gap fill + LOCF — downsample to hourly buckets, then
    // densify against a generated spine (every hour × every event_type)
    // and carry the last observed total forward across gap hours. The
    // spine is dims × hours — tiny at any corpus size — so it BROADCASTS
    // against the bucketed aggregate (the corpus-sized side never
    // reshuffles for the join); LOCF is one window per series key.
    // Missing-bucket counts fill with 0; is_gap marks synthesized rows.
    Q(
      "evt_gapfill_locf",
      s"""WITH b AS (
         |  SELECT event_type, ($oEs // 3600) * 3600 AS h,
         |         COUNT(*) AS events,
         |         ${Exact.oSum("value")} AS total
         |  FROM events GROUP BY 1, 2),
         |ext AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM b),
         |spine AS (
         |  SELECT t.event_type, g.h
         |  FROM (SELECT DISTINCT event_type FROM events) t
         |  CROSS JOIN (SELECT unnest(generate_series((SELECT mn FROM ext),
         |                                            (SELECT mx FROM ext), 3600)) AS h) g),
         |j AS (
         |  SELECT s.event_type, s.h, COALESCE(b.events, 0) AS events, b.total,
         |         (b.h IS NULL) AS is_gap
         |  FROM spine s LEFT JOIN b ON s.event_type = b.event_type AND s.h = b.h)
         |SELECT event_type, h AS hour_s, events,
         |       LAST_VALUE(total IGNORE NULLS) OVER (
         |         PARTITION BY event_type ORDER BY h
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total,
         |       is_gap
         |FROM j ORDER BY event_type, hour_s""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val b = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 3600) * 3600).as("h"))
        .agg(count(lit(1)).as("events"), Exact.dsum(col("value")).as("total"))
      val ext = b.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      val hours = ext.select(explode(sequence(col("mn"), col("mx"),
        lit(3600L))).as("h"))
      val spine = Tables.load(s, dir, "events").select(col("event_type")).distinct()
        .crossJoin(hours)
      val j = broadcast(spine).join(b, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("events"), lit(0L)).as("events"), col("total"),
          col("events").isNull.as("is_gap"))
      val locf = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      j.select(col("event_type"), col("h").as("hour_s"), col("events"),
          last(col("total"), ignoreNulls = true).over(locf).as("filled_total"),
          col("is_gap"))
        .orderBy(col("event_type"), col("hour_s"))
    },

    // First-order Markov transition matrix over per-user event streams —
    // the "what do users do next" behavioral model. LEAD partitions by
    // user (per-user local sort, shuffles on user_id — no global
    // ordering), and the transition aggregate is event-type² rows, so
    // the per-source totals for the probability normalization broadcast.
    Q(
      "evt_markov_transitions",
      s"""WITH seq AS (
         |  SELECT event_type AS src,
         |         LEAD(event_type) OVER (PARTITION BY user_id
         |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
         |  FROM events),
         |t AS (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
         |  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst),
         |tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_src FROM t GROUP BY src)
         |SELECT t.src, t.dst, t.n,
         |       CAST(t.n AS DOUBLE) / tot.n_src AS prob
         |FROM t JOIN tot ON t.src = tot.src
         |ORDER BY t.src, t.dst""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val seq = Tables.load(s, dir, "events")
        .select(col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
      val t = seq.groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).cast("long").as("n"))
      val tot = t.groupBy(col("src"))
        .agg(sum(col("n")).cast("long").as("n_src"))
      t.join(broadcast(tot), "src")
        .select(col("src"), col("dst"), col("n"),
          (col("n").cast("double") / col("n_src")).as("prob"))
        .orderBy(col("src"), col("dst"))
    },

    // Linear multi-touch attribution — each purchase's value splits
    // equally across the user's view/click touches in the preceding
    // 24h. The touch join keys on user_id with a time-range predicate
    // (per-user work bounded by events-per-user-per-day, like the as-of
    // join); the per-purchase credit divisor is a purchase-partitioned
    // window (bounded groups); credit sums go through Exact decimals so
    // accumulation order cannot perturb the rollup.
    Q(
      "evt_attribution_linear",
      s"""WITH purch AS (
         |  SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts, value
         |  FROM events WHERE event_type = 'purchase'),
         |touch AS (
         |  SELECT user_id, event_type AS touch_type, CAST(ts AS TIMESTAMP) AS t_ts
         |  FROM events WHERE event_type IN ('view', 'click')),
         |joined AS (
         |  SELECT p.p_id, p.value, t.touch_type
         |  FROM purch p JOIN touch t
         |    ON p.user_id = t.user_id
         |   AND t.t_ts <= p.p_ts
         |   AND t.t_ts > p.p_ts - INTERVAL 24 HOURS),
         |credit AS (
         |  SELECT touch_type,
         |         value / COUNT(*) OVER (PARTITION BY p_id) AS credit
         |  FROM joined)
         |SELECT touch_type,
         |       CAST(count(*) AS BIGINT) AS n_credits,
         |       ${Exact.oSum("credit")} AS attributed
         |FROM credit GROUP BY touch_type
         |ORDER BY touch_type""".stripMargin
    ) { (s, dir) =>
      // ONE join definition for both modes: the batch gate here and the
      // stream-stream interval join twin (StreamingSpec) share
      // StreamingJoin.touchAttribution, so the oracle protects the
      // streaming semantics too (the watermarks are no-ops in batch)
      val ev = Tables.load(s, dir, "events")
      val joined = graft.streaming.StreamingJoin.touchAttribution(
        ev.filter(col("event_type").isin("view", "click")),
        ev.filter(col("event_type") === "purchase"))
      val perPurchase = Window.partitionBy(col("p_id"))
      joined
        .select(col("touch_type"),
          (col("value") / count(lit(1)).over(perPurchase)).as("credit"))
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).cast("long").as("n_credits"),
          Exact.dsum(col("credit")).as("attributed"))
        .orderBy(col("touch_type"))
    },

    // Unattributed conversions — the left-outer twin of the attribution
    // join: every purchase with NO view/click touch in its 24 h window
    // (organic / dark-channel conversions, the number a marketing
    // pipeline reconciles budgets against). Shares StreamingJoin
    // .purchasesWithTouch with the streaming left-outer form, so the
    // oracle also protects the stream's null-padding semantics; one
    // outer row per purchase needs touch_type IS NULL — a purchase with
    // ANY touch yields only matched rows.
    Q(
      "evt_attribution_unmatched",
      s"""WITH purch AS (
         |  SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts, value
         |  FROM events WHERE event_type = 'purchase'),
         |touch AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t_ts
         |  FROM events WHERE event_type IN ('view', 'click')),
         |unmatched AS (
         |  SELECT p.p_id, p.user_id, p.value
         |  FROM purch p LEFT JOIN touch t
         |    ON p.user_id = t.user_id
         |   AND t.t_ts <= p.p_ts
         |   AND t.t_ts > p.p_ts - INTERVAL 24 HOURS
         |  WHERE t.t_ts IS NULL)
         |SELECT CAST(COUNT(*) AS BIGINT) AS organic_purchases,
         |       ${Exact.oSum("value")} AS organic_revenue,
         |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS organic_users
         |FROM unmatched""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      graft.streaming.StreamingJoin.purchasesWithTouch(
          ev.filter(col("event_type").isin("view", "click")),
          ev.filter(col("event_type") === "purchase"))
        .filter(col("touch_type").isNull)
        .agg(count(lit(1)).cast("long").as("organic_purchases"),
          Exact.dsum(col("value")).as("organic_revenue"),
          countDistinct(col("user_id")).as("organic_users"))
    },

    // Top user paths — the most common day-leading event-type sequences
    // (first 5 steps per user-day), the "how do people actually move
    // through the product" mining query. Per-(user, day) groups are
    // bounded, the ordered path assembles via an in-group sort (struct
    // sort_array, no window), path counting is an ordinary aggregate,
    // and the top-10 cut is a TakeOrdered.
    Q(
      "evt_top_paths",
      s"""WITH seq AS (
         |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |         array_to_string(list_slice(
         |           list(event_type ORDER BY CAST(ts AS TIMESTAMP), event_id),
         |           1, 5), '>') AS path
         |  FROM events GROUP BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE))
         |SELECT path, CAST(count(*) AS BIGINT) AS n_user_days
         |FROM seq GROUP BY path
         |ORDER BY n_user_days DESC, path
         |LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val seq = Tables.load(s, dir, "events")
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
        .select(concat_ws(">",
          expr("transform(slice(evs, 1, 5), x -> x.event_type)")).as("path"))
      seq.groupBy(col("path"))
        .agg(count(lit(1)).cast("long").as("n_user_days"))
        .orderBy(col("n_user_days").desc, col("path"))
        .limit(10)
    },

    // DAU/MAU stickiness — daily active users over 28-day-trailing
    // monthly actives, the engagement ratio every product pipeline
    // tracks. Exact trailing distinct via bounded replication: each
    // DISTINCT (user, day) observation projects onto the 28 observation
    // days it supports (a constant 28× of the already-day-deduped
    // activity set — linear with a fixed constant, never events×28),
    // then one distinct-count per observation day; the day dimension is
    // calendar-bounded and broadcast.
    Q(
      "evt_dau_mau",
      s"""WITH d AS (
         |  SELECT DISTINCT user_id, $oEs // 86400 AS day FROM events),
         |days AS (SELECT DISTINCT day FROM d),
         |dau AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM d GROUP BY day),
         |expand AS (
         |  SELECT d.user_id, d.day + k.k AS obs_day
         |  FROM d CROSS JOIN (SELECT unnest(generate_series(0, 27)) AS k) k),
         |mau AS (
         |  SELECT e.obs_day AS day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS mau
         |  FROM expand e JOIN days dd ON e.obs_day = dd.day
         |  GROUP BY e.obs_day)
         |SELECT dau.day, dau.dau, mau.mau,
         |       CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
         |FROM dau JOIN mau ON dau.day = mau.day
         |ORDER BY dau.day""".stripMargin
    ) { (s, dir) =>
      val d = Tables.load(s, dir, "events")
        .select(col("user_id"),
          floor(unix_timestamp(col("ts")) / 86400).cast("long").as("day"))
        .distinct()
      val days = d.select(col("day")).distinct()
      val dau = d.groupBy(col("day"))
        .agg(count(lit(1)).cast("long").as("dau"))
      val mau = d
        .select(col("user_id"),
          explode(sequence(lit(0L), lit(27L))).as("k"), col("day"))
        .select(col("user_id"), (col("day") + col("k")).as("obs_day"))
        .join(broadcast(days.withColumnRenamed("day", "obs_day")), "obs_day")
        .groupBy(col("obs_day").as("day"))
        .agg(countDistinct(col("user_id")).cast("long").as("mau"))
      dau.join(mau, "day")
        .select(col("day"), col("dau"), col("mau"),
          (col("dau").cast("double") / col("mau")).as("stickiness"))
        .orderBy(col("day"))
    },

    // Session conversion by entry event — which landing action converts:
    // per 30-min-gap session, the ENTRY event type (first by time) and
    // whether the session contains a purchase, rolled up to a conversion
    // rate per entry type. ONE session_window aggregate carries all three
    // facts (entry via lexicographic struct-min, conversion via
    // conditional max, size via count) — no second pass over the events,
    // no per-session window function; the rollup is event-type-bounded.
    // The oracle rebuilds identical sessions with the same lag-gap
    // running sum as evt_sessions, taking the entry row by ROW_NUMBER.
    Q(
      "evt_session_conversion",
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, $oEs AS es,
         |         CASE WHEN $oEs - lag($oEs) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
         |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |              THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |s AS (
         |  SELECT user_id, event_id, event_type, es,
         |         SUM(brk) OVER (PARTITION BY user_id ORDER BY es, event_id
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM e),
         |r AS (
         |  SELECT user_id, sid, event_type,
         |         ROW_NUMBER() OVER (PARTITION BY user_id, sid
         |                            ORDER BY es, event_id) AS rn
         |  FROM s),
         |conv AS (
         |  SELECT user_id, sid,
         |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
         |  FROM s GROUP BY user_id, sid)
         |SELECT e.event_type AS entry_type,
         |       CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |       CAST(SUM(c.converted) AS BIGINT) AS n_converted,
         |       CAST(SUM(c.converted) AS DOUBLE) / COUNT(*) AS conversion_rate
         |FROM r e JOIN conv c ON e.user_id = c.user_id AND e.sid = c.sid
         |WHERE e.rn = 1
         |GROUP BY e.event_type
         |ORDER BY entry_type""".stripMargin
    ) { (s, dir) =>
      val perSession = Tables.load(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(
          min(struct(unix_timestamp(col("ts")).as("es"), col("event_id"),
            col("event_type"))).getField("event_type").as("entry_type"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("converted"))
      perSession.groupBy(col("entry_type"))
        .agg(count(lit(1)).cast("long").as("n_sessions"),
          sum(col("converted")).cast("long").as("n_converted"))
        .select(col("entry_type"), col("n_sessions"), col("n_converted"),
          (col("n_converted").cast("double") / col("n_sessions"))
            .as("conversion_rate"))
        .orderBy(col("entry_type"))
    },

    // Date-partitioned layout round trip — THE physical-layout practice
    // of every 100 TB event store: rewrite the event log partitioned by
    // day (`day=YYYY-MM-DD/` dirs), then read ONE day back through a
    // partition-value filter. At scale the read's cost is the selected
    // day's bytes, not the table's: Spark prunes non-matching partition
    // dirs at PLANNING time (PlanSpec pins PartitionFilters + the pruned
    // read). The oracle answers from the unpartitioned original — the
    // round trip must lose and invent nothing, so one misplaced row in
    // the partitioned write fails the hash gate. Writes go to a
    // deterministic per-corpus scratch dir (mode=overwrite): rerunning
    // the gate or the two bench passes is idempotent.
    Q(
      "evt_partitioned_prune",
      """SELECT event_id, user_id, event_type,
        |       CAST(CAST(ts AS DATE) AS VARCHAR) AS day
        |FROM events
        |WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)
        |ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
      val scratch = graft.Scratch.dir("graft_evt_part", dir)
      // repartition ON the partition column first: without it every input
      // task writes a file into every day dir (tasks × days small files —
      // the classic partitioned-write mistake at scale); with it each day
      // lands in exactly one task → one file per day dir regardless of
      // input parallelism
      ev.select(col("event_id"), col("user_id"), col("event_type"), col("day"))
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(scratch)
      // get(0), not getDate(0): the value is java.sql.Date or
      // java.time.LocalDate depending on the session's java8API setting,
      // and lit() accepts both
      val minDay = ev.agg(min(col("day"))).first().get(0)
      s.read.parquet(scratch)
        .filter(col("day") === lit(minDay))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("day").cast("string").as("day"))
        .orderBy(col("event_id"))
    }
  )
}

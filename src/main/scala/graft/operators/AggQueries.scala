package graft.operators

import graft.{Exact, Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY.md §2.4): GROUP BY, global aggregates,
  * HAVING, DISTINCT, COUNT(DISTINCT), ROLLUP/CUBE, FILTER clause, grouped
  * expressions. Reference behavior: hand-rolled hash grouping over
  * in-memory rows (reference kv/KvQueryExecutor.java:3269-3624); here it is
  * `groupBy().agg()` so Catalyst does partial (map-side) aggregation before
  * the shuffle — the property that makes these queries scale to 100 TB.
  */
object AggQueries extends QueryPack {
  import Exact._

  val qs: Seq[Q] = Seq(
    // HAVING with full boolean structure (AND/OR over multiple aggregates)
    // — the reference supports exactly ONE bare comparison (SURVEY §7.5
    // defect 5, kv/KvQueryExecutor.java:3832-3984); Catalyst gives the
    // complete expression language post-aggregation.
    Q(
      "agg_having_complex",
      """SELECT o_custkey, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total,
        |       MAX(o_totalprice) AS biggest
        |FROM orders
        |GROUP BY o_custkey
        |HAVING (COUNT(*) >= 25 AND MAX(o_totalprice) > 400000)
        |    OR SUM(CAST(o_totalprice AS DECIMAL(28,6))) > 4500000
        |ORDER BY o_custkey""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(dec)).as("total_dec"),
          max(col("o_totalprice")).as("biggest"))
        .filter((col("cnt") >= 25 && col("biggest") > 400000) ||
          col("total_dec") > 4500000)
        .select(col("o_custkey"), col("cnt"),
          col("total_dec").cast("double").as("total"), col("biggest"))
        .orderBy(col("o_custkey"))
    },
    // TPC-H Q1 shape: the reference demo's flagship agg (demo-ecommerce.sh).
    Q(
      "q1_pricing_summary",
      // money totals through oSum2/dsum2 (cents-quantized before the
      // double cast): at sf1 this query's corpus-scale sums crossed the
      // 2^53 unscaled bound and DuckDB's double-rounded decimal→double
      // cast diverged from the JVM's by 1 ulp on sum_charge (see Exact)
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSum2("l_quantity")} AS sum_qty,
         |  ${oSum2("l_extendedprice")} AS sum_base_price,
         |  ${oSum2("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${oSum2("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${oAvg2("l_quantity")} AS avg_qty,
         |  ${oAvg2("l_extendedprice")} AS avg_price,
         |  ${oAvg2("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum2(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_base_price"),
          dsum2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum2(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg2(col("l_quantity")).as("avg_qty"),
          davg2(col("l_extendedprice")).as("avg_price"),
          davg2(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Global aggregate, no GROUP BY (reference: AGGREGATION type without keys).
    Q(
      "agg_global",
      s"""SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_cust,
         |  ${oSum2("o_totalprice")} AS total, MIN(o_orderdate) AS first_order,
         |  MAX(o_orderdate) AS last_order
         |FROM orders""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_cust"),
        dsum2(col("o_totalprice")).as("total"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"))
    },

    // HAVING over an aggregate (reference supports only one bare comparison,
    // kv/KvQueryExecutor.java:3832-3984; full expressions here).
    Q(
      "agg_having",
      s"""SELECT o_custkey, COUNT(*) AS n_orders, ${oSum("o_totalprice")} AS spend
         |FROM orders
         |GROUP BY o_custkey
         |HAVING COUNT(*) >= 15 AND ${oSum("o_totalprice")} > 1000000
         |ORDER BY o_custkey""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 15 && col("spend") > 1000000)
        .orderBy(col("o_custkey"))
    },

    // SELECT DISTINCT — parsed-but-ignored in the reference (§7.5 defect 3);
    // real here.
    Q(
      "agg_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // COUNT(DISTINCT …) + multiple distinct aggregates (absent in reference).
    Q(
      "agg_count_distinct",
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // GROUP BY an expression (year of date) — reference §2.4 "expressions in
    // select list".
    Q(
      "agg_group_by_expr",
      s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
         |  o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY order_year, o_orderstatus
         |ORDER BY order_year, o_orderstatus""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("order_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("order_year"), col("o_orderstatus"))
    },

    // ROLLUP — beyond-reference (absent there, free in Spark).
    Q(
      "agg_rollup",
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${oSum("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // CUBE — beyond-reference.
    Q(
      "agg_cube",
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         |FROM orders
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // Aggregate FILTER (WHERE …) clause — beyond-reference.
    Q(
      "agg_filter_clause",
      """SELECT o_orderstatus,
        |  COUNT(*) FILTER (WHERE o_totalprice > 250000) AS n_big,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(when(col("o_totalprice") > 250000, 1)).as("n_big"),
          count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    // Moment statistics via exact sums so both engines evaluate the same
    // closed-form double expression (see Exact scaladoc).
    Q(
      "agg_stats_moments",
      s"""SELECT l_returnflag,
         |  ${oSum("l_quantity")} AS s1,
         |  ${oSum("l_quantity * l_quantity")} AS s2,
         |  COUNT(l_quantity) AS n,
         |  (${oSum("l_quantity * l_quantity")} - ${oSum("l_quantity")} * ${oSum("l_quantity")} / COUNT(l_quantity)) / (COUNT(l_quantity) - 1) AS var_samp_exact
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      val s1 = dsum(col("l_quantity"))
      val s2 = dsum(col("l_quantity") * col("l_quantity"))
      val n  = count(col("l_quantity"))
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          s1.as("s1"), s2.as("s2"), n.as("n"),
          ((s2 - s1 * s1 / n) / (n - lit(1))).as("var_samp_exact"))
        .orderBy(col("l_returnflag"))
    },

    // MIN/MAX over strings + empty-group semantics: standard NULL (the
    // reference returns 0.0 on empty — §7.5 defect 4; we keep ANSI).
    Q(
      "agg_minmax_string",
      """SELECT c_mktsegment, MIN(c_name) AS first_name, MAX(c_name) AS last_name,
        |  MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          min(col("c_name")).as("first_name"),
          max(col("c_name")).as("last_name"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))
        .orderBy(col("c_mktsegment"))
    },

    // --- PG ordered-set / ordered-aggregate surface (beyond the
    // reference, which has no ordered aggregates at all). The Spark side
    // of the first two runs the PG spelling through PgRewrite — the gate
    // verifies the compatibility shim end-to-end, not just the operator.

    // string_agg with PG's aggregate-internal ORDER BY (what pg_dump
    // emits); PgRewrite lifts it to Spark's standard WITHIN GROUP form.
    Q(
      "agg_string_agg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
    ) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(graft.sqlfront.PgRewrite.rewrite(
        """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin))
    },

    // array_agg(x ORDER BY y): both rewrite paths — same-expression key
    // (sort_array) and a different key (struct sort + transform). The
    // arrays are joined to flat strings for the gate (the driver's pandas
    // harness cannot sort/hash array columns); element order is exactly
    // what the joined string pins down, so aggregate-internal ORDER BY is
    // still verified end-to-end.
    Q(
      "agg_array_agg_order",
      """SELECT r_name,
        |  array_to_string(array_agg(n_name ORDER BY n_name DESC), ',') AS nations_desc,
        |  array_to_string(array_agg(CAST(n_nationkey AS VARCHAR) ORDER BY n_name), ',') AS keys_by_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
    ) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(graft.sqlfront.PgRewrite.rewrite(
        """SELECT r_name,
          |  array_join(array_agg(n_name ORDER BY n_name DESC), ',') AS nations_desc,
          |  array_join(array_agg(CAST(n_nationkey AS STRING) ORDER BY n_name), ',') AS keys_by_name
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin))
    },

    // percentile_cont / percentile_disc WITHIN GROUP — Spark-native since
    // 3.4; interpolation (lo + (hi-lo)*frac) is bit-identical to DuckDB's
    // quantile_cont (verified empirically, incl. non-terminating
    // fractions). disc CAST to DOUBLE on both sides: Spark returns the
    // ordering column's type, DuckDB preserves the input type.
    Q(
      "agg_percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |  CAST(quantile_disc(l_quantity, 0.9) AS DOUBLE) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag,
          |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
          |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25_price,
          |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p90_qty
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // mode() WITHIN GROUP: Spark returns the FIRST most-frequent value in
    // the WITHIN GROUP order (deterministic); the oracle spells that
    // tie-break explicitly instead of trusting DuckDB's mode() tie choice.
    Q(
      "agg_mode",
      """WITH f AS (SELECT l_returnflag, l_quantity, count(*) AS c
        |           FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, l_quantity,
        |        row_number() OVER (PARTITION BY l_returnflag
        |                           ORDER BY c DESC, l_quantity) AS rn
        |      FROM f)
        |SELECT l_returnflag, l_quantity AS mode_qty FROM r WHERE rn = 1
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag, mode() WITHIN GROUP (ORDER BY l_quantity) AS mode_qty
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // bool_and / bool_or — PG names, Spark-native, dialect-identical.
    Q(
      "agg_bool",
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_totalprice > 400000) AS any_over_400k
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority,
          |  bool_and(o_totalprice > 1000) AS all_over_1k,
          |  bool_or(o_totalprice > 400000) AS any_over_400k
          |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // GROUPING() — distinguishes a rollup's summary row from a genuine
    // NULL group key (the reference's GROUP BY cannot express either;
    // SURVEY §2.4 cube/rollup family).
    Q(
      "agg_grouping_fn",
      """SELECT o_orderpriority, CAST(GROUPING(o_orderpriority) AS INT) AS g, count(*) AS cnt
        |FROM orders GROUP BY ROLLUP(o_orderpriority)
        |ORDER BY g, o_orderpriority""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .rollup(col("o_orderpriority"))
        .agg(grouping(col("o_orderpriority")).cast("int").as("g"),
          count(lit(1)).as("cnt"))
        .orderBy(col("g"), col("o_orderpriority"))
    },

    // HLL sketch count-distinct — THE 100 TB cardinality operator: a
    // fixed-size (2^12 bucket) mergeable sketch crosses the shuffle
    // instead of the distinct key set, so memory is O(1) per group where
    // COUNT(DISTINCT) is O(ndv). Sketches are deterministic for a given
    // input, but not engine-portable — the gate therefore checks the
    // ESTIMATE against the exact count within the sketch's error bound
    // (relative standard error 1.04/√2^12 ≈ 1.6%; 2% bound): the exact
    // column must hash-match, the bound flag must be true on both sides.
    Q(
      "agg_hll_distinct_bound",
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_partkey) AS exact_parts,
        |       true AS within_2pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("est"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("est") - col("exact_parts")) <=
            col("exact_parts") * 0.02).as("within_2pct"))
        .orderBy(col("l_returnflag"))
    },

    // HLL sketch MERGE — the property that makes sketches work on a
    // cluster: per-partition (here per-returnflag) sketches union into a
    // corpus sketch without rescanning, the daily-rollup shape (sketch
    // per day, union per month). Merged estimate must land within the
    // same error bound of the exact global count.
    Q(
      "agg_hll_merge_bound",
      """SELECT COUNT(DISTINCT l_partkey) AS exact_parts, true AS merged_within_2pct
        |FROM lineitem""".stripMargin
    ) { (s, dir) =>
      val per = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      val merged = per.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = Tables.load(s, dir, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      exact.crossJoin(broadcast(merged))
        .select(col("exact_parts"),
          (abs(col("est") - col("exact_parts")) <=
            col("exact_parts") * 0.02).as("merged_within_2pct"))
    },

    // Count-min sketch frequency bounds — the third essential sketch at
    // scale (heavy-hitter counting without a per-key hashmap). One
    // distributed count_min_sketch aggregate (per-partition sketches
    // merge commutatively, the cluster shape); the finished sketch is a
    // single bounded row, read back once and probed driver-side — the
    // same bounded-collect precedent as the 1-row dim probes. CMS
    // guarantees est >= exact always and est <= exact + eps*N with the
    // configured confidence; seed 42 makes both deterministic here.
    Q(
      "agg_cms_freq_bound",
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt,
        |       true AS ge_ok, true AS le_ok
        |FROM lineitem WHERE l_partkey <= 5
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin
    ) { (s, dir) =>
      val eps = 0.0001
      val li = Tables.load(s, dir, "lineitem")
      val skRow = li.agg(
        expr(s"count_min_sketch(l_partkey, ${eps}d, 0.99d, 42)").as("sk")).head()
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skRow.getAs[Array[Byte]](0)))
      val slack = math.ceil(eps * cms.totalCount()).toLong
      import s.implicits._
      val est = (0L to 5L).map(k => (k, cms.estimateCount(k)))
        .toDF("l_partkey", "est")
      li.filter(col("l_partkey") <= 5)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).cast("long").as("exact_cnt"))
        .join(broadcast(est), "l_partkey")
        .select(col("l_partkey"), col("exact_cnt"),
          (col("est") >= col("exact_cnt")).as("ge_ok"),
          (col("est") <= col("exact_cnt") + slack).as("le_ok"))
        .orderBy(col("l_partkey"))
    },

    // Approximate top-k (Misra-Gries frequent-items summary) — the
    // fourth essential sketch at scale: exact top-k needs a groupBy with
    // state linear in DISTINCT keys; the MG summary holds ≤ m counters
    // per partial aggregate at ANY key cardinality, merges map-side, and
    // guarantees every key with freq > N/(m+1) survives. Estimates are
    // arrival-order-dependent, so the gate asserts the three
    // order-independent theorems per exact-top-8 item — underestimate
    // (est ≤ exact), the error bound (est ≥ exact − N/(m+1), est = 0
    // when absent), and guaranteed containment of the heavy items — over
    // the character stream of the documents corpus (24 distinct chars,
    // m = 16 < 24 forces real decrement epochs; 7 chars clear the
    // containment threshold). The exact columns anchor the hash compare;
    // TopKSpec additionally pins an explicit two-summary merge.
    Q(
      "agg_approx_topk_bound",
      """WITH c AS (SELECT unnest(string_split(replace(text, ' ', ''), '')) AS ch
        |           FROM documents),
        |e AS (SELECT ch, CAST(count(*) AS BIGINT) AS exact_cnt FROM c GROUP BY ch)
        |SELECT ch, exact_cnt,
        |       true AS present_ok, true AS le_ok, true AS ge_ok
        |FROM e ORDER BY exact_cnt DESC, ch LIMIT 8""".stripMargin
    ) { (s, dir) =>
      val m = 16
      val chars = Tables.spread(Tables.load(s, dir, "documents"))
        .select(explode(split(regexp_replace(col("text"), " ", ""), "")).as("ch"))
        .filter(length(col("ch")) > 0)
      val n = chars.count()
      val slack = n.toDouble / (m + 1)
      val est = chars.agg(graft.functions.TopKAgg.topk(col("ch"), m).as("sk"))
        .select(explode(col("sk")).as(Seq("ch", "est")))
      chars.groupBy(col("ch"))
        .agg(count(lit(1)).cast("long").as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("ch")).limit(8)
        .join(broadcast(est), Seq("ch"), "left")
        .select(col("ch"), col("exact_cnt"),
          (col("exact_cnt") <= slack || col("est").isNotNull).as("present_ok"),
          (coalesce(col("est"), lit(0L)) <= col("exact_cnt")).as("le_ok"),
          (coalesce(col("est"), lit(0L)) >= col("exact_cnt") - slack).as("ge_ok"))
        .orderBy(col("exact_cnt").desc, col("ch"))
    },

    // Approximate percentiles (Greenwald-Khanna) — the other essential
    // sketch at scale: rank error ε = 1/accuracy, so the approximate
    // p-quantile must lie within the EXACT [p-ε, p+ε] quantile band.
    // The gate pins that containment per quantile; the count column
    // anchors the hash compare.
    Q(
      "agg_approx_quantile_bound",
      """SELECT COUNT(*) AS n, true AS p50_ok, true AS p90_ok, true AS p99_ok
        |FROM lineitem""".stripMargin
    ) { (s, dir) =>
      def ok(p: Double): org.apache.spark.sql.Column = {
        // accuracy 10000 → rank error ≤ n/10000, an order of magnitude
        // inside the ±0.001-quantile acceptance window at every fixture
        // SF (at accuracy 1000 the sf0.001 table's ±6-rank window sat
        // exactly on the sketch's error bound and p90/p99 failed)
        val eps = 0.001
        (expr(s"approx_percentile(l_extendedprice, $p, 10000)") >=
          expr(s"percentile(l_extendedprice, ${p - eps})")) &&
          (expr(s"approx_percentile(l_extendedprice, $p, 10000)") <=
            expr(s"percentile(l_extendedprice, ${p + eps})"))
      }
      Tables.load(s, dir, "lineitem")
        .agg(count(lit(1)).as("n"), ok(0.5).as("p50_ok"),
          ok(0.9).as("p90_ok"), ok(0.99).as("p99_ok"))
    },

    // Bivariate statistics: corr / covar_pop / regr_slope per group —
    // the feature-engineering profile pass. Native corr()/covar_pop()
    // fold doubles in partition order (non-deterministic across
    // engines AND runs), so both sides compute the five decimal-exact
    // moment sums first and derive the statistics from identical
    // doubles. One partial-agg groupBy, corpus-linear.
    Q(
      "agg_corr_regr",
      s"""WITH m AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    ${Exact.oSum("l_quantity")} / COUNT(*) AS mx,
         |    ${Exact.oSum("l_extendedprice")} / COUNT(*) AS my,
         |    ${Exact.oSum("l_quantity * l_extendedprice")} / COUNT(*) AS mxy,
         |    ${Exact.oSum("l_quantity * l_quantity")} / COUNT(*) AS mxx,
         |    ${Exact.oSum("l_extendedprice * l_extendedprice")} / COUNT(*) AS myy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  CAST(CAST(mxy - mx * my AS DECIMAL(24,8)) AS DOUBLE) AS covar_pop,
         |  CAST(CAST((mxy - mx * my) / sqrt((mxx - mx * mx) * (myy - my * my))
         |       AS DECIMAL(20,12)) AS DOUBLE) AS corr,
         |  CAST(CAST((mxy - mx * my) / (mxx - mx * mx)
         |       AS DECIMAL(24,8)) AS DOUBLE) AS regr_slope
         |FROM m ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      val x = col("l_quantity"); val y = col("l_extendedprice")
      val nC = count(lit(1))
      val mx = Exact.dsum(x) / nC; val my = Exact.dsum(y) / nC
      val mxy = Exact.dsum(x * y) / nC
      val mxx = Exact.dsum(x * x) / nC; val myy = Exact.dsum(y * y) / nC
      val cov = mxy - mx * my
      // outputs quantize through decimal (8/12 frac digits) purely for
      // the cross-engine hash: the double→decimal cast of the SQUARED
      // moment sums can differ in the 17th significant digit between
      // engines, which survives into the last ulp of corr.
      def q(c: org.apache.spark.sql.Column, t: String) =
        c.cast(t).cast("double")
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(nC.as("n"), q(cov, "decimal(24,8)").as("covar_pop"),
          q(cov / sqrt((mxx - mx * mx) * (myy - my * my)),
            "decimal(20,12)").as("corr"),
          q(cov / (mxx - mx * mx), "decimal(24,8)").as("regr_slope"))
        .orderBy(col("l_returnflag"))
    }
  )
}

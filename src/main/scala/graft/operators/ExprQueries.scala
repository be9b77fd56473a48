package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Scalar expression surface (SURVEY.md §2.9): arithmetic, CASE, concat,
  * math/date-time/string function libraries, CAST, COALESCE, JSON access,
  * literal SELECT. The reference evaluates these with a recursive
  * interpreter over `Map<String,Object>` rows coercing everything through
  * double/toString (reference kv/CalciteSqlParser.java:536-696); here every
  * expression is a Catalyst `Column` that stays inside whole-stage codegen.
  * Semantics are ANSI/Spark-standard, not the reference's double-coercion
  * (SURVEY §1.3 caution) — the DuckDB oracle agrees with the standard.
  *
  * Float discipline: per-row double ops (+,*,sqrt,…) are IEEE-exact and
  * identical across engines; libm transcendentals (exp/ln/sin) are NOT
  * correctly-rounded, so those are quantized via FLOOR(x*1e6) and kept to
  * low-cardinality inputs.
  */
object ExprQueries extends QueryPack {

  val qs: Seq[Q] = Seq(
    // Arithmetic + - * / % (reference: always-double, kv/CalciteSqlParser.java:627-652).
    Q(
      "expr_arithmetic",
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity + l_tax AS add_d,
        |  l_extendedprice - l_discount AS sub_d,
        |  l_extendedprice * (1 - l_discount) AS mul_d,
        |  l_extendedprice / l_quantity AS div_d,
        |  l_orderkey % 7 AS mod_i,
        |  -l_quantity AS neg_d
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") + col("l_tax")).as("add_d"),
          (col("l_extendedprice") - col("l_discount")).as("sub_d"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("mul_d"),
          (col("l_extendedprice") / col("l_quantity")).as("div_d"),
          (col("l_orderkey") % 7).as("mod_i"),
          (-col("l_quantity")).as("neg_d"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // CASE — searched and simple forms (reference kv/CalciteSqlParser.java:698-811).
    Q(
      "expr_case",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 400000 THEN 'high'
        |       WHEN o_totalprice > 200000 THEN 'mid'
        |       ELSE 'low' END AS price_band,
        |  CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled'
        |       ELSE 'other' END AS status_name
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 400000, "high")
            .when(col("o_totalprice") > 200000, "mid")
            .otherwise("low").as("price_band"),
          when(col("o_orderstatus") === "O", "open")
            .when(col("o_orderstatus") === "F", "filled")
            .otherwise("other").as("status_name"))
        .orderBy(col("o_orderkey"))
    },

    // String concatenation `||` / CONCAT (reference kv/CalciteSqlParser.java:613-624).
    Q(
      "expr_concat",
      """SELECT c_custkey,
        |  c_name || ' [' || c_mktsegment || ']' AS tagged,
        |  CONCAT(c_mktsegment, '-', CAST(c_nationkey AS VARCHAR)) AS seg_nation
        |FROM customer WHERE c_custkey < 100
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select(
          col("c_custkey"),
          concat(col("c_name"), lit(" ["), col("c_mktsegment"), lit("]")).as("tagged"),
          concat(col("c_mktsegment"), lit("-"), col("c_nationkey").cast("string")).as("seg_nation"))
        .orderBy(col("c_custkey"))
    },

    // Exactly-rounded math built-ins over full table (IEEE-identical across
    // engines): abs, ceil, floor, sqrt, power with integral exponent, sign.
    // Reference math library: kv/MathFunctions.java:20-341 (never wired to SQL).
    Q(
      "expr_math_exact",
      """SELECT p_partkey,
        |  ABS(p_retailprice - 950) AS abs_v,
        |  CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_v,
        |  CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_v,
        |  SQRT(p_retailprice) AS sqrt_v,
        |  p_retailprice * p_retailprice AS pow2_v,
        |  CAST(SIGN(p_retailprice - 950) AS DOUBLE) AS sign_v,
        |  p_size % 7 AS mod_v
        |FROM part WHERE p_partkey < 300
        |ORDER BY p_partkey""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "part")
        .filter(col("p_partkey") < 300)
        .select(
          col("p_partkey"),
          abs(col("p_retailprice") - 950).as("abs_v"),
          ceil(col("p_retailprice")).cast("bigint").as("ceil_v"),
          floor(col("p_retailprice")).cast("bigint").as("floor_v"),
          sqrt(col("p_retailprice")).as("sqrt_v"),
          (col("p_retailprice") * col("p_retailprice")).as("pow2_v"),
          signum(col("p_retailprice") - 950).as("sign_v"),
          (col("p_size") % 7).as("mod_v"))
        .orderBy(col("p_partkey"))
    },

    // Transcendental math (exp/ln/log10/sin/cos/atan2/radians), quantized via
    // FLOOR(x*1e6) because libm results differ in the last ulp across engines;
    // kept to the 25-row nation table so boundary collisions are negligible.
    Q(
      "expr_math_transcendental",
      """SELECT n_nationkey,
        |  CAST(FLOOR(EXP(n_nationkey * 0.1) * 1000000) AS BIGINT) AS exp_q,
        |  CAST(FLOOR(LN(n_nationkey + 1) * 1000000) AS BIGINT) AS ln_q,
        |  CAST(FLOOR(LOG10(n_nationkey + 1) * 1000000) AS BIGINT) AS log10_q,
        |  CAST(FLOOR(SIN(n_nationkey) * 1000000) AS BIGINT) AS sin_q,
        |  CAST(FLOOR(COS(n_nationkey) * 1000000) AS BIGINT) AS cos_q,
        |  CAST(FLOOR(ATAN2(n_nationkey, 10) * 1000000) AS BIGINT) AS atan2_q,
        |  CAST(FLOOR(RADIANS(n_nationkey * 10) * 1000000) AS BIGINT) AS radians_q
        |FROM nation ORDER BY n_nationkey""".stripMargin
    ) { (s, dir) =>
      def q6(c: org.apache.spark.sql.Column) = floor(c * 1000000).cast("bigint")
      Tables.load(s, dir, "nation")
        .select(
          col("n_nationkey"),
          q6(exp(col("n_nationkey") * 0.1)).as("exp_q"),
          q6(log(col("n_nationkey") + 1)).as("ln_q"),
          q6(log10(col("n_nationkey") + 1)).as("log10_q"),
          q6(sin(col("n_nationkey"))).as("sin_q"),
          q6(cos(col("n_nationkey"))).as("cos_q"),
          q6(atan2(col("n_nationkey").cast("double"), lit(10.0))).as("atan2_q"),
          q6(radians(col("n_nationkey") * 10)).as("radians_q"))
        .orderBy(col("n_nationkey"))
    },

    // Date/time functions (reference kv/DateTimeFunctions.java:22-360, never
    // wired to SQL; wired here): EXTRACT, date_trunc, interval arithmetic,
    // diffs, formatting.
    Q(
      "expr_datetime",
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS plus_30d,
        |  CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym,
        |  date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
        |FROM orders WHERE o_orderkey < 300
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 300)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus_30d"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          datediff(col("o_orderdate").cast("date"),
            lit(java.sql.Date.valueOf("1995-01-01"))).cast("bigint")
            .as("days_since_epoch_start"))
        .orderBy(col("o_orderkey"))
    },

    // CAST surface (reference lacks CAST entirely — docs/SQL_GRAMMAR.md:707).
    // DuckDB rounds double→int while Spark truncates, so the oracle spells
    // the truncation explicitly with TRUNC.
    Q(
      "expr_cast",
      """SELECT o_orderkey,
        |  CAST(TRUNC(o_totalprice) AS BIGINT) AS price_long,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(o_orderkey AS DOUBLE) AS key_dbl,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_str,
        |  CAST(o_orderdate AS DATE) AS order_date
        |FROM orders WHERE o_orderkey < 200
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 200)
        .select(
          col("o_orderkey"),
          col("o_totalprice").cast("bigint").as("price_long"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_orderkey").cast("double").as("key_dbl"),
          col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_dec_str"),
          col("o_orderdate").cast("date").as("order_date"))
        .orderBy(col("o_orderkey"))
    },

    // COALESCE / NULLIF (reference kv/CalciteSqlParser.java:673-674,829-837).
    Q(
      "expr_coalesce",
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_sentinel,
        |  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_sentinel"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // String function library (parity-plus; absent in reference §2.9).
    Q(
      "expr_string_funcs",
      """SELECT c_custkey,
        |  UPPER(c_mktsegment) AS up,
        |  LOWER(c_name) AS lo,
        |  CAST(LENGTH(c_name) AS INT) AS len,
        |  SUBSTRING(c_name, 1, 8) AS sub,
        |  TRIM(c_name, 'C') AS trimmed,
        |  REPLACE(c_name, 'Customer', 'Cust') AS repl,
        |  LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  REVERSE(c_mktsegment) AS rev,
        |  CAST(STRPOS(c_name, '#') AS INT) AS pos
        |FROM customer WHERE c_custkey < 100
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("up"),
          lower(col("c_name")).as("lo"),
          length(col("c_name")).as("len"),
          substring(col("c_name"), 1, 8).as("sub"),
          expr("TRIM('C' FROM c_name)").as("trimmed"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          reverse(col("c_mktsegment")).as("rev"),
          instr(col("c_name"), "#").cast("int").as("pos"))
        .orderBy(col("c_custkey"))
    },

    // JSON access — the reference's ->/->> operators over JSONB text columns
    // (kv/KvQueryExecutor.java:3159-3211, kv/JsonHelper.java:67-160) map to
    // get_json_object; events.props is {"k": <int>}.
    Q(
      "expr_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  json_extract_string(props, '$.missing') AS missing_null
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INT) > 90
        |  AND event_id < 2000
        |ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "events")
        .filter(
          get_json_object(col("props"), "$.k").cast("int") > 90 &&
          col("event_id") < 2000)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          get_json_object(col("props"), "$.missing").as("missing_null"))
        .orderBy(col("event_id"))
    },

    // Literal SELECT with no FROM (reference kv/KvQueryExecutor.java:830-954).
    Q(
      "expr_literal_select",
      "SELECT 1 AS one, 'x' AS s, 1 + 1 AS two, CAST(2.5 AS DOUBLE) AS d, TRUE AS b"
    ) { (s, _) =>
      s.sql("SELECT 1 AS one, 'x' AS s, 1 + 1 AS two, CAST(2.5 AS DOUBLE) AS d, TRUE AS b")
    },

    // IS DISTINCT FROM — null-safe inequality (PG/ANSI; the reference's
    // comparison model treats NULL as absent, SURVEY §2.2). NULL rows
    // produced by nullif MUST survive the predicate (plain <> would drop
    // them) — that asymmetry is what the gate checks.
    Q(
      "expr_distinct_from",
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
        |FROM orders
        |WHERE nullif(o_orderstatus, 'P') IS DISTINCT FROM 'O' AND o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      val st = expr("nullif(o_orderstatus, 'P')")
      Tables.load(s, dir, "orders")
        .filter(!(st <=> lit("O")) && col("o_orderkey") < 2000)
        .select(col("o_orderkey"), st.as("st"))
        .orderBy(col("o_orderkey"))
    }
  )
}

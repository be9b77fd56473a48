package graft.operators

import graft.{Q, QueryPack, Tables}

/** Modern SQL-surface features beyond the reference's grammar — recursive
  * CTEs, LATERAL correlated derived tables, PIVOT — all free through
  * spark.sql (Spark 4.x) and therefore part of this engine's surface.
  * DuckDB shares recursive/LATERAL syntax; PIVOT's oracle is the
  * equivalent conditional aggregation.
  */
object SqlSurfaceQueries extends QueryPack {

  private def make(name: String, sparkSql: String, oracleSql: String): Q =
    Q(name, oracleSql) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(sparkSql)
    }

  private def same(name: String, text: String): Q = make(name, text, text)

  /** PG-only spellings (DISTINCT ON, FETCH FIRST, generate_series) route
    * through the GraftSession front — the same path a reference client's
    * statement takes (PgRewrite, then spark.sql) — while DuckDB parses
    * the identical text natively, so one string is both query and oracle. */
  private def pg(name: String, text: String): Q = pg2(name, text, text)

  // One read-only session per SparkSession: these queries only SELECT
  // over the fixture temp views, so the (catalog-init) construction cost
  // is paid once, not once per gate query.
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession,
      graft.sqlfront.GraftSession]()

  /** PG spelling through the session front, distinct DuckDB oracle text
    * (for forms where DuckDB's syntax or semantics differ from PG's). */
  private def pg2(name: String, pgSql: String, oracleSql: String): Q =
    Q(name, oracleSql) { (s, dir) =>
      Tables.registerAll(s, dir)
      sessions.computeIfAbsent(s, k => new graft.sqlfront.GraftSession(
        k, java.nio.file.Files.createTempDirectory("graft_sql"))).sql(pgSql)
    }

  val qs: Seq[Q] = Seq(
    // Recursive CTE (absent from the reference; CTEs not implemented at
    // all there, SURVEY §2.8).
    same(
      "sql_recursive_cte",
      """WITH RECURSIVE fib(i, a, b) AS (
        |  SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        |  UNION ALL
        |  SELECT i + 1, b, a + b FROM fib WHERE i < 40
        |)
        |SELECT i, a AS fib_i FROM fib ORDER BY i""".stripMargin),

    // LATERAL correlated derived table: per-region top customer balance.
    same(
      "sql_lateral",
      """SELECT r.r_name, t.top_bal
        |FROM region r,
        |LATERAL (SELECT MAX(c_acctbal) AS top_bal
        |         FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |         WHERE n.n_regionkey = r.r_regionkey) t
        |ORDER BY r.r_name""".stripMargin),

    // PIVOT: order counts by priority x status; the oracle spells it as
    // conditional aggregation (engine-portable semantics).
    make(
      "sql_pivot",
      """SELECT * FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
        |PIVOT (COUNT(*) FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p))
        |ORDER BY o_orderpriority""".stripMargin,
      """SELECT o_orderpriority,
        |       COUNT(*) FILTER (o_orderstatus = 'O') AS o,
        |       COUNT(*) FILTER (o_orderstatus = 'F') AS f,
        |       COUNT(*) FILTER (o_orderstatus = 'P') AS p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    // UNPIVOT: wide metric columns → long (metric, value) rows — the
    // inverse of PIVOT and the standard shape for feeding per-metric
    // dashboards from a wide aggregate. Both engines parse the
    // SQL-standard UNPIVOT clause; decimal-exact sums keep the doubles
    // bit-identical. Scale shape: one partial-agg groupBy then a
    // per-row expand (no shuffle beyond the agg).
    same(
      "sql_unpivot",
      """WITH m AS (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
        |         CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, val
        |FROM m UNPIVOT (val FOR metric IN (sum_qty, sum_price, sum_disc))
        |ORDER BY l_returnflag, metric""".stripMargin),

    // PG DISTINCT ON — the latest-per-key idiom (top customer balance per
    // nation). PgRewrite turns it into a row_number window; DuckDB parses
    // the PG form natively, so the oracle is the same text.
    pg(
      "sql_distinct_on",
      """SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
        |FROM customer
        |ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin),

    // ANSI/PG row-limit spelling: OFFSET n ROWS FETCH FIRST m ROWS ONLY
    // → LIMIT m OFFSET n (PgRewrite swaps the clauses for Spark's
    // grammar; DuckDB parses the standard form natively).
    pg(
      "sql_fetch_first",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |OFFSET 5 ROWS FETCH FIRST 10 ROWS ONLY""".stripMargin),

    // PG SIMILAR TO (SQL-regex) — rewritten to anchored RLIKE. DuckDB's
    // SIMILAR TO is plain-regex (not PG semantics), so the oracle spells
    // the equivalent regexp_full_match directly.
    pg2(
      "sql_similar_to",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name SIMILAR TO '%(gear|bolt)'
        |ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey, p_name FROM part
        |WHERE regexp_full_match(p_name, '.*(gear|bolt)')
        |ORDER BY p_partkey""".stripMargin),

    // PG set-returning generate_series in FROM → explode(sequence());
    // joined against a fact table (orderkey mod-7 histogram) so the
    // rewrite proves out as a real relation, not just a SELECT source.
    // PG quantified comparisons + ARRAY constructor — the JDBC setArray
    // idiom (`x = ANY(?)`) over an array literal AND a subquery in one
    // predicate; PgRewrite maps them to array_contains / IN. DuckDB
    // parses the PG forms natively.
    pg(
      "sql_any_quantifier",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment = ANY(ARRAY['BUILDING', 'MACHINERY'])
        |  AND c_custkey = ANY(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    pg(
      "sql_generate_series",
      """SELECT CAST(g.n AS BIGINT) AS n, count(o.o_orderkey) AS cnt
        |FROM generate_series(1, 7) AS g(n)
        |LEFT JOIN orders o ON o.o_orderkey % 7 + 1 = g.n
        |GROUP BY g.n
        |ORDER BY n""".stripMargin),

    // Named WINDOW clause — Spark and DuckDB both parse the standard
    // form natively (the reference grammar has no windows at all), so
    // one text serves both; two windows share partitioning work.
    same(
      "sql_window_clause",
      """SELECT c_custkey,
        |       row_number() OVER wn AS rn,
        |       count(*) OVER wnat AS nat_cnt
        |FROM customer
        |WHERE c_custkey < 500
        |WINDOW wn AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
        |       wnat AS (PARTITION BY c_nationkey)
        |ORDER BY c_custkey""".stripMargin),

    // PG set-returning unnest in SELECT position over string_to_array —
    // the tokenize-and-flatten idiom; PgRewrite maps to explode(split).
    // Duplicate (doc_id, tok) rows are identical values, so the total
    // ORDER BY yields a deterministic row sequence.
    pg2(
      "sql_unnest_tokens",
      """SELECT doc_id, unnest(string_to_array(text, ' ')) AS tok
        |FROM documents WHERE doc_id < 5
        |ORDER BY doc_id, tok""".stripMargin,
      """SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |FROM documents WHERE doc_id < 5
        |ORDER BY doc_id, tok""".stripMargin),

    // unnest WITH ORDINALITY (FROM position) → posexplode subquery with
    // a 1-based ordinal; DuckDB has no ORDINALITY, so the oracle pairs
    // unnest with generate_subscripts.
    pg2(
      "sql_unnest_ordinality",
      """SELECT t.v, t.o
        |FROM unnest(string_to_array('gamma alpha beta', ' '))
        |     WITH ORDINALITY AS t(v, o)
        |ORDER BY t.o""".stripMargin,
      """SELECT v, CAST(o AS INT) AS o
        |FROM (SELECT unnest(string_split('gamma alpha beta', ' ')) AS v,
        |             generate_subscripts(string_split('gamma alpha beta', ' '), 1) AS o)
        |ORDER BY o""".stripMargin),

    // PG string-function forms: POSITION(x IN y) / substring FROM-FOR /
    // TRIM(BOTH … FROM …) are Spark-native; the regex substring and
    // strpos go through PgRewrite. DuckDB lacks the regex-substring
    // form, so the oracle spells regexp_extract directly.
    pg2(
      "sql_pg_string_fns",
      """SELECT doc_id,
        |       CAST(position('table' IN text) AS INT) AS pos_tbl,
        |       substring(text FROM 1 FOR 10) AS head10,
        |       substring(text FROM '[a-z]+') AS first_word,
        |       CAST(strpos(text, 'agg') AS INT) AS pos_agg,
        |       split_part(text, ' ', 3) AS tok3,
        |       trim(BOTH 'ke' FROM split_part(text, ' ', 1)) AS trimmed
        |FROM documents WHERE doc_id < 50
        |ORDER BY doc_id""".stripMargin,
      """SELECT doc_id,
        |       CAST(position('table' IN text) AS INT) AS pos_tbl,
        |       substring(text FROM 1 FOR 10) AS head10,
        |       regexp_extract(text, '[a-z]+', 0) AS first_word,
        |       CAST(strpos(text, 'agg') AS INT) AS pos_agg,
        |       split_part(text, ' ', 3) AS tok3,
        |       trim(BOTH 'ke' FROM split_part(text, ' ', 1)) AS trimmed
        |FROM documents WHERE doc_id < 50
        |ORDER BY doc_id""".stripMargin),

    // PG to_char datetime formatting + epoch extraction over events —
    // PgRewrite maps to date_format / unix_micros; DuckDB spells them
    // strftime / epoch. (events.ts is registered micros-precise on the
    // Spark side; the oracle casts the raw nanos column the same way.)
    pg2(
      "sql_to_char_epoch",
      """SELECT event_id,
        |       to_char(ts, 'YYYY-MM-DD HH24:MI:SS') AS fmt,
        |       extract(epoch FROM ts) AS ep
        |FROM events WHERE event_id < 200
        |ORDER BY event_id""".stripMargin,
      """SELECT event_id,
        |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS fmt,
        |       extract(epoch FROM CAST(ts AS TIMESTAMP)) AS ep
        |FROM events WHERE event_id < 200
        |ORDER BY event_id""".stripMargin),

    // PG FILTER on a window aggregate (Spark lacks it; PgRewrite folds
    // the predicate into a CASE inside the aggregate) + a locking clause
    // peeled as a no-op. DuckDB parses both PG forms natively.
    pg2(
      "sql_window_filter",
      """SELECT o_orderkey, o_custkey,
        |       count(*) FILTER (WHERE o_orderstatus = 'F')
        |         OVER (PARTITION BY o_custkey) AS n_finished
        |FROM orders WHERE o_orderkey < 600
        |ORDER BY o_orderkey
        |FOR UPDATE""".stripMargin,
      """SELECT o_orderkey, o_custkey,
        |       count(*) FILTER (WHERE o_orderstatus = 'F')
        |         OVER (PARTITION BY o_custkey) AS n_finished
        |FROM orders WHERE o_orderkey < 600
        |ORDER BY o_orderkey""".stripMargin)
  )
}

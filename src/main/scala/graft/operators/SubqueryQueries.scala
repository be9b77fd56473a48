package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Subquery surface (SURVEY.md §2.8).
  *
  * The reference executes subqueries by TEXTUAL REWRITE: run the inner
  * query, splice its result back into the outer SQL string as literals,
  * re-parse, re-execute (reference SubqueryExecutor.java:185-260);
  * correlated subqueries become a per-outer-row nested loop of string
  * substitutions (CorrelatedSubqueryExecutor.java:243-420 — §7.5 defect
  * 7: injection-prone, breaks on nesting). Here the whole class is
  * `spark.sql` over registered views: Catalyst rewrites IN/EXISTS to
  * semi/anti joins (RewritePredicateSubquery) and decorrelates correlated
  * subqueries (DecorrelateInnerQuery) into joins — one distributed plan,
  * no per-row re-execution. CTEs (not implemented in the reference,
  * §2.8) come free.
  *
  * These queries deliberately use the SQL entry point rather than the
  * DataFrame API: subqueries ARE a SQL-surface feature, and the oracle
  * text doubles as the Spark text (both ANSI).
  */
object SubqueryQueries extends QueryPack {

  private def sql(s: org.apache.spark.sql.SparkSession, dir: String, text: String) = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  /** Queries whose Spark text and DuckDB oracle text are identical ANSI SQL. */
  private def both(name: String, text: String): Q =
    Q(name, text)((s, dir) => sql(s, dir, text))

  val qs: Seq[Q] = Seq(
    // Uncorrelated IN (reference SubqueryExecutor.java:35-83 rewrites to a
    // literal list; Catalyst plans a left-semi join).
    both(
      "sub_in_uncorrelated",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
        |  AND o_orderkey < 20000
        |ORDER BY o_orderkey""".stripMargin),

    // Uncorrelated NOT IN — null-aware anti join in Spark (the hard case
    // the reference's literal-list rewrite gets wrong when NULLs appear).
    both(
      "sub_not_in",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
        |  AND c_custkey < 300
        |ORDER BY c_custkey""".stripMargin),

    // Correlated EXISTS (reference CorrelatedSubqueryExecutor.java:36-57
    // nested loop; Catalyst decorrelates to a semi join).
    both(
      "sub_exists_correlated",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |  AND c_custkey < 400
        |ORDER BY c_custkey""".stripMargin),

    // Correlated NOT EXISTS → anti join.
    both(
      "sub_not_exists_correlated",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        |                    AND o.o_totalprice > 250000)
        |  AND c_custkey < 500
        |ORDER BY c_custkey""".stripMargin),

    // Uncorrelated scalar subquery in WHERE (reference
    // SubqueryExecutor.java:324-384 splices the scalar as a literal).
    // MAX is exact on doubles, so the threshold is bit-identical on both
    // engines.
    both(
      "sub_scalar_where",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.97
        |ORDER BY o_orderkey""".stripMargin),

    // Correlated scalar subquery in the SELECT list (reference
    // SelectListSubqueryExecutor.java:30-354 runs it once per row).
    both(
      "sub_scalar_select",
      """SELECT c_custkey,
        |       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS order_cnt
        |FROM customer c
        |WHERE c_custkey < 300
        |ORDER BY c_custkey""".stripMargin),

    // Derived table in FROM (reference kv/KvQueryExecutor.java:5577-6200
    // holds inner rows in memory; Catalyst just nests the plan).
    both(
      "sub_derived_table",
      """SELECT t.o_custkey, t.cnt, t.total
        |FROM (SELECT o_custkey,
        |             COUNT(*) AS cnt,
        |             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        |      FROM orders GROUP BY o_custkey) t
        |WHERE t.cnt >= 20
        |ORDER BY t.o_custkey""".stripMargin),

    // CTE — not implemented in the reference (SURVEY §2.8); free in Spark.
    // Two CTEs, the second referencing the first.
    both(
      "sub_cte_chain",
      """WITH big_orders AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000
        |), per_cust AS (
        |  SELECT o_custkey, COUNT(*) AS big_cnt FROM big_orders GROUP BY o_custkey
        |)
        |SELECT p.o_custkey, p.big_cnt, c.c_mktsegment
        |FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
        |WHERE p.big_cnt >= 3
        |ORDER BY p.o_custkey""".stripMargin),

    // Correlated AGGREGATE subquery in WHERE (TPC-H Q2 shape): each row
    // compared to a per-group aggregate computed over the same table -
    // Catalyst decorrelates to an aggregate + join; the reference would
    // re-run the inner query per outer row.
    both(
      "sub_correlated_agg",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem l1
        |WHERE l_extendedprice = (SELECT MAX(l_extendedprice) FROM lineitem l2
        |                         WHERE l2.l_orderkey = l1.l_orderkey)
        |  AND l_orderkey < 12000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // IN + correlated conjunct mixing both rewrite classes.
    both(
      "sub_in_nested",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |    AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 3))
        |  AND l_orderkey < 30000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // View layered on a view (reference ViewMetadata re-execution,
    // kv/KvQueryExecutor.java:4740-4768) — temp views + spark.sql; the
    // oracle expresses the same two layers as CTEs.
    Q(
      "view_over_view",
      """WITH v_high_bal AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer WHERE c_acctbal > 5000
        |), v_by_nation AS (
        |  SELECT c_nationkey, COUNT(*) AS cust_cnt FROM v_high_bal GROUP BY c_nationkey
        |)
        |SELECT c_nationkey, cust_cnt FROM v_by_nation WHERE cust_cnt > 10
        |ORDER BY c_nationkey""".stripMargin
    ) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("CREATE OR REPLACE TEMP VIEW v_high_bal AS " +
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer WHERE c_acctbal > 5000")
      s.sql("CREATE OR REPLACE TEMP VIEW v_by_nation AS " +
        "SELECT c_nationkey, COUNT(*) AS cust_cnt FROM v_high_bal GROUP BY c_nationkey")
      s.sql("SELECT c_nationkey, cust_cnt FROM v_by_nation WHERE cust_cnt > 10 " +
        "ORDER BY c_nationkey")
    }
  )
}

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
        |ORDER BY o_orderpriority""".stripMargin)
  )
}

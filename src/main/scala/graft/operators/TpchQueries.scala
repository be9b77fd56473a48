package graft.operators

import graft.{Exact, Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Additional TPC-H-shaped workload queries over the star schema —
  * realistic multi-join/agg plans that exercise the optimizer paths the
  * single-operator queries don't: star joins with multiple broadcast
  * dims, filter-heavy scans with date predicates, conditional aggregation,
  * large-group HAVING, disjunctive multi-column predicates.
  * (The reference cannot run any of these beyond 100k scanned rows —
  * SURVEY §6; they define our bench headline set together with q1/q3/q5.)
  */
object TpchQueries extends QueryPack {

  val qs: Seq[Q] = Seq(
    // Q6-shape: forecasting revenue — pure scan+filter+agg, the pushdown
    // benchmark. All predicates reach the parquet scan.
    Q(
      "q6_forecast_revenue",
      s"""SELECT ${Exact.oSum("l_extendedprice * l_discount")} AS revenue,
         |       COUNT(*) AS cnt
         |FROM lineitem
         |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-07-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(Exact.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("cnt"))
    },

    // Q10-shape: returned-item reporting — 4-way join, group on customer,
    // top 20 by revenue. customer/nation broadcast; lineitem-orders
    // shuffle join on orderkey.
    Q(
      "q10_returned_items",
      s"""SELECT c.c_custkey, c.c_name, n.n_name,
         |       ${Exact.oSum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |GROUP BY c.c_custkey, c.c_name, n.n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = Tables.load(s, dir, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q12-shape: shipping-priority distribution — join + conditional
    // (CASE-based) aggregation into two buckets.
    Q(
      "q12_priority_shipping",
      """SELECT l.l_linestatus,
        |       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
        |GROUP BY l.l_linestatus
        |ORDER BY l.l_linestatus""".stripMargin
    ) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1).otherwise(0)).as("high_line_count"),
          sum(when(!high, 1).otherwise(0)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // Q14-shape: promo revenue share — join to part, ratio of conditional
    // to total aggregate in one pass.
    Q(
      "q14_promo_share",
      s"""SELECT ${Exact.oSum("CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
         |       / ${Exact.oSum("l.l_extendedprice * (1 - l.l_discount)")} * 100.0 AS promo_share
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin
    ) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg((Exact.dsum(when(col("p_type").like("PROMO%"), rev).otherwise(0.0)) /
          Exact.dsum(rev) * 100.0).as("promo_share"))
    },

    // Q18-shape: large-volume customers — HAVING over a big group-by used
    // as a semi-filter on the fact table.
    Q(
      "q18_large_orders",
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, t.total_qty
        |FROM orders o
        |JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 180) t
        |  ON o.o_orderkey = t.l_orderkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey
        |LIMIT 50""".stripMargin
    ) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val big = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast(Exact.dec)).as("q"))
        .filter(col("q") > 180)
        .select(col("l_orderkey"), col("q").cast("double").as("total_qty"))
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    },

    // Q19-shape: disjunctive multi-column predicate over a join — the
    // OR-of-ANDs pattern that tests predicate normalization/pushdown.
    Q(
      "q19_disjunctive_filter",
      s"""SELECT ${Exact.oSum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
         |       COUNT(*) AS cnt
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
         |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
         |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin
    ) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      val pred =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 5) && col("l_quantity").between(20, 30))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(pred)
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("cnt"))
    },

    // Grouping sets — finer than cube/rollup (already covered): explicit
    // set list over two dimensions plus grand total.
    Q(
      "agg_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    }
  )
}

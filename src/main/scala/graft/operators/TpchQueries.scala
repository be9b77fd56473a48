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

  /** Dialect-identical ANSI text run verbatim on both engines (the
    * subquery-heavy TPC-H shapes need no hints — Catalyst decorrelates
    * and AQE broadcasts the small sides). */
  private def both(name: String, text: String): Q =
    Q(name, text) { (s, dir) => Tables.registerAll(s, dir); s.sql(text) }

  val qs: Seq[Q] = Seq(
    // Q6-shape: forecasting revenue — pure scan+filter+agg, the pushdown
    // benchmark. All predicates reach the parquet scan.
    Q(
      "q6_forecast_revenue",
      s"""SELECT ${Exact.oSum2("l_extendedprice * l_discount")} AS revenue,
         |       COUNT(*) AS cnt
         |FROM lineitem
         |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-07-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(Exact.dsum2(col("l_extendedprice") * col("l_discount")).as("revenue"),
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
      s"""SELECT ${Exact.oSum2("CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
         |       / ${Exact.oSum2("l.l_extendedprice * (1 - l.l_discount)")} * 100.0 AS promo_share
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin
    ) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg((Exact.dsum2(when(col("p_type").like("PROMO%"), rev).otherwise(0.0)) /
          Exact.dsum2(rev) * 100.0).as("promo_share"))
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
      s"""SELECT ${Exact.oSum2("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
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
        .agg(Exact.dsum2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("cnt"))
    },

    // Q4-shape: order-priority checking — EXISTS semi-join against the
    // fact table under a date-range scan filter. (The fixture has no
    // l_commitdate/l_receiptdate; returned-items stands in for the
    // late-delivery correlation.)
    both(
      "q4_order_priority",
      """SELECT o.o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin),

    // Q7-shape: volume shipping between two nations by year — 6-way join
    // where BOTH nation dims broadcast; the fact-side joins shuffle on
    // their keys.
    Q(
      "q7_volume_shipping",
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
         |       ${Exact.oSum2("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
         |FROM supplier s
         |JOIN lineitem l ON s.s_suppkey = l.l_suppkey
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT)
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
    ) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val sup = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val n1 = n.select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = n.select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      sup.join(l, col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(Exact.dsum2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // Q8-shape: national market share inside one region's market — the
    // widest join in the suite (7 tables), conditional share-of-total
    // aggregation by year. part/region/nation broadcast.
    Q(
      "q8_market_share",
      s"""SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
         |  ${Exact.oSum2("CASE WHEN n1.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
         |  / ${Exact.oSum2("l.l_extendedprice * (1 - l.l_discount)")} AS mkt_share
         |FROM part p
         |JOIN lineitem l ON p.p_partkey = l.l_partkey
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         |JOIN region r ON n2.n_regionkey = r.r_regionkey
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         |WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
         |GROUP BY CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT)
         |ORDER BY o_year""".stripMargin
    ) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val sup = Tables.load(s, dir, "supplier")
      val p = Tables.load(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val n1 = n.select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = n.select(col("n_nationkey").as("ck"), col("n_regionkey"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(sup, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((Exact.dsum2(when(col("supp_nation") === "NATION_3", vol).otherwise(0.0)) /
          Exact.dsum2(vol)).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // Q9-shape: product-type profit by nation and year. The fixture has
    // no partsupp/ps_supplycost, so cost is modeled off the part's list
    // price (deterministic, join shape identical to Q9's).
    Q(
      "q9_product_profit",
      s"""SELECT n.n_name AS nation, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
         |  ${Exact.oSum2("l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity * CAST(0.1 AS DOUBLE)")} AS profit
         |FROM lineitem l
         |JOIN part p ON p.p_partkey = l.l_partkey
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE p.p_name LIKE '%red%'
         |GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT)
         |ORDER BY nation, o_year DESC""".stripMargin
    ) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val sup = Tables.load(s, dir, "supplier")
      val p = Tables.load(s, dir, "part").filter(col("p_name").like("%red%"))
      val n = Tables.load(s, dir, "nation")
      val amount = col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity") * lit(0.1)
      l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .join(broadcast(sup), col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(Exact.dsum2(amount).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q11-shape: important stock identification — share-of-total HAVING
    // via a scalar subquery over the same CTE (no partsupp in the
    // fixture; lineitem revenue stands in for stock value).
    both(
      "q11_important_parts",
      """WITH pv AS (
        |  SELECT l.l_partkey,
        |         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS part_value
        |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  WHERE s.s_nationkey < 5
        |  GROUP BY l.l_partkey)
        |SELECT l_partkey, part_value FROM pv
        |WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,6))) AS DOUBLE) * CAST(0.002 AS DOUBLE) FROM pv)
        |ORDER BY part_value DESC, l_partkey""".stripMargin),

    // Q13-shape: customer order-count distribution — LEFT join with an
    // extra join-condition predicate, double aggregation.
    both(
      "q13_count_distribution",
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |      FROM customer c LEFT JOIN orders o
        |        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |      GROUP BY c.c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // Q15-shape: top supplier — CTE reused three times (revenue per
    // supplier, its max as a scalar subquery, join back to the dim).
    both(
      "q15_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin),

    // Q16-shape: supplier diversity per part group — COUNT(DISTINCT)
    // over the lineitem-derived part-supplier bridge (no partsupp).
    both(
      "q16_part_supplier_cnt",
      """SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#45' AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |GROUP BY p.p_brand, p.p_type, p.p_size
        |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin),

    // Q17-shape: small-quantity-order revenue — correlated scalar AVG
    // subquery per part (Catalyst decorrelates to an aggregate+join).
    both(
      "q17_small_qty_revenue",
      """SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#23'
        |  AND l.l_quantity < (SELECT CAST(0.2 AS DOUBLE) *
        |        (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l2.l_quantity))
        |      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin),

    // Q21-shape: suppliers who were the ONLY returner on multi-supplier
    // orders — EXISTS + NOT EXISTS against the same fact table (the
    // hardest decorrelation shape in the suite).
    both(
      "q21_sole_returner",
      """SELECT s.s_name, COUNT(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 25""".stripMargin),

    // Q2-shape: minimum-cost supplier per part in a region — the classic
    // correlated-MIN shape. The fixture has no partsupp, so the bridge is
    // derived once from lineitem (distinct part×supplier pairs, unit
    // price as supply cost) in a CTE both engines share. Catalyst
    // decorrelates the per-part MIN into an aggregate + join; region and
    // nation broadcast. Per-row division then MIN is order-insensitive,
    // so double equality is engine-stable.
    both(
      "q2_min_cost_supplier",
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supplycost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type
        |FROM part p
        |JOIN ps ON ps.l_partkey = p.p_partkey
        |JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
        |  AND ps.supplycost = (SELECT MIN(ps2.supplycost) FROM ps ps2
        |      JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        |      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        |      WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        |LIMIT 100""".stripMargin),

    // Q20-shape: suppliers with excess stock of promo parts — nested IN
    // chain with a correlated half-of-shipped threshold. availqty is the
    // lineitem-derived total per part×supplier (decimal-exact sum). The
    // inner correlated SUM decorrelates to one aggregate over the
    // date-filtered fact, joined back on (partkey, suppkey).
    both(
      "q20_excess_stock",
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS availqty
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT s.s_name, s.s_nationkey
        |FROM supplier s
        |WHERE s.s_nationkey < 3
        |  AND s.s_suppkey IN (
        |    SELECT ps.l_suppkey FROM ps
        |    WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND ps.availqty > (SELECT CAST(0.5 AS DOUBLE) *
        |            CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE)
        |          FROM lineitem l
        |          WHERE l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
        |            AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'))
        |ORDER BY s.s_name""".stripMargin),

    // Q22-shape: global sales opportunity — above-average balances with
    // no orders (scalar subquery + anti join; nationkey stands in for
    // the phone country code).
    both(
      "q22_sales_opportunity",
      """SELECT c.c_nationkey, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(c2.c_acctbal)
        |                     FROM customer c2 WHERE c2.c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""".stripMargin),

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
    },

    // RFM segmentation — the classic customer-analytics quartile cut
    // (recency / frequency / monetary) with THRESHOLD semantics rather
    // than NTILE: quartile boundaries are computed once as
    // percentile_disc(0.25/0.50/0.75) over the per-customer aggregate
    // (identical ordered-set definition in both engines, so boundaries
    // are bit-equal), broadcast back, and each customer is scored by
    // row-local comparison. Ties share a score — deterministic with no
    // tie-break column. Scale shape: NTILE(4) OVER (ORDER BY ...) is a
    // global single-partition sort — three of them serialized — which is
    // a scale-killer at billions of customers; the threshold form is one
    // orders-linear aggregate + a 1-row broadcast + a narrow scan (at
    // true 100 TB scale, swap percentile_disc for approx_percentile and
    // keep the identical plan shape). monetary is the decimal-exact sum.
    Q(
      "rfm_segments",
      """WITH per AS (
        |  SELECT o_custkey, MAX(o_orderdate) AS last_o, COUNT(*) AS frequency,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
        |base AS (
        |  SELECT o_custkey, datediff('day', last_o, maxd) AS recency_days,
        |         frequency, monetary
        |  FROM per CROSS JOIN mx),
        |thr AS (
        |  SELECT
        |    percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days) AS r1,
        |    percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_days) AS r2,
        |    percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days) AS r3,
        |    percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency) AS f1,
        |    percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency) AS f2,
        |    percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency) AS f3,
        |    percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary) AS m1,
        |    percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary) AS m2,
        |    percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary) AS m3
        |  FROM base),
        |scored AS (
        |  SELECT base.*,
        |         CASE WHEN recency_days <= r1 THEN 1 WHEN recency_days <= r2 THEN 2
        |              WHEN recency_days <= r3 THEN 3 ELSE 4 END AS r_score,
        |         CASE WHEN frequency > f3 THEN 1 WHEN frequency > f2 THEN 2
        |              WHEN frequency > f1 THEN 3 ELSE 4 END AS f_score,
        |         CASE WHEN monetary > m3 THEN 1 WHEN monetary > m2 THEN 2
        |              WHEN monetary > m1 THEN 3 ELSE 4 END AS m_score
        |  FROM base CROSS JOIN thr)
        |SELECT o_custkey, recency_days, frequency, monetary,
        |       r_score, f_score, m_score,
        |       CAST(r_score AS VARCHAR) || '-' || CAST(f_score AS VARCHAR)
        |         || '-' || CAST(m_score AS VARCHAR) AS segment
        |FROM scored ORDER BY o_custkey""".stripMargin
    ) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val per = o.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_o"),
          count(lit(1)).as("frequency"),
          graft.Exact.dsum(col("o_totalprice")).as("monetary"))
      val mx = o.agg(max(col("o_orderdate")).as("maxd"))
      val base = per.crossJoin(broadcast(mx))
        .select(col("o_custkey"),
          datediff(col("maxd"), col("last_o")).as("recency_days"),
          col("frequency"), col("monetary"))
      val thr = base.agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days)").as("r1"),
        expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_days)").as("r2"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days)").as("r3"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency)").as("f1"),
        expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency)").as("f2"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency)").as("f3"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary)").as("m1"),
        expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary)").as("m2"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary)").as("m3"))
      val rScore = when(col("recency_days") <= col("r1"), 1)
        .when(col("recency_days") <= col("r2"), 2)
        .when(col("recency_days") <= col("r3"), 3).otherwise(4)
      val fScore = when(col("frequency") > col("f3"), 1)
        .when(col("frequency") > col("f2"), 2)
        .when(col("frequency") > col("f1"), 3).otherwise(4)
      val mScore = when(col("monetary") > col("m3"), 1)
        .when(col("monetary") > col("m2"), 2)
        .when(col("monetary") > col("m1"), 3).otherwise(4)
      base.crossJoin(broadcast(thr))
        .select(col("o_custkey"), col("recency_days"), col("frequency"),
          col("monetary"), rScore.as("r_score"), fScore.as("f_score"),
          mScore.as("m_score"))
        .withColumn("segment", concat(col("r_score").cast("string"), lit("-"),
          col("f_score").cast("string"), lit("-"), col("m_score").cast("string")))
        .orderBy(col("o_custkey"))
    },

    // Market-basket co-occurrence: part pairs bought in the same order,
    // with support and lift. The pair self-join keys on l_orderkey, so
    // work per order is items-per-order² — TPC-H bounds that at 7, so
    // the pair space is corpus-LINEAR, never corpus². Item totals join
    // back on partkey (plain shuffle join — the item-count table is
    // part-cardinality, too big to assume broadcastable at 100 TB), and
    // the top-25 cut is a TakeOrdered, not a global sort.
    Q(
      "mba_item_pairs",
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM baskets),
        |items AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item FROM baskets GROUP BY l_partkey),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |         CAST(count(*) AS BIGINT) AS support
        |  FROM baskets a JOIN baskets b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)
        |SELECT part_a, part_b, support,
        |       CAST(support AS DOUBLE) * (SELECT n_orders FROM n)
        |         / (ia.n_item * ib.n_item) AS lift
        |FROM pairs
        |JOIN items ia ON ia.l_partkey = part_a
        |JOIN items ib ON ib.l_partkey = part_b
        |ORDER BY support DESC, part_a, part_b
        |LIMIT 25""".stripMargin
    ) { (s, dir) =>
      val baskets = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val nOrders = baskets.agg(
        countDistinct(col("l_orderkey")).cast("long").as("n_orders"))
      val items = baskets.groupBy(col("l_partkey"))
        .agg(count(lit(1)).cast("long").as("n_item"))
      val a = baskets.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      val b = baskets.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("part_b"))
      val pairs = a.join(b,
          a("l_orderkey") === b("ok_b") && col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).cast("long").as("support"))
      pairs
        .join(items.select(col("l_partkey").as("part_a"), col("n_item").as("na")), "part_a")
        .join(items.select(col("l_partkey").as("part_b"), col("n_item").as("nb")), "part_b")
        .crossJoin(broadcast(nOrders))
        .select(col("part_a"), col("part_b"), col("support"),
          (col("support").cast("double") * col("n_orders") / (col("na") * col("nb")))
            .as("lift"))
        .orderBy(col("support").desc, col("part_a"), col("part_b"))
        .limit(25)
    }
  )
}

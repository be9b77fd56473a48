package graft.operators

import graft.{Exact, Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2.3). The reference implements single-column
  * equi-joins as a single-threaded build/probe over fully-materialized row
  * lists (reference kv/KvJoinExecutor.java:113-425) with a 100k-row scan cap;
  * here each join is a declarative `Dataset.join` so Catalyst chooses
  * broadcast-hash vs sort-merge (the reference's "build from smaller side"
  * heuristic, optimizer/QueryOptimizer.java:75-100, generalized) and AQE
  * re-plans skew at runtime. Dimension tables are explicitly `broadcast()`
  * where we know they are small at any scale factor (region/nation: fixed
  * cardinality ≤ 25 rows even at 100 TB).
  */
object JoinQueries extends QueryPack {
  import Exact._

  val qs: Seq[Q] = Seq(
    // INNER equi-join (reference kv/KvJoinExecutor.java:113-132).
    Q(
      "join_inner",
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 450000
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 450000)
      val c = Tables.load(s, dir, "customer")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("o_orderkey"))
    },

    // LEFT OUTER — unmatched-left rows kept per ROW, not per key (the
    // reference tracks unmatched by join key, §7.5 defect 1; Spark is correct).
    Q(
      "join_left_outer",
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_totalprice > 490000
        |WHERE c_custkey < 200
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_custkey") < 200)
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey") && col("o_totalprice") > 490000, "left")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    // RIGHT OUTER (reference swaps sides, kv/KvJoinExecutor.java:168-181).
    Q(
      "join_right_outer",
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer
        |  ON c_custkey = o_custkey AND o_totalprice > 490000
        |WHERE c_custkey < 200
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_custkey") < 200)
      val o = Tables.load(s, dir, "orders")
      o.join(c, col("c_custkey") === col("o_custkey") && col("o_totalprice") > 490000, "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    // FULL OUTER with unmatched rows on both sides
    // (reference kv/KvJoinExecutor.java:186-206).
    Q(
      "join_full_outer",
      """SELECT a.c_custkey AS left_key, b.o_custkey AS right_key,
        |  a.c_name, b.n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 60) a
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |           WHERE o_custkey BETWEEN 30 AND 90 GROUP BY o_custkey) b
        |  ON a.c_custkey = b.o_custkey
        |ORDER BY left_key NULLS FIRST, right_key NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      val a = Tables.load(s, dir, "customer").filter(col("c_custkey") < 60)
        .select(col("c_custkey"), col("c_name"))
      val b = Tables.load(s, dir, "orders")
        .filter(col("o_custkey").between(30, 90))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      a.join(b, col("c_custkey") === col("o_custkey"), "full")
        .select(
          col("c_custkey").as("left_key"), col("o_custkey").as("right_key"),
          col("c_name"), col("n_orders"))
        .orderBy(col("left_key").asc_nulls_first, col("right_key").asc_nulls_first)
    },

    // CROSS JOIN (reference nested-loop cartesian, kv/KvJoinExecutor.java:211-262).
    Q(
      "join_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "region")
        .crossJoin(Tables.load(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Multi-way (5-table) join + aggregation — TPC-H Q5 shape; the
    // reference's left-deep chain (kv/KvJoinExecutor.java:267-316) becomes a
    // Catalyst-reorderable join tree with broadcast dims.
    Q(
      "q5_local_supplier_volume",
      s"""SELECT n_name, ${oSum2("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    ) { (s, dir) =>
      val c  = Tables.load(s, dir, "customer")
      val o  = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
                col("o_orderdate") <  lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      val l  = Tables.load(s, dir, "lineitem")
      val su = Tables.load(s, dir, "supplier")
      val n  = Tables.load(s, dir, "nation")
      val r  = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q3 shape: join + agg + ORDER BY/LIMIT wrapper
    // (reference kv/KvQueryExecutor.java:1459-1531).
    Q(
      "q3_shipping_priority",
      s"""SELECT l_orderkey, ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  o_orderdate
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
         |  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-03-15 00:00:00")))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1997-03-15 00:00:00")))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // LEFT SEMI join — the reference rewrites IN/EXISTS subqueries textually
    // (SubqueryExecutor.java:185-260); Spark plans a proper semi join.
    Q(
      "join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 480000)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 480000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // LEFT ANTI join (NOT EXISTS).
    Q(
      "join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Explicit broadcast of a bounded dim (nation is ≤ 25 rows at ANY scale
    // factor — always broadcast-able, never a shuffle).
    Q(
      "join_broadcast_dim",
      s"""SELECT n_name, COUNT(*) AS n_suppliers, ${oSum("s_acctbal")} AS total_bal
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin
    ) { (s, dir) =>
      val su = Tables.load(s, dir, "supplier")
      val n  = Tables.load(s, dir, "nation")
      su.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"), dsum(col("s_acctbal")).as("total_bal"))
        .orderBy(col("n_name"))
    },

    // Join then outer ORDER BY + LIMIT/OFFSET (reference join wrapper,
    // kv/KvQueryExecutor.java:1459-1531).
    Q(
      "join_orderby_limit",
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25 OFFSET 5""".stripMargin
    ) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(5)
        .limit(25)
    },

    // Bucketed CO-LOCATED join — the 100 TB fact×fact answer when
    // neither side broadcast-fits: both tables are written bucketed (and
    // sorted) on the join key, so the sort-merge join reads bucket i of
    // each side into the same task and needs NO pre-join exchange and no
    // per-query sort — the shuffle is paid ONCE at layout time and
    // amortized over every subsequent join (PlanSpec pins
    // SelectedBucketsCount and exactly one post-join hashpartitioning,
    // the small agg's). The write runs mode=overwrite into dir-hashed
    // table names: idempotent per corpus, and a driver-regenerated
    // fixture can never leave a stale bucketed copy behind the oracle's
    // back. The oracle answers from the raw parquet — the layout round
    // trip must lose and invent nothing.
    Q(
      "join_bucketed_colocated",
      s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS line_count,
         |       ${graft.Exact.oSum("l_extendedprice")} AS revenue
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      val h = Integer.toHexString(dir.hashCode)
      val oT = s"graft_bkt_orders_$h"
      val lT = s"graft_bkt_lineitem_$h"
      // warehouse FILES persist across JVMs but the in-memory catalog's
      // metadata does not — a fresh session's "overwrite" is a CREATE
      // that trips LOCATION_ALREADY_EXISTS on the previous run's files.
      // Reset both halves explicitly (drop the catalog entry AND clear
      // the location), and TTL-prune stale bucketed copies other
      // corpora left behind (same policy as graft.Scratch tmp dirs).
      val wh = s.conf.get("spark.sql.warehouse.dir")
      val whDir = new java.io.File(
        if (wh.startsWith("file:")) java.nio.file.Paths.get(new java.net.URI(wh)).toString
        else wh)
      // DATABASE-QUALIFIED throughout: the session's CURRENT database is
      // session-global mutable state (GraftSession mirrors its live
      // database into the Spark catalog), so unqualified names would
      // resolve — and leave locations — wherever the last `USE` pointed.
      // Pinning `default` keeps the catalog entry and the on-disk
      // location (warehouse root) in lockstep with the resets below.
      def reset(t: String, prefix: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS default.`$t`")
        graft.Scratch.rm(new java.io.File(whDir, t))
        // a pre-qualification run may have left the location under a
        // GraftSession database's dir — clear those too
        Option(whDir.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isDirectory && f.getName.endsWith(".db"))
          .foreach(db => graft.Scratch.rm(new java.io.File(db, t)))
        graft.Scratch.pruneStale(whDir, prefix, t)
      }
      reset(oT, "graft_bkt_orders")
      reset(lT, "graft_bkt_lineitem")
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(16, "o_orderkey").sortBy("o_orderkey").saveAsTable(s"default.$oT")
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey").saveAsTable(s"default.$lT")
      s.table(s"default.$oT")
        .join(s.table(s"default.$lT"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("line_count"),
          graft.Exact.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }
  )
}

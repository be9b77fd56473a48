package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Set-operation surface (SURVEY.md §2.7).
  *
  * The reference splits the UNION tree, executes each branch to a
  * `List<Map>`, concatenates, and dedups via stringified-row keys
  * (reference kv/UnionExecutor.java:36-263 — §7.5 defect 10: `1` and
  * `"1"` collide). Here each branch is a DataFrame and the set op is
  * Spark's native positional union / INTERSECT / EXCEPT — distributed
  * hash-based dedup, typed comparison, no driver materialization.
  * INTERSECT/EXCEPT (plus ALL variants) are absent from the reference;
  * they come free in Spark.
  */
object SetOpQueries extends QueryPack {

  val qs: Seq[Q] = Seq(
    // UNION ALL: positional concat (reference kv/UnionExecutor.java:185-210
    // remaps branch 2's columns to branch 1's names — Spark union is the
    // same positional rule).
    Q(
      "setop_union_all",
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer WHERE c_custkey <= 60
        |UNION ALL
        |SELECT s_suppkey, s_name, 'supplier' FROM supplier WHERE s_suppkey <= 60
        |ORDER BY src, id""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_custkey") <= 60)
        .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("src"))
      val sup = Tables.load(s, dir, "supplier").filter(col("s_suppkey") <= 60)
        .select(col("s_suppkey"), col("s_name"), lit("supplier"))
      c.union(sup).orderBy(col("src"), col("id"))
    },

    // UNION (distinct): overlapping branches so dedup is exercised
    // (reference kv/UnionExecutor.java:218-263).
    Q(
      "setop_union_distinct",
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderkey < 5000
        |ORDER BY custkey""".stripMargin
    ) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("custkey"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") < 5000)
        .select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("custkey"))
    },

    // INTERSECT — set semantics (dedup), absent from the reference.
    Q(
      "setop_intersect",
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        |INTERSECT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 0
        |ORDER BY nationkey""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("nationkey"))
      val sup = Tables.load(s, dir, "supplier").filter(col("s_acctbal") > 0)
        .select(col("s_nationkey"))
      c.intersect(sup).orderBy(col("nationkey"))
    },

    // EXCEPT — set semantics, absent from the reference.
    Q(
      "setop_except",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier WHERE s_suppkey < 50
        |ORDER BY nationkey""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sup = Tables.load(s, dir, "supplier").filter(col("s_suppkey") < 50)
        .select(col("s_nationkey"))
      c.except(sup).orderBy(col("nationkey"))
    },

    // INTERSECT ALL / EXCEPT ALL — bag semantics (multiplicity-aware).
    Q(
      "setop_intersect_all",
      """SELECT l_quantity AS qty FROM lineitem WHERE l_orderkey < 100
        |INTERSECT ALL
        |SELECT l_quantity FROM lineitem WHERE l_orderkey >= 100 AND l_orderkey < 200
        |ORDER BY qty""".stripMargin
    ) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val a = l.filter(col("l_orderkey") < 100).select(col("l_quantity").as("qty"))
      val b = l.filter(col("l_orderkey") >= 100 && col("l_orderkey") < 200)
        .select(col("l_quantity"))
      a.intersectAll(b).orderBy(col("qty"))
    },

    Q(
      "setop_except_all",
      """SELECT l_linenumber AS ln FROM lineitem WHERE l_orderkey < 60
        |EXCEPT ALL
        |SELECT l_linenumber FROM lineitem WHERE l_orderkey >= 60 AND l_orderkey < 90
        |ORDER BY ln""".stripMargin
    ) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val a = l.filter(col("l_orderkey") < 60).select(col("l_linenumber").as("ln"))
      val b = l.filter(col("l_orderkey") >= 60 && col("l_orderkey") < 90)
        .select(col("l_linenumber"))
      a.exceptAll(b).orderBy(col("ln"))
    },

    // UNION feeding an outer aggregate (reference kv/UnionAggregateTest.java
    // shape): set op as a subquery input.
    Q(
      "setop_union_agg",
      """SELECT nationkey, COUNT(*) AS cnt FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey FROM supplier
        |) u GROUP BY nationkey
        |ORDER BY nationkey""".stripMargin
    ) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sup = Tables.load(s, dir, "supplier").select(col("s_nationkey"))
      c.union(sup).groupBy(col("nationkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("nationkey"))
    }
  )
}

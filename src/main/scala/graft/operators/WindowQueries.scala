package graft.operators

import graft.{Exact, Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.5).
  *
  * The reference partitions rows into an in-memory hash map, sorts each
  * partition, and walks it row-at-a-time (reference
  * window/WindowFunctionExecutor.java:68-113); frames are parsed but
  * ignored, and LAST_VALUE returns the current row (§7.5 defect 6). Here
  * every function is Spark's native `Window` operator — a single shuffle
  * on the partition keys, sort within partitions, whole-stage codegen —
  * with real frame semantics (we implement the standard behavior, not the
  * reference's bugs, per SURVEY §7.4).
  *
  * Determinism: every OVER(ORDER BY …) is total within its partition
  * (ties broken by a unique key) so row_number/lag/navigation functions
  * hash-match the oracle; running double sums go through [[Exact]] decimal
  * casts so accumulation order cannot perturb low bits.
  */
object WindowQueries extends QueryPack {

  val qs: Seq[Q] = Seq(
    // ROW_NUMBER (reference window/WindowFunctionExecutor.java:167-172).
    Q(
      "win_row_number",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, rn""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // RANK / DENSE_RANK over ties (reference :177-236).
    Q(
      "win_rank_dense",
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS rnk,
        |  DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS drnk
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, rnk, l_linenumber""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_quantity").desc)
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy(col("l_orderkey"), col("rnk"), col("l_linenumber"))
    },

    // Running aggregate with explicit ROWS frame (reference runs these with
    // an implicit unbounded-preceding..current frame, :241-334).
    Q(
      "win_running_sum",
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
         |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
         |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
         |FROM orders WHERE o_custkey < 40
         |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 40)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(Exact.dec)).over(w).cast("double").as("running_total"),
          count(lit(1)).over(w).as("running_cnt"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // LAG / LEAD with offset + default (reference :339-382).
    Q(
      "win_lag_lead",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
        |  LEAD(o_totalprice, 2, -1.0) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next2_price
        |FROM orders WHERE o_custkey < 40
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 40)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 2, -1.0).over(w).as("next2_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // FIRST_VALUE / LAST_VALUE with a full-partition frame — the correct
    // semantics the reference gets wrong (§7.5 defect 6: its LAST_VALUE
    // returns the current row because it ignores frames).
    Q(
      "win_first_last",
      """SELECT l_orderkey, l_linenumber,
        |  FIRST_VALUE(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_qty,
        |  LAST_VALUE(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_qty
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          first(col("l_quantity")).over(w).as("first_qty"),
          last(col("l_quantity")).over(w).as("last_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Sliding ROWS frame (moving average) — frames the reference only
    // parses (window/WindowFrame.java:10-48) executed for real.
    Q(
      "win_moving_avg",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
        |FROM orders WHERE o_custkey < 40
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 40)
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(col("o_totalprice").cast(Exact.dec)).over(w).cast("double") /
            count(lit(1)).over(w)).as("moving_avg"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Numeric RANGE frame: all orders within +/-5000 of the current
    // row's price count as peers — value-based frames the reference only
    // parses (window/WindowFrame.java:10-48).
    Q(
      "win_range_frame",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |                 RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING) AS near_price_peers
        |FROM orders WHERE o_custkey < 30
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
        .rangeBetween(-5000, 5000)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("near_price_peers"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // NTH_VALUE with a full frame (absent from the reference, SURVEY §2.5).
    Q(
      "win_nth_value",
      """SELECT l_orderkey, l_linenumber,
        |  NTH_VALUE(l_quantity, 2) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_qty
        |FROM lineitem WHERE l_orderkey < 150
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 150)
        .select(col("l_orderkey"), col("l_linenumber"),
          nth_value(col("l_quantity"), 2).over(w).as("second_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // NTILE / PERCENT_RANK / CUME_DIST — beyond the reference's function
    // set (SURVEY §2.5 lists them as absent), included for parity-plus.
    Q(
      "win_ntile_dist",
      """SELECT c_custkey, c_acctbal,
        |  NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
        |  PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS pct_rank,
        |  CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS cume
        |FROM customer WHERE c_custkey < 200
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 200)
        .select(col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("c_custkey"))
    },

    // Default frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW) with peer
    // rows: ties in the ORDER BY key must aggregate together — standard
    // semantics both engines share.
    Q(
      "win_default_frame_peers",
      """SELECT l_orderkey, l_linenumber, l_linestatus,
        |  COUNT(*) OVER (PARTITION BY l_orderkey ORDER BY l_linestatus) AS peers_so_far
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linestatus"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_linestatus"),
          count(lit(1)).over(w).as("peers_so_far"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }
  )
}

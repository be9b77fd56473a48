package graft

import java.nio.file.{Files, Paths}

/** TPC-H shape suite at sf1-class volume (dev tooling, like ScaleProbe):
  * the per-round bench runs q1-q22 at sf0.1 where every dimension AND
  * most fact-side shuffles broadcast-fit, so the q9/q21-class plans
  * never exercise real sort-merge + AQE paths. This main materializes a
  * 10×-fact fixture from sf0.1 — orders/lineitem replicated with offset
  * ORDER keys only (o_custkey / l_suppkey / l_partkey untouched, so
  * every foreign key still resolves against the unreplicated dimension
  * tables; each customer simply carries 10× orders, which is exactly the
  * fact-heavy join pressure the probe wants) — then times each TPC-H
  * query twice and records which join strategies the FINAL adaptive plan
  * chose (BroadcastHashJoin vs SortMergeJoin vs ShuffledHashJoin
  * counts), so a plan that flipped from broadcast to SMJ at volume is
  * visible in the artifact, not just in wall-clock.
  *
  *   sbt "runMain graft.BenchTpch /root/testdata/sf0.1 /tmp/graft_tpch_sf1 10"
  */
object BenchTpch {
  private val keyOffset = 1000000000L

  val tpchQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_parts", "q12_priority_shipping",
    "q13_count_distribution", "q14_promo_share", "q15_top_supplier",
    "q16_part_supplier_cnt", "q17_small_qty_revenue", "q18_large_orders",
    "q19_disjunctive_filter", "q20_excess_stock", "q21_sole_returner",
    "q22_sales_opportunity")

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_tpch_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Engine.session("graft-bench-tpch")

    if (!Files.exists(Paths.get(s"$out/lineitem.parquet"))) {
      Files.createDirectories(Paths.get(out))
      // dimensions first, facts after: lineitem doubles as the
      // fixture-complete marker, so it must be the LAST artifact — a
      // crash mid-build then leaves a dir the next run finishes instead
      // of a half-fixture it trusts
      Tables.names.filterNot(n => n == "orders" || n == "lineitem").foreach { n =>
        Tables.load(spark, base, n).write.mode("overwrite").parquet(s"$out/$n.parquet")
      }
      // fact tables: replicate with offset ORDER keys only — FK-valid
      // against unreplicated dimensions by construction (ScaleProbe's
      // scaleKeyed, shared so the offset math has one definition)
      ScaleProbe.scaleKeyed(spark, base, "orders", Seq("o_orderkey"), factor)
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      ScaleProbe.scaleKeyed(spark, base, "lineitem", Seq("l_orderkey"), factor)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    }

    // JIT/codegen/file-index warmup (the Bench discipline)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.load(spark, out, n).count())

    def joinMix(p: String): String = {
      def c(k: String) = k.r.findAllIn(p).size
      s""""bhj":${c("BroadcastHashJoin")},"smj":${c("SortMergeJoin")},"shj":${c("ShuffledHashJoin")},"bnlj":${c("BroadcastNestedLoopJoin")}"""
    }

    val only: Option[Set[String]] = args.lift(3).map(_.split(",").map(_.trim).toSet)
    tpchQueries.filter(n => only.forall(_.contains(n))).foreach { name =>
      def once(): (Double, Long, String, Option[String]) = {
        val t0 = System.nanoTime()
        try {
          val df = SparkEntry.queries(name)(spark, out)
          // toLocalIterator, NOT collect() or count(): count() runs a
          // DERIVED groupBy().count() QueryExecution and leaves df's own
          // AdaptiveSparkPlanExec unexecuted (isFinalPlan=false, initial
          // strategies only), while collect() materializes the whole
          // result as one driver array — fine for these dimension-
          // bounded outputs but a landmine the first time a probe query
          // has fact-sized output. Draining the local iterator executes
          // df's plan itself (AQE finalizes before the result stage, so
          // the join-strategy counts below read the FINAL adaptive plan,
          // runtime BHJ→SMJ flips included) while the driver holds at
          // most one result partition.
          var rows = 0L
          val it = df.toLocalIterator()
          while (it.hasNext) { it.next(); rows += 1 }
          val sec = (System.nanoTime() - t0) / 1e9
          (sec, rows, df.queryExecution.executedPlan.toString, None)
        } catch { case e: Throwable =>
          ((System.nanoTime() - t0) / 1e9, -1L,
            "", Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
              .replaceAll("[\"\\\\\\x00-\\x1f]", " ")))
        }
      }
      val r1 = once()
      if (r1._4.isDefined)
        println(f"""{"probe":"$name","sec":${r1._1}%.2f,"rows":-1,"error":"${r1._4.get}"}""")
      else {
        val r2 = once()
        // pass 1 green + pass 2 failed = FLAKY, recorded as a failure
        // (same contract as Bench) — never two clean-looking passes
        if (r2._4.isDefined)
          println(f"""{"probe":"$name","sec":${r1._1}%.2f,"rows":-1,"error":"pass2: ${r2._4.get}"}""")
        else {
          val best = math.min(r1._1, r2._1)
          println(f"""{"probe":"$name","sec":$best%.2f,"p1":${r1._1}%.2f,"p2":${r2._1}%.2f,"rows":${r1._2},${joinMix(r1._3)}}""")
        }
      }
    }
    spark.stop()
  }
}

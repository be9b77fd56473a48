package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** BFS frontier-growth probe (dev tooling, like ScaleProbe): measure how
  * `graph_shortest_path`'s per-round cost tracks TRUE frontier width.
  *
  * The sf10-class campaign's own caveat: ScaleProbe replicas offset every
  * key, so replica blocks are DISJOINT subgraphs — BFS from the base seed
  * set exercised 100× edge-probe volume but the frontier never widened.
  * This probe builds a BRIDGED replica fixture instead: orders replicate
  * with offset (o_orderkey, o_custkey) and lineitem with offset
  * (l_orderkey, l_suppkey), EXCEPT that every `bridgeEvery`-th order's
  * lineitems keep their BASE supplier. Those shared suppliers connect
  * every replica block: seeds (base NATION_7 customers) reach base
  * suppliers at hop 1, bridge into every block's customers at hop 2, and
  * flood the block-local suppliers at hop 3 — frontier width at hops 2-3
  * scales with the replication factor, which is exactly the regime the
  * per-round frontier×degree claim must hold in.
  *
  *   sbt "runMain graft.FrontierProbe /root/testdata/sf0.1 /tmp/graft_bridge10 10"
  *
  * Prints one JSON line per BFS round: {"round","frontier","sec"} plus a
  * fixture/edge-build header. Only the four graph-relevant tables are
  * materialized (nation, customer, orders, lineitem).
  */
object FrontierProbe {
  private val scheme = "bridge-v1"

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_bridge10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val rounds = args.lift(3).map(_.toInt).getOrElse(6)
    val bridgeEvery = args.lift(4).map(_.toInt).getOrElse(16)
    val spark = Engine.session("graft-frontier-probe")

    val marker = Paths.get(s"$out/_scale_meta")
    val stamp = s"$scheme factor=$factor bridgeEvery=$bridgeEvery"
    if (factor <= 1) () // probe the base corpus in place, no build
    else if (!Files.exists(Paths.get(s"$out/lineitem.parquet"))) {
      Files.createDirectories(Paths.get(out))
      Seq("nation", "customer").foreach { n =>
        Tables.load(spark, base, n).write.mode("overwrite").parquet(s"$out/$n.parquet")
      }
      ScaleProbe.scaleKeyed(spark, base, "orders",
          Seq("o_orderkey", "o_custkey"), factor)
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      val l = Tables.load(spark, base, "lineitem")
      (0 until factor).map { i =>
        l.select(l.columns.toSeq.map {
          case "l_orderkey" => (col("l_orderkey") + lit(i * ScaleProbe.keyOffset))
            .as("l_orderkey")
          case "l_suppkey" =>
            // the bridge: block 0 is the base corpus; in blocks i>0 the
            // lineitems of every bridgeEvery-th ORDER keep their BASE
            // supplier, so those suppliers are shared by all blocks
            when(col("l_orderkey") % bridgeEvery === 0, col("l_suppkey"))
              .otherwise(col("l_suppkey") + lit(i * ScaleProbe.keyOffset))
              .as("l_suppkey")
          case c => col(c)
        }: _*)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      Files.writeString(marker, stamp + "\n")
    } else {
      val have = if (Files.exists(marker)) Files.readString(marker).trim else "<none>"
      require(have == stamp,
        s"fixture $out was built as '$have', current is '$stamp' — delete it and rerun")
    }
    val dir = if (factor <= 1) base else out

    spark.range(1000000).selectExpr("sum(id)").collect() // JIT/codegen warmup
    val t0 = System.nanoTime()
    val nEdges = graft.operators.GraphQueries.warmSharedEdges(spark, dir)
    println(f"""{"detail":"edge_build","factor":$factor,"edges":$nEdges,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    graft.operators.GraphQueries.frontierSeries(spark, dir, rounds).foreach {
      case (r, n, sec) =>
        println(f"""{"round":$r,"frontier":$n,"sec":$sec%.2f}""")
    }
    graft.operators.GraphQueries.evictSharedEdges(spark)
    spark.stop()
  }
}

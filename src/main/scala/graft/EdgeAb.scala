package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for the shared graph-edge build's degree
  * annotation (VERDICT r17 "what's wrong" #2): the current COUNT-window
  * over src is one hash-partition + SORT of the full 2|E| edge rows, and
  * on a power-law graph the hot-src partition is a straggler AQE cannot
  * split (skew handling covers joins, not windows). The candidate is a
  * two-level formulation: partial-aggregated groupBy(src) for degrees
  * (skew-immune map-side combine) joined back broadcast — the edge rows
  * are never re-exchanged at all. The question the probe answers at the
  * 10× fixture: does the window's sort + skew exposure cost more than
  * the consumers save from its src-partitioned output layout?
  *
  * Per side and rep: (1) build+materialize the annotated edge list,
  * (2) the degree-histogram consumer (groupBy src — reuses the window
  * layout's partitioning, pays a fresh exchange on the broadcast
  * layout), (3) one PageRank-shaped iteration (broadcast rank join +
  * groupBy dst — layout-indifferent). Equality: order-independent
  * checksum over (src, dst, outdeg).
  *
  * Usage: runMain graft.EdgeAb [sfDir] [reps]
  */
object EdgeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark: SparkSession = Engine.session("edgeab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def pairs(): DataFrame = {
      val o = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.load(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      o.join(l, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select(concat(lit("c"), col("ck").cast("string")).as("src"),
          concat(lit("s"), col("sk").cast("string")).as("dst"))
    }
    def undirected(e0: DataFrame): DataFrame =
      e0.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))

    def buildWindow(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      undirected(pairs())
        .withColumn("outdeg", count(lit(1)).over(Window.partitionBy(col("src"))))
    }
    def buildAggJoin(): DataFrame = {
      val e = undirected(pairs())
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      e.join(broadcast(deg), "src")
    }

    def sweep(tag: String, build: () => DataFrame): (Double, Double, Double, String) = {
      val t0 = System.nanoTime()
      val e = build().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = e.select(col("src")).distinct().count()
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      e.groupBy(col("src")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("nodes"))
        .orderBy(col("degree"))
        .write.format("noop").mode("overwrite").save()
      val tHist = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val pr = e.select(col("src").as("id")).distinct()
        .select(col("id"), lit(1.0 / n).as("pr"))
      e.join(broadcast(pr), e("src") === pr("id"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("mass"))
        .write.format("noop").mode("overwrite").save()
      val tIter = (System.nanoTime() - t2) / 1e9
      val chk = e.agg(sum(xxhash64(col("src"), col("dst"), col("outdeg"))
          .cast("decimal(38,0)")))
        .collect()(0).getDecimal(0).toString
      e.unpersist()
      println(f"[edgeab] $tag build=$tBuild%.3f hist=$tHist%.3f iter=$tIter%.3f chk=$chk")
      (tBuild, tHist, tIter, chk)
    }

    var chkA = ""; var chkB = ""
    val (ba, ha, ia2) = (Seq.newBuilder[Double], Seq.newBuilder[Double], Seq.newBuilder[Double])
    val (bb, hb, ib) = (Seq.newBuilder[Double], Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to reps).foreach { i =>
      val a = sweep(s"window  rep$i", buildWindow)
      val b = sweep(s"aggjoin rep$i", buildAggJoin)
      ba += a._1; ha += a._2; ia2 += a._3; chkA = a._4
      bb += b._1; hb += b._2; ib += b._3; chkB = b._4
    }
    require(chkA == chkB, s"edge sets differ: $chkA vs $chkB")
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    println(f"[edgeab] MEDIANS window : build=${med(ba.result())}%.3f hist=${med(ha.result())}%.3f iter=${med(ia2.result())}%.3f")
    println(f"[edgeab] MEDIANS aggjoin: build=${med(bb.result())}%.3f hist=${med(hb.result())}%.3f iter=${med(ib.result())}%.3f")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Pins the property the z-order layout exists for: row-group footer
  * stats under the Morton layout confine each group to a small
  * (l_partkey, l_suppkey) rectangle, so a 2-D box predicate can skip
  * most row groups — where a single-column sort (the best a 1-D layout
  * can do) leaves the second column's stats wide open and skips almost
  * nothing on it. The census reads the SAME footer stats the stock
  * parquet reader's row-group filter consults, so "hit" row groups here
  * are exactly what a scan must read. */
class ZOrderSpec extends SparkSpec {

  test("z-order layout skips most row groups for a 2-D box; 1-D sort cannot") {
    val dir = sf()
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"))

    val zPath = Scratch.dir("graft_zorder_spec", dir)
    plans.ZOrder.writeClustered(li, "l_partkey", "l_suppkey", zPath, 16)

    // the 1-D straw man: same file count, range-clustered on l_partkey
    // only (tight partkey stats, suppkey stats span the whole domain)
    val sPath = Scratch.dir("graft_zorder_1d", dir)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(sPath)

    // query box: HALF the partkey range × a QUARTER of suppkey → 1/8 of
    // the plane. The wide partkey slice is what separates the layouts:
    // the 1-D sort prunes on partkey only, so it must read ~half the
    // groups no matter what the suppkey predicate says, while the 2-D
    // layout reads ~area fraction + Morton boundary. (A 1/4×1/4 box
    // does NOT separate them — 1-D partkey pruning alone already
    // confines it to ~4/16, tying z-order's ~4/16 within the ±1
    // row-group variance repartitionByRange's split-point sampling
    // introduces between identical runs.)
    val mm = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).first()
    val (pLo, pHi) = (mm.getLong(0), mm.getLong(1))
    val (sLo, sHi) = (mm.getLong(2), mm.getLong(3))
    val (qpLo, qpHi) = (pLo, pLo + (pHi - pLo) / 2)
    val (qsLo, qsHi) = (sLo, sLo + (sHi - sLo) / 4)

    val (zTotal, zHit) = plans.ZOrder.rowGroupBoxCensus(spark, zPath,
      "l_partkey", qpLo, qpHi, "l_suppkey", qsLo, qsHi)
    val (sTotal, sHit) = plans.ZOrder.rowGroupBoxCensus(spark, sPath,
      "l_partkey", qpLo, qpHi, "l_suppkey", qsLo, qsHi)
    assert(zTotal >= 16 && sTotal >= 16, s"expected >=16 row groups: $zTotal / $sTotal")
    // 1-D: partkey pruning keeps ≈half the groups and every survivor's
    // suppkey range spans the domain; 2-D must beat it outright
    assert(zHit < sHit,
      s"z-order must skip more than a 1-D sort: z $zHit/$zTotal vs 1-D $sHit/$sTotal")
    // 1/8-plane area + Morton-boundary overlap: ≤40% of groups (the 1-D
    // layout is pinned above ~50% by its partkey-only pruning)
    assert(zHit.toDouble / zTotal <= 0.4,
      s"z-order should confine a 1/8-plane box to <=40% of row groups: $zHit/$zTotal")

    // and the layout changes no results: box aggregate identical on
    // the clustered copy and the original
    def boxAgg(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("l_partkey").between(qpLo, qpHi) &&
        col("l_suppkey").between(qsLo, qsHi))
      .agg(count(lit(1)), Exact.dsum(col("l_extendedprice"))).first()
    assert(boxAgg(spark.read.parquet(zPath)) == boxAgg(li))
  }

  test("k-D z-order: a 3-column layout skips a 3-D box the 2-D layout cannot") {
    val dir = sf()
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))

    val z3Path = Scratch.dir("graft_zorder_3d", dir)
    plans.ZOrder.writeClustered(li,
      Seq("l_partkey", "l_suppkey", "l_orderkey"), z3Path, 16)

    // 1-D straw man clustered on l_partkey only: a 3-D box prunes on
    // partkey but every surviving group spans the other two dimensions
    val sPath = Scratch.dir("graft_zorder_3d_1d", dir)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(sPath)

    val b = plans.ZOrder.bounds(li,
      Seq("l_partkey", "l_suppkey", "l_orderkey")).get
    // ~1/3 of each dimension → ~1/27 of the cube
    val boxes = Seq("l_partkey", "l_suppkey", "l_orderkey").zip(b).map {
      case (c, (lo, hi)) =>
        (c, lo.toLong, lo.toLong + ((hi - lo) / 3).toLong)
    }
    val (zTotal, zHit) = plans.ZOrder.rowGroupBoxCensus(spark, z3Path, boxes)
    val (sTotal, sHit) = plans.ZOrder.rowGroupBoxCensus(spark, sPath, boxes)
    assert(zTotal >= 16 && sTotal >= 16, s"expected >=16 row groups: $zTotal / $sTotal")
    assert(zHit < sHit,
      s"3-D z-order must skip more than a 1-D sort: z $zHit/$zTotal vs 1-D $sHit/$sTotal")
    // a 1/27-cube box should confine to well under half the row groups
    // (fractions, not exact counts — repartitionByRange samples split
    // points, so boundary-straddling groups vary between runs)
    assert(zHit.toDouble / zTotal <= 0.5,
      s"3-D layout should confine a 1/27-cube box: $zHit/$zTotal")

    // layout-only: content identical row-for-row
    assert(spark.read.parquet(z3Path).count() == li.count())

    // NULL cluster values are layout-only too: rows survive clustering
    // with NULLs collected at the curve origin (grid cell 0)
    val withNulls = li.withColumn("l_suppkey",
      when(col("l_orderkey") % 7 === 0, lit(null)).otherwise(col("l_suppkey")))
    val nPath = Scratch.dir("graft_zorder_nulls", dir)
    plans.ZOrder.writeClustered(withNulls,
      Seq("l_partkey", "l_suppkey"), nPath, 8)
    assert(spark.read.parquet(nPath).count() == withNulls.count())
    assert(spark.read.parquet(nPath).filter(col("l_suppkey").isNull).count()
      == withNulls.filter(col("l_suppkey").isNull).count())
  }
}

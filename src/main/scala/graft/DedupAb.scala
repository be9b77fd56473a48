package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B for the r18 hashed-prefix jaccard build
  * (DedupQueries.jaccardPairsBuild hashedPrefix flag): host weather makes
  * sequential whole-JVM comparisons meaningless (±40%), so both
  * formulations run alternately in ONE session and the report is
  * per-side min/median. Also asserts the two pair sets are EXACTLY equal
  * (same (a, b, jaccard) rows) — the superset-candidates argument's
  * empirical twin.
  *
  * Usage: runMain graft.DedupAb [sfDir] [reps]
  */
object DedupAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark: SparkSession = Engine.session("dedupab")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def run(hashed: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      val (pairs, prefix) = graft.operators.DedupQueries.jaccardPairsBuild(
        graft.operators.DedupQueries.shingleSets(spark, sfDir), 0.8,
        hashedPrefix = hashed)
      val n = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      prefix.unpersist()
      (sec, n)
    }

    // equality first (one run each, exact row compare)
    val (pa, ia) = graft.operators.DedupQueries.jaccardPairsBuild(
      graft.operators.DedupQueries.shingleSets(spark, sfDir), 0.8, hashedPrefix = false)
    val (pb, ib) = graft.operators.DedupQueries.jaccardPairsBuild(
      graft.operators.DedupQueries.shingleSets(spark, sfDir), 0.8, hashedPrefix = true)
    val ra = pa.orderBy("a", "b").collect().map(_.toSeq).toSeq
    val rb = pb.orderBy("a", "b").collect().map(_.toSeq).toSeq
    ia.unpersist(); ib.unpersist()
    println(s"[dedupab] equality: string=${ra.size} hashed=${rb.size} identical=${ra == rb}")
    require(ra == rb, "pair sets differ!")

    val as = Seq.newBuilder[Double]; val bs = Seq.newBuilder[Double]
    (1 to reps).foreach { i =>
      val (sa, na) = run(hashed = false)
      val (sb, nb) = run(hashed = true)
      as += sa; bs += sb
      println(f"[dedupab] rep$i string $sa%.3f s ($na) | hashed $sb%.3f s ($nb)")
    }
    def stats(xs: Seq[Double]): String = {
      val s = xs.sorted
      f"min=${s.head}%.3f med=${s(s.size / 2)}%.3f"
    }
    println(s"[dedupab] string: ${stats(as.result())} | hashed: ${stats(bs.result())}")
    spark.stop()
  }
}

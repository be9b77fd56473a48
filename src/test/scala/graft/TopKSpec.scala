package graft

import org.apache.spark.sql.functions._

/** Pins the Misra-Gries frequent-items summary (functions.TopKAgg): the
  * three order-independent theorems (underestimate, N/(m+1) error bound,
  * guaranteed containment of heavy keys) on a deterministic stream, and
  * that an EXPLICIT pairwise merge of two summaries preserves them —
  * the property that lets partial aggregates combine map-side on a
  * cluster (Mergeable Summaries, PODS 2012). */
class TopKSpec extends SparkSpec {

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def assertBounds(est: Map[String, Long], xs: Seq[String], m: Int): Unit = {
    val exact = exactCounts(xs)
    val slack = xs.size.toDouble / (m + 1)
    assert(est.size <= m, s"summary must hold <= $m counters, got ${est.size}")
    exact.foreach { case (k, c) =>
      val e = est.getOrElse(k, 0L)
      assert(e <= c, s"overestimate for $k: est $e > exact $c")
      assert(e >= c - slack, s"error bound broken for $k: est $e < $c - $slack")
      if (c > slack) assert(est.contains(k), s"heavy key $k (exact $c > $slack) missing")
    }
    // no phantom keys: every surviving counter is a real key
    est.keys.foreach(k => assert(exact.contains(k), s"phantom key $k"))
  }

  test("MG summary bounds hold; explicit merge of two summaries preserves them") {
    val m = 4
    val agg = new functions.TopKAgg(m)
    // zipf-ish halves over 10 distinct keys — m = 4 forces decrements
    def stream(seed: Int): Seq[String] =
      (0 until 500).map { i =>
        val r = (i * 2654435761L + seed) & 0x7fffffffL
        val z = (r % 55).toInt
        // cumulative zipf-ish buckets: k0 heavy, tail light
        val k = if (z < 20) 0 else if (z < 32) 1 else if (z < 40) 2
          else if (z < 46) 3 else 4 + (z % 6)
        s"k$k"
      }
    val (xs, ys) = (stream(1), stream(7))
    def summarize(s: Seq[String]): functions.TopKAgg.Buf =
      s.foldLeft(agg.zero)(agg.reduce)
    val bx = summarize(xs)
    val by = summarize(ys)
    assertBounds(agg.finish(bx), xs, m)
    assertBounds(agg.finish(by), ys, m)
    // the cluster property: merge(summary(A), summary(B)) obeys the same
    // bounds over A ++ B
    assertBounds(agg.finish(agg.merge(bx, by)), xs ++ ys, m)
  }

  test("distributed: per-source character sketches stay bounded vs exact") {
    val dir = sf()
    val m = 16
    val chars = Tables.load(spark, dir, "documents")
      .select(col("source"),
        explode(split(regexp_replace(col("text"), " ", ""), "")).as("ch"))
      .filter(length(col("ch")) > 0)
    // one sketch per source — each flows through Spark's partial/final
    // merge machinery (the udaf path exercises reduce AND merge)
    val perSource = chars.groupBy(col("source"))
      .agg(functions.TopKAgg.topk(col("ch"), m).as("sk"), count(lit(1)).as("n"))
      .collect()
    val exact = chars.groupBy(col("source"), col("ch")).count().collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    perSource.foreach { row =>
      val src = row.getString(0)
      val est = row.getMap[String, Long](1).toMap
      val n = row.getLong(2)
      val slack = n.toDouble / (m + 1)
      assert(est.size <= m)
      exact(src).foreach { case (k, c) =>
        val e = est.getOrElse(k, 0L)
        assert(e <= c && e >= c - slack,
          s"source $src key $k: est $e outside [${c - slack}, $c]")
        if (c > slack) assert(est.contains(k), s"source $src heavy key $k missing")
      }
    }
  }
}

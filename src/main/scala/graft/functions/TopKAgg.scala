package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state frequent-items sketch (Misra-Gries summary, the
  * SpaceSaving/heavy-hitters family) as a distributed `Aggregator`
  * (SURVEY §2.13 "sketches at scale" — the reference has no sketch
  * surface at all; its aggregation enum stops at COUNT/SUM/AVG/MIN/MAX,
  * kv/AggregateFunction.java:8-14).
  *
  * The 100-TB rationale: exact top-k over a key column is a full
  * groupBy — shuffle state linear in DISTINCT KEYS, which for
  * token/URL/user-id streams is itself corpus-scale. This summary keeps
  * AT MOST `m` counters per partial aggregate no matter how many
  * distinct keys flow through it, merges associatively map-side (the
  * same partial/final split every native agg gets), and still
  * guarantees every key with frequency > N/(m+1) survives to the final
  * summary.
  *
  * Guarantees (classic MG analysis; merging per Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012, which
  * proves the pairwise merge below preserves the bound):
  *   - UNDERESTIMATE: est(x) ≤ exact(x) for every key (counters only
  *     ever absorb real arrivals; decrements subtract).
  *   - ERROR BOUND:   est(x) ≥ exact(x) − N/(m+1), with est(x) = 0 for
  *     keys not in the summary (each decrement epoch removes ≥ m+1
  *     total count, so there are ≤ N/(m+1) epochs, and any key loses at
  *     most one count per epoch).
  *   - CONTAINMENT:   any key with exact(x) > N/(m+1) is present.
  * Which keys survive NEAR the threshold (and their exact est values)
  * depends on arrival/merge order — so gates must assert the bounds,
  * never the raw estimates.
  */
final class TopKAgg(m: Int)
    extends Aggregator[String, TopKAgg.Buf, Map[String, Long]] {
  require(m >= 1, s"capacity must be >= 1, got $m")

  override def zero: TopKAgg.Buf = TopKAgg.Buf(Array.empty, Array.empty)

  override def reduce(b: TopKAgg.Buf, x: String): TopKAgg.Buf = {
    var i = 0
    while (i < b.keys.length && b.keys(i) != x) i += 1
    if (i < b.keys.length) { b.counts(i) += 1L; b }
    else if (b.keys.length < m)
      TopKAgg.Buf(b.keys :+ x, b.counts :+ 1L)
    else {
      // full: the arriving key is the conceptual (m+1)-th counter at 1 —
      // decrement every counter (it included, so it vanishes), drop zeros
      var nz = 0
      i = 0
      while (i < b.counts.length) {
        b.counts(i) -= 1L
        if (b.counts(i) > 0L) nz += 1
        i += 1
      }
      if (nz == b.counts.length) b
      else {
        val ks = new Array[String](nz); val cs = new Array[Long](nz)
        var j = 0; i = 0
        while (i < b.counts.length) {
          if (b.counts(i) > 0L) { ks(j) = b.keys(i); cs(j) = b.counts(i); j += 1 }
          i += 1
        }
        TopKAgg.Buf(ks, cs)
      }
    }
  }

  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    // pointwise counter sum, then the Mergeable-Summaries compaction:
    // subtract the (m+1)-th largest counter from all, drop non-positive
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < a.keys.length) { acc.update(a.keys(i), acc.getOrElse(a.keys(i), 0L) + a.counts(i)); i += 1 }
    i = 0
    while (i < b.keys.length) { acc.update(b.keys(i), acc.getOrElse(b.keys(i), 0L) + b.counts(i)); i += 1 }
    if (acc.size <= m) TopKAgg.Buf(acc.keys.toArray, acc.values.toArray)
    else {
      val sorted = acc.values.toArray.sorted(Ordering[Long].reverse)
      val cstar = sorted(m) // (m+1)-th largest
      val kept = acc.iterator.map { case (k, v) => (k, v - cstar) }
        .filter(_._2 > 0L).toArray
      TopKAgg.Buf(kept.map(_._1), kept.map(_._2))
    }
  }

  override def finish(b: TopKAgg.Buf): Map[String, Long] =
    b.keys.zip(b.counts).toMap

  override def bufferEncoder: Encoder[TopKAgg.Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TopKAgg.Buf]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object TopKAgg {
  /** Summary buffer, struct-of-arrays (the StreamingDedup lesson: two
    * flat arrays encode as primitive/UTF8 blocks; a Map buffer would
    * round-trip through slower map encoding on every partial merge). */
  final case class Buf(keys: Array[String], counts: Array[Long])

  /** Column form: approx_top_k(item, m) for use in agg(); returns a
    * map<string,bigint> of ≤ m surviving keys → estimated counts. */
  def topk(item: Column, m: Int): Column =
    org.apache.spark.sql.functions.udaf(new TopKAgg(m),
      org.apache.spark.sql.Encoders.STRING).apply(item)
}

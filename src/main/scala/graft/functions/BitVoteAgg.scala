package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash bit-vote aggregation fused into ONE pass (SURVEY §2.12 custom
  * aggregates): per (doc, term) row the weighted bit votes accumulate
  * into a single buffer, and `finish` assembles the signature — bit b
  * set iff vote b is positive. Width is 60 bits — every bit the 15-hex-
  * digit md5 term hash provides — so the 4-band LSH over the signature
  * gets 15-bit band keys (32768 buckets per band): bucket count scales
  * far past any corpus this runs on, where the earlier 32-bit/8-bit-band
  * form capped at 256 buckets per band and made in-band candidates grow
  * n²/256 — the fixed-width-bucket hazard. The hamming ≤ 3 pigeonhole
  * guarantee (any pair within distance 3 shares at least one of the 4
  * bands exactly) is width-independent.
  *
  * Scale rationale: the declarative spelling explodes every term row ×60
  * (one row per bit) and shuffles all of them into a (doc, bit) groupBy —
  * 60× the shuffle volume of the input. This Aggregator reduces locally
  * (partial aggregation), so exactly 60 longs per document cross the
  * wire regardless of document length. Semantics are bit-identical to the
  * explode+groupBy form: vote(b) = Σ_terms (cnt if hash bit b set else
  * -cnt), signature = Σ_{b: vote(b)>0} 2^b.
  */
object BitVoteAgg extends Aggregator[(Long, Long), Array[Long], Long] {

  val Bits = 60

  override def zero: Array[Long] = new Array[Long](Bits)

  override def reduce(votes: Array[Long], row: (Long, Long)): Array[Long] = {
    val (h, cnt) = row
    var b = 0
    while (b < Bits) {
      votes(b) += (if (((h >> b) & 1L) == 1L) cnt else -cnt)
      b += 1
    }
    votes
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var b = 0
    while (b < Bits) { x(b) += y(b); b += 1 }
    x
  }

  override def finish(votes: Array[Long]): Long = {
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong

  /** Column form: simhash60(hash, cnt) for use in agg(). */
  def simhash60(hash: Column, cnt: Column): Column =
    org.apache.spark.sql.functions.udaf(this,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .apply(hash, cnt)
}

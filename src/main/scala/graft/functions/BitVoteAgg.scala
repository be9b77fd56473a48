package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash bit-vote aggregation fused into ONE pass (SURVEY §2.12 custom
  * aggregates): per (doc, term) row the weighted bit votes accumulate
  * into a single buffer, and `finish` assembles the signature — bit b
  * set iff vote b is positive. The width is a PARAMETER (≤ 60 bits, the
  * entropy a 15-hex-digit md5 slice carries): `dedup_simhash` derives it
  * from corpus size (band bits = smallest k in [16, 30] with 2^k ≥ n,
  * the same integer-exact find-first idiom as `lshSketchWidth`) and runs
  * TWO of these aggregates over two independent md5 slices, so the full
  * signature is 4·k bits (64 at small corpora, up to 120 at 10⁹ docs)
  * and the 4-band LSH's band keys keep expected bucket occupancy ~1 at
  * any corpus size — no fixed-width bucket hazard. The hamming ≤ 3
  * pigeonhole guarantee (any pair within distance 3 shares at least one
  * of the 4 bands exactly) is width-independent.
  *
  * Scale rationale: the declarative spelling explodes every term row ×W
  * (one row per bit) and shuffles all of them into a (doc, bit) groupBy —
  * W× the shuffle volume of the input. This Aggregator reduces locally
  * (partial aggregation), so exactly W longs per document cross the
  * wire regardless of document length. Semantics are bit-identical to the
  * explode+groupBy form: vote(b) = Σ_terms (cnt if hash bit b set else
  * -cnt), signature = Σ_{b: vote(b)>0} 2^b.
  */
final class BitVoteAgg(bits: Int) extends Aggregator[(Long, Long), Array[Long], Long] {
  require(bits >= 1 && bits <= 60, s"simhash width must be in [1, 60], got $bits")

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(votes: Array[Long], row: (Long, Long)): Array[Long] = {
    val (h, cnt) = row
    var b = 0
    while (b < bits) {
      votes(b) += (if (((h >> b) & 1L) == 1L) cnt else -cnt)
      b += 1
    }
    votes
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var b = 0
    while (b < bits) { x(b) += y(b); b += 1 }
    x
  }

  override def finish(votes: Array[Long]): Long = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

object BitVoteAgg {
  /** Column form: simhash(hash, cnt, bits) for use in agg(). */
  def simhash(hash: Column, cnt: Column, bits: Int): Column =
    org.apache.spark.sql.functions.udaf(new BitVoteAgg(bits),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .apply(hash, cnt)
}

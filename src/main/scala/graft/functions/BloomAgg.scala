package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, lit, udf, xxhash64}

/** Distributed Bloom-filter build as a custom `Aggregator` (SURVEY §2.12
  * custom-aggregate family; cf. reference sketch use in
  * `sql/execution/aggregates` — re-expressed Spark-first like
  * [[MinHashAgg]]). Input is a pre-hashed (h1, h2) pair per element —
  * the engine computes both with codegen'd `xxhash64` so the aggregator
  * itself never touches strings. Bit positions follow Kirsch–Mitzenmacher
  * double hashing: position_i = (h1 + i·h2) mod m, which preserves the
  * standard Bloom false-positive bound with only two base hashes.
  *
  * Scale shape: the buffer is an `Array[Long]` bitset that OR-merges, so
  * partial aggregation applies — each partition reduces its elements
  * locally and only m/8 bytes per partition cross the wire, independent
  * of element count. The finished filter is a compact broadcastable
  * stand-in for an eval set too large to broadcast as raw keys: probing
  * it costs k word reads per row with zero shuffle.
  *
  * A Bloom filter has NO false negatives by construction (every inserted
  * element's bits are set; OR-merge never clears a bit), so a
  * bloom-prefilter → exact-verify pipeline is exactly correct — the
  * filter only bounds how much work the verify join sees. BloomSpec pins
  * the no-false-negative property and the false-positive rate.
  */
class BloomAgg(mBits: Int, k: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(Integer.bitCount(mBits) == 1 && mBits >= 64,
    s"mBits must be a power of two >= 64, got $mBits")

  override def zero: Array[Long] = new Array[Long](mBits >>> 6)

  override def reduce(b: Array[Long], h: (Long, Long)): Array[Long] = {
    BloomAgg.setBits(b, k, h._1, h._2)
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object BloomAgg {
  /** Default hash count: at m = 16n bits, k = 5 gives
    * fp ≈ (1 − e^{−5/16})^5 ≈ 1.4e-3 — within 4× of the optimum
    * k = (m/n)·ln 2 ≈ 11 at half the probe cost. */
  val K = 5

  /** Filter size for `n` inserted elements: smallest power of two giving
    * ≥ 16 bits/element, floored at 1024 bits and capped at 2^27 bits
    * (16 MiB — still a trivial broadcast). Past the cap the false-positive
    * rate degrades gracefully and the exact verify join stays correct;
    * only the prefilter's selectivity suffers. */
  def sizeFor(n: Long): Int = {
    var m = 1024L
    while (m < n * 16 && m < (1L << 27)) m <<= 1
    m.toInt
  }

  /** The filter's geometry lives in the array itself (mBits =
    * bits.length·64) — set/probe derive the mask from the array they are
    * handed, so a stale externally-tracked mBits can never silently
    * misalign the probe positions and break the no-false-negative
    * guarantee. */
  private[graft] def setBits(
      bits: Array[Long], k: Int, h1: Long, h2: Long): Unit = {
    val mask = (bits.length << 6) - 1
    var i = 0
    var h = h1
    while (i < k) {
      val pos = (h & Long.MaxValue).toInt & mask
      bits(pos >>> 6) |= 1L << (pos & 63)
      h += h2
      i += 1
    }
  }

  /** Probe: true iff all k bit positions for (h1, h2) are set. Pure long
    * math over a broadcast array — cheap enough that the UDF wrapper (two
    * long inputs, no serialization beyond them) is not a hot-path hazard;
    * the expensive hashing stays in codegen'd xxhash64. */
  def mightContain(bits: Array[Long], k: Int, h1: Long, h2: Long): Boolean = {
    val mask = (bits.length << 6) - 1
    var i = 0
    var h = h1
    while (i < k) {
      val pos = (h & Long.MaxValue).toInt & mask
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  /** THE hash derivation, in one place: two independent 64-bit values
    * from codegen'd xxhash64 (the second salted by an extra column).
    * Build and probe must route through this pair — a one-sided change
    * would manufacture false negatives. */
  def hashPair(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit("g2")))

  /** Distributed build over `df`'s `keyCol`, sized from the dataframe's
    * row count (one action — callers hand the SMALL side). */
  def buildFrom(df: DataFrame, keyCol: String): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    val mBits = sizeFor(df.count().max(1L))
    val (h1, h2) = hashPair(col(keyCol))
    df.select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
      .select(new BloomAgg(mBits, K).toColumn).head()
  }

  /** Prefilter `df` to rows whose `keyCol` might be in the filter: the
    * broadcast bitset probes executor-locally, no shuffle, no state. */
  def prefilter(df: DataFrame, keyCol: String, bits: Array[Long]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(bits)
    val might = udf((h1: Long, h2: Long) => mightContain(bc.value, K, h1, h2))
    val (h1, h2) = hashPair(col(keyCol))
    df.filter(might(h1, h2))
  }
}

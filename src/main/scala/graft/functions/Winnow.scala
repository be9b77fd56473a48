package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003; the MOSS
  * algorithm) over a TRUE Rabin-Karp rolling hash:
  *
  *   - k-gram hashes: polynomial hash h(c_0..c_{k-1}) = Σ c_j·B^{k-1-j} mod M
  *     over the text's bytes, computed with the O(1) rolling update
  *     h' = (h − c_out·B^{k-1})·B + c_in (mod M) — one pass per document,
  *     never O(n·k).
  *   - winnowing: over every window of `w` consecutive gram hashes keep the
  *     minimum, ties broken by the RIGHTMOST position (the paper's rule);
  *     consecutive windows sharing a winner record it once. Guarantees: any
  *     shared substring of length ≥ k+w−1 contributes at least one common
  *     fingerprint, and fingerprint density is ~2/(w+1) — position-robust
  *     dedup/provenance signatures at a fraction of full-shingle cost.
  *
  * Scale shape: per-document, payload-local, no state across rows — the
  * classic mapPartitions-free narrow map. The DuckDB oracle replays the
  * same hashes DECLARATIVELY (Horner via list_reduce + explicit window
  * argmin) — the rolling update is algebraically identical to Horner mod M,
  * which WinnowSpec pins against a naive recompute.
  *
  * ASCII precondition (same as mm_decode_features): byte-level hashing here
  * equals DuckDB's codepoint-level ord(substr(...)) only for ASCII text,
  * which holds for this corpus.
  */
object WinnowOps {
  val K = 8                 // gram length (bytes)
  val W = 4                 // winnow window (grams)
  val B = 31L               // polynomial base
  val M = 1000000007L       // modulus (fits Horner steps in a long)

  /** B^(K-1) mod M — the rolling-update "out" coefficient. */
  val PowOut: Long = {
    var p = 1L
    var i = 0
    while (i < K - 1) { p = p * B % M; i += 1 }
    p
  }

  /** (pos, fp) fingerprints of `bytes`; pos is the 1-based gram start, to
    * match the oracle's substr indexing. Empty when fewer than W grams. */
  def fingerprints(bytes: Array[Byte]): Array[(Int, Long)] = {
    val n = bytes.length
    val ng = n - K + 1
    if (ng < W) return Array.empty
    val h = new Array[Long](ng)
    // first gram: Horner
    var acc = 0L
    var j = 0
    while (j < K) { acc = (acc * B + (bytes(j) & 0xffL)) % M; j += 1 }
    h(0) = acc
    // rolling update; (acc − c_out·PowOut) can go negative → re-center
    var i = 1
    while (i < ng) {
      acc = (acc - (bytes(i - 1) & 0xffL) * PowOut % M + M) % M
      acc = (acc * B + (bytes(i + K - 1) & 0xffL)) % M
      h(i) = acc
      i += 1
    }
    // winnow: ascending-min deque of indices; popping `>=` on push makes
    // the rightmost of equal minima win, per the paper's tie rule
    val deque = new Array[Int](ng)
    var head = 0; var tail = 0 // [head, tail)
    val out = scala.collection.mutable.LinkedHashSet[Int]()
    var p = 0
    while (p < ng) {
      while (tail > head && h(deque(tail - 1)) >= h(p)) tail -= 1
      deque(tail) = p; tail += 1
      if (deque(head) <= p - W) head += 1
      if (p >= W - 1) out += deque(head) // window [p-W+1, p] complete
      p += 1
    }
    out.iterator.map(idx => (idx + 1, h(idx))).toArray
  }
}

/** winnow(text) → array<struct<pos:int, fp:bigint>>. */
case class WinnowExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private val outStruct = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(outStruct, containsNull = false)
  override def nullSafeEval(t: Any): Any = {
    val fps = WinnowOps.fingerprints(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    new GenericArrayData(fps.map { case (pos, fp) =>
      new GenericInternalRow(Array[Any](pos, fp))
    }.toArray[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFunctions {
  def winnow(text: Column): Column =
    Bridge.column(WinnowExpr(Bridge.expression(text)))
}

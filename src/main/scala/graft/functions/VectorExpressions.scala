package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot inner loops of the similarity /
  * dedup operators (SURVEY §2.12: custom `Expression` only where codegen
  * performance demands — these are those cases).
  *
  * Both reproduce, bit-for-bit, the semantics of the composed-builtin
  * formulations they replace (and of the DuckDB oracle):
  *  - [[DotExactExpr]] ≡ aggregate(zip_with(a,b,*), 0 :: decimal(20,12), +)
  *    — each double product quantized to scale 12 with HALF_UP (exactly
  *    Spark's double→decimal cast), accumulated exactly in a long.
  *  - [[MinHashExpr]] ≡ k independent min-hashes h_i(s) = first 15 hex
  *    digits of md5(s + "#" + i) — computed in ONE pass over the shingle
  *    array instead of an explode(×k) + shuffle + groupBy.
  */
object FastOps {

  /** µ-unit (scale-6) quantization of one ELEMENT, half away from zero —
    * the lockstep primitive behind every exact dot product since the r14
    * sf1 sweep. The pre-r14 semantics quantized the per-element PRODUCT
    * to scale 12, which pinned the engine to Spark's exact-expansion
    * HALF_UP while the oracle rode DuckDB's double-multiply CAST — two
    * algorithms that disagree whenever the product's exact ·10^12 image
    * sits within a double-rounding window of a .5 boundary (~2e-6 per
    * element; first struck at sf1 volume). Quantizing the ELEMENT instead
    * is decision-free for FLOAT inputs: v·10^6 = m·5^6/2^(k-6) needs at
    * most 24+14 = 38 significant bits, so fl(v·10^6) is EXACT, x+0.5 is
    * exact (39 bits), and floor half-away-from-zero here computes the
    * same integer as DuckDB's round() on the same exact double — zero
    * ambiguity, on every float, on both engines. (For an arbitrary
    * DOUBLE operand — the LSH hyperplane side — v·10^6 can round first,
    * leaving a ~1e-10-per-element ambiguity window: four orders tighter
    * than the old product quantization.) */
  private def q6(v: Double): Long = {
    val x = v * 1e6
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(0.5 - x)).toLong
  }

  /** Exact dot product of two µ-quantized float vectors:
    * Σ q6(aᵢ)·q6(bᵢ) in long arithmetic, then ONE correctly-rounded
    * conversion to double — bit-identical to the oracle's
    * SUM(round(a·10^6)·round(b·10^6))/1e12.
    *
    * OPERATIVE BOUND: the ORACLE side sums the per-element products in
    * DOUBLE arithmetic, so every partial sum must stay below 2^53 for
    * that sum to be exact — i.e. n·(10^6·max|v|)² < 2^53, ~2.8× tighter
    * per-element magnitude than the engine's own long-overflow limit of
    * 2^63 (which is NOT the binding constraint). At n = 64 that caps
    * max|v| at ≈ 11.8; unit-ish embeddings (max|v| ≤ ~1.5, asserted at
    * fixture build — see ScaleProbe.scaleEmbeddings) sit 60× inside it.
    * Corpora with larger-magnitude vectors must rescale or the oracle's
    * double sum silently loses exactness before the engine does. */
  def dotExact(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += q6(a.getFloat(i).toDouble) * q6(b.getFloat(i).toDouble)
      i += 1
    }
    new JBigDecimal(java.math.BigInteger.valueOf(acc), 12).doubleValue()
  }

  /** [[dotExact]] over pre-decoded primitive arrays — same quantized
    * arithmetic, no per-element virtual ArrayData reads (the blocked
    * kernel decodes each block once and calls this per pair). */
  def dotExactF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += q6(a(i).toDouble) * q6(b(i).toDouble)
      i += 1
    }
    new JBigDecimal(java.math.BigInteger.valueOf(acc), 12).doubleValue()
  }

  /** Plain double dot — the cheap PRE-FILTER for the exact kernels: ~20×
    * faster than the quantized loop (no per-element rounding decision).
    * Accumulation error is ≤ (n−1)·eps·‖a‖‖b‖ ≈ 1.4e-14·‖a‖‖b‖ at
    * n = 64, and the µ-quantized dot differs from the true dot by ≤
    * Σᵢ 5e-7·(|aᵢ|+|bᵢ|) ≈ 4e-6·(‖a‖₁+‖b‖₁)/8 for n = 64 — so a
    * candidate whose double cosine falls below thr − 1e-4 can NEVER
    * reach thr under the exact dot (norm-side quantization shifts den by
    * a further ~1e-6 relative, absorbed by the same margin). The emitted
    * cosine always comes from [[dotExactF]]; this only skips pairs that
    * are provably below threshold.
    *
    * MINIMUM-NORM ASSUMPTION: the 1e-4 margin is an absolute COSINE
    * margin, but the quantized dot's absolute error (~n·5e-7·max|v|·2)
    * divides by den = ‖a‖·‖b‖ when converted to cosine. The "never lose
    * a true pair" guarantee therefore requires den ≳ 0.1 at n = 64.
    * Real embedding corpora are unit-ish-norm and clear this easily; a
    * corpus with near-zero vectors must scale the margin by 1/den (or
    * drop the pre-filter) or risk silently losing above-threshold
    * pairs. */
  def dotDoubleF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  /** Quantize a whole float vector ONCE (q6 per element). Element-wise
    * quantization (unlike the pre-r14 per-PRODUCT scheme) factors through
    * the pair loop: a blocked kernel quantizes each block O(n·dim) at
    * decode time and every pair's exact dot is then [[dotExactQ]]'s pure
    * long multiply-add — no per-pair floor/branch work at all. */
  def q6Vec(v: Array[Float]): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { out(i) = q6(v(i).toDouble); i += 1 }
    out
  }

  /** Exact dot over pre-quantized ([[q6Vec]]) vectors — identical result
    * to [[dotExactF]] on the original floats (same integer sum, same one
    * correctly-rounded scale-12 conversion), minus the per-pair
    * quantization cost. */
  def dotExactQ(a: Array[Long], b: Array[Long]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    new JBigDecimal(java.math.BigInteger.valueOf(acc), 12).doubleValue()
  }

  /** Same µ-quantized dot where the second side is double (e.g. LSH
    * hyperplanes) — see [[q6]] for the (tiny) ambiguity window the
    * arbitrary-double side retains. */
  def dotExactFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += q6(a.getFloat(i).toDouble) * q6(b.getDouble(i))
      i += 1
    }
    new JBigDecimal(java.math.BigInteger.valueOf(acc), 12).doubleValue()
  }

  /** k min-hashes over a shingle array in one pass: min over shingles of
    * long(md5(shingle + "#" + i).hex.substring(0,15), 16). */
  def minHash(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    // suffix bytes for "#<i>" precomputed once — the hot loop feeds the
    // digest straight from the UTF8String's bytes, no per-(shingle,i)
    // String concat / re-encode
    val suffixes = Array.tabulate(k)(i => ("#" + i).getBytes("UTF-8"))
    var s = 0
    val n = shingles.numElements()
    while (s < n) {
      val base = shingles.getUTF8String(s).getBytes // UTF-8 already
      var i = 0
      while (i < k) {
        md.reset()
        md.update(base)
        md.update(suffixes(i))
        val digest = md.digest()
        // first 15 hex chars = 60 bits: digest[0..6] full bytes + high nibble of digest[7]
        var v = 0L
        var bi = 0
        while (bi < 7) { v = (v << 8) | (digest(bi) & 0xffL); bi += 1 }
        v = (v << 4) | ((digest(7) & 0xf0L) >> 4)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** shingles(text, n) → array<string>: distinct word n-grams of a single-
  * space-tokenized text in one pass, first-occurrence order — semantically
  * identical to array_distinct(transform(sequence(0, size-n),
  * i -> array_join(slice(tokens, i+1, n), ' '))) but without the
  * interpreted per-element lambda chain (which dominated the dedup
  * queries' runtime).
  */
object ShingleOps {
  def shingles(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    // split(" ", -1): KEEP interior and trailing empty tokens. Both
    // Spark's split() (the compositional equivalent this kernel
    // replaces) and DuckDB's string_split (the oracle) keep them;
    // String.split(' ') drops trailing empties, so a text ending in a
    // doubled/trailing space would shingle differently here than in the
    // ≥n-token filters and oracles built on split() — an empty Spark
    // shingle set against a non-empty oracle set, and a 0-size Jaccard
    // denominator. Pinned by the doubled-space test in BloomSpec.
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next()); k += 1
    }
    new GenericArrayData(out)
  }
}

case class ShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any, n: Any): Any =
    ShingleOps.shingles(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleOps.shingles($t, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot_exact(array<float>, array<float>) → double; codegen emits a single
  * static call (no per-element Catalyst interpretation). */
case class DotExactExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    FastOps.dotExact(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.FastOps.dotExact($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot_exact_fd(array<float>, array<double>) → double. */
case class DotExactFDExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    FastOps.dotExactFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.FastOps.dotExactFD($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** minhash(array<string>, k) → array<bigint>: the k-wise signature in one
  * pass (k is a literal). */
case class MinHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, k: Any): Any =
    FastOps.minHash(a.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.functions.FastOps.minHash($a, $k);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API façade for the native expressions. */
object VectorFunctions {
  def dotExact(a: Column, b: Column): Column =
    Bridge.column(DotExactExpr(Bridge.expression(a), Bridge.expression(b)))
  def dotExactFD(a: Column, b: Column): Column =
    Bridge.column(DotExactFDExpr(Bridge.expression(a), Bridge.expression(b)))
  def minHash(shingles: Column, k: Int): Column =
    Bridge.column(MinHashExpr(Bridge.expression(shingles),
      org.apache.spark.sql.catalyst.expressions.Literal(k)))
  def shingles(text: Column, n: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
}

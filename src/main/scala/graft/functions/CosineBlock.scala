package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Blocked all-pairs cosine kernel: given two blocks of vectors (arrays of
  * (id, embedding, norm) structs), emit every cross pair with cosine >=
  * threshold, using the same decimal(·,12)-quantized dot product as
  * [[DotExactExpr]] so results are bit-identical to the row-pair
  * formulation and the DuckDB oracle.
  *
  * Why: a pairwise self-join materializes O(n²) wide rows (the embeddings
  * duplicated per pair) before any arithmetic happens; blocking moves the
  * pair loop inside ONE expression call per block pair — B² calls instead
  * of n² rows, the classic BLAS-style blocked nested loop. `same = true`
  * restricts to the upper triangle within a block; across blocks every
  * (i, j) pair is emitted once with ids ordered.
  */
case class CosinePairsExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {

  private val outStruct = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(outStruct, containsNull = false)

  /** Decode a block ONCE into primitive arrays. The pair loop otherwise
    * re-wraps the same UnsafeRow structs and re-reads every embedding
    * element through ArrayData's virtual getFloat per pair — an O(n²·dim)
    * stream of allocations and megamorphic calls; decoding is O(n·dim)
    * and lets the dot loop run over flat float[]s. */
  private def decode(blk: ArrayData): (Array[Long], Array[Array[Float]], Array[Double]) = {
    val n = blk.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = blk.getStruct(i, 3)
      ids(i) = r.getLong(0)
      vecs(i) = r.getArray(1).toFloatArray()
      norms(i) = r.getDouble(2)
      i += 1
    }
    (ids, vecs, norms)
  }

  override def eval(input: InternalRow): Any = {
    val aBlk = children(0).eval(input).asInstanceOf[ArrayData]
    val bBlk = children(1).eval(input).asInstanceOf[ArrayData]
    val thr = children(2).eval(input).asInstanceOf[Double]
    val same = children(3).eval(input).asInstanceOf[Boolean]
    val (aIds, aVecs, aNorms) = decode(aBlk)
    val (bIds, bVecs, bNorms) = decode(bBlk)
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    val nA = aIds.length
    val nB = bIds.length
    var i = 0
    while (i < nA) {
      val ida = aIds(i); val ea = aVecs(i); val na = aNorms(i)
      var j = if (same) i + 1 else 0
      while (j < nB) {
        val cos = FastOps.dotExactF(ea, bVecs(j)) / (na * bNorms(j))
        if (cos >= thr) {
          val idb = bIds(j)
          val (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
          out += new GenericInternalRow(Array[Any](lo, hi, cos))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object CosineBlock {
  /** cosine_pairs(blockA, blockB, thr, sameBlock) → array<struct<a,b,cosine>> */
  def pairs(a: Column, b: Column, thr: Double, same: Column): Column =
    Bridge.column(CosinePairsExpr(Seq(
      Bridge.expression(a), Bridge.expression(b), Literal(thr),
      Bridge.expression(same))))
}

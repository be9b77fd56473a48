package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Group-level MinHash union (SURVEY §2.12: `Aggregator` for custom
  * aggregates — "minhash union" named explicitly). Merging the signatures
  * of a set of documents by elementwise min yields the signature of the
  * UNION of their shingle sets — the standard trick that lets near-dup
  * statistics roll up hierarchically (per-source, per-shard, per-corpus)
  * without revisiting the documents. Partial aggregation applies: each
  * partition reduces locally, only k longs per group cross the wire.
  */
object MinHashAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
    if (b.isEmpty) a.toArray else merge0(b, a)

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.isEmpty) y else if (y.isEmpty) x else merge0(x, y)

  private def merge0(x: Array[Long], y: Seq[Long]): Array[Long] = {
    val n = math.min(x.length, y.length)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.min(x(i), y(i)); i += 1 }
    out
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column form: minhash_union(sig) for use in agg(). */
  def union(sig: Column): Column =
    org.apache.spark.sql.functions.udaf(this).apply(sig)
}

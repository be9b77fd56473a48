package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous quality-gating of a document ingest stream with a PUBLISHED
  * classifier model — the streaming twin of `text_classifier_infer`
  * (SURVEY §2.11 extension; the reference has no streaming surface). The
  * operational setting: the weight table is a release artifact retrained
  * offline (text_classifier_train), while crawl documents arrive
  * continuously and must be scored before entering the corpus.
  *
  * Shape: the 65-entry model compiles INTO the expression as a map
  * literal — no join, no broadcast exchange, no state. Each document's
  * margin is Σ_tokens w(bucket(token)) + w(intercept) in exact long
  * arithmetic: identical to the batch Σ_b c_b·w_b fold (grouping tokens
  * by bucket first is the same sum reordered, and long addition is
  * associative-commutative exactly), with model-absent buckets scoring 0
  * in both paths (the batch join drops them; coalesce-0 here). Fully
  * STATELESS — append-mode safe, narrow per-row work, so sustained
  * throughput is batch-local compute with no state growth.
  */
object StreamingClassifier {

  /** Per-doc exact margin under `weights`, as one scalar expression. The
    * bucket function is [[graft.operators.TextQueries.tokenBucket]] —
    * the ONE featurization definition train/infer/stream all share. */
  private def marginExpr(weights: Map[Long, Long]): Column = {
    val wm = map(weights.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val tokenW: (Column, Column) => Column = (acc, t) =>
      acc + coalesce(
        element_at(wm, graft.operators.TextQueries.tokenBucket(t)), lit(0L))
    aggregate(split(col("text"), " "), lit(0L), tokenW) +
      coalesce(element_at(wm, lit(-1L)), lit(0L))
  }

  /** Score a (doc_id, text) stream: (doc_id, dotq, accept) — margins
    * bit-identical to the batch `classifierScore` on the same rows. */
  def score(docs: DataFrame, weights: Map[Long, Long]): DataFrame =
    docs.select(col("doc_id"), marginExpr(weights).as("dotq"))
      .withColumn("accept", col("dotq") >= 0L)
}

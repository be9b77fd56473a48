package graft

import org.apache.spark.sql.functions._

/** Value-level checks for the text-pipeline operators the fixture can't
  * exercise directly (its synthetic word-soup contains no PII — by
  * design), plus the determinism/shape properties the hash-split and
  * weighted-mix operators promise. The DuckDB oracle gate covers their
  * exact values; these specs cover the SEMANTICS the gate can't see. */
class TextPipelineSpec extends SparkSpec {

  test("PII redaction fires on emails and digit runs") {
    import spark.implicits._
    // the same pattern chain text_pii_redact applies to the fixture
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val df = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call 555 123456"),
      (2L, "no pii here"),
      (3L, "a@b.io and c.d@e-f.org")).toDF("id", "t")
    val out = df.select(col("id"),
      regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"),
        "[0-9]+", "<NUM>").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact <EMAIL> or call <NUM> <NUM>")
    assert(out(2L) == "no pii here")
    assert(out(3L) == "<EMAIL> and <EMAIL>")
  }

  test("hash split is pure, stable, and majority-train") {
    val out = SparkEntry.queries("sample_split_hash")(spark, sf())
    val rows = out.collect()
    val bySplit = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"),
      s"80/10/10 split should be majority-train: $bySplit")
    // a rerun is bit-identical — assignment is a pure function of doc_id
    val again = SparkEntry.queries("sample_split_hash")(spark, sf()).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("weighted mix keeps at most n_in per source and keeps the corpus nonempty") {
    val rows = SparkEntry.queries("pipeline_mix_weighted")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, nIn, nKept) => nKept <= nIn })
    assert(rows.map(_._3).sum > 0)
  }

  test("kth-smallest boundary: top-k path and histogram path agree") {
    import spark.implicits._
    // duplicated values force tie handling; the two paths must agree on
    // every k because both compute the smallest v with count(<= v) >= k
    val sq = Seq(5L, 3L, 9L, 3L, 7L, 1L, 9L, 9L, 2L, 7L)
      .zipWithIndex.map { case (v, i) => (i.toLong, 1L, v) }
      .toDF("doc_id", "n_bigrams", "surprise_q")
    val sorted = Seq(1L, 2L, 3L, 3L, 5L, 7L, 7L, 9L, 9L, 9L)
    for (k <- 1 to 10) {
      val topk = graft.operators.TextQueries.kthSmallestSurprise(sq, k.toLong)
      val hist = graft.operators.TextQueries.kthSmallestSurprise(sq, k.toLong, topkMax = 0L)
      assert(topk == sorted(k - 1), s"top-k path wrong at k=$k: $topk")
      assert(hist == sorted(k - 1), s"histogram path wrong at k=$k: $hist")
    }
    // wide value range (>= 2^16) drives the histogram-REFINEMENT loop,
    // not just the final exact pass: values spread over ~10^9 with
    // duplicates and a hot boundary region
    val wide = (Seq.tabulate(300)(i => i.toLong * 7654321L) ++
      Seq.fill(5)(123L * 7654321L))
    val wsq = wide.zipWithIndex.map { case (v, i) => (i.toLong, 1L, v) }
      .toDF("doc_id", "n_bigrams", "surprise_q")
    val wsorted = wide.sorted
    for (k <- Seq(1, 2, 123, 124, 128, 129, 150, 304, 305)) {
      val topk = graft.operators.TextQueries.kthSmallestSurprise(wsq, k.toLong)
      val hist = graft.operators.TextQueries.kthSmallestSurprise(wsq, k.toLong, topkMax = 0L)
      assert(topk == wsorted(k - 1), s"top-k path wrong at k=$k: $topk")
      assert(hist == wsorted(k - 1), s"histogram path wrong at k=$k: $hist")
    }
    // pathological 64-bit span (lo near Long.MinValue, hi near
    // Long.MaxValue): `hi - lo` overflows SIGNED arithmetic, so this pins
    // the unsigned bracket math + sign-crossing XOR bucketing — under the
    // old signed width computation the refinement loop was silently
    // skipped here and the "exact pass" ran over the full value domain
    val extreme = Seq(Long.MinValue + 3, -987654321098765432L, -17L, 0L,
      12345L, 987654321098765432L, Long.MaxValue - 5, Long.MaxValue - 5)
    val esq = extreme.zipWithIndex.map { case (v, i) => (i.toLong, 1L, v) }
      .toDF("doc_id", "n_bigrams", "surprise_q")
    val esorted = extreme.sorted
    for (k <- 1 to extreme.length) {
      val hist = graft.operators.TextQueries.kthSmallestSurprise(esq, k.toLong, topkMax = 0L)
      assert(hist == esorted(k - 1), s"histogram path wrong at extreme k=$k: $hist")
    }
  }

  test("repetition signals are valid fractions and catch repetitive docs") {
    val rows = SparkEntry.queries("text_repetition_signals")(spark, sf()).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (top, dup) =>
      top > 0.0 && top <= 1.0 && dup >= 0.0 && dup < 1.0 })
    // the word-soup fixture draws from a tiny vocabulary, so repeated
    // bigrams must exist somewhere in the corpus
    assert(rows.exists { case (_, dup) => dup > 0.0 })
  }
}

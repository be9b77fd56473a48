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

  test("tertile boundaries: one-collect path equals two kth-smallest probes") {
    import spark.implicits._
    // same fixtures as the kth test: duplicates force tie handling; the
    // single TakeOrdered collect must return exactly what two
    // kthSmallestSurprise calls would, on both its branches
    val sq = Seq(5L, 3L, 9L, 3L, 7L, 1L, 9L, 9L, 2L, 7L)
      .zipWithIndex.map { case (v, i) => (i.toLong, 1L, v) }
      .toDF("doc_id", "n_bigrams", "surprise_q")
    for (k1 <- 1 to 10; k2 <- k1 to 10) {
      val (t1, t2) = graft.operators.TextQueries.tertileBoundaries(sq, k1.toLong, k2.toLong)
      assert(t1 == graft.operators.TextQueries.kthSmallestSurprise(sq, k1.toLong),
        s"t1 diverges at ($k1, $k2)")
      assert(t2 == graft.operators.TextQueries.kthSmallestSurprise(sq, k2.toLong),
        s"t2 diverges at ($k1, $k2)")
    }
    // past the top-k gate the helper must fall back to the histogram
    // probes and still agree
    val (h1, h2) = graft.operators.TextQueries.tertileBoundaries(sq, 3L, 7L, topkMax = 0L)
    assert(h1 == graft.operators.TextQueries.kthSmallestSurprise(sq, 3L) &&
      h2 == graft.operators.TextQueries.kthSmallestSurprise(sq, 7L))
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

  test("classifier training: inference margins agree bit-exactly; model learns") {
    import graft.operators.TextQueries
    val weights = TextQueries.classifierTrain(spark, sf(), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weights.contains(-1L), "intercept bucket must be in the model")
    assert(weights.values.exists(_ != 0L), "8 steps must move some weight")
    // agreement: scoring the corpus with the RETURNED weight table
    // reproduces exactly the margins a 9th training step would see —
    // the inference path and the training loop share one definition of
    // the model (same featurization, same exact BIGINT fold)
    val scored = TextQueries.classifierScore(spark, sf(), weights)
    val viaScore = scored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaTrainStep = {
      import spark.implicits._
      val docs = Tables.spread(Tables.load(spark, sf(), "documents"))
      val fx = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % 64").as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
        .unionByName(docs.select(col("doc_id"), lit(-1L).as("b"), lit(1L).as("c")))
      fx.join(broadcast(weights.toSeq.toDF("b", "wq")), Seq("b"))
        .groupBy(col("doc_id")).agg(sum(col("c") * col("wq")).as("dotq"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(viaScore == viaTrainStep, "inference margins must equal the training fold")
    // training must IMPROVE the objective on the fixture: mean log-loss
    // of the trained model beats the untrained (w = 0, σ = 1/2) model's
    // ln 2. (Accuracy can NOT beat the majority baseline here — the
    // fixture's languages share one 31-word vocabulary by design, so the
    // only label signal is distributional.)
    val lab = Tables.spread(Tables.load(spark, sf(), "documents"))
      .select(col("doc_id"), (col("lang") === "en").as("y"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val logLoss = viaScore.toSeq.map { case (d, dotq) =>
      val p = 1.0 / (1.0 + math.exp(-(dotq / 1e6)))
      if (lab(d)) -math.log(p) else -math.log(1.0 - p)
    }.sum / lab.size
    assert(logLoss < math.log(2.0) - 0.01,
      f"trained log-loss $logLoss%.4f must improve on the w=0 model's ln2")

    // on a SEPARABLE corpus the same loop must actually classify: two
    // disjoint vocabularies, one per class
    import spark.implicits._
    val synth = (0 until 200).map { i =>
      val en = i % 2 == 0
      val vocab = if (en) Seq("alpha", "beta", "gamma", "delta")
        else Seq("uno", "dos", "tres", "cuatro")
      val words = (0 until 20).map(j => vocab((i * 7 + j * 3) % vocab.size))
      (i.toLong, if (en) "en" else "es", words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val wSynth = TextQueries.classifierTrainDocs(spark, synth, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val synthAcc = TextQueries.classifierScoreDocs(spark, synth, wSynth)
      .join(synth.select(col("doc_id"), (col("lang") === "en").as("y")), "doc_id")
      .filter(col("accept") === col("y")).count().toDouble / 200
    assert(synthAcc >= 0.95,
      f"separable corpus must classify (accuracy $synthAcc%.3f)")
  }

  test("classifier training: driver-gated and distributed loops are bit-identical") {
    // the fixtures all sit inside DriverTrainGate, so the distributed
    // branch (the 100 TB path) would otherwise run in no gate or spec —
    // force it with driverGate = 0 and pin the weights bit-equal: the
    // two loops share every arithmetic step (exact Long folds + the
    // same IEEE double ops in the same order), so ANY divergence is a
    // defect, not tolerance
    import graft.operators.TextQueries
    val docs = Tables.spread(Tables.load(spark, sf(), "documents"))
    val viaDriver = TextQueries.classifierTrainDocs(spark, docs, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDistributed =
      TextQueries.classifierTrainDocs(spark, docs, iters = 4, driverGate = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaDriver.nonEmpty && viaDriver == viaDistributed,
      "driver-gated and distributed training must produce identical models")
  }

  test("classifier training refuses duplicate doc_ids") {
    // the row-local bag build trains one bag per ROW; the oracle and the
    // inference featurization merge per DOC — a duplicated doc_id must
    // refuse loudly, not silently diverge
    import graft.operators.TextQueries
    import spark.implicits._
    val dup = Seq((1L, "en", "a b c"), (1L, "en", "c d e"), (2L, "es", "x y"))
      .toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      TextQueries.classifierTrainDocs(spark, dup, iters = 1).collect()
    }
    assert(e.getMessage.contains("unique doc_ids"))
  }
}

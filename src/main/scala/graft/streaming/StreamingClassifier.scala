package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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

  // ------------------------------------------------- model hot-swap
  //
  // Production shape: the model retrains OFFLINE (text_classifier_train)
  // and re-publishes while the scoring stream keeps running. The weight
  // table is tiny (65 entries), so an epoch publish is one atomic file
  // move, and the swap point is a micro-batch boundary (the StreamingAnn
  // epoch-refresh discipline): every row of a batch is scored by exactly
  // one model version, no restart, no dropped or duplicated rows — the
  // checkpoint's exactly-once batch accounting is untouched because the
  // model is plan-side state, not stream state.

  private val EpochFile = "^epoch_(\\d+)\\.tsv$".r

  /** Publish `weights` as model epoch `epoch` under `modelDir` — write to
    * a temp name, then one atomic move, so a concurrent reader sees the
    * old set or the new set, never a torn file. */
  def publishModel(weights: Map[Long, Long], modelDir: String, epoch: Long): Unit = {
    val dir = Paths.get(modelDir)
    Files.createDirectories(dir)
    val body = weights.toSeq.sorted.map { case (b, q) => s"$b\t$q" }.mkString("\n")
    val tmp = Files.createTempFile(dir, s".epoch_$epoch", ".tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, dir.resolve(s"epoch_$epoch.tsv"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Highest published epoch under `modelDir` (listing only, no read). */
  private def latestEpoch(modelDir: String): Option[(Long, Path)] = {
    val dir = Paths.get(modelDir)
    if (!Files.isDirectory(dir)) return None
    val listing = Files.list(dir)
    try {
      val epochs = listing.iterator().asScala
        .flatMap(p => EpochFile.findFirstMatchIn(p.getFileName.toString)
          .map(m => (m.group(1).toLong, p))).toSeq
      if (epochs.isEmpty) None else Some(epochs.maxBy(_._1))
    } finally listing.close()
  }

  private def loadWeights(path: Path): Map[Long, Long] =
    Files.readAllLines(path).asScala.filter(_.nonEmpty).map { line =>
      val Array(b, q) = line.split("\t", 2)
      b.toLong -> q.toLong
    }.toMap

  /** Highest published epoch in `modelDir` and its weight table. */
  def currentModel(modelDir: String): Option[(Long, Map[Long, Long])] =
    latestEpoch(modelDir).map { case (e, p) => (e, loadWeights(p)) }

  /** Continuous scoring against the LATEST published model: each trigger
    * re-checks `modelDir` (one directory listing — the 65-entry reload
    * only happens on an epoch change) and scores the whole micro-batch
    * with that epoch's compiled margin expression, writing
    * (doc_id, dotq, accept, model_epoch) under `outDir`. A publish
    * between triggers takes effect at the next batch boundary; rows
    * inside one batch never mix models. Requires at least one published
    * epoch before the first batch — scoring with no model is a loud
    * error, never a silent accept-all.
    *
    * Exactly-once: a foreachBatch parquet APPEND is not idempotent — a
    * batch retried after a partial commit (executor loss between the
    * write and the checkpoint commit) would duplicate its rows. Each
    * batch therefore OVERWRITES its own `batch_id=<id>` subdirectory
    * (reads over `outDir` see batch_id as a partition column): a retry
    * replaces its own output, never doubles it. Restart durability needs
    * a stable `checkpointDir` — the temp-dir default serves tests and
    * ad-hoc runs, where a restart is a new stream. */
  def scoreStream(docs: DataFrame, modelDir: String, outDir: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    // per-batch overwrite is only exactly-once when batch ids are
    // CONTINUOUS with the output already present: a fresh temp
    // checkpoint restarts ids at 0, and batch 0's overwrite would
    // silently DESTROY a previous run's batch_id=0 rows. Refuse loudly:
    // resuming over existing output requires the original checkpoint.
    val hasPriorOutput = Files.isDirectory(Paths.get(outDir)) && {
      val listing = Files.list(Paths.get(outDir))
      try listing.findFirst().isPresent finally listing.close()
    }
    if (checkpointDir.isEmpty && hasPriorOutput)
      throw new IllegalStateException(
        s"$outDir already holds scored batches; pass the original " +
          "checkpointDir to resume exactly-once, or use a fresh outDir")
    // a SUPPLIED checkpoint must actually be the original: a fresh
    // (non-committed) checkpoint dir over existing output restarts batch
    // ids at 0 and silently overwrites prior batch_id=N directories —
    // the exact loss the bare-outDir refusal above exists to prevent.
    // "Original" is testable as: the checkpoint has committed offsets.
    checkpointDir.foreach { cd =>
      val offsets = Paths.get(cd, "offsets")
      val hasCommittedOffsets = Files.isDirectory(offsets) && {
        val l = Files.list(offsets)
        try l.findFirst().isPresent finally l.close()
      }
      if (hasPriorOutput && !hasCommittedOffsets)
        throw new IllegalStateException(
          s"$outDir already holds scored batches but checkpoint $cd has " +
            "no committed offsets — a fresh checkpoint would restart batch " +
            "ids at 0 and overwrite them; pass the ORIGINAL checkpointDir " +
            "or use a fresh outDir")
    }
    var cached: Option[(Long, Map[Long, Long])] = None // foreachBatch is serial
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir.getOrElse(
        Files.createTempDirectory("graft_clf_ckpt").toString))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (latest, path) = latestEpoch(modelDir).getOrElse(
          throw new IllegalStateException(
            s"no classifier model published under $modelDir"))
        if (!cached.exists(_._1 == latest)) cached = Some((latest, loadWeights(path)))
        val (epoch, w) = cached.get
        score(batch, w).withColumn("model_epoch", lit(epoch))
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
        ()
      }
      .start()
  }
}

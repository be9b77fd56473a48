package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous near-duplicate detection over a document ingest stream —
  * the streaming twin of the batch `dedup_incremental` operator (SURVEY
  * §2.11 extension; the reference has no streaming surface at all, its
  * closest analogue being the scheduled background jobs in kv/jobs/).
  *
  * Shape: the stateless prefix (shingle → one-pass MinHash signature →
  * band keys) is the exact batch pipeline and runs narrow on the stream;
  * the stateful core keys by LSH bucket `(band, bkey)` and keeps, per
  * bucket, the signatures of every document that ever landed there.
  * A new arrival compares against only its bucket's residents —
  * candidates emit in the micro-batch they become detectable, never a
  * corpus re-pairing (the property that makes daily-crawl dedup viable
  * at 100 TB: per-batch cost is proportional to the increment × bucket
  * occupancy, not the corpus).
  *
  * State growth: a bucket's resident list grows with its occupancy —
  * the same skew exposure as the batch band join. Production bounds it
  * with `GroupStateTimeout` eviction (stale buckets expire) or a
  * per-bucket cap; the operator keeps `NoTimeout` so the test surface
  * is deterministic, and the cap decision is the caller's policy.
  *
  * A pair sharing several band keys emits once per matching bucket;
  * dedupe downstream (`dropDuplicates("a","b")` — streaming-safe in
  * append mode) exactly as the batch LSH pipeline `distinct()`s its
  * candidate set.
  */
object StreamingDedup {

  /** One document landing in one LSH bucket. `sig` is a primitive array:
    * the row is shuffled to its state partition and the signature is the
    * payload — `Array[Long]` encodes as an UnsafeArrayData primitive
    * block, where a `Seq[Long]` boxes every component on both sides of
    * the exchange. */
  case class DocSig(docId: Long, band: Int, bkey: String, sig: Array[Long])

  /** Bucket residents, struct-of-arrays: doc ids plus all signatures
    * flattened into one primitive block (`sigs.length == ids.length *
    * sigLen`). The WHOLE value round-trips through the state store
    * encoder on every trigger that touches the bucket — at a sustained
    * 50 k docs/s every bucket is touched every trigger, so state serde
    * is the per-batch constant and two primitive arrays beat a
    * `Seq[(Long, Seq[Long])]` by an order of magnitude.
    *
    * CHECKPOINT COMPATIBILITY: this flattened shape replaced the earlier
    * `Seq[(Long, Seq[Long])]` state class, which changes the persisted
    * state-row schema — restarting against a checkpoint written by the
    * old shape fails Spark's state-schema compatibility check (a generic
    * `StateSchemaNotCompatible`-style error, NOT a config problem). A
    * restart across that boundary needs a fresh checkpoint dir; the
    * stride `require` below only guards same-schema bands×rows drift,
    * it cannot detect or migrate the shape change. */
  case class BucketDocs(ids: Array[Long], sigs: Array[Long])

  /** Candidate pair with its estimated Jaccard (matching MinHash
    * component fraction); a < b always. */
  case class DupCandidate(a: Long, b: Long, est: Double)

  /** Stateless prefix — identical math to the batch LSH operator
    * (DedupQueries `dedup_minhash_lsh`): 5-shingles, `bands × rows`
    * MinHash components in one native pass, one row per band with the
    * band's component slice as the bucket key. */
  def bandRows(docs: DataFrame, bands: Int, rows: Int): Dataset[DocSig] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        graft.functions.VectorFunctions.minHash(
          array_distinct(graft.functions.VectorFunctions.shingles(col("text"), 5)),
          bands * rows).as("mh"))
      .select(col("doc_id").as("docId"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"), col("mh"))
      .select(col("docId"), col("band"),
        concat_ws(",",
          transform(slice(col("mh"), col("band") * rows + 1, lit(rows)),
            _.cast("string"))).as("bkey"),
        col("mh").as("sig"))
      .as[DocSig]
  }

  /** Stateful core: per-bucket resident comparison. Works on a streaming
    * OR batch `Dataset[DocSig]` (Spark runs `flatMapGroupsWithState`
    * one-shot in batch mode) — the same one-definition/two-modes
    * property as [[EventStreams]]. */
  def candidates(rows: Dataset[DocSig], thr: Double): Dataset[DupCandidate] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), it: Iterator[DocSig], state: GroupState[BucketDocs]) => {
          // arrival order within a micro-batch is nondeterministic, so
          // order by docId for a deterministic emit set (same-batch
          // pairs are emitted exactly once, smaller id first)
          val arrivals = it.toArray.sortBy(_.docId)
          val st = state.getOption.getOrElse(
            BucketDocs(Array.emptyLongArray, Array.emptyLongArray))
          val sigLen =
            if (arrivals.nonEmpty) arrivals.head.sig.length
            else if (st.ids.nonEmpty) st.sigs.length / st.ids.length
            else 0
          // the flattened state is only readable at the stride it was
          // written with: restarting against a checkpoint produced under
          // different bands×rows would misindex every stored signature
          // (garbage est values, then a permanently corrupted write-back).
          // The old nested shape was self-describing; the flat one must
          // check. Fail loudly — reconfiguring requires a new checkpoint.
          require(st.ids.isEmpty || st.sigs.length == st.ids.length * sigLen,
            s"bucket state stride ${if (st.ids.isEmpty) 0 else st.sigs.length / st.ids.length} " +
              s"!= arrival signature length $sigLen: checkpoint was written " +
              "under a different bands*rows configuration")
          val out = Seq.newBuilder[DupCandidate]
          // residents as preallocated primitive arrays (worst case: every
          // arrival is new): the compare is a flat long loop, the append
          // is an arraycopy — no per-arrival list copies, no boxing
          val cap = st.ids.length + arrivals.length
          val ids = java.util.Arrays.copyOf(st.ids, cap)
          val flat = java.util.Arrays.copyOf(st.sigs, cap * sigLen)
          val seen = new java.util.HashSet[java.lang.Long](cap * 2)
          st.ids.foreach(seen.add(_))
          var n = st.ids.length
          for (d <- arrivals) {
            if (!seen.contains(d.docId)) {
              var i = 0
              while (i < n) {
                val off = i * sigLen
                var j = 0; var matching = 0
                while (j < sigLen) {
                  if (flat(off + j) == d.sig(j)) matching += 1
                  j += 1
                }
                val est = if (sigLen == 0) 0.0 else matching.toDouble / sigLen
                if (est >= thr)
                  out += DupCandidate(
                    math.min(ids(i), d.docId), math.max(ids(i), d.docId), est)
                i += 1
              }
              seen.add(d.docId)
              ids(n) = d.docId
              System.arraycopy(d.sig, 0, flat, n * sigLen, sigLen)
              n += 1
            }
          }
          state.update(BucketDocs(
            java.util.Arrays.copyOf(ids, n), java.util.Arrays.copyOf(flat, n * sigLen)))
          out.result().iterator
        })
  }

  /** End-to-end: documents stream in, candidate near-dup pairs stream
    * out (once per matching band — see class doc for dedupe). */
  def nearDupStream(docs: DataFrame, bands: Int = 4, rows: Int = 3,
      thr: Double = 0.7): Dataset[DupCandidate] =
    candidates(bandRows(docs, bands, rows), thr)
}

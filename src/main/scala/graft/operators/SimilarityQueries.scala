package graft.operators

import graft.{Exact, Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over the `embeddings` table (north-star extension).
  *
  * Dot products are computed arrays-first via a native codegen'd kernel
  * (one row per vector pair, no positional explode, no extra shuffle)
  * over µ-QUANTIZED ELEMENTS: each float element maps to the exact
  * integer round(v·10^6) — decision-free on both engines because a
  * float's ·10^6 image is exactly representable in a double — and the
  * dot is then pure integer arithmetic, so the sum is exact,
  * order-independent, and bit-identical to the DuckDB oracle's
  * unnest+join spelling SUM(round(a·10^6)·round(b·10^6))/1e12. (The
  * pre-r14 contract quantized each PRODUCT to scale 12 instead, which
  * exposed the two engines' different double→decimal rounding
  * algorithms — first divergence at sf1 volume.)
  *
  * Brute-force top-k is the correctness baseline (queries × corpus, fine
  * when |queries| is small); the LSH variant buckets vectors by
  * sign-random-projection so the candidate join is bucket-local — the
  * shape that survives a 100 TB corpus where all-pairs is impossible.
  */
object SimilarityQueries extends QueryPack {

  // (20,12): the ADC distance sums still accumulate through this decimal
  // type (their own paired oracle spelling keeps DECIMAL(38,12) there).
  private val dec = DecimalType(20, 12)

  /** µ-quantized exact dot product — a native codegen'd Expression
    * ([[graft.functions.DotExactExpr]], see FastOps.q6 for the lockstep
    * argument) — one static call per row, no interpreted lambdas. */
  private def dotExact(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotExact(a, b)

  private def withNorm(df: DataFrame): DataFrame =
    // spread first: the embeddings fixture is one parquet split, and the
    // per-row norm / downstream dot-product kernels are the CPU cost here
    Tables.spread(df)
      .withColumn("norm", sqrt(dotExact(col("embedding"), col("embedding"))))

  /** DuckDB spelling: per-vector squared norm and pairwise dot via
    * position join, decimal-accumulated. */
  private val oVecs =
    """SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS p
      |  FROM embeddings""".stripMargin

  private val oNorms =
    s"""SELECT vec_id,
       |       sqrt((SUM(round(CAST(x AS DOUBLE) * 1000000) * round(CAST(x AS DOUBLE) * 1000000)) / 1e12)) AS norm
       |FROM ($oVecs) GROUP BY vec_id""".stripMargin

  /** Blocked exact cosine pairs ≥ thr over the embeddings corpus —
    * shared by the `sim_cosine_pairs` gate query and the
    * embedding-near-dup dedup operator (DedupQueries). Columns
    * (a, b, cosine). See the inline notes at the call site for the
    * block-bound reasoning. */
  private[graft] def cosinePairs(s: SparkSession, dir: String, thr: Double): DataFrame = {
    val maxPerBlock = 4096L
    // a real (cheap) Spark job: parquet COUNT(*) is answered from the
    // footer row-counts without reading column data, but it does
    // schedule tasks — one footer read per file, corpus-size
    // independent per file
    val n = Tables.load(s, dir, "embeddings").count()
    val B = math.max(16L, (n + maxPerBlock - 1) / maxPerBlock).toInt
    val vecs = withNorm(Tables.load(s, dir, "embeddings"))
    val blocks = vecs
      .withColumn("bid", pmod(col("vec_id"), lit(B)).cast("int"))
      .groupBy(col("bid"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"), col("norm"))).as("blk"))
    val pairs = blocks.as("x").join(blocks.as("y"), col("x.bid") <= col("y.bid"))
      .select(explode(graft.functions.CosineBlock.pairs(
        col("x.blk"), col("y.blk"), thr, col("x.bid") === col("y.bid"))).as("p"))
    pairs.select(col("p.a").as("a"), col("p.b").as("b"), col("p.cosine").as("cosine"))
  }

  /** ANN-candidate cosine pairs ≥ thr: banded sign-random-projection
    * candidates + exact decimal verify — the PRODUCT path for embedding
    * near-dup ([[cosinePairs]]'s blocked all-pairs kernel stays as its
    * small-scale ground-truth twin). Band geometry is CORPUS-ADAPTIVE
    * (see below); hyperplane components are md5-derived (deterministic
    * across engines and runs); a pair is a candidate when ANY band key
    * matches, and each candidate is emitted from its FIRST matching band
    * only — a local filter on the band equi-join output, so no distinct
    * shuffle is needed. Candidates are then verified with the same
    * quantized-decimal exact cosine the oracle computes, so the RESULT
    * is exact; only discovery is probabilistic.
    *
    * Plan shape (the 100 TB story): sketching is one narrow projection
    * pass over a literal plane matrix — no join, no shuffle; discovery
    * is a bucket equi-join on (band, key) — hash-partitioned,
    * corpus-linear when buckets are balanced, never an O(B²)
    * nested-loop block join.
    *
    * Band geometry: with static bits, expected bucket occupancy grows
    * linearly with the corpus and in-bucket verify work grows with its
    * SQUARE (the 11.3×-at-10× probe of round 9) — so bits is derived
    * from corpus size to hold occupancy ~flat (2^bits buckets per band,
    * bits = log2(n / targetOccupancy)), and bands from the recall
    * target: per-pair miss at threshold-cosine match probability
    * p = 1 − θ/π is (1 − p^bits)^bands ≤ δ for
    * bands = ln(1/δ)/p^bits, δ = 1e-3 (capped — at the fixture's
    * deliberately near-random thr = 0.4 the exact formula explodes;
    * production near-dup thresholds ≥ 0.7 sit well inside the cap).
    * At the oracle-gated scale factors this resolves to the round-8
    * geometry (bits = 3) where empirically every exact pair shares a
    * band key (sf0.001: 66/66, sf0.01: 59/59). */
  /** Bands per bits-width for [[cosinePairsAnn]]'s recall target,
    * precomputed for every legal width: per-pair miss probability at
    * threshold-cosine p = 1 − acos(thr)/π is (1 − p^bits)^bands ≤ δ for
    * bands = ln(1/δ)/p^bits, δ = 1e-3, clamped to [24, 96]. Evaluated
    * ONCE in Scala and inlined into the DuckDB oracle as an integer
    * CASE table — the oracle must never re-derive it through its own
    * libm (acos/pow/ceil differ across math libraries at ULP scale, and
    * a ceil straddling an integer boundary would silently change the
    * band count on one side only). */
  private[operators] def annBands(thr: Double): Map[Int, Int] = {
    val p = 1.0 - math.acos(thr) / math.Pi
    (3 to 12).map(b => b ->
      math.min(96, math.max(24, math.ceil(math.log(1000.0) / math.pow(p, b)).toInt))).toMap
  }

  private[graft] def cosinePairsAnn(s: SparkSession, dir: String, thr: Double): DataFrame = {
    // one metadata-cheap count; parameters, not data. Width via the
    // lshSketchWidth find-first idiom (smallest b in [3,12] with
    // 1024·2^b ≥ n — integer-exact, same quantity as the old
    // ceil(log2(n/1024)) clamp without the log2 ULP exposure), so the
    // oracle's bcfg CTE can never disagree.
    val n = Tables.load(s, dir, "embeddings").count().max(1L)
    val bits = lshSketchWidth(n)
    val bands = annBands(thr)(bits)
    // plane dimensionality from the data, not a constant: a 768-dim
    // corpus with 64-dim planes would sketch only a prefix of every
    // vector — still correct (verify is exact) but far less selective.
    // One parquet-footer-cheap first() against the narrow column.
    val dim = Tables.load(s, dir, "embeddings")
      .select(size(col("embedding"))).limit(1).collect()(0).getInt(0)
    def md5hex(x: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // same component derivation as sim_ann_lsh's planes; bits·bands
    // plane vectors of dim doubles (e.g. 3·28 = 84 planes at thr 0.4,
    // bits from lshSketchWidth, bands from annBands) built driver-side —
    // parameters, not data
    val planes: Seq[Seq[Double]] = (0 until bits * bands).map { i =>
      (1 to dim).map { p =>
        val h = md5hex(s"${i}_$p").substring(0, 15)
        ((java.lang.Long.parseLong(h, 16) % 2001) - 1000) / 1000.0
      }
    }
    // all `bands` band keys in one native pass (SignBandKeysExpr) — sketching
    // is sign-only, so plain double math; candidates never touch the
    // oracle-exact verify below
    val sk = withNorm(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"), col("norm"))
      .withColumn("bkeys", graft.functions.CosineBlock.signBandKeys(
        col("embedding"), typedLit(planes), bits))
    // One row per (vector, band): the vector lands in bucket
    // (band, bkeys[band]). Buckets larger than maxPerBlock split into
    // sub-blocks (counts join — a tiny aggregate, broadcast when small)
    // so a collect_list row stays bounded no matter how hot a bucket
    // gets; verification is then a bucket-local equi-join of sub-blocks
    // running the blocked kernel, exactly like cosinePairs but scoped to
    // a bucket instead of the corpus.
    val maxPerBlock = 4096L
    val exploded = sk.select(col("vec_id"), col("embedding"), col("norm"),
      col("bkeys"), posexplode(col("bkeys")).as(Seq("band", "bkey")))
    // bucket occupancy table: partial aggregation projects it narrow
    // before its exchange, and the broadcast join back means the WIDE
    // (embedding + bkeys) rows are never shuffled for the counts lookup
    val counts = exploded.groupBy(col("band"), col("bkey"))
      .agg(ceil(count(lit(1)) / lit(maxPerBlock.toDouble)).cast("int").as("nblk"))
    val blocks = exploded.join(broadcast(counts), Seq("band", "bkey"))
      .withColumn("bid", pmod(col("vec_id"), greatest(col("nblk"), lit(1))).cast("int"))
      .groupBy(col("band"), col("bkey"), col("bid"))
      .agg(first(col("nblk")).as("nblk"),
        collect_list(struct(col("vec_id"), col("embedding"), col("norm"),
          col("bkeys"))).as("blk"))
    // A pair sharing several band keys is verified ONCE: the kernel
    // computes its first matching band and emits it only there.
    //
    // With occupancy held at ~targetOccupancy, essentially every bucket
    // fits ONE sub-block — its pair work is a LOCAL kernel call on the
    // grouped row, with no self-join and no re-shuffle of the wide block
    // rows (the probe showed that (band,bkey) re-partition of ~400 KB
    // block rows dominating wall-clock, not the kernel arithmetic). Only
    // the rare over-occupied buckets route through the sub-block join;
    // both branches filter the SAME grouped exchange, so the corpus-wide
    // collect_list runs once (ReuseExchange).
    val single = blocks.filter(col("nblk") <= 1)
      .select(explode(graft.functions.CosineBlock.bucketPairs(
        col("blk"), col("blk"), thr, lit(true), col("band"))).as("p"))
    val multiBlocks = blocks.filter(col("nblk") > 1)
    val x = multiBlocks.select(col("band"), col("bkey"), col("bid").as("bidx"), col("blk").as("blkx"))
    val y = multiBlocks.select(col("band"), col("bkey"), col("bid").as("bidy"), col("blk").as("blky"))
    val multi = x.join(y, Seq("band", "bkey"))
      .filter(col("bidx") <= col("bidy"))
      .select(explode(graft.functions.CosineBlock.bucketPairs(
        col("blkx"), col("blky"), thr, col("bidx") === col("bidy"), col("band"))).as("p"))
    single.unionByName(multi)
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.cosine").as("cosine"))
  }

  /** Corpus-derived sign-LSH sketch width: the smallest b in [3, 12]
    * with 1024·2^b ≥ n. Integer arithmetic only — the DuckDB oracle
    * computes the identical quantity from a COUNT(*) scalar, so the two
    * engines can never disagree by a log2 ULP. Equivalent to
    * max(3, ceil(log2(n/1024))) capped at 12 ([[cosinePairsAnn]]'s
    * bucket geometry): expected occupancy stays ≤ ~1024 per bucket and
    * the same-sketch candidate join stays corpus-linear. */
  private[graft] def lshSketchWidth(n: Long): Int =
    (3 to 12).find(b => 1024L * (1L << b) >= n).getOrElse(12)

  /** Same-sketch candidate pairs with exact cosine, the shared core of
    * the `sim_ann_lsh` gate query: md5-derived hyperplanes (64-dim, the
    * fixture's embedding width — engine-identical to the oracle's
    * `planes` CTE), corpus-adaptive sketch width ([[lshSketchWidth]]),
    * one-long sketch per vector, then bucket pair work. With a `thr`
    * (the gate path) pairs run through the BLOCKED kernel — per-bucket
    * collect_list, one decode to primitive arrays, double pre-filter in
    * front of the exact-decimal verify — never a wide-row pair join.
    * Without (`None`) it is the raw candidate census the ScaleProbe
    * decomposition counts (every same-sketch pair, no threshold). */
  /** (vec_id, embedding, norm, sk): every vector with its banded sign-LSH
    * sketch — the bucket key of the candidate join. Exposed for bucket-
    * occupancy diagnostics. */
  private[graft] def lshSketches(s: SparkSession, dir: String): DataFrame =
    lshCandidatePairsImpl(s, dir, None, sketchesOnly = true)

  private[graft] def lshCandidatePairs(s: SparkSession, dir: String,
      thr: Option[Double] = None): DataFrame =
    lshCandidatePairsImpl(s, dir, thr, sketchesOnly = false)

  private def lshCandidatePairsImpl(s: SparkSession, dir: String,
      thr: Option[Double], sketchesOnly: Boolean): DataFrame = {
    // one metadata-cheap count; a parameter, not data
    val n = Tables.load(s, dir, "embeddings").count().max(1L)
    val bits = lshSketchWidth(n)
    // Hyperplanes as a broadcast-sized literal-free table: bits × 64
    // dims, components in [-1, 1] from md5 — engine-identical.
    val planes = s.range(0, bits).select(col("id").cast("int").as("b"))
      .crossJoin(s.range(1, 65).select(col("id").cast("int").as("p")))
      .select(col("b"), col("p"),
        ((conv(substring(md5(concat(col("b"), lit("_"), col("p"))), 1, 15), 16, 10)
          .cast("long") % 2001 - 1000) / 1000.0).as("r"))
    val plArr = planes.groupBy(col("b"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("r")))),
        x => x.getField("r")).as("plane"))
    val vecs = withNorm(Tables.load(s, dir, "embeddings"))
    // Sketch: sign bit per plane, assembled into one long.
    val proj = vecs.crossJoin(broadcast(plArr))
      .select(col("vec_id"), col("embedding"), col("norm"), col("b"),
        graft.functions.VectorFunctions.dotExactFD(col("embedding"), col("plane")).as("s"))
    val sketch = proj.groupBy(col("vec_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L))
        .as("sk"))
    val withSk = vecs.join(sketch, "vec_id")
    if (sketchesOnly) return withSk
    thr match {
      case Some(t) =>
        // Thresholded path (the gate query): route the in-bucket pair
        // work through the BLOCKED kernel instead of a self-join. The
        // join formulation materializes every same-sketch ordered pair
        // as a wide row and evaluates the dot through ArrayData's
        // virtual per-element reads — at target occupancy ~1024 that is
        // ~0.5·occupancy·n pair rows of redundant decode (measured 21 s
        // at 10×). The kernel decodes each bucket's vectors ONCE to
        // primitive arrays and loops pairs locally with the cheap double
        // pre-filter in front of the exact-decimal verify (CosineBlock),
        // the same shape as cosinePairsAnn's round-10 fix; buckets past
        // maxPerBlock split into sub-blocks so a collect_list row stays
        // bounded no matter how hot a bucket gets. Emitted cosines come
        // from the same exact dot — bit-identical to the join form and
        // the oracle.
        val maxPerBlock = 4096L
        val counts = withSk.groupBy(col("sk"))
          .agg(ceil(count(lit(1)) / lit(maxPerBlock.toDouble)).cast("int").as("nblk"))
        val blocks = withSk.join(broadcast(counts), "sk")
          .withColumn("bid", pmod(col("vec_id"), greatest(col("nblk"), lit(1))).cast("int"))
          .groupBy(col("sk"), col("bid"))
          .agg(first(col("nblk")).as("nblk"),
            collect_list(struct(col("vec_id"), col("embedding"), col("norm"))).as("blk"))
        val single = blocks.filter(col("nblk") <= 1)
          .select(explode(graft.functions.CosineBlock.pairs(
            col("blk"), col("blk"), t, lit(true))).as("p"))
        val mb = blocks.filter(col("nblk") > 1)
        val mx = mb.select(col("sk"), col("bid").as("bidx"), col("blk").as("blkx"))
        val my = mb.select(col("sk"), col("bid").as("bidy"), col("blk").as("blky"))
        val multi = mx.join(my, "sk").filter(col("bidx") <= col("bidy"))
          .select(explode(graft.functions.CosineBlock.pairs(
            col("blkx"), col("blky"), t, col("bidx") === col("bidy"))).as("p"))
        single.unionByName(multi)
          .select(col("p.a").as("a"), col("p.b").as("b"), col("p.cosine").as("cosine"))
      case None =>
        // Raw candidate census (ScaleProbe decomposition): every
        // same-sketch pair with its exact cosine, no threshold.
        val right = withSk.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
          col("norm").as("nb"), col("sk").as("skb"))
        withSk.join(right, col("sk") === col("skb") && col("vec_id") < col("b_id"))
          .select(col("vec_id").as("a"), col("b_id").as("b"),
            (dotExact(col("embedding"), col("eb")) / (col("norm") * col("nb"))).as("cosine"))
    }
  }

  /** Corpus-derived IVF coarse-index width: the smallest k in [16, 4096]
    * with k² ≥ n — i.e. ⌈√n⌉ (FAISS's √n-lists sizing rule), computed by
    * integer find-first (the [[lshSketchWidth]] idiom) so the oracle's
    * generate_series CTE can never disagree by a sqrt ULP. With nlist
    * tracking √n, per-list length is ~√n and the probed fraction
    * nprobe/nlist SHRINKS with corpus size — a fixture-fixed nlist keeps
    * the fraction constant, which at 100 TB degenerates to the full scan.
    * The 4096 cap keeps the centroid set broadcastable (4096 × 64 floats
    * ≈ 1 MB); corpora past 16 M vectors would raise it with a second
    * routing level (IVF-HNSW), which the fixtures cannot exercise. */
  private[graft] def ivfNlist(n: Long): Int =
    (16 to 4096).find(k => k.toLong * k >= n).getOrElse(4096)

  /** nprobe = smallest p in [2, 64] with p² ≥ nlist (≈ √nlist ≈ n^(1/4)):
    * probed work per query grows as n^(3/4) while the probed FRACTION
    * falls as n^(-1/4) — recall degrades only logarithmically because the
    * probe count still grows, the standard IVF recall/cost compromise. */
  private[graft] def ivfNprobe(nlist: Int): Int =
    (2 to 64).find(p => p * p >= nlist).getOrElse(64)

  /** (vec_id, embedding, vv): the decimal-exact self-dot every IVF
    * routing consumer starts from. */
  private[graft] def ivfVv(vecsIn: DataFrame): DataFrame =
    vecsIn.select(col("vec_id"), col("embedding"))
      .withColumn("vv", dotExact(col("embedding"), col("embedding")))

  /** The deterministic coarse centroid set: the nlist lowest-id vectors
    * (cid, ce, cc). */
  private[graft] def ivfCents(withVv: DataFrame, nlist: Int): DataFrame =
    withVv.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("vv").as("cc"))

  /** Narrow (vec_id, cid, fd) routing distances: full squared-L2
    * (vv + cc − 2·dot, decimal-quantized terms) against the broadcast
    * centroid set. */
  private[graft] def ivfFdist(withVv: DataFrame, cents: DataFrame): DataFrame =
    withVv.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (col("vv") + col("cc") - lit(2) * dotExact(col("embedding"), col("ce")))
          .as("fd"))

  /** Rank-1 inverted-list assignment from a routing-distance frame: the
    * map-side-combinable argmin (min of struct(fd, cid) ≡ the (fd, cid)
    * window's rank-1 row). ONE definition shared by the batch IVF+PQ
    * index and the streaming incremental indexer
    * ([[graft.streaming.StreamingAnn]]) — a drifted streaming copy would
    * route stream-ingested vectors to different lists than the batch
    * rebuild it must converge to. */
  private[graft] def ivfLists(fdist: DataFrame): DataFrame =
    fdist.groupBy(col("vec_id"))
      .agg(min(struct(col("fd"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))

  /** Batch index build: assign every vector of `vecsIn` to its inverted
    * list under the corpus-derived geometry. */
  private[graft] def ivfAssign(vecsIn: DataFrame, nlist: Int): DataFrame = {
    val withVv = ivfVv(vecsIn)
    ivfLists(ivfFdist(withVv, ivfCents(withVv, nlist)))
  }

  /** SemDeDup cluster count: k = ⌈n/1024⌉ clamped to [16, 4096] —
    * constant ~1024-vector clusters so intra-cluster pair work stays
    * corpus-LINEAR (k·1024² comparisons). Integer arithmetic only; the
    * oracle's `sk` CTE computes the identical quantity. */
  private[graft] def semdedupK(n: Long): Int =
    math.min(4096L, math.max(16L, (n + 1023) / 1024)).toInt

  /** Oracle twin of [[ivfNlist]]/[[ivfNprobe]]: CTEs `nl(nlist)` and
    * `np(nprobe)` via the same integer find-first — splice after WITH.
    * ONE definition shared by every IVF-routed oracle so the engine and
    * oracle can never probe different index geometries. */
  private val oIvfCfg: String =
    """nl AS (
      |  SELECT COALESCE(MIN(k), 4096) AS nlist
      |  FROM (SELECT unnest(generate_series(16, 4096)) AS k)
      |  WHERE CAST(k AS BIGINT) * k >= (SELECT COUNT(*) FROM embeddings)),
      |np AS (
      |  SELECT COALESCE(MIN(p), 64) AS nprobe
      |  FROM (SELECT nlist, unnest(generate_series(2, 64)) AS p FROM nl)
      |  WHERE p * p >= nlist)""".stripMargin

  /** Oracle twin of [[ivfTopk]]'s cosine routing: CTE chain ending in
    * `cand(query_id, neighbor_id)`; splice after `u`/`n` + [[oIvfCfg]].
    * ONE definition shared by the sim_ann_ivf gate and its recall eval
    * (the shared-definition discipline: a drifted copy would let the
    * gate verify a different index than the eval scores). */
  private val oIvfFlatCtes: String =
    """cents AS (SELECT vec_id AS cid, x, p FROM u
      |          WHERE vec_id < (SELECT nlist FROM nl)),
      |adots AS (
      |  SELECT u.vec_id, c.cid,
      |         (SUM(round(CAST(u.x AS DOUBLE) * 1000000) * round(CAST(c.x AS DOUBLE) * 1000000)) / 1e12) AS dot
      |  FROM u JOIN cents c ON u.p = c.p
      |  GROUP BY u.vec_id, c.cid),
      |acos AS (
      |  SELECT a.vec_id, a.cid, a.dot / (nv.norm * nc.norm) AS cos
      |  FROM adots a JOIN n nv ON a.vec_id = nv.vec_id JOIN n nc ON a.cid = nc.vec_id),
      |ranked_assign AS (
      |  SELECT vec_id, cid,
      |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
      |  FROM acos),
      |lists AS (SELECT vec_id, cid FROM ranked_assign WHERE rnk = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, cid FROM ranked_assign
      |  WHERE rnk <= (SELECT nprobe FROM np) AND vec_id IN (5, 6, 7, 8, 9)),
      |cand AS (
      |  SELECT p.query_id, l.vec_id AS neighbor_id
      |  FROM probes p JOIN lists l ON p.cid = l.cid AND l.vec_id <> p.query_id)""".stripMargin

  /** IVF-Flat top-10 for the fixed query set (5-9): the nlist lowest-id
    * corpus vectors as deterministic coarse centroids (nlist = ⌈√n⌉ via
    * [[ivfNlist]]), nprobe-probe exact rerank — shared by the sim_ann_ivf
    * gate query and the recall-eval operator. */
  private def ivfTopk(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "embeddings").count().max(1L)
    val nlist = ivfNlist(n)
    val nprobe = ivfNprobe(nlist)
    val vecs = withNorm(Tables.load(s, dir, "embeddings"))
    val cents = vecs.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("norm").as("cnorm"))
    // assignment: every vector scored against the nlist broadcast
    // centroids, PROJECTED NARROW before any shuffle — with nlist ~ √n
    // a window carrying embeddings over the n×nlist assignment rows
    // would shuffle n^1.5 wide rows; instead the rank-1 list assignment
    // is a map-side-combinable argmin (min of struct(-cos, cid) ≡ the
    // (cos DESC, cid) window's rank-1 row), shuffling n narrow rows
    val assigned = vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dotExact(col("embedding"), col("ce")) / (col("norm") * col("cnorm"))).as("cos"))
    val lists = assigned
      .groupBy(col("vec_id"))
      .agg(min(struct((-col("cos")).as("nc"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
      .join(vecs.select(col("vec_id"), col("embedding"), col("norm")), "vec_id")
      .select(col("vec_id"), col("embedding"), col("norm"), col("cid"))
    // probes: the query set is 5 rows by definition — its top-nprobe
    // window runs over 5×nlist rows, parameters not data
    val wA = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
    val probes = assigned.filter(col("vec_id").isin(5, 6, 7, 8, 9))
      .withColumn("rnk", row_number().over(wA))
      .filter(col("rnk") <= nprobe)
      .join(vecs.select(col("vec_id"), col("embedding"), col("norm")), "vec_id")
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("norm").as("qnorm"), col("cid"))
    // probe join: only the 2 probed lists per query are rescanned
    val scored = lists.join(broadcast(probes), "cid")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotExact(col("qe"), col("embedding")) / (col("qnorm") * col("norm")))
          .as("cosine"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= 10)
  }

  /** Exact (brute-force) top-10 for an arbitrary query-id set — the
    * ground truth the recall eval compares against. */
  private def bruteTopk(s: SparkSession, dir: String, ids: Seq[Int]): DataFrame = {
    val vecs = withNorm(Tables.load(s, dir, "embeddings"))
    val queries = vecs.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("norm").as("qnorm"))
    val scored = vecs.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotExact(col("qe"), col("embedding")) / (col("qnorm") * col("norm")))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
  }

  /** Shared PQ machinery (sim_pq_adc + sim_ivf_pq): per-(vector,
    * codeword, subspace) squared-L2 distances against the deterministic
    * 16-vector codebook, via three exact dots (vv + cc − 2·vc) per
    * subspace — identical quantization to the oracle's DECIMAL(38,12)
    * products. */
  private def pqDists(s: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.spread(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"))
    val cb = vecs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    def subDist(sp: Int): Column = {
      val va = slice(col("embedding"), sp * 16 + 1, 16)
      val vb = slice(col("ce"), sp * 16 + 1, 16)
      dotExact(va, va) + dotExact(vb, vb) - lit(2) * dotExact(va, vb)
    }
    vecs.crossJoin(broadcast(cb))
      .select(col("vec_id"), col("cid"),
        posexplode(array((0 until 4).map(sp => subDist(sp)): _*)).as(Seq("s", "d")))
  }

  /** PQ encoding: per (vector, subspace), the nearest codeword id. */
  private def pqCodes(dists: DataFrame): DataFrame = {
    val wCode = Window.partitionBy(col("vec_id"), col("s"))
      .orderBy(col("d"), col("cid"))
    dists.withColumn("rn", row_number().over(wCode))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("s"), col("cid").as("code"))
  }

  /** IVF+PQ top-10 for the fixed query set (5-9): coarse routing by full
    * squared-L2 (vv + cc − 2·dot, each term a decimal-quantized sum cast
    * to double — the oracle computes the identical expression so ties
    * break identically) against the nlist = ⌈√n⌉ lowest-id centroids
    * ([[ivfNlist]]), nprobe = ⌈√nlist⌉ list selection ([[ivfNprobe]]),
    * ADC scoring over the probed lists' codes. The coarse index is
    * corpus-derived — the probed fraction nprobe/nlist shrinks with n —
    * while the PQ codebook stays 16 codewords/subspace (a quantization
    * RESOLUTION constant, like FAISS's 256, not a routing fanout).
    * Shared by the sim_ivf_pq gate and the recall eval. */
  private def ivfPqTopk(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "embeddings").count().max(1L)
    val nlist = ivfNlist(n)
    val nprobe = ivfNprobe(nlist)
    val dists = pqDists(s, dir)
    val codes = pqCodes(dists)
    // routing distances: narrow (vec_id, cid, fd) frame via a broadcast
    // of the ≤4096-row centroid set — never a shuffle of embeddings;
    // list assignment shuffles n narrow rows, not the n×nlist frame
    // (ivfVv/ivfCents/ivfFdist/ivfLists — shared with StreamingAnn)
    val withVv = ivfVv(Tables.spread(Tables.load(s, dir, "embeddings")))
    val fdist = ivfFdist(withVv, ivfCents(withVv, nlist))
    val lists = ivfLists(fdist).select(col("vec_id"), col("cid").as("lcid"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("fd"), col("cid"))
    val probes = fdist.filter(col("vec_id").isin(5, 6, 7, 8, 9))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cid").as("pcid"))
    val lut = dists.filter(col("vec_id").isin(5, 6, 7, 8, 9))
      .select(col("vec_id").as("q_id"), col("cid"), col("s").as("ls"),
        col("d"))
    val adc = codes.join(lists, "vec_id")
      .join(broadcast(probes), col("lcid") === col("pcid"))
      .join(broadcast(lut), col("q_id") === col("query_id") &&
        col("ls") === col("s") && col("cid") === col("code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d").cast(DecimalType(38, 12))).cast("double").as("adc"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    adc.select(col("query_id"), col("vec_id").as("neighbor_id"), col("adc"))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= 10)
  }

  /** Oracle twin of [[pqDists]]+[[pqCodes]]: CTE chain ending in
    * `dist(vec_id, cid, s, d)` and `codes(vec_id, s, code)`; splice
    * after WITH. */
  private val oPqCtes: String =
    s"""u AS ($oVecs),
       |sub AS (SELECT vec_id, x, p, CAST((p - 1) // 16 AS INT) AS s FROM u),
       |pairdot AS (
       |  SELECT v.vec_id, c.vec_id AS cid, v.s,
       |         (SUM(round(CAST(v.x AS DOUBLE) * 1000000) * round(CAST(c.x AS DOUBLE) * 1000000)) / 1e12) AS dot
       |  FROM sub v JOIN sub c ON v.p = c.p AND c.vec_id < 16
       |  GROUP BY v.vec_id, c.vec_id, v.s),
       |snorm AS (
       |  SELECT vec_id, s,
       |         (SUM(round(CAST(x AS DOUBLE) * 1000000) * round(CAST(x AS DOUBLE) * 1000000)) / 1e12) AS vv
       |  FROM sub GROUP BY vec_id, s),
       |dist AS (
       |  SELECT p.vec_id, p.cid, p.s, a.vv + b.vv - 2 * p.dot AS d
       |  FROM pairdot p
       |  JOIN snorm a ON a.vec_id = p.vec_id AND a.s = p.s
       |  JOIN snorm b ON b.vec_id = p.cid AND b.s = p.s),
       |codes AS (
       |  SELECT vec_id, s, cid AS code FROM (
       |    SELECT vec_id, s, cid,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, cid) AS rn
       |    FROM dist) WHERE rn = 1)""".stripMargin

  /** Oracle twin of [[ivfPqTopk]]'s routing + ADC scoring: CTE chain
    * ending in `adc(query_id, neighbor_id, adc)`; splice after
    * [[oPqCtes]] + [[oIvfCfg]]. ONE definition shared by the sim_ivf_pq
    * gate and the recall eval — a drifted copy would let both gates stay
    * green while the recall number scores a different index than the
    * gate verifies. Routing replays the engine exactly: full-vector
    * squared-L2 (vv + cc − 2·dot, decimal-quantized terms) against the
    * nlist lowest-id centroids, top-nprobe probes. */
  private val oIvfPqCtes: String =
    """vself AS (
      |  SELECT vec_id,
      |         (SUM(round(CAST(x AS DOUBLE) * 1000000) * round(CAST(x AS DOUBLE) * 1000000)) / 1e12) AS vv
      |  FROM u GROUP BY vec_id),
      |cdot AS (
      |  SELECT v.vec_id, c.vec_id AS cid,
      |         (SUM(round(CAST(v.x AS DOUBLE) * 1000000) * round(CAST(c.x AS DOUBLE) * 1000000)) / 1e12) AS dot
      |  FROM u v JOIN u c ON v.p = c.p AND c.vec_id < (SELECT nlist FROM nl)
      |  GROUP BY v.vec_id, c.vec_id),
      |fdist AS (
      |  SELECT d.vec_id, d.cid, a.vv + b.vv - 2 * d.dot AS fd
      |  FROM cdot d
      |  JOIN vself a ON d.vec_id = a.vec_id
      |  JOIN vself b ON d.cid = b.vec_id),
      |lists AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY fd, cid) AS rn
      |    FROM fdist) WHERE rn = 1),
      |probes AS (
      |  SELECT query_id, cid FROM (
      |    SELECT vec_id AS query_id, cid,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY fd, cid) AS rn
      |    FROM fdist WHERE vec_id IN (5, 6, 7, 8, 9))
      |  WHERE rn <= (SELECT nprobe FROM np)),
      |lut AS (
      |  SELECT vec_id AS query_id, cid, s, d FROM dist
      |  WHERE vec_id IN (5, 6, 7, 8, 9)),
      |adc AS (
      |  SELECT l.query_id, v.vec_id AS neighbor_id,
      |         CAST(SUM(CAST(l.d AS DECIMAL(38,12))) AS DOUBLE) AS adc
      |  FROM codes v
      |  JOIN lists li ON li.vec_id = v.vec_id
      |  JOIN probes pr ON pr.cid = li.cid
      |  JOIN lut l ON l.query_id = pr.query_id AND l.s = v.s AND l.cid = v.code
      |  WHERE v.vec_id <> l.query_id
      |  GROUP BY l.query_id, v.vec_id)""".stripMargin

  /** DuckDB CTE block computing the same cosine pairs as [[cosinePairs]]
    * (names them `cpairs(a, b)`); splice after WITH [RECURSIVE]. */
  /** Oracle CTE chain ending in `cpairs(a, b)` = EXACTLY the pair set
    * [[cosinePairsAnn]] emits: the banded sign-LSH DISCOVERY is
    * replicated, not just the exact verify. The earlier all-pairs-exact
    * form asserted 100% LSH recall — empirically true at sf ≤ 0.01 but
    * not a property the operator has (at sf0.1 the wider geometry
    * missed one true pair and the component labels diverged). Exact
    * replication points per SignBandKeysExpr / cosinePairsAnn:
    *   - bits: the same integer find-first (bcfg);
    *   - bands: the Scala-precomputed [[annBands]] CASE table (no libm);
    *   - plane components: same md5 derivation;
    *   - projections: PLAIN-DOUBLE LEFT-TO-RIGHT accumulation via
    *     list_reduce over the embedding list — IEEE-identical to the
    *     kernel's sequential loop (a decimal-quantized sum here could
    *     flip a sign the kernel's double sum decides the other way);
    *   - band key: plane j of band b is bit (bits−1−j), sign = s > 0;
    *   - candidates: DISTINCT pairs sharing any (band, key);
    *   - verify: the exact-decimal cosine ≥ thr (what the kernel emits).
    *     Spelled per-PAIR (list_transform over the two embedding lists,
    *     one row per candidate) rather than per-element unnest+join:
    *     same µ-quantized integer terms, same exact-in-double sum
    *     (< 2^53), same single division — but 64× fewer oracle rows,
    *     which keeps DuckDB's temp under the disk ceiling at sf1
    *     (the unnest spelling spilled > 79 GB there and died).
    */
  private[operators] def oAnnPairCtes(thr: Double): String = {
    val bandsCase = (3 to 12)
      .map(b => s"WHEN $b THEN ${annBands(thr)(b)}").mkString(" ")
    s"""n AS ($oNorms),
       |dim AS (SELECT len(embedding) AS d FROM embeddings LIMIT 1),
       |bcfg AS (
       |  SELECT COALESCE(MIN(b), 12) AS bits
       |  FROM (SELECT unnest(generate_series(3, 12)) AS b)
       |  WHERE 1024 * (CAST(1 AS BIGINT) << b) >= (SELECT COUNT(*) FROM embeddings)),
       |bnd AS (SELECT CASE (SELECT bits FROM bcfg) $bandsCase END AS nb),
       |planes AS (
       |  SELECT i, p,
       |         (CAST(('0x' || substr(md5(i || '_' || p), 1, 15)) AS BIGINT) % 2001 - 1000)
       |           / 1000.0 AS r
       |  FROM (SELECT unnest(generate_series(0,
       |          (SELECT bits FROM bcfg) * (SELECT nb FROM bnd) - 1)) AS i)
       |  CROSS JOIN (SELECT unnest(generate_series(1, (SELECT d FROM dim))) AS p)),
       |pl AS (SELECT i, list(r ORDER BY p) AS v FROM planes GROUP BY i),
       |proj AS (
       |  SELECT e.vec_id, pl.i,
       |         list_reduce(list_transform(generate_series(1, (SELECT d FROM dim)),
       |           dd -> CAST(e.embedding[dd] AS DOUBLE) * pl.v[dd]),
       |           (x, y) -> x + y) AS s
       |  FROM embeddings e CROSS JOIN pl),
       |keys AS (
       |  SELECT vec_id, i // (SELECT bits FROM bcfg) AS band,
       |         SUM(CASE WHEN s > 0
       |             THEN (CAST(1 AS BIGINT) << CAST((SELECT bits FROM bcfg) - 1
       |                    - (i % (SELECT bits FROM bcfg)) AS INT))
       |             ELSE 0 END) AS bkey
       |  FROM proj GROUP BY vec_id, i // (SELECT bits FROM bcfg)),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM keys x JOIN keys y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id),
       |dots AS (
       |  SELECT c.a, c.b,
       |         list_reduce(list_transform(generate_series(1, (SELECT d FROM dim)),
       |           dd -> round(CAST(ea.embedding[dd] AS DOUBLE) * 1000000)
       |               * round(CAST(eb.embedding[dd] AS DOUBLE) * 1000000)),
       |           (x, y) -> x + y) / 1e12 AS dot
       |  FROM cand c JOIN embeddings ea ON ea.vec_id = c.a
       |              JOIN embeddings eb ON eb.vec_id = c.b),
       |cpairs AS (
       |  SELECT a, b FROM dots
       |  JOIN n na ON a = na.vec_id JOIN n nb ON b = nb.vec_id
       |  WHERE dot / (na.norm * nb.norm) >= $thr)""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    // Brute-force cosine top-k for a small query set: broadcast the
    // queries, scan the corpus once, per-query row_number window.
    Q(
      "sim_topk_bruteforce",
      s"""WITH u AS ($oVecs),
         |n AS ($oNorms),
         |q AS (SELECT * FROM u WHERE vec_id IN (0, 1, 2, 3, 4)),
         |dots AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         (SUM(round(CAST(q.x AS DOUBLE) * 1000000) * round(CAST(c.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM q JOIN u c ON q.p = c.p AND q.vec_id <> c.vec_id
         |  GROUP BY q.vec_id, c.vec_id),
         |scored AS (
         |  SELECT query_id, neighbor_id, dot / (nq.norm * nc.norm) AS cosine
         |  FROM dots JOIN n nq ON query_id = nq.vec_id JOIN n nc ON neighbor_id = nc.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      val vecs = withNorm(Tables.load(s, dir, "embeddings"))
      val queries = vecs.filter(col("vec_id").isin(0, 1, 2, 3, 4))
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("norm").as("qnorm"))
      val scored = vecs.join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (dotExact(col("qe"), col("embedding")) / (col("qnorm") * col("norm")))
            .as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .orderBy(col("query_id"), col("rnk"))
    },

    // Embedding near-dup pairs: all-pairs exact cosine over a threshold.
    // (The fixture plants no >0.8 dups; 0.4 exercises the operator.)
    // Kept as the small-scale ground truth for the LSH variant.
    Q(
      "sim_cosine_pairs",
      s"""WITH u AS ($oVecs),
         |n AS ($oNorms),
         |dots AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b,
         |         (SUM(round(CAST(a.x AS DOUBLE) * 1000000) * round(CAST(b.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM u a JOIN u b ON a.p = b.p AND a.vec_id < b.vec_id
         |  GROUP BY a.vec_id, b.vec_id)
         |SELECT a, b, dot / (na.norm * nb.norm) AS cosine
         |FROM dots JOIN n na ON a = na.vec_id JOIN n nb ON b = nb.vec_id
         |WHERE dot / (na.norm * nb.norm) >= 0.4
         |ORDER BY a, b""".stripMargin
    ) { (s, dir) =>
      // blocked all-pairs: B blocks → B(B+1)/2 block-pair rows, each one
      // native kernel call (CosinePairsExpr) — identical quantized-exact
      // cosine, but no O(n²) wide-row materialization before arithmetic.
      // B derives from the corpus count so a block row stays bounded
      // (≤ maxPerBlock vectors ≈ a few MB) no matter the corpus size —
      // a fixed B would make block rows grow linearly with the corpus
      // and OOM the collect_list at 100× scale. The all-pairs COMPUTE
      // is inherently quadratic (this query is the small-scale ground
      // truth for the ANN variants); only the materialization is bounded.
      cosinePairs(s, dir, 0.4).orderBy(col("a"), col("b"))
    },

    // LSH-bucketed ANN: sign-random-projection sketch (hyperplane
    // components derived from md5, so both engines build identical
    // planes), bucket-join, exact re-rank within buckets. The candidate
    // join touches only same-sketch pairs — corpus-linear when buckets
    // are balanced, vs the quadratic brute force above.
    //
    // The sketch WIDTH is corpus-derived, not fixed: with a static w-bit
    // sketch there are at most 2^w buckets, so expected candidate pairs
    // grow as n²/2^w — quadratic at any fixed width (the defining
    // 100×-scale killer; cf. cosinePairsAnn's band geometry). Both
    // engines compute bits = the smallest b in [3, 12] with
    // 1024·2^b ≥ n — pure integer arithmetic (equivalent to
    // max(3, ceil(log2(n/1024))) capped at 12) so a log2 ULP can never
    // diverge between Spark and DuckDB — which holds expected bucket
    // occupancy ≤ ~1024 and candidate pairs ≤ ~512·n, corpus-linear.
    Q(
      "sim_ann_lsh",
      s"""WITH u AS ($oVecs),
         |n AS ($oNorms),
         |bcfg AS (
         |  SELECT COALESCE(MIN(b), 12) AS bits
         |  FROM (SELECT unnest(generate_series(3, 12)) AS b)
         |  WHERE 1024 * (CAST(1 AS BIGINT) << b) >= (SELECT COUNT(*) FROM embeddings)),
         |planes AS (
         |  SELECT b, p,
         |         (CAST(('0x' || substr(md5(b || '_' || p), 1, 15)) AS BIGINT) % 2001 - 1000)
         |           / 1000.0 AS r
         |  FROM (SELECT unnest(generate_series(0, (SELECT bits FROM bcfg) - 1)) AS b)
         |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS p)),
         |proj AS (
         |  SELECT u.vec_id, pl.b,
         |         (SUM(round(CAST(u.x AS DOUBLE) * 1000000) * round(pl.r * 1000000)) / 1e12) AS s
         |  FROM u JOIN planes pl ON u.p = pl.p
         |  GROUP BY u.vec_id, pl.b),
         |sketch AS (
         |  SELECT vec_id,
         |         SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sk
         |  FROM proj GROUP BY vec_id),
         |cand AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM sketch x JOIN sketch y ON x.sk = y.sk AND x.vec_id < y.vec_id),
         |dots AS (
         |  SELECT c.a, c.b,
         |         (SUM(round(CAST(ua.x AS DOUBLE) * 1000000) * round(CAST(ub.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM cand c JOIN u ua ON ua.vec_id = c.a JOIN u ub ON ub.vec_id = c.b AND ua.p = ub.p
         |  GROUP BY c.a, c.b)
         |SELECT a, b, dot / (na.norm * nb.norm) AS cosine
         |FROM dots JOIN n na ON a = na.vec_id JOIN n nb ON b = nb.vec_id
         |WHERE dot / (na.norm * nb.norm) >= 0.2
         |ORDER BY a, b""".stripMargin
    ) { (s, dir) =>
      // thr enables the sound double pre-filter in the candidate join;
      // the kept pairs' cosines still come from the exact dot, and this
      // final exact filter is what defines the result set
      lshCandidatePairs(s, dir, thr = Some(0.2))
        .filter(col("cosine") >= 0.2)
        .orderBy(col("a"), col("b"))
    },

    // IVF-Flat ANN — the other canonical scale path besides LSH: a coarse
    // quantizer (deterministic: the nlist = ⌈√n⌉ lowest-id corpus vectors
    // as centroids, ivfNlist) partitions the corpus into inverted lists;
    // each query probes its nprobe = ⌈√nlist⌉ nearest centroids and
    // exact-reranks ONLY those lists. At 100 TB the lists are
    // hash-partitioned by centroid id and the probe set is a broadcast —
    // a query touches nprobe/nlist ≈ n^(-1/4) of the corpus, a fraction
    // that SHRINKS as the corpus grows.
    Q(
      "sim_ann_ivf",
      s"""WITH u AS ($oVecs),
         |n AS ($oNorms),
         |$oIvfCfg,
         |$oIvfFlatCtes,
         |dots AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         (SUM(round(CAST(q.x AS DOUBLE) * 1000000) * round(CAST(v.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM cand c JOIN u q ON q.vec_id = c.query_id
         |              JOIN u v ON v.vec_id = c.neighbor_id AND q.p = v.p
         |  GROUP BY c.query_id, c.neighbor_id),
         |scored AS (
         |  SELECT query_id, neighbor_id, dot / (nq.norm * nn.norm) AS cosine
         |  FROM dots JOIN n nq ON query_id = nq.vec_id JOIN n nn ON neighbor_id = nn.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      ivfTopk(s, dir).orderBy(col("query_id"), col("rnk"))
    },

    // ANN recall evaluation — the operator every approximate index ships
    // with: recall@10 of the IVF path against the exact brute-force
    // ground truth, per query. The eval is itself a distributed query
    // (exact top-k ⋈ ANN top-k on (query, neighbor)), so it runs at any
    // corpus size the index runs at; the query set stays broadcast-sized
    // by definition. A recall drop after an index rebuild is the
    // canonical data-quality alarm for a similarity pipeline.
    Q(
      "sim_ann_recall_eval",
      s"""WITH u AS ($oVecs),
         |n AS ($oNorms),
         |$oIvfCfg,
         |$oIvfFlatCtes,
         |idots AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         (SUM(round(CAST(q.x AS DOUBLE) * 1000000) * round(CAST(v.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM cand c JOIN u q ON q.vec_id = c.query_id
         |              JOIN u v ON v.vec_id = c.neighbor_id AND q.p = v.p
         |  GROUP BY c.query_id, c.neighbor_id),
         |iscored AS (
         |  SELECT query_id, neighbor_id, dot / (nq.norm * nn.norm) AS cosine
         |  FROM idots JOIN n nq ON query_id = nq.vec_id JOIN n nn ON neighbor_id = nn.vec_id),
         |ivf AS (
         |  SELECT query_id, neighbor_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM iscored),
         |edots AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |         (SUM(round(CAST(q.x AS DOUBLE) * 1000000) * round(CAST(v.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM u q JOIN u v ON q.p = v.p AND q.vec_id <> v.vec_id
         |  WHERE q.vec_id IN (5, 6, 7, 8, 9)
         |  GROUP BY q.vec_id, v.vec_id),
         |escored AS (
         |  SELECT query_id, neighbor_id, dot / (nq.norm * nn.norm) AS cosine
         |  FROM edots JOIN n nq ON query_id = nq.vec_id JOIN n nn ON neighbor_id = nn.vec_id),
         |exact AS (
         |  SELECT query_id, neighbor_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rnk
         |  FROM escored)
         |SELECT e.query_id,
         |       CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_overlap,
         |       CAST(COUNT(i.neighbor_id) AS DOUBLE) / 10 AS recall_at_10
         |FROM exact e
         |LEFT JOIN ivf i ON e.query_id = i.query_id
         |                AND e.neighbor_id = i.neighbor_id AND i.rnk <= 10
         |WHERE e.rnk <= 10
         |GROUP BY e.query_id
         |ORDER BY e.query_id""".stripMargin
    ) { (s, dir) =>
      val exact = bruteTopk(s, dir, Seq(5, 6, 7, 8, 9))
        .select(col("query_id"), col("neighbor_id"))
      val ivf = ivfTopk(s, dir)
        .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1))
      exact.join(ivf, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
        .select(col("query_id"), col("n_overlap"),
          (col("n_overlap").cast("double") / 10).as("recall_at_10"))
        .orderBy(col("query_id"))
    },

    // Semantic decontamination — the embedding-space twin of the n-gram
    // eval/train overlap check (dedup_contamination): flag every train
    // vector whose cosine to ANY benchmark vector clears the threshold
    // (paraphrased eval leakage that n-gram overlap misses). Eval sets
    // are tiny by definition, so the plan is broadcast(eval) × one
    // corpus scan with a codegen'd exact dot per pair — corpus-linear
    // at any scale, no shuffle until the final per-vector aggregate;
    // the same decimal-exact kernel as the oracle, so values match
    // bit-for-bit.
    Q(
      "dedup_semantic_decontam",
      s"""WITH u AS ($oVecs),
         |n AS ($oNorms),
         |e AS (SELECT vec_id FROM embeddings WHERE vec_id < 20),
         |dots AS (
         |  SELECT t.vec_id AS t_id, q.vec_id AS e_id,
         |         (SUM(round(CAST(t.x AS DOUBLE) * 1000000) * round(CAST(q.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM u t JOIN u q ON t.p = q.p
         |  WHERE q.vec_id IN (SELECT vec_id FROM e) AND t.vec_id >= 20
         |  GROUP BY t.vec_id, q.vec_id),
         |scored AS (
         |  SELECT t_id, e_id, dot / (nt.norm * ne.norm) AS cosine
         |  FROM dots JOIN n nt ON t_id = nt.vec_id JOIN n ne ON e_id = ne.vec_id)
         |SELECT t_id AS vec_id, count(*) AS n_hits, MAX(cosine) AS max_cos
         |FROM scored WHERE cosine >= 0.35
         |GROUP BY t_id
         |ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      val vecs = withNorm(Tables.load(s, dir, "embeddings"))
      val evalSet = vecs.filter(col("vec_id") < 20)
        .select(col("vec_id").as("e_id"), col("embedding").as("ee"),
          col("norm").as("enorm"))
      vecs.filter(col("vec_id") >= 20)
        .crossJoin(broadcast(evalSet))
        .select(col("vec_id"),
          (dotExact(col("embedding"), col("ee")) / (col("norm") * col("enorm")))
            .as("cosine"))
        .filter(col("cosine") >= 0.35)
        .groupBy(col("vec_id"))
        .agg(count(lit(1)).as("n_hits"), max(col("cosine")).as("max_cos"))
        .orderBy(col("vec_id"))
    },

    // Distributed k-means (Lloyd's) — TRAINS the centroids the IVF
    // operator probes (sim_ann_ivf seeds its lists from raw vectors; a
    // production index trains them). k=8, deterministic init (vec_id<8),
    // two update rounds + final assignment. Every arithmetic step is the
    // repo's decimal-exact contract — dot products and component means
    // accumulate in DECIMAL(38,12) then cast to double — so assignment,
    // tie-breaks (dist, then cid) and the trained centroids are
    // bit-identical across engines and runs, making a value-level oracle
    // possible for an iterative ML fit. Scale shape per round: centroids
    // are PARAMETERS (k×dim doubles) — broadcast as literals into one
    // narrow scan (argmin over k scores per row, no join, no shuffle);
    // the update is one (cluster, dim)-keyed partial aggregate. The k×dim
    // driver collect is the MLlib pattern: parameters come back to the
    // driver, data never does.
    Q(
      "sim_kmeans_train",
      {
        val k = 8
        def iterCtes(i: Int, prev: String): String =
          s"""cu$i AS (SELECT cid, CAST(unnest(ce) AS DOUBLE) AS y,
             |            generate_subscripts(ce, 1) AS p FROM $prev),
             |c2_$i AS (SELECT cid, CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS c2
             |          FROM cu$i GROUP BY cid),
             |d$i AS (SELECT u.vec_id, cu$i.cid,
             |          CAST(SUM(CAST(CAST(u.x AS DOUBLE) * cu$i.y AS DECIMAL(38,12))) AS DOUBLE) AS dot
             |        FROM u JOIN cu$i ON u.p = cu$i.p GROUP BY u.vec_id, cu$i.cid),
             |s$i AS (SELECT d$i.vec_id, d$i.cid, c2_$i.c2 - 2 * d$i.dot AS s
             |        FROM d$i JOIN c2_$i ON d$i.cid = c2_$i.cid),
             |a$i AS (SELECT vec_id, cid,
             |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cid) AS r
             |        FROM s$i)""".stripMargin
        def updateCtes(i: Int, prev: String): String =
          s"""mm$i AS (SELECT a.cid, u.p,
             |           CAST(SUM(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
             |             / COUNT(*) AS m
             |         FROM (SELECT vec_id, cid FROM a$i WHERE r = 1) a
             |         JOIN u USING (vec_id) GROUP BY a.cid, u.p),
             |cn$i AS (SELECT cid, list(m ORDER BY p) AS ce FROM mm$i GROUP BY cid),
             |c$i AS (SELECT p.cid, COALESCE(cn$i.ce, p.ce) AS ce
             |        FROM $prev p LEFT JOIN cn$i ON p.cid = cn$i.cid)""".stripMargin
        s"""WITH u AS ($oVecs),
           |c0 AS (SELECT vec_id AS cid, list_transform(embedding, z -> CAST(z AS DOUBLE)) AS ce
           |       FROM embeddings WHERE vec_id < $k),
           |${iterCtes(1, "c0")},
           |${updateCtes(1, "c0")},
           |${iterCtes(2, "c1")},
           |${updateCtes(2, "c1")},
           |${iterCtes(3, "c2")}
           |SELECT vec_id, CAST(cid AS INT) AS cluster FROM a3 WHERE r = 1
           |ORDER BY vec_id""".stripMargin
      }
    ) { (s, dir) =>
      import org.apache.spark.sql.types.DataTypes
      val k = 8
      // scale 12 = the oracle's DECIMAL(38,12) rounding; precision 30
      // leaves addition headroom below Spark's 38 cap (a (38,12)+(38,12)
      // add would shrink to scale 11 and break bit-exactness). The
      // re-cast in the merge lambda is value-preserving: magnitudes here
      // are ≤ 10^3, far inside 18 integer digits.
      val dec = DataTypes.createDecimalType(30, 12)
      val vecs = Tables.spread(Tables.load(s, dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      // decimal-exact dot against a literal (broadcast-as-parameter) array
      def dotLit(e: Column, c: Seq[Double]): Column =
        aggregate(
          zip_with(e, typedlit(c), (x, y) => (x.cast("double") * y).cast(dec)),
          lit(BigDecimal(0)).cast(dec), (a, b) => (a + b).cast(dec)).cast("double")
      def assign(cents: Seq[Seq[Double]]): DataFrame = {
        val scores = array(cents.zipWithIndex.map { case (c, j) =>
          // |c|^2 via the same decimal kernel (constant subtree), minus
          // 2*x·c — |x|^2 is rank-invariant and dropped
          struct((dotLit(typedlit(c), c) - lit(2.0) * dotLit(col("embedding"), c)).as("s"),
            lit(j).as("cid"))
        }: _*)
        vecs.select(col("vec_id"), col("embedding"),
          array_min(scores).getField("cid").as("cluster"))
      }
      var cents: Seq[Seq[Double]] = vecs.filter(col("vec_id") < k)
        .orderBy(col("vec_id")).collect()
        .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
      for (_ <- 1 to 2) {
        val members = assign(cents)
        val means = members
          .select(col("cluster"), posexplode(col("embedding")).as(Seq("p", "x")))
          .groupBy(col("cluster"), col("p"))
          .agg((sum(col("x").cast("double").cast(dec)).cast("double") / count(lit(1))).as("m"))
          .collect()
        val byCluster = means.groupBy(_.getInt(0)).map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
        cents = cents.indices.map(j => byCluster.getOrElse(j, cents(j)))
      }
      assign(cents)
        .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
        .orderBy(col("vec_id"))
    },

    // Product quantization + ADC — the memory-bound half of a production
    // ANN index (FAISS IVFPQ's PQ stage): the 64-dim corpus compresses to
    // m=4 one-byte codes (16 codewords per 16-dim subspace, deterministic
    // codebook = the first 16 corpus vectors' subvectors, the same seeding
    // rule as sim_ann_ivf's coarse quantizer), and a query scans CODES,
    // not vectors — per query it computes a 4×16 lookup table once, and
    // every corpus distance is then 4 table lookups + 3 adds (asymmetric
    // distance computation). At 100 TB this is the difference between
    // scanning 256 bytes/vector and 4 bytes/vector. Plan: encoding is a
    // crossJoin against the 16-row broadcast codebook (one corpus pass);
    // the LUT is tiny by construction (queries × 64 rows) → broadcast
    // against the codes scan; ADC sums accumulate through DECIMAL(38,12)
    // so ranking is bit-identical to the oracle's replay. Squared-L2
    // distances throughout (PQ's native metric). The u/sub/…/codes CTE
    // prefix is shared verbatim with sim_ivf_pq (oPqCtes / pqDists /
    // pqCodes) so the two operators' quantizers can never drift.
    Q(
      "sim_pq_adc",
      s"""WITH $oPqCtes,
         |lut AS (
         |  SELECT vec_id AS query_id, cid, s, d FROM dist
         |  WHERE vec_id IN (5, 6, 7, 8, 9)),
         |adc AS (
         |  SELECT l.query_id, v.vec_id AS neighbor_id,
         |         CAST(SUM(CAST(l.d AS DECIMAL(38,12))) AS DOUBLE) AS adc
         |  FROM codes v JOIN lut l ON l.s = v.s AND l.cid = v.code
         |  WHERE v.vec_id <> l.query_id
         |  GROUP BY l.query_id, v.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY adc, neighbor_id) AS rnk
         |  FROM adc)
         |SELECT query_id, neighbor_id, adc, rnk FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      val dists = pqDists(s, dir)
      val codes = pqCodes(dists)
      val lut = dists.filter(col("vec_id").isin(5, 6, 7, 8, 9))
        .select(col("vec_id").as("query_id"), col("cid"), col("s").as("ls"),
          col("d"))
      val adc = codes.join(broadcast(lut),
          col("ls") === col("s") && col("cid") === col("code"))
        .filter(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("d").cast(DecimalType(38, 12))).cast("double").as("adc"))
      val wRank = Window.partitionBy(col("query_id"))
        .orderBy(col("adc"), col("neighbor_id"))
      adc.select(col("query_id"), col("vec_id").as("neighbor_id"), col("adc"))
        .withColumn("rnk", row_number().over(wRank))
        .filter(col("rnk") <= 10)
        .orderBy(col("query_id"), col("rnk"))
    },

    // IVF+PQ combined — the full billion-scale ANN index architecture
    // (FAISS IVFPQ, Milvus IVF_PQ): the coarse quantizer ROUTES (every
    // vector joins its nearest centroid's inverted list; a query probes
    // its nprobe nearest lists), and PQ codes SCORE (ADC over the probed
    // lists' codes only — 4 lookups + 3 adds per candidate). The coarse
    // index is CORPUS-DERIVED (nlist = ⌈√n⌉, nprobe = ⌈√nlist⌉ —
    // ivfNlist/ivfNprobe), so the probed fraction nprobe/nlist falls as
    // n^(-1/4) while per-list length grows as √n: at 100 TB the probe
    // join touches a vanishing slice of the 4-byte-per-vector code
    // table — the scan-volume product of the two reductions. The PQ
    // codebook stays 16 codewords/subspace (quantization RESOLUTION,
    // like FAISS's fixed 256 — not a routing fanout) and encodes raw
    // vectors (no residuals), trading some recall for an
    // exactly-replayable oracle. Plan: probes and LUT are
    // query-set-sized → broadcast; lists and codes are the only
    // corpus-sized frames and meet in one equi-join.
    Q(
      "sim_ivf_pq",
      s"""WITH $oPqCtes,
         |$oIvfCfg,
         |$oIvfPqCtes,
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY adc, neighbor_id) AS rnk
         |  FROM adc)
         |SELECT query_id, neighbor_id, adc, rnk FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      ivfPqTopk(s, dir).orderBy(col("query_id"), col("rnk"))
    },

    // Recall@10 of the IVF+PQ index against exact squared-L2 ground
    // truth (PQ's native metric) — the eval every ANN deployment runs
    // before trusting an index: routing loses candidates outside the
    // probed lists, PQ loses resolution to quantization, and this
    // measures both at once. Ground truth is the brute-force shape
    // (broadcast query batch × one corpus scan); the index side is the
    // shared ivfPqTopk. Per-query overlap counts, not an average — a
    // single bad query hides inside a mean. Standard recall@k
    // convention: exact-distance ties straddling the rank-10 boundary
    // are cut by neighbor_id on BOTH sides (deterministic, engines
    // agree), so an index hit on an equidistant rank-11 neighbor scores
    // as a miss — recall@k under ties is conservative, never inflated.
    Q(
      "sim_ivf_pq_recall",
      s"""WITH $oPqCtes,
         |$oIvfCfg,
         |$oIvfPqCtes,
         |pq AS (
         |  SELECT query_id, neighbor_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY adc, neighbor_id) AS rnk
         |  FROM adc),
         |edots AS (
         |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |         (SUM(round(CAST(q.x AS DOUBLE) * 1000000) * round(CAST(v.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM u q JOIN u v ON q.p = v.p AND q.vec_id <> v.vec_id
         |  WHERE q.vec_id IN (5, 6, 7, 8, 9)
         |  GROUP BY q.vec_id, v.vec_id),
         |exact AS (
         |  SELECT e.query_id, e.neighbor_id,
         |         ROW_NUMBER() OVER (PARTITION BY e.query_id
         |                            ORDER BY a.vv + b.vv - 2 * e.dot,
         |                                     e.neighbor_id) AS rnk
         |  FROM edots e
         |  JOIN vself a ON e.query_id = a.vec_id
         |  JOIN vself b ON e.neighbor_id = b.vec_id)
         |SELECT e.query_id,
         |       CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_overlap,
         |       CAST(COUNT(p.neighbor_id) AS DOUBLE) / 10 AS recall_at_10
         |FROM exact e
         |LEFT JOIN pq p ON e.query_id = p.query_id
         |               AND e.neighbor_id = p.neighbor_id AND p.rnk <= 10
         |WHERE e.rnk <= 10
         |GROUP BY e.query_id
         |ORDER BY e.query_id""".stripMargin
    ) { (s, dir) =>
      val vecs = Tables.spread(Tables.load(s, dir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
        .withColumn("vv", dotExact(col("embedding"), col("embedding")))
      val queries = vecs.filter(col("vec_id").isin(5, 6, 7, 8, 9))
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("vv").as("qvv"))
      val wExact = Window.partitionBy(col("query_id"))
        .orderBy(col("d"), col("neighbor_id"))
      val exact = vecs.join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (col("qvv") + col("vv") - lit(2) * dotExact(col("qe"), col("embedding")))
            .as("d"))
        .withColumn("rnk", row_number().over(wExact))
        .filter(col("rnk") <= 10)
      val pq = ivfPqTopk(s, dir)
        .select(col("query_id").as("pq_q"), col("neighbor_id").as("pq_n"))
      exact.join(pq,
          col("query_id") === col("pq_q") && col("neighbor_id") === col("pq_n"),
          "left_outer")
        .groupBy(col("query_id"))
        .agg(count(col("pq_n")).cast("long").as("n_overlap"),
          (count(col("pq_n")).cast("double") / 10).as("recall_at_10"))
        .orderBy(col("query_id"))
    },

    // Hard-negative mining — the contrastive-training shape (DPR /
    // Contriever): for each query vector, the top-k most-similar corpus
    // vectors with a DIFFERENT label are its hard negatives (similar in
    // embedding space, wrong class — the examples that actually move a
    // contrastive loss). Plan = the brute-force top-k shape with a
    // label-mismatch predicate fused into the broadcast join: queries are
    // tiny by definition (a training batch), so this is broadcast(batch)
    // × one corpus scan — corpus-linear, no shuffle before the per-query
    // top-k window. At 100 TB the corpus side would first be pruned by an
    // ANN index (sim_ann_lsh / sim_ann_ivf above); the verify-and-rank
    // tail is this exact plan.
    Q(
      "sim_hard_negatives",
      s"""WITH u AS ($oVecs),
         |n AS ($oNorms),
         |q AS (SELECT e.vec_id, e.label, u.x, u.p
         |      FROM embeddings e JOIN u ON e.vec_id = u.vec_id
         |      WHERE e.vec_id IN (0, 1, 2, 3, 4)),
         |dots AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neg_id,
         |         (SUM(round(CAST(q.x AS DOUBLE) * 1000000) * round(CAST(c.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM q
         |  JOIN (SELECT e.vec_id, e.label, u.x, u.p
         |        FROM embeddings e JOIN u ON e.vec_id = u.vec_id) c
         |    ON q.p = c.p AND q.label <> c.label
         |  GROUP BY q.vec_id, c.vec_id),
         |scored AS (
         |  SELECT query_id, neg_id, dot / (nq.norm * nc.norm) AS cosine
         |  FROM dots JOIN n nq ON query_id = nq.vec_id
         |            JOIN n nc ON neg_id = nc.vec_id),
         |ranked AS (
         |  SELECT query_id, neg_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neg_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neg_id, cosine, rnk FROM ranked WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin
    ) { (s, dir) =>
      val vecs = withNorm(Tables.load(s, dir, "embeddings"))
      val queries = vecs.filter(col("vec_id").isin(0, 1, 2, 3, 4))
        .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
          col("embedding").as("qe"), col("norm").as("qnorm"))
      val scored = vecs.join(broadcast(queries), col("label") =!= col("qlabel"))
        .select(col("query_id"), col("vec_id").as("neg_id"),
          (dotExact(col("qe"), col("embedding")) / (col("qnorm") * col("norm")))
            .as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neg_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .orderBy(col("query_id"), col("rnk"))
    },

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    // clustering — assign every embedding to its nearest coarse centroid,
    // then compare pairs ONLY within a cluster; a vector is pruned when it
    // is ≥ thr cosine-similar to any lower-id vector of the same cluster.
    // The clustering bounds the pair work: k is CORPUS-DERIVED so
    // clusters stay ~constant-size (k = ⌈n/1024⌉, the paper's rule —
    // k≈100k at LAION scale — clamped to [16, 4096]), making discovery
    // corpus-linear instead of quadratic; cross-cluster pairs are never
    // formed (the equi-join on cid is the whole point). Assignment uses
    // the k lowest-id vectors as deterministic seed centroids
    // (broadcast); the trained-centroid path of sim_kmeans_train would
    // slot in unchanged. Past the 4096 cap (4 M+ vectors) a production
    // index re-derives centroids hierarchically (assign to √k
    // super-clusters first); the fixtures cannot exercise that level.
    Q(
      "dedup_semdedup",
      s"""WITH u AS ($oVecs),
         |n AS ($oNorms),
         |sk AS (SELECT LEAST(4096, GREATEST(16,
         |         ((SELECT COUNT(*) FROM embeddings) + 1023) // 1024)) AS k),
         |cents AS (SELECT vec_id AS cid, x, p FROM u
         |          WHERE vec_id < (SELECT k FROM sk)),
         |adots AS (
         |  SELECT u.vec_id, c.cid,
         |         (SUM(round(CAST(u.x AS DOUBLE) * 1000000) * round(CAST(c.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM u JOIN cents c ON u.p = c.p
         |  GROUP BY u.vec_id, c.cid),
         |acos AS (
         |  SELECT a.vec_id, a.cid, a.dot / (nv.norm * nc.norm) AS cos
         |  FROM adots a JOIN n nv ON a.vec_id = nv.vec_id JOIN n nc ON a.cid = nc.vec_id),
         |lists AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rnk
         |    FROM acos) WHERE rnk = 1),
         |cand AS (
         |  SELECT la.vec_id AS a, lb.vec_id AS b
         |  FROM lists la JOIN lists lb ON la.cid = lb.cid AND la.vec_id < lb.vec_id),
         |dots AS (
         |  SELECT c.a, c.b,
         |         (SUM(round(CAST(ua.x AS DOUBLE) * 1000000) * round(CAST(ub.x AS DOUBLE) * 1000000)) / 1e12) AS dot
         |  FROM cand c JOIN u ua ON ua.vec_id = c.a
         |              JOIN u ub ON ub.vec_id = c.b AND ua.p = ub.p
         |  GROUP BY c.a, c.b),
         |removed AS (
         |  SELECT DISTINCT d.b
         |  FROM dots d JOIN n na ON d.a = na.vec_id JOIN n nb ON d.b = nb.vec_id
         |  WHERE d.dot / (na.norm * nb.norm) >= 0.4)
         |SELECT l.vec_id, CAST(l.cid AS INT) AS cluster, (r.b IS NULL) AS keep
         |FROM lists l LEFT JOIN removed r ON l.vec_id = r.b
         |ORDER BY l.vec_id""".stripMargin
    ) { (s, dir) =>
      val n = Tables.load(s, dir, "embeddings").count().max(1L)
      val k = semdedupK(n)
      val vecs = withNorm(Tables.load(s, dir, "embeddings"))
      val cents = vecs.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("norm").as("cnorm"))
      // coarse assignment: one narrow pass against the ≤4096 broadcast
      // centroids; the rank-1 cluster is a map-side-combinable argmax
      // (min of struct(-cos, cid) ≡ the (cos DESC, cid) rank-1 row) so
      // only n narrow rows shuffle — never the n×k assignment frame
      val assigned = vecs.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          (dotExact(col("embedding"), col("ce")) / (col("norm") * col("cnorm"))).as("cos"))
      val lists = assigned
        .groupBy(col("vec_id"))
        .agg(min(struct((-col("cos")).as("nc"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
        .join(vecs.select(col("vec_id"), col("embedding"), col("norm")), "vec_id")
        .select(col("vec_id"), col("embedding"), col("norm"), col("cid"))
      // intra-cluster pairs only: equi-join on cid (hash-partitioned by
      // cluster at scale), never a corpus-wide cross product
      val right = lists.select(col("cid"), col("vec_id").as("b_id"),
        col("embedding").as("eb"), col("norm").as("nb"))
      val removed = lists.join(right, Seq("cid"))
        .filter(col("vec_id") < col("b_id"))
        .filter((dotExact(col("embedding"), col("eb")) / (col("norm") * col("nb"))) >= 0.4)
        .select(col("b_id").as("vec_id")).distinct()
        .withColumn("rm", lit(true))
      lists.select(col("vec_id"), col("cid").cast("int").as("cluster"))
        .join(removed, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"), col("rm").isNull.as("keep"))
        .orderBy(col("vec_id"))
    },

    // Embedding-column profiling — the sanity pass before any similarity
    // work: per-label vector counts, norm statistics (degenerate
    // near-zero or exploding norms flag a broken encoder), and the mean
    // of the leading component (a cheap drift probe). One corpus-linear
    // aggregate; norm means go through Exact decimals so partition
    // accumulation order cannot perturb them.
    Q(
      "sim_embedding_profile",
      s"""WITH n AS ($oNorms),
         |j AS (
         |  SELECT e.label, n.norm, CAST(e.embedding[1] AS DOUBLE) AS dim1
         |  FROM embeddings e JOIN n ON e.vec_id = n.vec_id)
         |SELECT label,
         |       CAST(count(*) AS BIGINT) AS n_vecs,
         |       ${Exact.oAvg("norm")} AS mean_norm,
         |       MIN(norm) AS min_norm,
         |       MAX(norm) AS max_norm,
         |       ${Exact.oAvg("dim1")} AS mean_dim1
         |FROM j GROUP BY label ORDER BY label""".stripMargin
    ) { (s, dir) =>
      withNorm(Tables.load(s, dir, "embeddings"))
        .select(col("label"), col("norm"),
          col("embedding").getItem(0).cast("double").as("dim1"))
        .groupBy(col("label"))
        .agg(count(lit(1)).cast("long").as("n_vecs"),
          Exact.davg(col("norm")).as("mean_norm"),
          min(col("norm")).as("min_norm"),
          max(col("norm")).as("max_norm"),
          Exact.davg(col("dim1")).as("mean_dim1"))
        .orderBy(col("label"))
    }
  )
}

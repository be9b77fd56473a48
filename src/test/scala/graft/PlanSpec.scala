package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audits: the properties that decide whether these
  * operators survive a 100x scale-up (SURVEY §4 — everything the
  * reference lacked and Catalyst provides, verified rather than assumed).
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  /** Final ADAPTIVE plan: AQE's runtime exchange reuse only shows after
    * execution (the initial plan still prints both subtrees). */
  private def finalPlanOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf())
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("filters are pushed into the parquet scan") {
    val p = planOf("scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,500)]"),
      s"missing pushdown:\n$p")
  }

  test("projection prunes the scan to selected columns only") {
    val p = planOf("scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    // 3 of lineitem's 17 columns read
    assert(read.contains("l_orderkey") && read.contains("l_quantity") &&
      !read.contains("l_comment") && !read.contains("l_shipdate"), read)
  }

  test("dimension joins broadcast the small side") {
    val p = planOf("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$p")
  }

  test("aggregations are partial (map-side) then final") {
    val p = planOf("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, // partial + final
      s"expected two-phase aggregate in:\n$p")
  }

  test("top-k orderBy+limit plans TakeOrderedAndProject, not a full sort") {
    val p = planOf("sort_limit_offset")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
  }

  test("IN-subquery plans a semi join; NOT EXISTS an anti join") {
    val semi = planOf("sub_in_uncorrelated")
    assert(semi.toLowerCase.contains("leftsemi"), s"expected semi join:\n$semi")
    val anti = planOf("sub_not_exists_correlated")
    assert(anti.toLowerCase.contains("leftanti"), s"expected anti join:\n$anti")
  }

  test("IVF probe join broadcasts the query side") {
    // the probe set (queries × 2 centroids) must broadcast against the
    // corpus-sized inverted lists — a shuffle here would defeat IVF
    val p = planOf("sim_ann_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast probe join:\n${p.take(1500)}")
  }

  test("substring dedup plans anti-join coverage removal, no all-pairs work") {
    val p = planOf("dedup_substring_exact")
    // token removal must be a hash anti-join on (doc_id, position) —
    // corpus-linear — and nothing in the pipeline may plan a cartesian
    assert(p.toLowerCase.contains("leftanti"), s"expected anti join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      s"must not plan a cartesian:\n${p.take(1500)}")
  }

  test("semantic decontamination broadcasts the eval vectors over one corpus scan") {
    val p = planOf("dedup_semantic_decontam")
    // eval × corpus must be a broadcast nested loop over the 20-row eval
    // side (the pair compute is row-local after broadcast) — never a
    // shuffle of the corpus or a partition-less cartesian
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"expected eval-side broadcast:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      s"must not plan a cartesian:\n${p.take(1500)}")
  }

  test("decontamination broadcasts the tiny eval side against the train index") {
    val p = planOf("dedup_contamination")
    assert(!p.contains("CartesianProduct"),
      s"decontamination must not plan a cartesian:\n${p.take(1500)}")
    // the eval-shingle side is pinned as a broadcast: at 100 TB the
    // train index never shuffles on shingle for this join
    assert(p.contains("BroadcastHashJoin"),
      s"expected eval-broadcast hash join on shingle:\n${p.take(1500)}")
  }

  test("fused SimHash signature aggregates partially (map-side) per document") {
    val df = SparkEntry.queries("dedup_simhash")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // BitVoteAgg must run as a two-phase ObjectHashAggregate/SortAggregate
    // (partial + final), so only 60 longs per doc cross the shuffle
    assert("(ObjectHashAggregate|SortAggregate|HashAggregate)".r.findAllIn(p).size >= 2,
      s"expected two-phase custom aggregate:\n${p.take(1500)}")
  }

  test("scan-level queries stay inside whole-stage codegen") {
    // AQE finalizes (and shows codegen stages) only after execution
    val df = SparkEntry.queries("filter_comparisons")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n) Op" is the WholeStageCodegen marker in the plan string
    assert(p.contains("WholeStageCodegen") || "\\*\\(\\d+\\) ".r.findFirstIn(p).isDefined,
      s"expected codegen spans:\n$p")
  }

  test("native dot-product expression participates in codegen (no HOF lambdas)") {
    val df = SparkEntry.queries("sim_topk_bruteforce")(spark, sf())
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dotexactexpr") || p.contains("DotExactExpr") ||
      !p.contains("aggregate(zip_with"), s"expected native expression:\n${p.take(1200)}")
  }

  // NOTE: the former "bucketed tables join without a shuffle" test was
  // superseded by the "bucketed co-located join" pin below the gate
  // query join_bucketed_colocated: the old form located SortMergeJoin
  // with indexOf(...).max(0), which degraded to scanning the WHOLE plan
  // when AQE (correctly, at test scale) broadcast the join — a vacuous
  // pass. The replacement disables both broadcast thresholds to force
  // the at-scale regime and asserts the bucketed SMJ directly.

  test("partitioned writes prune partitions at the scan") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.load(spark, sf(), "events")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("day") === lit("2024-01-03"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("PartitionFilters: [") && !pf.contains("PartitionFilters: []"),
      s"expected non-empty partition filters:\n$p")
  }

  test("injected optimizer rule rewrites size(array_intersect) to one-pass count") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("dedup_minhash_lsh")(spark, sf())
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("intersectcountexpr") || p.contains("IntersectCountExpr"),
      s"rule did not fire:\n${p.take(1500)}")
    // semantics: matches size(array_intersect) incl. nulls and duplicates
    val r = spark.sql(
      "SELECT size(array_intersect(array('a','b','b','c'), array('b','c','d'))) AS s, " +
      "size(array_intersect(CAST(NULL AS ARRAY<STRING>), array('x'))) AS n").collect()(0)
    assert(r.getInt(0) == 2 && r.isNullAt(1))
  }

  test("embedding near-dup discovers pairs via band equi-join, never a nested loop") {
    // the PRODUCT path: banded sign-LSH candidates + exact verify. The
    // discovery join must be a hash-partitionable equi-join on
    // (band, key) — an O(B²) block-pair nested loop or a corpus
    // cartesian would not survive a 100x corpus.
    val ann = graft.operators.SimilarityQueries.cosinePairsAnn(spark, sf(), 0.4)
    val p = ann.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"non-equi pair discovery in embedding dedup:\n${p.take(1500)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected an equi-join on band buckets:\n${p.take(1500)}")
    val full = planOf("dedup_embedding_canonical")
    assert(!full.contains("CartesianProduct"),
      s"corpus-level cartesian in embedding dedup:\n${full.take(1500)}")
    // exactness: ANN candidates + exact verify reproduce the blocked
    // all-pairs kernel bit-for-bit (total recall on the fixture)
    val exact = graft.operators.SimilarityQueries.cosinePairs(spark, sf(), 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ann.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact, s"ANN pairs diverge from exact: missing=${exact -- got} extra=${got -- exact}")
  }

  test("sim_ann_lsh sketch width is corpus-derived, bucket join is an equi-join") {
    import graft.operators.SimilarityQueries.lshSketchWidth
    // integer formula ≡ max(3, ceil(log2(n/1024))) capped at 12; pin the
    // boundaries so a refactor can't silently reintroduce a fixed width
    assert(lshSketchWidth(1L) == 3 && lshSketchWidth(8192L) == 3)
    assert(lshSketchWidth(8193L) == 4)
    assert(lshSketchWidth(1024L * 4096) == 12)
    assert(lshSketchWidth(Long.MaxValue) == 12)
    // occupancy invariant behind the linear-candidates claim
    (Seq(1L, 500L, 5000L, 1000000L, 123456789L) ++
      (3 to 12).map(b => 1024L * (1L << b))).foreach { n =>
      val b = lshSketchWidth(n)
      assert(b >= 3 && b <= 12)
      if (b < 12) assert(n <= 1024L * (1L << b), s"occupancy >1024 at n=$n")
      if (b > 3) assert(n > 1024L * (1L << (b - 1)), s"width over-wide at n=$n")
    }
    // pair work runs through the BLOCKED kernel (per-bucket collect_list
    // + CosinePairsExpr with the double pre-filter), never a wide-row
    // pair self-join; the rare over-occupied-bucket fallback is an
    // equi-join of sub-blocks on the sketch key
    val p = planOf("sim_ann_lsh")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in LSH plan:\n${p.take(1500)}")
    assert(p.contains("collect_list") &&
      p.toLowerCase.contains("cosinepairsexpr"),
      s"bucket pairs not routed through the blocked kernel:\n${p.take(2000)}")
    assert("Join \\[?sk".r.findFirstIn(p).isDefined ||
      p.contains("Join [sk#") ||
      "(SortMergeJoin|ShuffledHashJoin) \\[sk".r.findFirstIn(p).isDefined,
      s"sub-block fallback not an equi-join on the sketch:\n${p.take(2000)}")
  }

  test("TF-IDF plans top-k window group limits and broadcasts the vocab df join") {
    val p = planOf("text_tfidf_top_terms")
    // rnk<=3 pushes into the window as a group limit (no full per-doc sort
    // materialization), the df side broadcasts, and the doc_id filter
    // reaches the tf branch's scan while df still covers the full corpus
    assert(p.contains("WindowGroupLimit"), s"top-k not pushed into window:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"), s"df join lost its broadcast:\n${p.take(1500)}")
    assert(p.contains("LessThan(doc_id,100)"), s"doc filter not pushed:\n${p.take(1500)}")
  }

  test("BPE merge counting aggregates partially and top-50 is TakeOrdered, never a full sort") {
    val p = planOf("pipeline_bpe_merges")
    assert("partial_sum|partial_count".r.findFirstIn(p).isDefined,
      s"pair aggregate not map-side partial:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"LIMIT 50 must plan top-k, not a global sort:\n${p.take(1500)}")
  }

  test("partitioned event read prunes to the selected day at planning time") {
    val df = SparkEntry.queries("evt_partitioned_prune")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the day filter must reach the scan as a PARTITION filter (dir
    // pruning — the selected day's bytes are the query's cost), not as
    // a post-scan row filter over the whole table
    assert(p.contains("PartitionFilters: [") && "day#\\d+ = ".r.findFirstIn(p).isDefined,
      s"expected day partition filter at the scan:\n${p.take(2000)}")
  }

  test("RFM scoring is threshold-based: no window (= no global sort), thresholds broadcast") {
    val p = planOf("rfm_segments")
    // the old shape was three un-partitioned NTILE windows — three serial
    // single-task sorts over every customer. The threshold form has no
    // Window at all: one aggregate (map-side partial -> 1-row final) whose
    // result broadcasts back onto the per-customer table.
    assert(!p.contains("Window"), s"rfm must not plan a window:\n${p.take(1500)}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"thresholds must broadcast:\n${p.take(1500)}")
  }

  test("sequence packing windows per source partition, never a single global sort") {
    val p = planOf("pipeline_pack_sequences")
    assert(p.contains("windowspecdefinition(source"),
      s"cumsum window must partition by source:\n${p.take(1500)}")
    assert(!p.contains("Exchange SinglePartition"),
      s"packing must not funnel through one partition:\n${p.take(1500)}")
    assert(p.contains("partial_sum"), s"bin aggregate not map-side partial:\n${p.take(1500)}")
  }

  test("source capping windows per source partition, never one global sort") {
    val p = planOf("pipeline_source_cap")
    assert(p.contains("windowspecdefinition(source"),
      s"cap ranking must partition by source:\n${p.take(1500)}")
    assert(!p.contains("Exchange SinglePartition"),
      s"capping must not funnel through one partition:\n${p.take(1500)}")
  }

  test("vocab coverage bounds its global window with a top-k cut first") {
    val p = planOf("text_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-25 vocab cut must plan top-k, not a full sort:\n${p.take(1500)}")
    assert("partial_count|partial_sum".r.findFirstIn(p).isDefined,
      s"word-frequency aggregate not map-side partial:\n${p.take(1500)}")
  }

  test("markov transitions window per user and broadcast the normalizer") {
    val p = planOf("evt_markov_transitions")
    assert(p.contains("windowspecdefinition(user_id"),
      s"LEAD must partition by user_id:\n${p.take(1500)}")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"per-src totals must broadcast:\n${p.take(1500)}")
  }

  test("market-basket top pairs plan top-k with map-side partial support counts") {
    val p = planOf("mba_item_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      s"LIMIT 25 must plan top-k, not a global sort:\n${p.take(1500)}")
    assert("partial_count|partial_sum".r.findFirstIn(p).isDefined,
      s"support aggregate not map-side partial:\n${p.take(1500)}")
  }

  test("distribution drift is one conditional-sum aggregate with broadcast totals") {
    val p = planOf("text_dist_drift")
    assert("partial_sum|partial_count".r.findFirstIn(p).isDefined,
      s"cohort counts not map-side partial:\n${p.take(1500)}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"scalar totals must broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"cohorts must not join — one aggregate computes both:\n${p.take(1500)}")
  }

  test("bm25 computes the term-frequency shuffle once (AQE exchange reuse)") {
    val p = finalPlanOf("text_bm25")
    // both consumers of tf (the score join and the dfreq→qterms branch)
    // must read ONE (doc_id, w) shuffle: the branches are deliberately
    // kept byte-identical (explicit isNotNull + a count-preserving
    // filter) so AQE stage reuse dedupes the expensive explode+shuffle
    assert(p.contains("ReusedExchange") &&
      "ReusedExchange \\[[^\\]]*\\], Exchange hashpartitioning\\(doc_id".r
        .findFirstIn(p).isDefined,
      s"tf shuffle not reused — explode runs twice:\n${p.take(2000)}")
    // the top-20 cut stays a distributed top-k feeding a 20-row window,
    // never a corpus-sized global-sort funnel
    assert(p.contains("TakeOrderedAndProject(limit=20"),
      s"rank filter must plan a bounded top-k:\n${p.take(2000)}")
  }

  test("distinctive terms rank inside a source-partitioned window") {
    val p = planOf("text_distinctive_terms")
    assert(p.contains("windowspecdefinition(source"),
      s"top-3 cut must partition by source:\n${p.take(1500)}")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"per-source totals must broadcast:\n${p.take(1500)}")
    // the rn <= 3 filter must push into the window as a group limit so
    // each source keeps 3 rows BEFORE the full ranking materializes
    assert(p.contains("WindowGroupLimit"),
      s"rank filter must plan WindowGroupLimit:\n${p.take(1500)}")
  }

  test("attribution credit divisor windows per purchase, never globally") {
    val p = planOf("evt_attribution_linear")
    assert(p.contains("windowspecdefinition(p_id"),
      s"credit divisor must partition by purchase:\n${p.take(1500)}")
    assert(!p.contains("Exchange SinglePartition"),
      s"attribution must not funnel through one partition:\n${p.take(1500)}")
  }

  test("expectations sweep scans each table exactly once, k checks notwithstanding") {
    val p = planOf("pipeline_expectations")
    val scans = "Scan parquet|FileScan parquet".r.findAllIn(p).size
    assert(scans == 2,
      s"8 checks over 2 tables must cost exactly 2 scans, found $scans:\n${p.take(1500)}")
  }

  test("selective fact-fact joins inject a runtime bloom filter on the probe side") {
    // At 100 TB a shuffle join whose build side is filtered selectively
    // should not shuffle the ENTIRE probe side: Spark's runtime bloom
    // filter (on by default in this Spark line) aggregates the build
    // side's join keys into a bloom filter and injects a
    // might_contain predicate into the probe scan, cutting the shuffle
    // to near-matching rows. Its size thresholds are tuned for real
    // clusters (10 MB build / 10 GB probe scan), so the fixture can't
    // trip them — lower the probe threshold and disable broadcast to
    // reproduce the 100-TB planning decision, then pin the injection
    // and that results are unchanged by it.
    val c = spark.conf
    val kApp = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val kBc = "spark.sql.autoBroadcastJoinThreshold"
    val kEn = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val prev = Seq(kApp, kBc, kEn).map(k => k -> c.get(k))
    def shape(): DataFrame = {
      val o = Tables.load(spark, sf(), "orders")
        .filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
      Tables.load(spark, sf(), "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }
    val unfiltered = shape().collect().toSeq
    try {
      c.set(kEn, "true")
      c.set(kBc, "-1")
      c.set(kApp, "1KB")
      val df = shape()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("might_contain") || p.contains("BloomFilterMightContain"),
        s"no runtime bloom filter injected:\n${p.take(2000)}")
      assert(df.collect().toSeq == unfiltered,
        "runtime bloom filter must not change results")
    } finally prev.foreach { case (k, v) => c.set(k, v) }
  }

  test("suite-wide plan hygiene: no cartesian products; single-partition funnels only where bounded") {
    // An Exchange SinglePartition is a scale hazard ONLY when corpus-sized
    // rows flow through it. Every entry below is audited bounded-input:
    //   final    — final step of a global scalar aggregate (one row per
    //              upstream partition flows, never corpus rows)
    //   scalar   — a 1-row scalar/threshold table built by such an
    //              aggregate (then broadcast)
    //   bounded  — a window/sort whose input is already cut to a bounded
    //              row count (post-LIMIT / post-TakeOrdered)
    //   byDef    — distribution window functions (NTILE/PERCENT_RANK/
    //              CUME_DIST) are global by definition; the gate scopes
    //              their input
    // A NEW name appearing here means a query grew a global funnel — fix
    // it or justify it; a STALE entry means the funnel was fixed — prune.
    val allowedSinglePartition: Map[String, String] = Map(
      "pipeline_expectations" -> "final",
      "evt_attribution_unmatched" -> "final",
      // global MG-sketch aggregate: the final merge is ≤ m counters per
      // upstream partition, bounded by construction (TopKAgg)
      "agg_approx_topk_bound" -> "final",
      "agg_global" -> "final", "agg_approx_quantile_bound" -> "final",
      "agg_hll_merge_bound" -> "final", "q6_forecast_revenue" -> "final",
      "q14_promo_share" -> "final", "q17_small_qty_revenue" -> "final",
      "q19_disjunctive_filter" -> "final", "q22_sales_opportunity" -> "scalar",
      "q11_important_parts" -> "scalar", "q15_top_supplier" -> "scalar",
      "sub_scalar_where" -> "scalar", "pipeline_mix_weighted" -> "scalar",
      // min source mass: one row per source (≤20) into the scalar min
      "pipeline_mix_temperature" -> "scalar",
      "dedup_contamination" -> "scalar",
      // the audited exchange is the min(source) scalar subquery (same
      // as dedup_contamination). NOTE: the bloom bitset build ALSO
      // funnels (≤16 MiB OR-merge buffer per partition, bounded by
      // construction) but runs eagerly inside the query function —
      // its plan is asserted separately in BloomSpec, not here
      "dedup_bloom_decontam" -> "scalar",
      "evt_gapfill_locf" -> "scalar", "mba_item_pairs" -> "scalar",
      "rfm_segments" -> "scalar", "text_bm25" -> "scalar",
      "text_tfidf_top_terms" -> "scalar", "text_lm_surprise" -> "scalar",
      "text_lm_bigram" -> "scalar", "text_dist_drift" -> "scalar",
      // the vocab countDistinct scalar inside the SHARED cached
      // bigram-model build, visible through the InMemoryRelation
      // printout now that the consumer no longer hides its plan behind
      // a checkpoint stub (r17: the stub also hid a cache-eviction bug)
      "pipeline_ppl_buckets" -> "scalar",
      "text_distinctive_terms" -> "scalar",
      "text_vocab_coverage" -> "bounded", "win_ntile_dist" -> "byDef",
      // score-bucket cum-mass window: bucket count is bounded by the 1e3
      // score quantization (≤15k rows), never by the corpus
      "pipeline_token_budget" -> "bounded")
    val offenders = scala.collection.mutable.Map[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, f) =>
      val p = f(spark, sf()).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$n plans a cartesian product:\n${p.take(1500)}")
      if (p.contains("Exchange SinglePartition")) offenders += n -> "sp"
    }
    val unexpected = offenders.keySet -- allowedSinglePartition.keySet
    val stale = allowedSinglePartition.keySet -- offenders.keySet
    assert(unexpected.isEmpty,
      s"new single-partition funnel(s) — audit and fix or whitelist: ${unexpected.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"stale whitelist entr(ies) — funnel fixed, prune: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("spread is gated: no round-robin shuffle when the scan already has ≥cores splits") {
    val cores = spark.sparkContext.defaultParallelism
    // a source that already saturates the cluster must pass through untouched
    val wide = spark.range(0, 10000).toDF("id").repartition(cores + 4)
    val spreadWide = Tables.spread(wide)
    assert(spreadWide eq wide, "spread must be identity when splits >= parallelism")
    assert(!spreadWide.queryExecution.executedPlan.toString.contains("roundrobin"),
      "no round-robin exchange expected on an already-parallel source")
    // a single-split source must still be spread out for compute-dense maps
    val narrow = spark.range(0, 100).toDF("id").coalesce(1)
    val spreadNarrow = Tables.spread(narrow)
    assert(spreadNarrow.rdd.getNumPartitions == cores,
      s"expected $cores partitions, got ${spreadNarrow.rdd.getNumPartitions}")
  }

  test("wide TPC-H joins broadcast every dimension and never plan a cartesian") {
    // q8 joins 7 tables: part/region/nation×2 must broadcast; only the
    // fact-side joins (lineitem-orders-customer/supplier) may shuffle
    for (q <- Seq("q7_volume_shipping", "q8_market_share", "q9_product_profit")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n${p.take(1500)}")
      assert(p.contains("BroadcastHashJoin"), s"$q lost its dim broadcasts:\n${p.take(1500)}")
    }
  }

  test("sole-returner EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val p = planOf("q21_sole_returner").toLowerCase
    assert(p.contains("leftsemi") && p.contains("leftanti"),
      s"expected decorrelated semi+anti joins:\n${p.take(1500)}")
  }

  test("partition count scales with input, not fixed at 200") {
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt <= 32)
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
  }

  test("hard-negative mining broadcasts the query batch over one corpus scan") {
    // the query batch (training examples) is tiny by definition; the
    // corpus must never shuffle for the label-mismatch pair join
    val p = planOf("sim_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"expected query-side broadcast:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      s"must not plan a cartesian:\n${p.take(1500)}")
  }

  test("SemDeDup compares pairs only within a cluster (equi-join on cid)") {
    val p = planOf("dedup_semdedup")
    // the intra-cluster pair join must be a hash join keyed on the
    // cluster id — cross-cluster pairs are never formed, which is what
    // makes discovery corpus-linear when k tracks corpus size
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected cid equi-join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      s"must not plan a cartesian pair join:\n${p.take(1500)}")
  }

  test("PQ/ADC broadcasts the codebook and the query LUT, never a cartesian") {
    val p = planOf("sim_pq_adc")
    // encoding = corpus × 16-row broadcast codebook; scoring = codes ×
    // broadcast LUT (queries × 64 rows). Neither side may shuffle the
    // corpus for these joins, and nothing may plan a raw cartesian.
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast codebook:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast LUT equi-join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      s"must not plan a cartesian:\n${p.take(1500)}")
  }

  test("bigram LM joins model tables on the gram key with partial aggregates") {
    val p = planOf("text_lm_bigram")
    // count tables build with map-side partial aggregation; the model
    // joins back on gram/prev equi-keys — no cartesian anywhere
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected two-phase count aggregates:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      s"must not plan a cartesian:\n${p.take(1500)}")
  }

  test("hashed classifier scores per row: no explode, no weight-table join") {
    val df = SparkEntry.queries("text_hashed_classifier")(spark, sf())
    val p = df.queryExecution.executedPlan.toString
    // the whole score is one higher-order-function expression — scoring
    // must plan zero joins and zero generators (the oracle explodes;
    // the product path must not)
    assert(!p.contains("Generate"), s"unexpected explode in:\n${p.take(1500)}")
    assert(!p.toLowerCase.contains("join"), s"unexpected join in:\n${p.take(1500)}")
  }

  test("bloom decontam: prefilter UDF below a shuffled (never broadcast) verify join") {
    val p = finalPlanOf("dedup_bloom_decontam")
    // the operator exists for the eval-set-too-big-to-broadcast regime:
    // the verify join must stay shuffle-hash even where AQE would pick
    // broadcast at test scale, and the train side must pass through the
    // bloom-probe Filter before reaching it
    assert(p.contains("ShuffledHashJoin"),
      s"verify join must be pinned shuffle-hash:\n${p.take(2000)}")
    assert(p.contains("UDF"),
      s"bloom-probe filter missing from the train side:\n${p.take(2000)}")
  }

  test("audio frame energies are payload-local: no hash shuffle before the sort") {
    // same contract for the scene-cut twin: per-doc array stats compose
    // from codegen'd array functions over the native expression — the
    // only exchange is the final sort's range partitioning; a
    // hashpartitioning would mean an explode+groupBy crept in (the
    // oracle's lag-window shape must NOT leak into the product plan)
    for (q <- Seq("mm_audio_energy", "mm_scene_cuts")) {
      val p = planOf(q)
      assert(!p.contains("hashpartitioning"),
        s"$q: unexpected aggregation shuffle:\n${p.take(2000)}")
      assert(p.toLowerCase.contains("audioframeenergies"),
        s"$q: native energy expression missing from plan:\n${p.take(2000)}")
    }
  }

  test("bucketed co-located join: no exchange before the sort-merge join") {
    // at test scale AQE (correctly) broadcasts the small side; the
    // co-location property matters in the regime where NEITHER side
    // broadcast-fits — simulate it by disabling both broadcast
    // thresholds, then require the bucketed SMJ with zero pre-join
    // exchanges
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("join_bucketed_colocated")(spark, sf())
      df.collect()
      // AQE prints the final plan followed by "== Initial Plan ==";
      // audit only the plan that ran
      val full = df.queryExecution.executedPlan.toString
      val p = full.split("== Initial Plan ==")(0)
      // both scans must read buckets (the shuffle was paid at layout time)
      assert(p.contains("SelectedBucketsCount"),
        s"join sides must be bucketed scans:\n${p.take(2500)}")
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n${p.take(2500)}")
      // the ONLY hash exchange allowed is the post-join aggregation's;
      // a second one means a join side was re-shuffled (bucketing ignored)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges <= 1,
        s"join side re-shuffled ($exchanges hash exchanges):\n${p.take(2500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("shard export writes exactly one file per shard dir") {
    SparkEntry.queries("pipeline_export_shards")(spark, sf()).collect()
    val scratch = new java.io.File(Scratch.dir("graft_shards", sf()))
    val dirs = scratch.listFiles.filter(_.getName.startsWith("shard="))
    assert(dirs.length == 8, s"expected 8 shard dirs, got ${dirs.length}")
    // the repartition-on-shard-column write discipline: one file per
    // shard dir, independent of input parallelism
    val counts = dirs.map(d => d.listFiles.count(_.getName.endsWith(".parquet")))
    assert(counts.forall(_ == 1), s"files per shard dir: ${counts.mkString(",")}")
  }

  test("ORC round trip pushes the predicate into the ORC scan") {
    val df = SparkEntry.queries("scan_orc_roundtrip")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("OrcScan") || p.contains("Format: orc") || p.toLowerCase.contains("orc"),
      s"expected an ORC scan:\n${p.take(2000)}")
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"ORC predicate pushdown missing:\n${p.take(2000)}")
  }

  test("chunking is a shuffle-free flatMap: explode, pruned scan, one sort exchange") {
    val p = planOf("pipeline_chunk_overlap")
    // per-row work only: the explode of the computed range, no
    // aggregation, no join
    assert(p.contains("Generate explode"), s"expected explode:\n${p.take(1500)}")
    assert(!p.contains("HashAggregate") && !p.contains("Join"),
      s"chunking must not aggregate or join:\n${p.take(1500)}")
    // no exchange ON A KEY: the only partitionings are Tables.spread's
    // deliberate round-robin (compute-spreading, data-oblivious) and the
    // final presentation sort's range partition — never a hash shuffle
    assert(!p.contains("hashpartitioning"),
      s"chunking must not hash-shuffle:\n${p.take(2000)}")
    assert(p.contains("rangepartitioning"), s"expected the sort exchange:\n${p.take(1500)}")
    // column pruning reaches the scan: doc_id + text, not the metadata
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("n_chars") && !read.contains("lang"), read)
  }

  test("classifier inference broadcasts the model; the corpus shuffles once per agg") {
    val p = planOf("text_classifier_infer")
    // the 65-row weight table enters as a broadcast, never a shuffle join
    assert(p.contains("BroadcastHashJoin"),
      s"expected the model broadcast-joined:\n${p.take(2000)}")
    // margins fold partial-then-final (map-side combine before exchange)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregate:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-to-corpus shuffle join belongs in inference:\n${p.take(2000)}")
  }

  test("chunk dedup is one hash-partitioned agg over the chunk flatMap, no join") {
    val p = planOf("pipeline_chunk_dedup")
    // the chunk table materializes as the same shuffle-free explode
    assert(p.contains("Generate explode"), s"expected explode:\n${p.take(1500)}")
    // digest-groupBy discipline: hash agg with map-side partial combine
    // on chunk_hash, never an all-pairs join
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregate:\n${p.take(2000)}")
    assert(!p.contains("Join"), s"chunk dedup must not join:\n${p.take(2000)}")
    assert(p.contains("hashpartitioning(chunk_hash"),
      s"expected ONE hash exchange on chunk_hash:\n${p.take(2000)}")
    // column pruning reaches the scan: only doc_id + text are read
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("n_chars") && !read.contains("lang"), read)
  }

  test("chunk retrieval: bounded queries broadcast; band candidates equi-join") {
    val p = planOf("pipeline_chunk_retrieval")
    // the exact ground-truth pass is a DELIBERATE nested loop — its
    // probe side is the capped (≤200-row) broadcast query set, so cost
    // is |queries| x |chunks|, corpus-linear; an un-broadcast NL join
    // here would be the quadratic mistake
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"eval path must broadcast the bounded query set:\n${p.take(2000)}")
    // the production LSH path joins on (band, sig) — a keyed join, and
    // no cartesian product anywhere in the plan
    assert(!p.contains("CartesianProduct"),
      s"no cartesian product belongs in retrieval:\n${p.take(2000)}")
    assert(p.contains("band"), s"band key must reach a join:\n${p.take(1500)}")
  }

  test("chunk ANN: centroids/queries/probes broadcast; assignment argmin partial-aggregates; no cartesian") {
    val p = planOf("pipeline_chunk_ann")
    // IVF routing: the nlist centroid set, the 5-query set and the
    // nprobe probe rows are all parameter-sized — every one of them
    // must enter its join as a BROADCAST (assignment and ground truth
    // are deliberate broadcast NL joins over the corpus; the probe join
    // is a broadcast hash join on ccid)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"assignment/ground-truth must broadcast the small side:\n${p.take(2000)}")
    assert(p.contains("BroadcastExchange"),
      s"expected broadcast exchanges for centroids/probes:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian product belongs in ANN routing:\n${p.take(2000)}")
    // the rank-1 list assignment is the map-side-combinable argmin (min
    // of struct), partial-then-final — never a corpus-wide window
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final argmin aggregate:\n${p.take(2000)}")
    // (no ReadSchema pin: the multi-consumer embedding frame is an eager
    // localCheckpoint, so the final plan's leaf is the cached scan — the
    // chunk family's scan-pruning pin lives on the overlap/dedup gates,
    // which share the identical tokenize→chunk head)
  }
}

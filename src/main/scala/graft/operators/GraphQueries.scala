package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over the order graph — PageRank-style
  * link analysis is a first-class training-data operation (web-graph
  * quality propagation à la CommonCrawl filtering) and the canonical
  * iterative-join workload. The graph is the customer↔supplier bipartite
  * graph induced by lineitem⋈orders, made undirected so every node has
  * out-degree ≥ 1 (no dangling-mass redistribution needed).
  *
  * Scale shape: edges materialize ONCE (persist) and every iteration is
  * the same join-on-src + groupBy-dst — hash-partitioned on the node id,
  * corpus-linear per iteration, no driver-side graph. The oracle unrolls
  * the identical three iterations as chained CTEs; per-node contributions
  * sum through DECIMAL(38,18) so the fold is order-independent and the
  * resulting doubles are bit-identical on both engines.
  */
object GraphQueries extends QueryPack {

  /** Exact, order-independent sum for O(1/n)-scale PageRank mass (the
    * repo-wide DECIMAL(28,6) pattern loses everything below 1e-6). */
  private def prSum(c: Column): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 18))).cast("double")
  private def oPrSum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(38,18))) AS DOUBLE)"

  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Undirected customer↔supplier edge list: c<custkey> — s<suppkey>.
    * Both directions EXPLODE from one pass over the joined+deduped pair
    * set — a union of e0 with its swap would execute the o⋈l+distinct
    * subtree once per branch (the same double-evaluation the dedup
    * label-propagation edge builder avoids).
    *
    * Cached per (session, corpus) like DedupQueries' shared pair set:
    * three gate queries (degree histogram, PageRank, BFS) consume the
    * SAME edge list, and the o⋈l+distinct build is the dominant cost of
    * each — one shuffle paid once instead of three times. The persisted
    * set is node-pair-sized (≪ lineitem); Bench warms it outside the
    * per-query timers via [[warmSharedEdges]]. */
  /** Serializes first-build per JVM: TrieMap.getOrElseUpdate may evaluate
    * its thunk MORE THAN ONCE under concurrent first calls, and a losing
    * build here would leave an orphaned persisted DataFrame nothing ever
    * unpersists. The build is rare (once per (session, corpus)) and the
    * double-checked fast path below never touches the lock. */
  private val edgeBuildLock = new Object

  /** Sessions whose application-end hook is already registered — the
    * cache must not outlive its session: without the hook, any caller
    * outside Bench/ScaleProbe (tests, embedded use) would leak one
    * MEMORY_AND_DISK-persisted DataFrame per (session, corpus) for the
    * session's lifetime. */
  private val evictHooked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Boolean]

  private def hookEvictionOnEnd(s: SparkSession): Unit =
    if (evictHooked.putIfAbsent(s, true).isEmpty)
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          evictSharedEdges(s)
          evictHooked.remove(s)
        }
      })

  /** Node count per cached edge list — loop-invariant like the degrees,
    * consumed by every PageRank call (initial mass, damping term,
    * broadcast-vs-partitioned strategy choice). Cached alongside so the
    * per-query path never pays a count job for a number the shared build
    * already knows. */
  private val nodeCountCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Long]

  private def edges(s: SparkSession, dir: String): DataFrame =
    edgeCache.getOrElse((s, dir), edgeBuildLock.synchronized {
      edgeCache.getOrElseUpdate((s, dir), {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        // distinct on the RAW key ints, node-id strings built after: the
        // dedup exchange then moves two longs per pair instead of two
        // ~8-char strings (guide §2.3 narrower types), and the int→id
        // mapping is injective so the distinct set is identical
        val e0 = o.join(l, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
          .distinct()
          .select(concat(lit("c"), col("ck").cast("string")).as("src"),
            concat(lit("s"), col("sk").cast("string")).as("dst"))
        // out-degree is annotated HERE, not per consumer: it is a pure
        // function of the edge list, PageRank needs it every call, and
        // the COUNT window's own hash-partition + sort on src leaves the
        // cached data exactly in the layout the per-iteration (and
        // per-BFS-round) join on src wants — consumers that ignore it
        // (degree histogram, BFS selects) prune the column at the cache
        // read, so they pay nothing for it.
        val e = e0.select(explode(array(
            struct(col("src"), col("dst")),
            struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .withColumn("outdeg", count(lit(1)).over(Window.partitionBy(col("src"))))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // ONE materializing job: the node-count distinct scans every
        // cache partition, so it populates the persisted edge list as a
        // side effect — a separate e.count() first would pay a second
        // full pass for a number this query already produces
        nodeCountCache.putIfAbsent((s, dir),
          e.select(col("src")).distinct().count()): Unit
        hookEvictionOnEnd(s)
        e
      })
    })

  /** Distinct node count of the cached edge list (one small job over the
    * cache at build time, a map lookup afterwards). getOrElse fallback:
    * evictSharedEdges (bench teardown / app-end hook) can clear the
    * count map between the build call and this read; recompute from the
    * edge frame rather than throw on the race. */
  private def nodeCount(s: SparkSession, dir: String): Long = {
    val e = edges(s, dir) // ensure the build (and the cached count) ran
    nodeCountCache.getOrElse((s, dir),
      e.select(col("src")).distinct().count())
  }

  /** Bench hook: pay the edge build once, outside the per-query timers
    * (the `shared:dedup_pairs` discipline, Bench.scala). */
  def warmSharedEdges(s: SparkSession, dir: String): Long =
    edges(s, dir).count()

  /** Drop every cached edge list belonging to `s` (bench/suite teardown —
    * a long-lived JVM must not accumulate one persisted DataFrame per
    * (session, corpus) forever). */
  def evictSharedEdges(s: SparkSession): Unit = {
    edgeCache.filterInPlace { case ((sess, _), df) =>
      // unpersist can throw on a STOPPING context (the application-end
      // hook fires mid-teardown); the map entry must go regardless, or
      // the cache retains the stopped session for the JVM's life — the
      // exact leak this eviction exists to prevent
      if (sess eq s) { scala.util.Try(df.unpersist()); false } else true
    }
    nodeCountCache.filterInPlace { case ((sess, _), _) => !(sess eq s) }
  }

  private val oEdges =
    """e0 AS (
      |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
      |                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
      |nn AS (SELECT COUNT(*) AS n FROM deg)""".stripMargin

  /** One oracle PageRank step: p<k> -> p<k+1>. Deliberately PLAIN (as is
    * every CTE in the pagerank/BFS/histogram oracles): each step is
    * referenced once, so there is no inlining blowup, and with no
    * materialized CTE in the query DuckDB's plain-over-materialized
    * ordering hazard cannot arise. An earlier cut materialized `deg`
    * here by an over-broad replace and the degree histogram's top-level
    * ORDER BY over it went NONDETERMINISTIC under the checker's
    * preserve_insertion_order=false (caught by a 15x stability rerun —
    * aggregation atop a materialized CTE loses the final ordering, while
    * the r15 infer shape, a bare ordered READ of one, keeps it). */
  private def oStep(prev: String, next: String): String =
    s"""$next AS (
       |  SELECT e.dst AS id,
       |         0.15 / (SELECT n FROM nn) +
       |         0.85 * ${oPrSum(s"p.pr / d.outdeg")} AS pr
       |  FROM edges e
       |  JOIN $prev p ON p.id = e.src
       |  JOIN deg d ON d.src = e.src
       |  GROUP BY e.dst)""".stripMargin

  val qs: Seq[Q] = Seq(
    // Degree distribution — the graph-shape profile (how skewed is the
    // join key?) that decides salting/broadcast strategy downstream.
    // One groupBy for degrees, one for the histogram.
    Q(
      "graph_degree_histogram",
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
        |                  's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src)
        |SELECT degree, COUNT(*) AS nodes
        |FROM deg GROUP BY degree
        |ORDER BY degree""".stripMargin
    ) { (s, dir) =>
      edges(s, dir)
        .groupBy(col("src")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("nodes"))
        .orderBy(col("degree"))
    },

    // PageRank, 3 iterations, damping 0.85 — top 50 nodes by rank. The
    // final projection quantizes pr to 12 decimal digits purely for the
    // cross-engine hash (the iteration arithmetic itself is exact-summed
    // doubles, identical on both engines).
    Q(
      "graph_pagerank",
      s"""WITH $oEdges,
         |p0 AS (SELECT src AS id, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
         |${oStep("p0", "p1")},
         |${oStep("p1", "p2")},
         |${oStep("p2", "p3")}
         |SELECT id, CAST(CAST(pr AS DECIMAL(20,12)) AS DOUBLE) AS pr
         |FROM p3
         |ORDER BY pr DESC, id
         |LIMIT 50""".stripMargin
    ) { (s, dir) => pagerank(s, dir, iters = 3) },

    // Triangle counting + global clustering coefficient over the item
    // co-purchase graph (items linked when bought together in ≥2
    // orders) — the canonical "joins explode quadratically unless you
    // orient" graph workload. The 100 TB technique is DEGREE-ORDERED
    // ORIENTATION (Suri & Vassilvitskii's MR triangle counting): direct
    // every undirected edge from its (degree, id)-smaller endpoint to
    // the larger, and enumerate each triangle exactly once from its
    // lowest-degree corner — each join's fan-out is then bounded by
    // out-degree ≤ O(√m) instead of the raw degree, so a celebrity node
    // with degree d contributes O(m) candidate wedges, not O(d²). All
    // counts are exact integers; the clustering ratio is one double
    // division of exact ints (identical on both engines), denominator
    // floored at 1 for the degenerate no-wedge fixture.
    Q(
      "graph_triangle_count",
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS MATERIALIZED (
        |  SELECT x, COUNT(*) AS d
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY x),
        |o AS MATERIALIZED (
        |  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
        |         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t
        |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
        |tri AS MATERIALIZED (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS nt
        |  FROM o e1 JOIN o e2 ON e2.s = e1.t
        |            JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |       (SELECT nt FROM tri) AS n_triangles,
        |       (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS wedges,
        |       round(3.0 * (SELECT nt FROM tri)
        |             / GREATEST((SELECT SUM(d * (d - 1) // 2) FROM deg), 1), 6)
        |         AS clustering""".stripMargin
    ) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      // undirected edge list u<v, support ≥2; feeds degree AND
      // orientation — persist so the order self-join runs once
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .agg(count(lit(1)).as("supp")).filter(col("supp") >= 2)
        .select(col("u"), col("v")).persist()
      val deg = e.select(explode(array(col("u"), col("v"))).as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
      val lower = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val o = e
        .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
        .select(when(lower, col("u")).otherwise(col("v")).as("s"),
          when(lower, col("v")).otherwise(col("u")).as("t"))
        .persist()
      // materialize the oriented edges NOW (filling e's cache on the
      // way): deferred to the final action, the one big plan reads both
      // persisted scaffolds from several concurrent subtrees before
      // either cache is populated, and racing partition reads recompute
      // the expensive li⋈li build redundantly (the edges()/pagerank
      // materialize-now discipline)
      o.count(): Unit
      val nT = o.as("e1")
        .join(o.as("e2"), col("e2.s") === col("e1.t"))
        .join(o.as("e3"),
          col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t"))
        .agg(count(lit(1)).cast("long").as("n_triangles"))
      val nE = e.agg(count(lit(1)).cast("long").as("n_edges"))
      val wedges = deg.agg(sum(expr("d * (d - 1) DIV 2")).cast("long").as("wedges"))
      val result = nE.crossJoin(nT).crossJoin(wedges)
        .select(col("n_edges"), col("n_triangles"), col("wedges"),
          round(lit(3.0) * col("n_triangles")
            / greatest(col("wedges"), lit(1L)), 6).as("clustering"))
        .localCheckpoint(true)
      e.unpersist()
      o.unpersist()
      result
    },

    // Multi-source hop-bounded BFS ("degrees of separation" from a seed
    // set — the web-graph trust/spam-distance propagation used in
    // crawl-quality filtering, TrustRank's first half). Seeds are the
    // NATION_7 customers; 4 relaxation rounds label every node with its
    // hop distance to the nearest seed. The oracle unrolls the identical
    // rounds as min-fold CTEs (d_{k+1} = MIN over d_k ∪ relax(d_k)) —
    // for UNWEIGHTED edges the engine's frontier recursion computes the
    // same function: a node's first reach is its hop distance, and
    // min-fold never lowers it afterwards. All-integer arithmetic, so
    // the cross-engine hash is exact.
    Q(
      "graph_shortest_path",
      s"""WITH $oEdges,
         |s0 AS (
         |  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS id, 0 AS dist
         |  FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_7'),
         |${oBfsStep("s0", "d1")},
         |${oBfsStep("d1", "d2")},
         |${oBfsStep("d2", "d3")},
         |${oBfsStep("d3", "d4")}
         |SELECT id, CAST(dist AS INT) AS dist FROM d4
         |ORDER BY dist, id""".stripMargin
    ) { (s, dir) => shortestPath(s, dir, rounds = 4) }
  )

  /** One oracle BFS round: settled ∪ one-hop relax, min per node. */
  private def oBfsStep(prev: String, next: String): String =
    s"""$next AS (
       |  SELECT id, MIN(dist) AS dist FROM (
       |    SELECT id, dist FROM $prev
       |    UNION ALL
       |    SELECT e.dst AS id, p.dist + 1 AS dist
       |    FROM edges e JOIN $prev p ON p.id = e.src)
       |  GROUP BY id)""".stripMargin

  /** Frontier BFS with the iteration count exposed (gate runs 4 to match
    * the oracle's unrolled CTEs). Scale shape: each round joins ONLY the
    * newly-settled frontier against the edge list (hash join on src) and
    * anti-joins the settled set to drop revisits — per-round work is
    * frontier × degree, NOT settled × degree, which is what makes
    * 20-round diameters affordable on a web graph. The settled set grows
    * monotonically; each round's result is persisted and the previous
    * round's unpersisted so lineage stays one round deep (the pagerank
    * checkpoint discipline, but per-round because BFS frontiers feed two
    * consumers each round). */
  /** Eager per-round lineage cut for the BFS frontier. RELIABLE
    * checkpoint when the context has a checkpoint dir configured (the
    * cluster deployment: local-checkpoint blocks are NOT fault-tolerant —
    * losing any executor holding one fails the whole query, where a
    * reliable checkpoint re-reads from storage); localCheckpoint
    * otherwise (local[n] runs — no storage round trip). Block cleanup is
    * the ContextCleaner's: frontiers are node-sized, and the checkpoint
    * RDDs free when the per-round references drop out of scope. */
  private def cutLineage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  def shortestPath(s: SparkSession, dir: String, rounds: Int): DataFrame = {
    val e = edges(s, dir) // shared cache — already persisted + materialized
    val nat = Tables.load(s, dir, "nation")
      .filter(col("n_name") === "NATION_7").select(col("n_nationkey"))
    val seeds = Tables.load(s, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(concat(lit("c"), col("c_custkey").cast("string")).as("id"),
        lit(0).as("dist"))
    var settled = seeds.persist()
    var frontier = seeds
    var toFree = List.empty[DataFrame]
    for (_ <- 1 to rounds) {
      val reached = frontier.as("f")
        .join(e.as("e"), col("f.id") === col("e.src"))
        .select(col("e.dst").as("id"), (col("f.dist") + 1).as("dist"))
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
      // checkpoint, not persist: fresh_r's LOGICAL plan contains
      // fresh_{r-1}'s twice (via the relax join and via settled's union),
      // so without a hard lineage cut the plan tree — and Catalyst's
      // re-analysis time per round — grows EXPONENTIALLY in the round
      // count (the round-16 frontier probe measured empty-frontier
      // rounds doubling 1.1→2.5→5.9 s by round 6). The eager checkpoint
      // replaces the plan with a node-sized LogicalRDD: per-round
      // planning stays constant, which is what 20-50-round web-graph
      // diameters need. Persist alone caches DATA but keeps the plan.
      val fresh = cutLineage(reached.join(settled, Seq("id"), "left_anti"))
      val next = settled.unionAll(fresh).persist()
      toFree = settled :: toFree
      settled = next
      frontier = fresh
    }
    val result = settled
      .select(col("id"), col("dist").cast("int").as("dist"))
      .orderBy(col("dist"), col("id"))
      .localCheckpoint(true)
    toFree.foreach(_.unpersist())
    settled.unpersist()
    result
  }

  /** Probe-only instrumented twin of [[shortestPath]]: the SAME frontier
    * loop, but each round's fresh frontier is counted as it materializes,
    * returning (round, frontierSize, roundSeconds) — the evidence series
    * that per-round cost tracks frontier × degree rather than settled ×
    * degree. The sf10-class replica fixtures never widened the seed
    * component (replica blocks are disjoint subgraphs), so BFS probes
    * there exercised edge-probe volume only; [[graft.FrontierProbe]]
    * builds a BRIDGED fixture (shared suppliers across replica blocks)
    * where the frontier truly grows with the replication factor, and
    * this series is what it records. Kept separate from the gate path:
    * the gate defers all materialization to the final sort, and a
    * mid-loop count() there would change what the bench measures. */
  def frontierSeries(s: SparkSession, dir: String, rounds: Int): Seq[(Int, Long, Double)] = {
    val e = edges(s, dir)
    val nat = Tables.load(s, dir, "nation")
      .filter(col("n_name") === "NATION_7").select(col("n_nationkey"))
    val seeds = Tables.load(s, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(concat(lit("c"), col("c_custkey").cast("string")).as("id"),
        lit(0).as("dist"))
    var settled = seeds.persist()
    var frontier = settled
    val t0 = System.nanoTime()
    val series = Seq.newBuilder[(Int, Long, Double)]
    series += ((0, settled.count(), (System.nanoTime() - t0) / 1e9))
    var toFree = List.empty[DataFrame]
    for (r <- 1 to rounds) {
      val tr = System.nanoTime()
      val reached = frontier.as("f")
        .join(e.as("e"), col("f.id") === col("e.src"))
        .select(col("e.dst").as("id"), (col("f.dist") + 1).as("dist"))
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
      // same per-round lineage cut as the gate loop (see shortestPath)
      val fresh = cutLineage(reached.join(settled, Seq("id"), "left_anti"))
      val n = fresh.count()
      val next = settled.unionAll(fresh).persist()
      toFree = settled :: toFree
      settled = next
      frontier = fresh
      series += ((r, n, (System.nanoTime() - tr) / 1e9))
    }
    toFree.foreach(_.unpersist())
    settled.unpersist()
    series.result()
  }

  /** PageRank body with the iteration count exposed: the gate query runs
    * 3 (matching the oracle's unrolled CTEs); ScaleProbe drives 10 to
    * verify the per-iteration cost stays flat once the edge build is
    * amortized — the web-graph use case runs 20-50 iterations, so the
    * engine's scale story rests on the per-iteration constant, not the
    * 3-iteration total. */
  def pagerank(s: SparkSession, dir: String, iters: Int,
      // every 8 rounds by default: deep enough that the gate query's
      // 3-iteration oracle-matched plan is untouched, shallow enough
      // that planning cost stays bounded at web-graph iteration counts;
      // the spec overrides it to pin cut-vs-no-cut bit-equality
      checkpointEvery: Int = 8,
      // exact=true (gate): per-node mass sums through DECIMAL(38,18) so
      // the fold is order-independent and bit-matches the oracle replay.
      // exact=false (production): plain double sums — PageRank is a
      // fixed-point iteration, contraction damps per-iteration float
      // noise, and no oracle replays the fold, so a real web-graph run
      // has no reason to pay 38-digit decimal arithmetic on every edge.
      // ScaleToolsSpec pins the two paths' agreement (top-50 order
      // identical, |Δpr| < 1e-9); ScaleProbe measures the saving.
      exact: Boolean = true): DataFrame = {
      // The shared edge cache already carries the loop-invariant
      // out-degree (annotated in the ONE window pass of the edge build,
      // which also leaves the cache hash-partitioned + sorted on src —
      // exactly the layout every iteration's join wants), so each
      // iteration is a single join on the node id (edges ⋈ ranks), no
      // per-call window, no per-call persist.
      val eDeg = edges(s, dir)
      // n is loop-invariant and known from the shared build: folding it
      // in as a LITERAL (1/n, 0.15/n — the same IEEE double ops on the
      // same values the old scalar-subquery crossJoin produced) deletes
      // the count job AND the four broadcast-aggregate subtrees the
      // n-as-DataFrame formulation embedded in the iteration plan
      // (measured r17: 114 Exchange / 33 cache-scan nodes for 3
      // iterations, most of them the nDf funnel replicated per step).
      val n = nodeCount(s, dir)
      // ADAPTIVE rank-side strategy (same shape as dedup_components'
      // driver/distributed split): while nodes fit a broadcast (~1M ids)
      // each iteration is a broadcast join — the cached edge list never
      // re-exchanges and the rank shuffle disappears. Past the threshold
      // the same loop runs as partitioned sort-merge joins — the
      // web-graph scale path. The iteration arithmetic is identical
      // either way, so the oracle match is strategy-independent.
      val broadcastRanks = n <= 1000000L
      var pr = eDeg.select(col("src").as("id")).distinct()
        .select(col("id"), lit(1.0 / n).as("pr"))
      for (i <- 1 to iters) {
        val prSide = if (broadcastRanks) broadcast(pr) else pr
        val contrib = eDeg.join(prSide, eDeg("src") === prSide("id"))
          .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        val mass = if (exact) prSum(col("c")) else sum(col("c"))
        pr = contrib.groupBy(col("dst")).agg(mass.as("mass"))
          .select(col("dst").as("id"),
            (lit(0.15 / n) + lit(0.85) * col("mass")).as("pr"))
        // lineage cut: an unrolled iterative plan grows linearly in loop
        // depth and Catalyst's analysis/optimization cost grows faster
        // than that — at the 20-50 iterations web graphs run, planning
        // (driver-side, serial) would dominate. Materializing the rank
        // vector every few rounds resets the plan to a scan of a cached
        // node-sized table; the arithmetic is untouched, so results stay
        // bit-identical (GraphSpec pins this). Not on the last round —
        // the caller's own sink is the materialization there. Superseded
        // checkpoint RDDs drop out of scope and are reclaimed by Spark's
        // ContextCleaner; only the live rank vector stays resident.
        if (i % checkpointEvery == 0 && i < iters)
          pr = pr.localCheckpoint(true)
      }
      pr.select(col("id"),
          col("pr").cast("decimal(20,12)").cast("double").as("pr"))
        .orderBy(col("pr").desc, col("id"))
        .limit(50)
  }
}

package graft

import java.nio.file.Files

import graft.sqlfront.{ConsistencySweeper, GraftSession, RateLimiter}

/** RateLimiter-under-concurrency probe (dev tooling, like ScaleProbe):
  * measures FOREGROUND statement latency while a continuous background
  * consistency sweep runs against sf1-class tables — the reference's
  * rate-limited background-job contract (kv/jobs/RateLimiter.java
  * consumed by ConstraintViolationCheckerJob) quantified at volume
  * instead of asserted at test size.
  *
  * Setup: a fresh GraftSession warehouse loads the sf1-class fixture's
  * fact tables (orders, lineitem — millions of rows) plus constrained
  * dimensions through the engine's own COPY path, so each per-table
  * audit is a REAL distributed aggregate over real volume. Then three
  * configurations, each timing the same foreground TPC-H-style
  * statement mix through the statement gate (the wire clients' path):
  *
  *   - `none`:      no sweep running (baseline)
  *   - `unlimited`: continuous sweep, no rate limiter
  *   - `limited`:   continuous sweep, token bucket at 1 table/s
  *
  * Reported per configuration: foreground p50/p95/max (ms) over N
  * statements, plus sweep runs completed. The claim under test: with
  * pacing ON, foreground p95 stays within a small factor of baseline
  * (the per-table gate scope + bucket pacing bound the wait to at most
  * one table's audit), while the sweep still makes progress.
  *
  *   sbt "runMain graft.SweepProbe /tmp/graft_sf1_full 40"
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/graft_sf1_full")
    val n = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = Engine.session("graft-sweep-probe")
    val gs = new GraftSession(spark, Files.createTempDirectory("graft_sweep_probe"))

    // Spark reads part-file directories natively — no glob needed
    def path(t: String): String = s"$sfDir/$t.parquet"
    // constrained schema so audits do real work: PKs → unique sweeps,
    // FKs → anti-joins against distinct parent keys, NOT NULLs → scans
    gs.sql("""CREATE TABLE nation (
      n_nationkey INT PRIMARY KEY, n_name TEXT NOT NULL,
      n_regionkey INT NOT NULL)""")
    gs.sql("""CREATE TABLE customer (
      c_custkey BIGINT PRIMARY KEY, c_name TEXT NOT NULL,
      c_nationkey INT NOT NULL REFERENCES nation(n_nationkey),
      c_acctbal DOUBLE, c_mktsegment TEXT)""")
    gs.sql("""CREATE TABLE orders (
      o_orderkey BIGINT PRIMARY KEY, o_custkey BIGINT NOT NULL,
      o_orderstatus TEXT, o_totalprice DOUBLE, o_orderdate TIMESTAMP,
      o_orderpriority TEXT)""")
    gs.sql("""CREATE TABLE lineitem (
      l_orderkey BIGINT NOT NULL, l_partkey BIGINT NOT NULL,
      l_suppkey BIGINT NOT NULL, l_linenumber INT NOT NULL,
      l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE,
      l_tax DOUBLE, l_returnflag TEXT, l_linestatus TEXT,
      l_shipdate TIMESTAMP)""")
    // (no lineitem PK: the TPC-H-ish fixture carries duplicate
    // (l_orderkey, l_linenumber) pairs — the audit's heavyweight unique
    // sweeps come from orders/customer; lineitem contributes NOT NULLs)
    Seq("nation", "customer", "orders", "lineitem").foreach { t =>
      val t0 = System.nanoTime()
      gs.sql(s"COPY $t FROM '${path(t)}' (FORMAT PARQUET)")
      println(f"[sweep-probe] loaded $t in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // foreground mix: one wide aggregate, one selective filter, one join
    // (gate READ side — concurrent with audits), plus one WRITER (gate
    // EXCLUSIVE side — the statement the per-table audit scope exists
    // for: it must wait at most ONE table's audit, never a whole sweep)
    var ins = 0
    val stmts = Seq(
      "SELECT l_returnflag, l_linestatus, CAST(SUM(l_quantity) AS BIGINT) AS q " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY 1, 2",
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders WHERE o_totalprice > 500000",
      "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer c " +
        "JOIN orders o ON c.c_custkey = o.o_custkey " +
        "GROUP BY c_mktsegment ORDER BY 1")
    def nextStmt(i: Int): String =
      if (i % 4 == 3) { // every 4th statement is the writer
        ins += 1
        s"INSERT INTO nation VALUES (${1000 + ins}, 'probe_$ins', 0)"
      } else stmts(i % 4 % stmts.length)

    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, math.ceil(p * s.size).toInt - 1).max(0))
    }
    def runForeground(label: String, lim: Option[RateLimiter],
        sweep: Boolean): Unit = {
      val handle =
        if (sweep) Some(ConsistencySweeper.continuous(gs, intervalMs = 1, limiter = lim))
        else None
      try {
        if (sweep) Thread.sleep(2000) // sweep mid-flight before sampling
        val lats = (0 until n).map { i =>
          val stmt = nextStmt(i)
          val t0 = System.nanoTime()
          gs.withStatementLock(stmt)(gs.sql(stmt).collect())
          (System.nanoTime() - t0) / 1e6
        }
        val runs = handle.map(_.runs).getOrElse(0L)
        println(f"""[sweep-probe] {"config":"$label","n":$n,""" +
          f""""p50_ms":${pct(lats, 0.50)}%.1f,"p95_ms":${pct(lats, 0.95)}%.1f,""" +
          f""""max_ms":${lats.max}%.1f,"sweep_runs":$runs}""")
      } finally handle.foreach(_.stop())
    }

    runForeground("none_cold", None, sweep = false)
    runForeground("unlimited", None, sweep = true)
    runForeground("limited_1tps", Some(new RateLimiter(ratePerSec = 1.0, burst = 1.0)),
      sweep = true)
    // warm baseline LAST so JVM warm-up bias works AGAINST the claim,
    // not for it (the cold first pass overstates the no-sweep cost)
    runForeground("none_warm", None, sweep = false)
    spark.stop()
  }
}

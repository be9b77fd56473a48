package graft.sqlfront

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.catalog.TableDef

/** Post-hoc constraint audit — the reference's background consistency
  * jobs (kv/jobs/ConstraintViolationCheckerJob.java: UNIQUE + FK sweeps;
  * kv/jobs/BackgroundJobScheduler.java: fixed-interval scheduling),
  * re-expressed as distributed aggregates. Write-time checks make
  * violations unrepresentable through the engine's own DML path; the
  * sweep exists for everything that path does NOT cover — part-files
  * imported or restored by hand, constraint enforcement bugs, snapshots
  * written before a constraint was added (the reference job's own
  * rationale list).
  *
  * Scale shape per table: every row-local check (NOT NULL, enum domain)
  * and every unique-key check folds into ONE conditional aggregate over
  * ONE scan (the pipeline_expectations k-checks-one-scan shape —
  * duplicates are `count(keyed rows) − count(DISTINCT key)`, PG NULL
  * semantics: a key containing NULL is always distinct); each FK adds
  * one anti-join against the DISTINCT parent keys. Nothing row-sized
  * ever reaches the driver — the report is check-count-sized.
  */
object ConsistencySweeper {

  /** Thrown when `stopped` flips (or a limiter wait is abandoned)
    * MID-SWEEP: a truncated report where every audited row passes is
    * indistinguishable from a complete clean pass, so audit() refuses to
    * return one — callers that stop a sweep get a loud signal, never a
    * partial report masquerading as a full one. */
  final class SweepAborted extends RuntimeException(
    "consistency sweep stopped mid-pass — partial report suppressed")

  /** One audit pass over every table of the session's CURRENT database.
    * Returns (tbl, chk, rows, violations, pass), one row per declared
    * constraint. Throws [[SweepAborted]] if `stopped` fires before the
    * last table — the report is COMPLETE or absent, never partial.
    *
    * Pacing + isolation per TABLE, not per sweep: each table's audit
    * first acquires a token from the optional [[RateLimiter]] (with no
    * locks held — a throttled sweep parks harmlessly), then runs under
    * the statement gate's SHARED side (its aggregates read the catalog
    * and the visible snapshot like any client SELECT), releasing between
    * tables. A foreground writer therefore waits at most one table's
    * audit, never a whole catalog sweep — the reference rate-limited
    * checker's foreground-latency contract (kv/jobs/RateLimiter.java
    * consumed by ConstraintViolationCheckerJob's scan loop). */
  def audit(gs: GraftSession, limiter: Option[RateLimiter] = None,
      stopped: () => Boolean = () => false): DataFrame = {
    import gs.spark.implicits._
    val report = gs.catalog.tables.values.toSeq.flatMap { t =>
      val admitted = limiter.forall(_.acquire(1.0, stopped))
      if (!admitted || stopped()) throw new SweepAborted
      gs.withReadLock(auditTable(gs, t))
    }
    report.toDF("tbl", "chk", "rows", "violations")
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("tbl"), col("chk"))
  }

  private def uniqueKeySets(t: TableDef): Seq[Seq[String]] =
    (t.columns.filter(_.unique).map(c => Seq(c.name)) ++ t.uniqueKeys ++
      (if (t.primaryKey.nonEmpty) Seq(t.primaryKey) else Nil)).distinct

  private def auditTable(gs: GraftSession, t: TableDef): Seq[(String, String, Long, Long)] = {
    val df = gs.visibleDf(t)
    // row-local + unique checks: ONE aggregate, ONE scan
    val checks: Seq[(String, Column)] =
      t.visibleColumns.filter(_.notNull).map(c =>
        s"not_null:${c.name}" ->
          sum(when(col(c.name).isNull, 1L).otherwise(0L))) ++
      t.visibleColumns.flatMap(c => c.enumType.flatMap(en =>
        gs.catalog.enums.get(en.toLowerCase)).map(e =>
        s"enum:${c.name}" ->
          sum(when(col(c.name).isNotNull &&
            !col(c.name).isin(e.values: _*), 1L).otherwise(0L)))) ++
      uniqueKeySets(t).map { ks =>
        val keyed = ks.map(col(_).isNotNull).reduce(_ && _)
        s"unique:${ks.mkString("+")}" ->
          (sum(when(keyed, 1L).otherwise(0L)) -
            count_distinct(when(keyed, struct(ks.map(col): _*))))
      }
    val head = df.agg(count(lit(1)).as("__rows"),
      checks.map { case (n, c) => coalesce(c, lit(0L)).as(n) }: _*).head()
    val nRows = head.getLong(0)
    val local = checks.zipWithIndex.map { case ((n, _), i) => (n, head.getLong(i + 1)) }
    // FK orphans: one anti-join per declared FK, parent keys DISTINCT so
    // a duplicated parent can never mask or multiply
    val fk = t.visibleColumns.flatMap(c => c.references.flatMap { case (pt, pc) =>
      gs.catalog.getTable(pt).map { parent =>
        val parentKeys = gs.visibleDf(parent)
          .select(col(pc).as("__parent_key")).distinct()
        val orphans = df.filter(col(c.name).isNotNull)
          .join(parentKeys, col(c.name) === col("__parent_key"), "left_anti")
          .count()
        (s"fk:${c.name}->$pt.$pc", orphans)
      }
    })
    (local ++ fk).map { case (chk, v) => (t.name, chk, nRows, v) }
  }

  /** A running background sweep — stop() to halt; lastReport/runs for
    * observability (the reference scheduler's job-status surface). */
  final class Handle private[ConsistencySweeper] (
      thread: Thread, stopFlag: java.util.concurrent.atomic.AtomicBoolean,
      report: java.util.concurrent.atomic.AtomicReference[Seq[Row]],
      runCount: java.util.concurrent.atomic.AtomicLong) {
    def stop(): Unit = { stopFlag.set(true); thread.interrupt(); thread.join(30000) }
    def lastReport: Option[Seq[Row]] = Option(report.get())
    def runs: Long = runCount.get()
  }

  /** Fixed-interval background audits on a daemon thread (the
    * MatviewMaintenance.continuous analogue for constraint hygiene).
    * `onViolation` fires once per failing report row per sweep. A sweep
    * that throws (e.g. mid-DDL races on a live session) is recorded as a
    * skipped run, never kills the scheduler — the reference job's
    * swallow-and-rerun contract. */
  def continuous(gs: GraftSession, intervalMs: Long,
      onViolation: Row => Unit = _ => (),
      limiter: Option[RateLimiter] = None): Handle = {
    val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    val report = new java.util.concurrent.atomic.AtomicReference[Seq[Row]](null)
    val runs = new java.util.concurrent.atomic.AtomicLong(0)
    val thread = new Thread(() => {
      while (!stopFlag.get()) {
        try {
          val rows = // check-count-sized
            audit(gs, limiter, () => stopFlag.get()).collect().toSeq
          if (!stopFlag.get()) { // a stop() mid-sweep leaves a PARTIAL
            report.set(rows)     // report — never publish it as complete
            runs.incrementAndGet()
            rows.filterNot(_.getBoolean(4)).foreach(onViolation)
          }
        } catch {
          case _: SweepAborted => // stop() landed mid-sweep: nothing published
          case _: InterruptedException => // stop() path
          case _: Throwable => () // skipped run; next interval retries
        }
        // sliced sleep re-checking the flag: stop()'s interrupt can land
        // during audit() and be consumed there (by the catch above or by
        // Spark internals clearing interrupt status) — a monolithic
        // Thread.sleep(intervalMs) would then run out the FULL interval
        // and stop()'s bounded join would time out for long intervals
        var slept = 0L
        while (!stopFlag.get() && slept < intervalMs) {
          val step = math.min(200L, intervalMs - slept)
          try Thread.sleep(step)
          catch { case _: InterruptedException => () }
          slept += step
        }
      }
    }, "graft-consistency-sweeper")
    thread.setDaemon(true)
    thread.start()
    new Handle(thread, stopFlag, report, runs)
  }
}

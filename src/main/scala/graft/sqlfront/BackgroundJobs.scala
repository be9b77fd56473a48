package graft.sqlfront

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Fixed-interval maintenance scheduler — the reference's remaining
  * background jobs (kv/jobs/BackgroundJobScheduler.java driving
  * kv/jobs/StatisticsCollectorJob.java and kv/jobs/VacuumJob.java),
  * re-expressed over the session's own statements: a scheduled job here
  * IS `ANALYZE` / `VACUUM` run through the normal statement path, under
  * the SAME statement gate wire/HTTP clients take ([[GraftSession
  * .withStatementLock]] — both classify as writers, so a background
  * VACUUM serializes against a client's open BEGIN/UPDATE instead of
  * racing its snapshot pointers), honors transaction exclusion, and
  * produces exactly the artifacts the planner and the retention
  * machinery already consume (stats→broadcast-hint feedback, `_minver`
  * pruning markers). The other reference jobs map elsewhere:
  * ConstraintViolationCheckerJob → [[ConsistencySweeper]],
  * MaterializedViewRefreshJob → MatviewMaintenance.continuous,
  * IndexConsistencyJob → n/a by design (no secondary index structures to
  * drift), job-scheduler RateLimiter → [[RateLimiter]] (pacing below),
  * connection-admission limiting → [[ConnectionLimiter]].
  *
  * Pacing: an optional [[RateLimiter]] is consulted BEFORE each run,
  * outside the statement gate (the reference scheduler acquires its
  * rate-limiter tokens before dispatching a job, not while holding store
  * locks) — a throttled scheduler waits with no locks held, so
  * foreground statements are never queued behind the throttle itself.
  *
  * Same lifecycle discipline as the sweeper: daemon thread, flag-checked
  * sliced sleeps (stop() returns promptly even if its interrupt is
  * consumed inside a Spark job), a failed run is recorded and retried
  * next interval — never a dead scheduler.
  */
object BackgroundJobs {

  final class Handle private[BackgroundJobs] (
      thread: Thread, stopFlag: AtomicBoolean,
      okRuns: AtomicLong, failedRuns: AtomicLong) {
    def stop(): Unit = { stopFlag.set(true); thread.interrupt(); thread.join(30000) }
    def runs: Long = okRuns.get()
    def failures: Long = failedRuns.get()
  }

  private def schedule(name: String, intervalMs: Long,
      limiter: Option[RateLimiter])(job: () => Unit): Handle = {
    val stopFlag = new AtomicBoolean(false)
    val ok = new AtomicLong(0)
    val bad = new AtomicLong(0)
    val thread = new Thread(() => {
      while (!stopFlag.get()) {
        // token first, gate second: the wait happens with no locks held
        val admitted = limiter.forall(_.acquire(1.0, () => stopFlag.get()))
        if (admitted && !stopFlag.get()) {
          try { job(); ok.incrementAndGet() }
          catch {
            case _: InterruptedException => // stop() path
            case _: Throwable => bad.incrementAndGet() // retried next interval
          }
        }
        var slept = 0L
        while (!stopFlag.get() && slept < intervalMs) {
          val step = math.min(200L, intervalMs - slept)
          try Thread.sleep(step)
          catch { case _: InterruptedException => () }
          slept += step
        }
      }
    }, name)
    thread.setDaemon(true)
    thread.start()
    new Handle(thread, stopFlag, ok, bad)
  }

  /** Scheduled ANALYZE of every table in the session's current database
    * (reference StatisticsCollectorJob: periodic row counts, per-column
    * cardinality and null counts feeding the cost model). Runs under the
    * statement gate's write side like any client ANALYZE, so its
    * statsCache/saveStats writes never interleave a client statement. A
    * run inside an open transaction block is skipped (counts as a
    * failure, retried). */
  def scheduleAnalyze(gs: GraftSession, intervalMs: Long,
      limiter: Option[RateLimiter] = None): Handle =
    schedule("graft-bg-analyze", intervalMs, limiter)(() => {
      gs.withStatementLock("ANALYZE")(gs.sql("ANALYZE")); ()
    })

  /** Scheduled VACUUM (reference VacuumJob: periodic reclamation of
    * superseded versions — here the COW snapshot dirs past the retention
    * floor, with the same `_minver` crash-safe marker the statement
    * writes). Gated exclusively: a background VACUUM can never observe
    * "no transaction open", then prune a snapshot a wire client's BEGIN
    * started depending on a millisecond later — the gate serializes it
    * behind the whole client statement, like every other writer. */
  def scheduleVacuum(gs: GraftSession, intervalMs: Long,
      limiter: Option[RateLimiter] = None): Handle =
    schedule("graft-bg-vacuum", intervalMs, limiter)(() => {
      gs.withStatementLock("VACUUM")(gs.sql("VACUUM")); ()
    })
}

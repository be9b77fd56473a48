package graft.sqlfront

/** Token-bucket pacing for background maintenance work — the reference's
  * job throttle (kv/jobs/RateLimiter.java:13-45: a refilling token bucket
  * consumed by the background job scheduler so maintenance scans cannot
  * monopolize the store against foreground reads). Same contract here:
  * work units acquire tokens; the bucket refills at `ratePerSec` up to a
  * `burst` ceiling, so a sweep that wakes after idle time may catch up a
  * little but can never run unboundedly hot.
  *
  * Used by [[ConsistencySweeper]] (one token per table audited) and
  * [[BackgroundJobs]] (one token per scheduled run). Pacing happens
  * BETWEEN work units, never while a statement-gate lock is held, so a
  * throttled sweep yields the engine to foreground statements at every
  * table boundary instead of burning through the whole catalog at once.
  *
  * Blocking waits are sliced against a caller-supplied stop flag (the
  * scheduler-thread discipline shared with the sweeper's sliced sleeps):
  * `stop()` on the owning job returns promptly even mid-throttle.
  */
final class RateLimiter(ratePerSec: Double, burst: Double) {
  require(ratePerSec > 0, "ratePerSec must be positive")
  require(burst >= 1.0, "burst must admit at least one unit")

  private[this] var tokens = burst // start full: first unit never waits
  private[this] var lastNanos = System.nanoTime()
  private[this] var waitCount = 0L
  private[this] var grantCount = 0L

  private def refillLocked(): Unit = {
    val now = System.nanoTime()
    val dt = (now - lastNanos) / 1e9
    lastNanos = now
    tokens = math.min(burst, tokens + dt * ratePerSec)
  }

  /** Take `cost` tokens if available right now; false = caller should
    * back off (the non-blocking form the reference job loop polls). */
  def tryAcquire(cost: Double = 1.0): Boolean = synchronized {
    // a cost above the bucket ceiling can NEVER be satisfied — acquire()
    // would spin forever on it; refuse loudly instead
    require(cost > 0 && cost <= burst, s"cost $cost outside (0, burst=$burst]")
    refillLocked()
    if (tokens >= cost) { tokens -= cost; grantCount += 1; true }
    else false
  }

  /** Block (sliced, stop-aware) until `cost` tokens are available.
    * Returns false only when `stopped` flipped first — the caller's
    * shutdown path, in which case no tokens are consumed. */
  def acquire(cost: Double = 1.0, stopped: () => Boolean = () => false): Boolean = {
    var first = true
    while (!stopped()) {
      if (tryAcquire(cost)) return true
      if (first) { synchronized { waitCount += 1 }; first = false }
      try Thread.sleep(20L)
      catch { case _: InterruptedException => () } // re-check stopped()
    }
    false
  }

  /** Times a caller found the bucket empty and had to wait (observability:
    * nonzero proves the throttle actually paced something). */
  def waits: Long = synchronized(waitCount)

  /** Total units granted. */
  def grants: Long = synchronized(grantCount)
}

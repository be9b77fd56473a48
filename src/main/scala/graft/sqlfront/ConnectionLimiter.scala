package graft.sqlfront

import java.util.concurrent.{Semaphore, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Connection admission control for the wire frontends — the reference's
  * semantics (postgres/ConnectionLimiter.java:16-40): a FAIR semaphore of
  * `maxConnections` slots, a bounded wait of `timeoutMs` for a slot to
  * free, and monotone counters (total admitted, rejected) for
  * observability. Fairness matters under contention: a FIFO queue of
  * waiting connects means no client starves behind later arrivals, and
  * the bounded wait turns "pool briefly full" into a short stall rather
  * than an instant refusal — only a pool still full after the timeout
  * rejects.
  *
  * The PG-protocol half of the contract lives in [[PgWire]]: a rejected
  * connection receives a real ErrorResponse (SQLSTATE 53300
  * too_many_connections, the server's canonical "sorry, too many clients
  * already") after its startup message, never a bare TCP reset — drivers
  * surface it as a typed error instead of a connectivity failure.
  */
final class ConnectionLimiter(val maxConnections: Int, timeoutMs: Long) {
  private val slots = new Semaphore(maxConnections, true) // fair: FIFO waiters
  private val active = new AtomicInteger(0)
  private val total = new AtomicInteger(0)
  private val rejected = new AtomicInteger(0)

  /** Acquire a slot, waiting up to the bounded timeout; false = refuse. */
  def tryAcquire(): Boolean = {
    val acquired =
      try slots.tryAcquire(timeoutMs, TimeUnit.MILLISECONDS)
      catch { case _: InterruptedException =>
        Thread.currentThread().interrupt(); false
      }
    if (acquired) { active.incrementAndGet(); total.incrementAndGet() }
    else rejected.incrementAndGet()
    acquired
  }

  /** Release a previously-acquired slot (connection close path). */
  def release(): Unit = { slots.release(); active.decrementAndGet() }

  def activeConnections: Int = active.get()
  def totalConnections: Int = total.get()
  def rejectedConnections: Int = rejected.get()
  def utilization: Double = active.get().toDouble / maxConnections
  def isNearCapacity: Boolean = utilization > 0.8
}

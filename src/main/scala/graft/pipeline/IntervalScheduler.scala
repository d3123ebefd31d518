package graft.pipeline

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** The reference's scheduled-daemon mode ≙ APScheduler's interval
  * trigger with `max_instances=1` (main.py:138-146): the ETL job fires
  * every N minutes, and a tick that arrives while the previous run is
  * still in flight is SUPPRESSED (skipped with a count), never queued —
  * queuing would let a slow upstream stack an unbounded backlog of
  * identical full scans.
  *
  * Split for testability: [[tick]] is the pure scheduling decision
  * (start-or-suppress), [[runLoop]] the wall-clock driver around it.
  * Suites drive `tick()` directly with a job they control (no sleeps,
  * no real clock); `PipelineMain --interval` uses `runLoop`.
  */
final class IntervalScheduler(job: () => Unit,
                              onError: Throwable => Unit = _.printStackTrace()) {
  private val running = new AtomicBoolean(false)
  private val suppressedCount = new AtomicLong(0)
  private val completedCount = new AtomicLong(0)

  /** One scheduler tick: start the job on a worker thread unless the
    * previous run is still in flight. Returns true if the job started,
    * false if the tick was suppressed.
    */
  def tick(): Boolean =
    if (running.compareAndSet(false, true)) {
      val t = new Thread(() => {
        try job()
        catch { case scala.util.control.NonFatal(e) => onError(e) }
        finally {
          completedCount.incrementAndGet()
          running.set(false)
        }
      }, "graft-interval-job")
      t.setDaemon(true)
      t.start()
      true
    } else {
      suppressedCount.incrementAndGet()
      false
    }

  def isRunning: Boolean = running.get()
  def suppressed: Long = suppressedCount.get()
  def completed: Long = completedCount.get()

  /** Fire immediately (the reference schedules its first run 5 s out —
    * effectively "now"), then every `intervalMs` until `stop` flips.
    * Ticks align to the interval grid regardless of job duration; an
    * overlap suppresses rather than delays, exactly like
    * `max_instances=1`.
    */
  def runLoop(intervalMs: Long, stop: AtomicBoolean = new AtomicBoolean(false)): Unit = {
    require(intervalMs > 0, "intervalMs must be positive")
    while (!stop.get()) {
      tick()
      val deadline = System.nanoTime() + intervalMs * 1000000L
      while (!stop.get() && System.nanoTime() < deadline) {
        val remainMs = (deadline - System.nanoTime()) / 1000000L
        Thread.sleep(math.min(math.max(remainMs, 1L), 200L))
      }
    }
  }
}

package graft.pipeline

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Daemon scheduling semantics ≙ APScheduler interval job with
  * `max_instances=1` (main.py:138-146): ticks while a run is in flight
  * are suppressed, not queued; ticks after it completes run again.
  * Driven through [[IntervalScheduler.tick]] directly — no wall clock,
  * latches stand in for job duration.
  */
class IntervalSchedulerSpec extends AnyFunSuite {

  test("two ticks, one suppressed overlap, third runs after completion") {
    val gate = new CountDownLatch(1)
    val started = new CountDownLatch(1)
    val runs = new AtomicInteger(0)
    val sched = new IntervalScheduler(() => {
      runs.incrementAndGet()
      started.countDown()
      gate.await(10, TimeUnit.SECONDS)
      ()
    })

    assert(sched.tick(), "first tick must start the job")
    assert(started.await(10, TimeUnit.SECONDS))
    // the job is still in flight: the second tick is SUPPRESSED, not queued
    assert(!sched.tick(), "overlapping tick must be suppressed")
    assert(sched.suppressed == 1 && runs.get() == 1)

    gate.countDown()
    eventuallyCompleted(sched, 1)
    // after completion the next tick runs again — suppression is per
    // overlap, not a latch-up
    assert(sched.tick(), "post-completion tick must start a fresh run")
    eventuallyCompleted(sched, 2)
    assert(runs.get() == 2 && sched.suppressed == 1)
  }

  test("a failing job releases the slot (next tick still runs) and reports the error") {
    val errors = new AtomicInteger(0)
    val sched = new IntervalScheduler(
      () => throw new RuntimeException("boom"),
      onError = _ => errors.incrementAndGet())
    assert(sched.tick())
    eventuallyCompleted(sched, 1)
    assert(sched.tick(), "slot must be free after a failed run")
    eventuallyCompleted(sched, 2)
    assert(errors.get() == 2 && sched.suppressed == 0)
  }

  test("runLoop fires immediately and stops cleanly on the stop flag") {
    val runs = new AtomicInteger(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sched = new IntervalScheduler(() => { runs.incrementAndGet(); () })
    val loop = new Thread(() => sched.runLoop(intervalMs = 3600000L, stop = stop))
    loop.start()
    // first tick fires at t=0 (the reference schedules its first run 5 s
    // out); with a 1 h interval any observed run must be that first tick
    val deadline = System.nanoTime() + 10L * 1000000000L
    while (runs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(5)
    assert(runs.get() == 1)
    stop.set(true)
    loop.join(10000)
    assert(!loop.isAlive, "runLoop must exit promptly once stopped")
  }

  private def eventuallyCompleted(sched: IntervalScheduler, n: Long): Unit = {
    val deadline = System.nanoTime() + 10L * 1000000000L
    while (sched.completed < n && System.nanoTime() < deadline) Thread.sleep(5)
    assert(sched.completed >= n, s"job generation $n never completed")
  }
}

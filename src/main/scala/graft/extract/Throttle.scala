package graft.extract

/** T8 — extraction pacing (SURVEY §2.8): the reference sleeps
  * `throttle_time` between chunk SELECTs when a monitored server
  * variable crosses a threshold, and pauses all workers when target
  * disk space runs low (mydumper_write.c:1040,
  * mydumper_start_dump.c:128-208). On Spark the unit of pacing is the
  * chunk/partition *launch* on the driver — executors never self-pace —
  * so both knobs become small driver-side utilities wrapped around the
  * planner's per-chunk dispatch. Clock and sleep are injected so specs
  * drive them deterministically.
  */
object Throttle {

  /** Minimum-interval pacer: `acquire()` before each chunk launch
    * enforces ≥ `minIntervalMs` between launches (the reference's
    * `--throttle` sleep). Thread-safe — concurrent planners share one
    * pacer per source server. */
  final class Pacer(minIntervalMs: Long,
      now: () => Long = () => System.nanoTime() / 1000000L,
      sleep: Long => Unit = Thread.sleep) {
    require(minIntervalMs >= 0)
    private var last = Long.MinValue
    def acquire(): Unit = synchronized {
      val t = now()
      if (last == Long.MinValue || t - last >= minIntervalMs) last = t
      else { val wait = minIntervalMs - (t - last); sleep(wait); last = t + wait }
    }
  }

  /** Pause gate: blocks while `paused()` holds (the reference's
    * low-disk / SIGINT pause), polling every `pollMs`. Returns the
    * number of polls it waited — 0 means it never blocked. */
  def awaitResume(paused: () => Boolean, pollMs: Long = 1000L,
      sleep: Long => Unit = Thread.sleep, maxPolls: Int = Int.MaxValue): Int = {
    var polls = 0
    while (paused() && polls < maxPolls) { sleep(pollMs); polls += 1 }
    polls
  }
}

package graft.streaming

/** Daemon mode (SURVEY §2.8 T7, mydumper_daemon_thread.c:33-140): re-run
  * the dump every `--snapshot-interval` into `--snapshot-count` rotating
  * subdirectories (reference defaults: 60 min × 2 dirs), so consumers
  * always have one complete snapshot while the next one is being
  * written. The dump itself is whatever action the caller passes — each
  * iteration is one batch run (Spark jobs are naturally restartable, so
  * no in-dump state survives iterations, matching the reference).
  *
  * The clock is injected for testability; production use passes the
  * default Thread.sleep.
  */
object Daemon {

  /** Run `iterations` dumps into rotating `baseDir/<k>` dirs
    * (k = iteration mod snapshotCount). Returns the dirs written, in
    * order. `iterations < 0` would loop forever in the reference; here
    * the driver loop is bounded by the caller. */
  def run(baseDir: String, snapshotCount: Int = 2, iterations: Int,
      intervalMs: Long = 3600000L, sleep: Long => Unit = Thread.sleep)(
      dump: String => Unit): Seq[String] = {
    require(snapshotCount > 0 && iterations >= 0)
    (0 until iterations).map { i =>
      val dir = s"$baseDir/${i % snapshotCount}"
      dump(dir)
      if (i != iterations - 1 && intervalMs > 0) sleep(intervalMs)
      dir
    }
  }
}

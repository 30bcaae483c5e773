package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Daemon mode (SURVEY §2.8 T7, mydumper_daemon_thread.c:33-140): re-run
  * the dump every `--snapshot-interval` into `--snapshot-count` rotating
  * subdirectories (reference defaults: 60 min × 2 dirs), so consumers
  * always have one complete snapshot while the next one is being
  * written. The dump itself is whatever action the caller passes — each
  * iteration is one batch run (Spark jobs are naturally restartable, so
  * no in-dump state survives iterations, matching the reference).
  *
  * Reference-exact rotation state (mydumper_daemon_thread.c:55-115):
  * the numbered dirs are pre-created; a `last_dump` symlink names the
  * most recent COMPLETE snapshot; on startup the daemon resumes after
  * the symlink's target (wrapping at snapshot-count); the symlink only
  * advances after a successful dump — an aborted run leaves it on the
  * previous complete snapshot ("don't switch the symlink on shutdown
  * because the dump is probably incomplete").
  *
  * The clock is injected for testability; production use passes the
  * default Thread.sleep.
  */
object Daemon {

  val LinkName = "last_dump"

  /** Where the next snapshot goes: the `last_dump` symlink target + 1
    * (mod count), or 0 when no symlink exists — the reference's startup
    * probe (mydumper_daemon_thread.c:61-79, NOFOLLOW). */
  def nextDumpNumber(baseDir: String, snapshotCount: Int): Int = {
    val link = Paths.get(baseDir, LinkName)
    if (Files.isSymbolicLink(link)) {
      val t = Files.readSymbolicLink(link).toString
      val n = scala.util.Try(t.toInt).getOrElse(-1)
      if (n >= snapshotCount - 1 || n < 0) 0 else n + 1
    } else 0
  }

  /** Atomically point `last_dump` at the numbered dir (temp symlink +
    * rename, so a reader never sees a missing link). */
  def advanceLink(baseDir: String, dumpNumber: Int): Unit = {
    val tmp = Paths.get(baseDir, s".$LinkName.tmp")
    Files.deleteIfExists(tmp)
    Files.createSymbolicLink(tmp, Paths.get(dumpNumber.toString))
    Files.move(tmp, Paths.get(baseDir, LinkName),
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Resolve the most recent complete snapshot dir, if any — what a
    * consumer should read. */
  def lastComplete(baseDir: String): Option[Path] = {
    val link = Paths.get(baseDir, LinkName)
    if (Files.isSymbolicLink(link))
      Some(Paths.get(baseDir).resolve(Files.readSymbolicLink(link)))
    else None
  }

  /** Run `iterations` dumps into rotating `baseDir/<k>` dirs, resuming
    * the rotation from the `last_dump` symlink and advancing it after
    * each COMPLETE dump. Returns the dirs written, in order. A dump
    * that throws stops the daemon with the symlink still naming the
    * last complete snapshot. */
  def run(baseDir: String, snapshotCount: Int = 2, iterations: Int,
      intervalMs: Long = 3600000L, sleep: Long => Unit = Thread.sleep)(
      dump: String => Unit): Seq[String] = {
    require(snapshotCount > 0 && iterations >= 0)
    // pre-create the numbered dirs like the reference startup
    (0 until snapshotCount).foreach(k =>
      Files.createDirectories(Paths.get(baseDir, k.toString)))
    var number = nextDumpNumber(baseDir, snapshotCount)
    (0 until iterations).map { i =>
      val dir = s"$baseDir/$number"
      dump(dir)
      advanceLink(baseDir, number)
      number = if (number >= snapshotCount - 1) 0 else number + 1
      if (i != iterations - 1 && intervalMs > 0) sleep(intervalMs)
      dir
    }
  }
}

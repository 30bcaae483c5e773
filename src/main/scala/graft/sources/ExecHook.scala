package graft.sources

import scala.jdk.CollectionConverters._

/** S10 — post-write exec hook (SURVEY §2.1): the reference runs
  * `--exec "cmd FILENAME"` once per produced dump file through a
  * single-threaded queue (mydumper_exec_command.c:41-140). Here the hook
  * runs driver-side after the write action completes — executors write
  * files, the driver owns side effects — sequentially in filename order,
  * matching the reference's one-at-a-time semantics.
  */
object ExecHook {

  /** Run `cmdTemplate` per file under `dir` whose NAME matches `glob`
    * (every `FILENAME` occurrence replaced by the absolute path).
    * Returns (path, exit-code) per file. `runner` is injectable so specs
    * capture invocations without spawning processes. `exclude` drops
    * files by NAME after the glob (control files like `metadata` that
    * the reference's exec queue never sees). */
  def run(dir: String, glob: String, cmdTemplate: String,
      runner: Seq[String] => Int = shellRunner,
      exclude: String => Boolean = _ => false): Seq[(String, Int)] = {
    val matcher = java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$glob")
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val files =
      try listing.iterator().asScala
        .filter(p => matcher.matches(p.getFileName) &&
          !exclude(p.getFileName.toString))
        .map(_.toString).toSeq.sorted
      finally listing.close()
    files.map { p =>
      // the path rides as a POSITIONAL ARGUMENT ($1), never spliced into
      // the command text: direct substitution breaks on paths with
      // spaces (table names may contain them) and lets a crafted file
      // name execute arbitrary shell
      (p, runner(Seq("/bin/sh", "-c",
        cmdTemplate.replace("FILENAME", "\"$1\""), "graft-exec", p)))
    }
  }

  private def shellRunner(cmd: Seq[String]): Int =
    new ProcessBuilder(cmd: _*).inheritIO().start().waitFor()
}

package graft.sources

import java.io.OutputStream

/** `--exec-per-thread` stream filter (reference
  * src/mydumper/mydumper.c:275-298): each writer thread pipes its
  * file's bytes through one external process (stdin → stdout), letting
  * operators plug compressors the engine has no native codec for. Here
  * the child runs task-side, one per open dump file — the Spark shape
  * of the reference's per-thread child — and its stdout is pumped to
  * the file's OutputStream on a daemon thread so the writer never
  * deadlocks on a full pipe. A nonzero exit or pump failure throws on
  * close(): the task fails, Spark retries it, and the temp-file commit
  * protocol ([[SqlInsertWriter]] PartitionWriter) has already kept the
  * partial output away from any data file name.
  *
  * `ext` is the FULL file extension the filtered output should carry
  * (e.g. `".sql.zst"` for `Seq("zstd", "-c")`) — the reference's
  * `--exec-per-thread-extension` flag collapsed into the same value.
  */
final case class ExecFilter(cmd: Seq[String], ext: String) {
  require(cmd.nonEmpty, "empty exec-filter command")
  require(ext.startsWith("."), s"extension must start with '.', got: $ext")

  /** Wrap `sink`: bytes written to the returned stream feed the child's
    * stdin; the child's stdout streams into `sink`. close() closes
    * stdin, waits for the child, drains the pump, closes `sink`, and
    * surfaces any failure. */
  def wrap(sink: OutputStream): OutputStream = new OutputStream {
    private val proc = new ProcessBuilder(cmd: _*).start()
    private val stdin = proc.getOutputStream
    @volatile private var pumpError: Throwable = _
    private val pump = new Thread(() => {
      try {
        val in = proc.getInputStream
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) sink.write(buf, 0, n)
          n = in.read(buf)
        }
      } catch {
        case t: Throwable =>
          pumpError = t
          // a dead sink (disk full, HDFS failure) must FAIL the task,
          // not wedge it: with nobody draining stdout the child stalls
          // on a full pipe and the writer then blocks forever in
          // stdin.write / waitFor. Killing the child breaks both pipes,
          // so the writer surfaces an error and Spark retries the task.
          proc.destroyForcibly()
      }
    }, "graft-exec-filter-pump")
    pump.setDaemon(true)
    pump.start()

    override def write(b: Int): Unit = stdin.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      stdin.write(b, off, len)
    override def flush(): Unit = stdin.flush()
    override def close(): Unit = {
      // a child that died mid-file breaks the stdin pipe: that close
      // failure must not mask the informative diagnostics (exit code,
      // pump error) nor leak the sink's file handle
      val stdinError = try { stdin.close(); null }
        catch { case t: Throwable => t }
      val exit = proc.waitFor()
      pump.join()
      try sink.close() catch {
        case t: Throwable => if (pumpError == null) pumpError = t
      }
      if (pumpError != null)
        throw new java.io.IOException("exec-filter output pump failed", pumpError)
      if (exit != 0)
        throw new java.io.IOException(
          s"exec filter '${cmd.mkString(" ")}' exited $exit",
          stdinError)
      if (stdinError != null)
        throw new java.io.IOException(
          s"exec filter '${cmd.mkString(" ")}' stdin close failed", stdinError)
    }
  }
}

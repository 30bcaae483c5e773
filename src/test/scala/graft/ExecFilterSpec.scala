package graft

import graft.sources.{ExecFilter, SqlInsertReader, SqlInsertWriter}

/** `--exec-per-thread` stream filter (reference mydumper.c:275-298):
  * dump bytes flow through an external process per file. Gated with a
  * real child process (gzip), proving (a) the filtered output is what
  * the command produced — the unchanged extension-routed reader
  * decompresses it — and (b) a failing filter aborts the task without
  * committing a data file (the temp-commit protocol holds). */
class ExecFilterSpec extends SparkTestBase {

  test("gzip exec filter round-trips through the standard reader") {
    val li = Tables.lineitem(spark, sf).limit(2000).cache()
    li.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_execfilter").toString
    val n = SqlInsertWriter.write(li.repartition(4), "graft", "lineitem", dir,
      SqlInsertWriter.Options(
        execFilter = Some(ExecFilter(Seq("gzip", "-c"), ".sql.gz"))))
    assert(n === 2000L)
    val files = new java.io.File(dir).listFiles.map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files.nonEmpty && files.forall(_.endsWith(".sql.gz")),
      s"unexpected names: ${files.toSeq}")
    val back = SqlInsertReader.read(spark, dir, li.schema, "graft.lineitem.*.sql.gz")
    assert(back.count() === 2000L)
    assert(back.exceptAll(li).count() === 0)
    assert(li.exceptAll(back).count() === 0)
    li.unpersist()
  }

  test("readFiltered decodes an arbitrary-extension dump via the inverse child") {
    // write with gzip under a NON-codec extension (.sql.gzx): Hadoop has
    // no codec route for it, so only the exec-decode path can read it —
    // the loader-side FIFO-decompression analog, end to end
    val li = Tables.lineitem(spark, sf).limit(500).cache()
    li.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_execdec").toString
    SqlInsertWriter.write(li.repartition(2), "graft", "lineitem", dir,
      SqlInsertWriter.Options(
        execFilter = Some(ExecFilter(Seq("gzip", "-c"), ".sql.gzx"))))
    val back = SqlInsertReader.readFiltered(spark, dir, li.schema,
      Seq("gzip", "-dc"), "graft.lineitem.*.sql.gzx")
    assert(back.count() === 500L)
    assert(back.exceptAll(li).count() === 0)
    assert(li.exceptAll(back).count() === 0)
    li.unpersist()
  }

  test("failing filter aborts the task and commits no data file") {
    val li = Tables.lineitem(spark, sf).limit(100).coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("graft_execfail").toString
    intercept[org.apache.spark.SparkException] {
      SqlInsertWriter.write(li, "graft", "bad", dir,
        SqlInsertWriter.Options(
          execFilter = Some(ExecFilter(Seq("false"), ".sql.x"))))
    }
    val files = new java.io.File(dir).listFiles.toSeq.map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files.isEmpty, s"no data file may be committed on failure: $files")
  }
}

package graft

import graft.cli.Main
import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {

  test("flag parsing: long, short-alias, valueless, ignored") {
    val o = Main.parseFlags(Array(
      "--source-dir", "/data", "-o", "/out", "--compress",
      "--tables-list", "a,b", "-t", "8", "--pmm-path", "/x"))
    assert(o("source-dir") === "/data")
    assert(o("outputdir") === "/out")
    assert(o("compress") === "true")
    assert(o("tables-list") === "a,b")
    assert(o("threads") === "8")
    assert(!o.contains("pmm-path")) // accepted-but-ignored operational flag
  }
}

/** End-to-end CLI run against the dev slice (needs a session). */
class CliRunSpec extends SparkTestBase {

  test("dump command writes jsonl and fires the exec hook per file") {
    val out = java.nio.file.Files.createTempDirectory("graft_cli_").toString
    // exec hook proof: copy each produced item name into a log
    val log = s"$out/.hook_log"
    Main.main(Array("dump",
      "--source-dir", sf, "-o", out, "--format", "jsonl",
      "--tables-list", "region,nation",
      "--exec", s"echo FILENAME >> $log"))
    val written = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(written.contains("graft.region") && written.contains("graft.nation"))
    val back = spark.read.schema(Tables.t(spark, sf, "region").schema)
      .json(s"$out/graft.region")
    assert(back.count() === Tables.t(spark, sf, "region").count())
    val hooked = scala.io.Source.fromFile(log).getLines().toSeq
    assert(hooked.exists(_.endsWith("graft.region")) &&
      hooked.exists(_.endsWith("graft.nation")))
  }

  test("--no-data dumps schemas only; --no-schemas dumps data only") {
    val out = java.nio.file.Files.createTempDirectory("graft_nodata_").toString
    Main.main(Array("dump",
      "--source-dir", sf, "-o", out, "--tables-list", "region", "--no-data"))
    val files = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(files.contains("graft.region-schema.sql"))
    assert(!files.exists(_.matches("""graft\.region\.\d{5}.*""")),
      s"schema-only dump wrote data chunks: $files")

    val out2 = java.nio.file.Files.createTempDirectory("graft_noschema_").toString
    Main.main(Array("dump",
      "--source-dir", sf, "-o", out2, "--tables-list", "region", "--no-schemas"))
    val files2 = new java.io.File(out2).listFiles().map(_.getName).toSet
    assert(!files2.contains("graft.region-schema.sql"))
    assert(files2.exists(_.matches("""graft\.region\.\d{5}\.sql""")))
  }
}

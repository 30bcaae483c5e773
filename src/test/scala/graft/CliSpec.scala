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

  test("flag parsing: dash-leading values and boolean flags don't swallow tokens") {
    // a value starting with '-' used to be misread as the next flag
    val o = Main.parseFlags(Array("--regex", "-internal$", "--compress",
      "--where", "x > -5"))
    assert(o("regex") === "-internal$")
    assert(o("compress") === "true")
    assert(o("where") === "x > -5")
    // boolean flags never consume the following token
    val o2 = Main.parseFlags(Array("--compress", "--source-dir", "/d"))
    assert(o2("compress") === "true")
    assert(o2("source-dir") === "/d")
  }

  test("repeated --regex accumulates and ORs like the reference's re_list") {
    // regex.c:35 appends every -x/--regex occurrence; eval_regex walks
    // the list until the first match
    val m = Main.parseFlagsMulti(Array("-x", "lineitem$", "--regex", "^tpch\\.n",
      "-t", "4"))
    assert(m("regex") === Seq("lineitem$", "^tpch\\.n"))
    assert(m("threads") === Seq("4"))
    // last-wins view stays stable for single-valued flags
    assert(Main.parseFlags(Array("-t", "4", "-t", "8"))("threads") === "8")

    import graft.core.{ColumnMeta, TableMeta}
    def t(db: String, tbl: String) =
      TableMeta(db, tbl, Seq(ColumnMeta("c", "int")))
    val spec = graft.extract.TableFilter.Spec(
      regexes = Seq("lineitem$", "^tpch\\.n"))
    assert(graft.extract.TableFilter.accepts(spec, t("tpch", "lineitem")))
    assert(graft.extract.TableFilter.accepts(spec, t("tpch", "nation")))
    assert(!graft.extract.TableFilter.accepts(spec, t("tpch", "orders")))
    // no patterns at all -> accept everything non-system
    assert(graft.extract.TableFilter.accepts(
      graft.extract.TableFilter.Spec(), t("tpch", "orders")))
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

  test("--exec-per-thread round trip under a NON-codec extension") {
    // .sql.gzx has no Hadoop codec route: only the exec paths can write
    // AND read it — proving both sides of the reference's flag pair
    val out = java.nio.file.Files.createTempDirectory("graft_cli_xpt_").toString
    Main.main(Array("dump",
      "--source-dir", sf, "-o", out, "--tables-list", "region",
      "--exec-per-thread", "gzip -c",
      "--exec-per-thread-extension", ".sql.gzx"))
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("graft.region.")).filterNot(_.contains("schema"))
    assert(files.nonEmpty && files.forall(_.endsWith(".sql.gzx")),
      s"unexpected dump names: ${files.toSeq}")
    val restored = java.nio.file.Files.createTempDirectory("graft_cli_xptr_").toString
    Main.main(Array("load", "-d", out, "--target", restored,
      "--checksum", "fail",
      "--exec-per-thread", "gzip -dc",
      "--exec-per-thread-extension", ".sql.gzx"))
    val back = spark.read.parquet(s"$restored/graft.region")
    assert(back.count() === Tables.t(spark, sf, "region").count())
  }

  test("load without --source-dir restores from the dump's own schema files") {
    // the documented default usage (`load -d dir --target t`) used to
    // silently restore ZERO tables; it must reconstruct schemas from the
    // dump's db.table-schema.sql artifacts
    val out = java.nio.file.Files.createTempDirectory("graft_cli_ld_").toString
    val restored = java.nio.file.Files.createTempDirectory("graft_cli_rt_").toString
    Main.main(Array("dump",
      "--source-dir", sf, "-o", out, "--tables-list", "region"))
    Main.main(Array("load", "-d", out, "--target", restored, "--checksum", "fail"))
    val back = spark.read.parquet(s"$restored/graft.region")
    assert(back.count() === Tables.t(spark, sf, "region").count())
  }

  test("--rows sizes the chunk count from the row estimate") {
    val out = java.nio.file.Files.createTempDirectory("graft_cli_rows_").toString
    // orders at sf0.001 ≈ 1,500 rows; 200 rows/chunk → ~8 chunk files
    Main.main(Array("dump",
      "--source-dir", sf, "-o", out, "--tables-list", "orders",
      "--rows", "200"))
    val chunkFiles = new java.io.File(out).listFiles().map(_.getName)
      .count(_.matches("""graft\.orders\.\d{5}\.sql"""))
    assert(chunkFiles >= 4 && chunkFiles <= 16,
      s"--rows 200 over ~1500 rows should give ~8 chunks, got $chunkFiles")
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

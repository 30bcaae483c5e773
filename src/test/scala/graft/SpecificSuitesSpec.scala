package graft

import graft.cli.Main

/** Round-10 `specific_N` tranche — the reference's configuration-matrix
  * suites (test_mydumper.sh:236-390) driven through the CLI with
  * reference-shaped cnf files, like the round-9 specific_24 case.
  * Covered here: specific_25 (compression × chunk-filesize under
  * LOAD_DATA), specific_22 (--no-data), specific_23 + specific_28
  * (--no-schemas, dump and load sides), specific_3 (--where + --compact
  * + --tables-list row subsetting), specific_7/8/13/14 (INSERT-shape
  * flag matrix), specific_15 (empty database), and the --tables-list ×
  * --regex interplay (eval_regex applies BOTH filters). */
class SpecificSuitesSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def names(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles).map(_.map(_.getName).toSet)
      .getOrElse(Set.empty)

  private def cnf(content: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_spec_", ".cnf")
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  private def restoredOk(logfile: String): Seq[String] = {
    val ls = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(logfile))
    scala.jdk.CollectionConverters.ListHasAsScala(ls).asScala.toSeq
      .filter(_.startsWith("[graft] restored"))
  }

  test("specific_25: LOAD_DATA + compress=ZSTD + chunk-filesize rotates " +
      "compressed chunks and restores checksum-exact") {
    // the reference crosses format=LOAD_DATA with compress=zstd,
    // threads=8 and chunk-filesize=1 (test/specific_25/mydumper.cnf) —
    // rotation must count COMPRESSED bytes per chunk file and the
    // loader must decode .dat.zst through the same reader
    val c = cnf(
      """[mydumper]
        |format=LOAD_DATA
        |compress=ZSTD
        |threads=8
        |chunk-filesize=1
        |tables-list=lineitem
        |
        |[myloader]
        |drop-table
        |""".stripMargin)
    val out = tmp("graft_s25_")
    // sf0.01 lineitem (~60 k rows) exceeds 1 MiB of text → rotation
    Main.main(Array("dump", s"--defaults-extra-file=$c",
      "--source-dir", "/root/testdata/sf0.01", "-o", out))
    val dats = names(out).filter(_.matches("""graft\.lineitem\.\d{5}\.\d{5}\.dat\.zst"""))
    assert(dats.size >= 2, s"expected rotated .dat.zst chunks, got: ${names(out)}")
    assert(!names(out).exists(_.endsWith(".dat")),
      "uncompressed .dat files must not appear under --compress")
    val target = tmp("graft_s25_t_")
    val lf = java.nio.file.Files.createTempFile("graft_s25_log", ".txt").toString
    Main.main(Array("load", s"--defaults-extra-file=$c", "-d", out,
      "--target", target, "--checksum", "fail", "--logfile", lf))
    assert(spark.read.parquet(s"$target/graft.lineitem").count()
      === Tables.t(spark, "/root/testdata/sf0.01", "lineitem").count())
    val lines = restoredOk(lf)
    assert(lines.size === 1 && lines.head.endsWith("checksum ok"), lines)
  }

  test("specific_25 gzip half: SQL format rotation under --compress=GZIP") {
    val out = tmp("graft_s25g_")
    Main.main(Array("dump", "--source-dir", "/root/testdata/sf0.01",
      "-o", out, "--tables-list", "orders", "--compress=GZIP",
      "--chunk-filesize", "1"))
    val gzs = names(out).filter(_.matches("""graft\.orders\.\d{5}\.\d{5}\.sql\.gz"""))
    assert(gzs.nonEmpty, s"expected rotated .sql.gz chunks, got: ${names(out)}")
    val target = tmp("graft_s25g_t_")
    val lf = java.nio.file.Files.createTempFile("graft_s25g_log", ".txt").toString
    Main.main(Array("load", "-d", out, "--target", target,
      "--checksum", "fail", "--logfile", lf))
    assert(restoredOk(lf).forall(_.endsWith("checksum ok")))
  }

  test("specific_22: --no-data dumps schemas only and restores empty tables") {
    val c = cnf("[mydumper]\nno-data\ntables-list=region,nation\n\n" +
      "[myloader]\ndrop-table\n")
    val out = tmp("graft_s22_")
    Main.main(Array("dump", s"--defaults-extra-file=$c",
      "--source-dir", sf, "-o", out))
    val ns = names(out)
    assert(ns.exists(_.endsWith("region-schema.sql")) &&
      ns.exists(_.endsWith("nation-schema.sql")), ns)
    assert(!ns.exists(_.matches(""".*\.\d{5}\.sql.*""")),
      s"--no-data must write zero data files: $ns")
    val target = tmp("graft_s22_t_")
    Main.main(Array("load", s"--defaults-extra-file=$c", "-d", out,
      "--target", target))
    // the reference creates the (empty) tables; the lake analog is an
    // empty parquet table with the dump's schema
    for (t <- Seq("region", "nation")) {
      val back = spark.read.parquet(s"$target/graft.$t")
      assert(back.count() === 0, s"$t must restore empty")
      assert(back.columns.sameElements(
        Tables.t(spark, sf, t).columns), s"$t schema lost")
    }
  }

  test("specific_23 + specific_28: --no-schemas dumps data only; the load " +
      "side restores it against an external schema source") {
    val out = tmp("graft_s23_")
    Main.main(Array("dump", "--source-dir", sf, "-o", out,
      "--tables-list", "region", "--no-schemas"))
    val ns = names(out)
    assert(ns.exists(_.matches("""graft\.region\.\d{5}\.sql""")), ns)
    assert(!ns.exists(_.contains("-schema")),
      s"--no-schemas must write zero schema files: $ns")
    // without a schema source the load fails loudly (no silent no-op)
    val t1 = tmp("graft_s23_t1_")
    intercept[Exception] {
      Main.main(Array("load", "-d", out, "--target", t1))
    }
    // specific_28's shape: schemas pre-exist at the target side — the
    // engine analog is --source-dir providing them
    val t2 = tmp("graft_s23_t2_")
    val lf = java.nio.file.Files.createTempFile("graft_s23_log", ".txt").toString
    Main.main(Array("load", "-d", out, "--target", t2,
      "--source-dir", sf, "--checksum", "fail", "--logfile", lf))
    assert(spark.read.parquet(s"$t2/graft.region").count()
      === Tables.t(spark, sf, "region").count())
    assert(restoredOk(lf).forall(_.endsWith("checksum ok")))
  }

  test("specific_3: --where + --compact + --tables-list exports exactly " +
      "the predicate's rows, headerless") {
    val c = cnf(
      """[mydumper]
        |where= r_regionkey > 0 AND r_regionkey <= 3
        |compact=1
        |tables-list=region
        |""".stripMargin)
    val out = tmp("graft_s3_")
    Main.main(Array("dump", s"--defaults-extra-file=$c",
      "--source-dir", sf, "-o", out))
    val dataFile = names(out).find(_.matches("""graft\.region\.\d{5}\.sql"""))
    assert(dataFile.isDefined, names(out))
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, dataFile.get))
    assert(!text.contains("SET NAMES"),
      s"--compact must drop the file header: ${text.take(200)}")
    // the reference's check counts exported rows (10 there, 3 here)
    val target = tmp("graft_s3_t_")
    Main.main(Array("load", "-d", out, "--target", target,
      "--source-dir", sf))
    assert(spark.read.parquet(s"$target/graft.region").count() === 3)
  }

  test("specific_7/8/13/14: INSERT-shape flag matrix round-trips " +
      "(insert-ignore, replace, skip-tz-utc, tz-utc)") {
    // each case drives the verbatim reference [mydumper] flag through a
    // cnf and asserts the emitted statement/header shape, then restores
    // checksum-exact (the reference's myloader --checksum=fail leg)
    val cases = Seq(
      ("insert-ignore", (t: String) => t.contains("INSERT IGNORE INTO")),
      ("replace", (t: String) => t.contains("REPLACE INTO")),
      ("skip-tz-utc", (t: String) => !t.contains("TIME_ZONE")),
      ("tz-utc", (t: String) => t.contains("SET TIME_ZONE='+00:00'")))
    for ((flag, shapeOk) <- cases) {
      val c = cnf(s"[mydumper]\n$flag\ntables-list=region\n\n" +
        "[myloader]\ndrop-table\n")
      val out = tmp(s"graft_s7_${flag.replace("-", "")}_")
      Main.main(Array("dump", s"--defaults-extra-file=$c",
        "--source-dir", sf, "-o", out))
      val dataFile = names(out).find(_.matches("""graft\.region\.\d{5}\.sql"""))
        .getOrElse(fail(s"$flag: no data file in ${names(out)}"))
      val text = java.nio.file.Files.readString(
        java.nio.file.Paths.get(out, dataFile))
      assert(shapeOk(text), s"$flag shape assert failed: ${text.take(300)}")
      val target = tmp(s"graft_s7t_${flag.replace("-", "")}_")
      val lf = java.nio.file.Files.createTempFile("graft_s7_log", ".txt").toString
      Main.main(Array("load", s"--defaults-extra-file=$c", "-d", out,
        "--target", target, "--checksum", "fail", "--logfile", lf))
      val lines = restoredOk(lf)
      assert(lines.size === 1 && lines.head.endsWith("checksum ok"),
        s"$flag: $lines")
    }
  }

  test("specific_15: an empty database dumps and restores as a no-op " +
      "with metadata intact") {
    val out = tmp("graft_s15_")
    // tables-list matching nothing = the file-source empty database
    Main.main(Array("dump", "--source-dir", sf, "-o", out,
      "--tables-list", "no_such_table"))
    assert(names(out).contains("metadata"),
      s"empty dump must still write metadata: ${names(out)}")
    val m = graft.sources.Manifest.read(out).get
    assert(m.tables.isEmpty)
    val target = tmp("graft_s15_t_")
    Main.main(Array("load", "-d", out, "--target", target)) // must not throw
    assert(names(target).isEmpty, "nothing to restore")
  }

  test("--tables-list and --regex compose (eval_regex applies both filters)") {
    val out = tmp("graft_tlr_")
    Main.main(Array("dump", "--source-dir", sf, "-o", out,
      "--tables-list", "region,nation,supplier",
      "--regex", "^graft\\.(region|supplier)$"))
    val stems = names(out).filter(_.endsWith("-schema.sql"))
      .map(_.stripSuffix("-schema.sql"))
    assert(stems === Set("graft.region", "graft.supplier"),
      s"tables-list ∩ regex must admit exactly region+supplier: $stems")
  }
}

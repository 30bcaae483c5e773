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

  test("specific_18: integer-PK chunked dump (--rows) rotates per-chunk " +
      "files and restores checksum-exact") {
    // the reference's integer-PK suite: chunking on the key must
    // neither lose nor double rows across chunk files
    val out = tmp("graft_s18_")
    Main.main(Array("dump", "--source-dir", sf, "-o", out,
      "--tables-list", "orders", "--rows", "300"))
    val chunks = names(out).filter(_.matches("""graft\.orders\.\d{5}\.sql"""))
    assert(chunks.size >= 2,
      s"--rows 300 over 1500 orders must produce multiple chunk files: ${names(out)}")
    val target = tmp("graft_s18_t_")
    val lf = java.nio.file.Files.createTempFile("graft_s18_log", ".txt").toString
    Main.main(Array("load", "-d", out, "--target", target,
      "--checksum", "fail", "--logfile", lf))
    assert(spark.read.parquet(s"$target/graft.orders").count()
      === Tables.t(spark, sf, "orders").count())
    assert(restoredOk(lf).forall(_.endsWith("checksum ok")))
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

/** Second round-10 tranche batch: exec hook, INSERT column list,
  * hex-blob binary literals, ignore-engines lists, and the operational
  * flags whose suites exist to prove they don't corrupt a run. */
class SpecificSuitesSpec2 extends SparkTestBase {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def names(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles).map(_.map(_.getName).toSet)
      .getOrElse(Set.empty)

  private def cnf(content: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_spec2_", ".cnf")
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  private def restoredOk(logfile: String): Seq[String] = {
    val ls = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(logfile))
    scala.jdk.CollectionConverters.ListHasAsScala(ls).asScala.toSeq
      .filter(_.startsWith("[graft] restored"))
  }

  test("specific_5: --exec gzip FILENAME publishes .sql.gz files the " +
      "loader reads natively") {
    val c = cnf("[mydumper]\ntables-list=region\nexec=gzip FILENAME\n\n" +
      "[myloader]\ndrop-table\n")
    val out = tmp("graft_s5_")
    Main.main(Array("dump", s"--defaults-extra-file=$c",
      "--source-dir", sf, "-o", out))
    // gzip FILENAME replaces each published file with FILENAME.gz
    assert(names(out).exists(_.matches("""graft\.region\.\d{5}\.sql\.gz""")),
      s"exec hook must leave gzipped data files: ${names(out)}")
    assert(!names(out).exists(_.matches("""graft\.region\.\d{5}\.sql""")),
      s"original uncompressed file must be consumed: ${names(out)}")
    val target = tmp("graft_s5_t_")
    val lf = java.nio.file.Files.createTempFile("graft_s5_log", ".txt").toString
    Main.main(Array("load", s"--defaults-extra-file=$c", "-d", out,
      "--target", target, "--checksum", "fail", "--logfile", lf))
    val lines = restoredOk(lf)
    assert(lines.size === 1 && lines.head.endsWith("checksum ok"), lines)
  }

  test("specific_9: --complete-insert writes the column list; " +
      "--no-complete-insert drops it") {
    def dataText(flag: String): String = {
      val out = tmp("graft_s9_")
      Main.main(Array("dump", "--source-dir", sf, "-o", out,
        "--tables-list", "region", flag))
      val f = names(out).find(_.matches("""graft\.region\.\d{5}\.sql"""))
        .getOrElse(fail(s"no data file: ${names(out)}"))
      java.nio.file.Files.readString(java.nio.file.Paths.get(out, f))
    }
    val withCols = dataText("--complete-insert")
    assert(withCols.contains("INSERT INTO `region` (`r_regionkey`,"),
      withCols.take(200))
    val without = dataText("--no-complete-insert")
    assert(without.contains("INSERT INTO `region` VALUES"), without.take(200))
  }

  test("specific_10: --hex-blob renders a binary column as 0x literals " +
      "and round-trips checksum-exact") {
    // synthetic binary-column table through directory discovery
    val srcDir = tmp("graft_s10_src_")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rows = (0 until 50).map { i =>
      Row(i.toLong,
        if (i % 7 == 0) null
        else Array.tabulate[Byte](12)(j => ((i * 31 + j * 7) % 256 - 128).toByte))
    }
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      .repartition(2).write.mode("overwrite").parquet(s"$srcDir/blobs.parquet")
    val c = cnf("[mydumper]\ntables-list=blobs\nhex-blob\n\n" +
      "[myloader]\ndrop-table\n")
    val out = tmp("graft_s10_")
    Main.main(Array("dump", s"--defaults-extra-file=$c",
      "--source-dir", srcDir, "-o", out))
    val dataFile = names(out).find(_.matches("""graft\.blobs\.\d{5}\.sql"""))
      .getOrElse(fail(s"no data file: ${names(out)}"))
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, dataFile))
    assert("0x[0-9A-Fa-f]{24}".r.findFirstIn(text).isDefined,
      s"binary must render as 0x hex: ${text.take(300)}")
    val target = tmp("graft_s10_t_")
    val lf = java.nio.file.Files.createTempFile("graft_s10_log", ".txt").toString
    Main.main(Array("load", s"--defaults-extra-file=$c", "-d", out,
      "--target", target, "--checksum", "fail", "--logfile", lf))
    assert(restoredOk(lf).forall(_.endsWith("checksum ok")))
    val back = spark.read.parquet(s"$target/graft.blobs")
    assert(back.count() === 50)
  }

  test("specific_1/2: --ignore-engines single and comma-list exclude by " +
      "engine, case-insensitively") {
    import graft.core.{ColumnMeta, TableMeta}
    import graft.extract.TableFilter
    def tm(t: String, engine: String) =
      TableMeta("db", t, Seq(ColumnMeta("id", "bigint")), engine = engine)
    // specific_1: single engine
    val one = TableFilter.Spec(
      ignoreEngines = TableFilter.engineSetOf("MyISAM"))
    assert(!TableFilter.accepts(one, tm("a", "MyISAM")))
    assert(!TableFilter.accepts(one, tm("a", "myisam")))
    assert(TableFilter.accepts(one, tm("b", "InnoDB")))
    // specific_2: comma list (reference splits on ",")
    val two = TableFilter.Spec(
      ignoreEngines = TableFilter.engineSetOf("MyISAM, InnoDB"))
    assert(!TableFilter.accepts(two, tm("a", "MyISAM")))
    assert(!TableFilter.accepts(two, tm("b", "innodb")))
    assert(TableFilter.accepts(two, tm("c", "Aria")))
    // the CLI accepts the reference spelling without misparsing
    // neighbors (-i is ignored on the file source, warned)
    val o = Main.parseFlags(Array("-i", "MyISAM,InnoDB", "--threads", "8"))
    assert(o("threads") === "8" && !o.contains("ignore-engines"))
  }

  test("specific_26/27/29/30/38: operational flag suites run clean " +
      "(bulk-metadata-prefetch, skip-metadata-sorting, worker-pool caps, " +
      "trx-tables=0, skip-create-database)") {
    // the reference suites exist to prove these flags don't corrupt a
    // dump/restore; on the file source they are accept-and-ignore — the
    // assertion is a green checksum round trip WITH them present
    val cd = cnf(
      """[mydumper]
        |tables-list=region
        |threads=4
        |bulk-metadata-prefetch
        |skip-metadata-sorting
        |trx-tables=0
        |""".stripMargin)
    val cl = cnf(
      """[myloader]
        |threads=4
        |drop-table
        |max-threads-for-schema-creation=4
        |max-threads-for-index-creation=2
        |max-threads-for-post-actions=2
        |skip-create-database=1
        |""".stripMargin)
    val out = tmp("graft_s26_")
    Main.main(Array("dump", s"--defaults-extra-file=$cd",
      "--source-dir", sf, "-o", out))
    val target = tmp("graft_s26_t_")
    val lf = java.nio.file.Files.createTempFile("graft_s26_log", ".txt").toString
    Main.main(Array("load", s"--defaults-extra-file=$cl", "-d", out,
      "--target", target, "--checksum", "fail", "--logfile", lf))
    val lines = restoredOk(lf)
    assert(lines.size === 1 && lines.head.endsWith("checksum ok"), lines)
  }
}

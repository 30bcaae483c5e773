package graft

import graft.functions.Checksum
import graft.sources.{CsvDump, SqlInsertReader, SqlInsertWriter}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The reference's own oracle (SURVEY §5): dump → load → per-table
  * CRC32-XOR checksum equality (test_mydumper.sh uses --checksum-all +
  * --checksum=fail; myloader aborts on mismatch). */
class RoundTripSpec extends SparkTestBase {

  private def checksumOf(df: org.apache.spark.sql.DataFrame): Long =
    df.agg(Checksum.tableChecksum(df)).head().getLong(0)

  test("sql-insert round-trip preserves rows and checksum (lineitem sf0.001)") {
    val dir = Files.createTempDirectory("graft_dump_").toString
    val li = Tables.lineitem(spark, sf)
    val rows = SqlInsertWriter.write(li, "tpch", "lineitem", dir)
    assert(rows === li.count())
    val back = SqlInsertReader.read(spark, dir, li.schema)
    assert(back.count() === li.count())
    assert(checksumOf(back) === checksumOf(li))
  }

  test("sql-insert round-trip with gzip compression") {
    val dir = Files.createTempDirectory("graft_dump_gz_").toString
    val o = Tables.orders(spark, sf)
    SqlInsertWriter.write(o, "tpch", "orders", dir,
      SqlInsertWriter.Options(compress = true))
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")) // Hadoop local-FS .crc sidecars
    assert(names.nonEmpty && names.forall(_.endsWith(".sql.gz")))
    val back = SqlInsertReader.read(spark, dir, o.schema)
    assert(checksumOf(back) === checksumOf(o))
  }

  test("file rotation produces sub-part files under the size cap") {
    val dir = Files.createTempDirectory("graft_dump_rot_").toString
    val o = Tables.orders(spark, sf).coalesce(1)
    SqlInsertWriter.write(o, "tpch", "orders", dir,
      SqlInsertWriter.Options(statementSize = 4096, fileSizeBytes = 16384))
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.length > 1, s"expected rotation, got ${files.toSeq}")
    assert(files.forall(_.matches("""tpch\.orders\.\d{5}\.\d{5}\.sql""")))
  }

  test("escaping survives hostile strings (quotes, newlines, backslash, nul)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("b", BinaryType)))
    val hostile = Seq(
      Row(1L, "O'Brien \"quoted\"", Array[Byte](0, 1, 2, -1)),
      Row(2L, "line1\nline2\r\ttab", Array[Byte]()),
      Row(3L, "back\\slash, comma", Array[Byte](127, -128)),
      Row(4L, null, null),
      Row(5L, "nul\u0000and\u001actrl", Array[Byte](42)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(hostile, 2), schema)
    val dir = Files.createTempDirectory("graft_dump_esc_").toString
    SqlInsertWriter.write(df, "t", "hostile", dir)
    val back = SqlInsertReader.read(spark, dir, schema)
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a.map(_.getAs[String]("s")) === b.map(_.getAs[String]("s")))
    assert(a.map(r => Option(r.getAs[Array[Byte]]("b")).map(_.toSeq)) ===
      b.map(r => Option(r.getAs[Array[Byte]]("b")).map(_.toSeq)))
  }

  test("insert verb: --insert-ignore / --replace, reference-exact header") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(2L, "b")), 1), schema)

    // build_insert_statement (mydumper_write.c:458-478): verb INTO
    // `table` — NOT db-qualified — (cols) VALUES; verbs from
    // mydumper_working_thread.h:22-24
    def fileOf(opts: SqlInsertWriter.Options): String = {
      val dir = Files.createTempDirectory("graft_verb_").toString
      SqlInsertWriter.write(df, "db", "t", dir, opts)
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".sql")).head
      Files.readString(f.toPath)
    }
    // full byte contract: " VALUES" runs straight into the first row's
    // lines_starting_by (build_insert_statement ends there, write.c:477);
    // rows end with lines_terminated_by ")\n" and the "," row delimiter
    // is PREPENDED to follow-on rows (:1004-1007); strings enclose with
    // `"` (detect_quote_character's backtick-mode pick,
    // mydumper_start_dump.c:417); statement ends ";\n"
    assert(fileOf(SqlInsertWriter.Options()) ===
      "INSERT INTO `t` (`id`,`s`) VALUES(1,\"a\")\n,(2,\"b\")\n;\n")
    assert(fileOf(SqlInsertWriter.Options(insertIgnore = true)).startsWith(
      "INSERT IGNORE INTO `t` (`id`,`s`) VALUES("))
    assert(fileOf(SqlInsertWriter.Options(replace = true)).startsWith(
      "REPLACE INTO `t` (`id`,`s`) VALUES("))
    // columns_on_insert replaces the schema list verbatim (write.c:466-470)
    assert(fileOf(SqlInsertWriter.Options(
      columnsOnInsert = Some("`x`,`y`"))).startsWith("INSERT INTO `t` (`x`,`y`) VALUES("))
    // ANSI_QUOTES flips the enclosure to '\'' (mydumper_start_dump.c:424)
    assert(fileOf(SqlInsertWriter.Options(
      format = graft.sources.RowFormat.resolve(
        graft.sources.RowFormat.SqlKind, ansiQuotes = true))) ===
      "INSERT INTO `t` (`id`,`s`) VALUES(1,'a')\n,(2,'b')\n;\n")
    // mutual exclusion, the reference's m_error (mydumper_write.c:368-369)
    intercept[IllegalArgumentException] {
      SqlInsertWriter.Options(insertIgnore = true, replace = true)
    }
    // verb variants parse back identically — the reader keys on VALUES
    val dir = Files.createTempDirectory("graft_verb_rt_").toString
    SqlInsertWriter.write(df, "db", "t", dir,
      SqlInsertWriter.Options(replace = true))
    assert(SqlInsertReader.read(spark, dir, schema).count() === 2)
  }

  test("hex-blob off: _binary literal round-trips every byte value") {
    // the reference's DEFAULT binary form (hex_blob=FALSE,
    // mydumper_write.c:73): `_binary <encl><escaped raw bytes><encl>`
    // (:694-703) with the fields_enclosed_by char — `"` in backtick
    // identifier mode; empty stays two enclosure chars in both modes
    // (:682-684, length==0 precedes the hex check)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("b", BinaryType)))
    val all = Array.tabulate(256)(_.toByte)
    val rows = Seq(
      Row(1L, all), Row(2L, Array[Byte]()), Row(3L, null),
      Row(4L, "ascii'quote\\slash".getBytes("UTF-8")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = Files.createTempDirectory("graft_binlit_").toString
    SqlInsertWriter.write(df, "t", "bin", dir,
      SqlInsertWriter.Options(hexBlob = false))
    val text = Files.readString(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".sql"))
        .head.toPath)
    assert(text.contains("_binary \""), "binary must use the _binary literal")
    assert(!text.contains("0x"), "no hex literals with hexBlob off")
    assert(text.contains(",\"\""), "empty binary stays \"\" (length==0 branch)")
    val back = SqlInsertReader.read(spark, dir, schema)
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a.map(r => Option(r.getAs[Array[Byte]]("b")).map(_.toSeq)) ===
      b.map(r => Option(r.getAs[Array[Byte]]("b")).map(_.toSeq)))
  }

  test("csv dump round-trip preserves checksum") {
    val dir = Files.createTempDirectory("graft_csv_").toString
    val c = Tables.customer(spark, sf)
    CsvDump.write(c, dir, CsvDump.Options(header = true))
    val back = CsvDump.reader(spark, CsvDump.Options(header = true))
      .schema(c.schema).csv(dir)
    assert(checksumOf(back) === checksumOf(c))
  }

  test("load-data companion statement matches reference shape") {
    // clause-for-clause initialize_load_data_statement_suffix
    // (mydumper_write.c:515-548) + LOAD_DATA_PREFIX (mydumper_write.h:21):
    // no REPLACE/IGNORE verb, table NOT db-qualified, plain ENCLOSED BY;
    // ENCLOSED BY / ESCAPED BY / STARTING BY always present — the _ld
    // globals are back-filled non-NULL empties (:283-285,314-317), so
    // defaults print ENCLOSED BY '' and STARTING BY ''; ends `;\n` (:547)
    val stmt = CsvDump.loadDataStatement("t", "/x/db.t.00000.dat")
    assert(stmt === "LOAD DATA LOCAL INFILE '/x/db.t.00000.dat' INTO TABLE " +
      "`t` FIELDS TERMINATED BY '\\t' ENCLOSED BY '' ESCAPED BY '\\\\' " +
      "LINES STARTING BY '' TERMINATED BY '\\n' ;\n")
    assert(!stmt.contains("REPLACE"), "the reference emits no LOAD DATA verb")

    // hex-encoded binary columns route through @var + SET col=UNHEX(@var)
    // (append_load_data_columns, mydumper_write.c:561-575); header files
    // add IGNORE 1 LINES (:531-532); CHARACTER SET only when set (:519)
    val full = CsvDump.loadDataStatement("t", "f.dat",
      CsvDump.LoadDataDefaults.copy(header = true,
        characterSet = Some("utf8mb4")),
      columns = Seq("id", "blob", "name"), hexCols = Set("blob"))
    assert(full.contains("CHARACTER SET utf8mb4 "))
    assert(full.contains("IGNORE 1 LINES "))
    assert(full.contains("(`id`,@blob,`name`)SET `blob`=UNHEX(@blob)"))

    // columns_on_insert replaces the list verbatim, no SET generated
    // (mydumper_write.c:534-536)
    val coi = CsvDump.loadDataStatement("t", "f.dat",
      columns = Seq("id", "blob"), hexCols = Set("blob"),
      columnsOnInsert = Some("`a`,`b`"))
    assert(coi.contains("(`a`,`b`);"))
    assert(!coi.contains("UNHEX"))
  }

  test("csv codec option passes through to any Hadoop text codec") {
    // zstd needs native Hadoop libs absent in this container; lz4 proves
    // the same pass-through path with a codec this JVM provides
    val o = Tables.orders(spark, sf)
    val dir = Files.createTempDirectory("graft_lz4_").toString
    CsvDump.write(o, dir, CsvDump.Options(compress = true, codec = "lz4"))
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".csv.lz4")), files.mkString(","))
    val back = CsvDump.reader(spark).schema(o.schema).csv(dir)
    assert(checksumOf(back) === checksumOf(o))
  }

  test("clickhouse dump: data round-trips, loader script covers every chunk (S7)") {
    val n = Tables.nation(spark, sf)
    val dir = Files.createTempDirectory("graft_ch_").toString
    val res = Dump.dumpTable(n, "nation", Dump.Config(
      outDir = dir, format = Dump.ClickHouseFormat, db = "tpch",
      primaryKeys = Tables.primaryKeys))
    assert(res.rows === n.count())
    // data chunks are plain SQL-INSERT (FORMAT MySQLDump payload) and
    // read back losslessly
    val back = SqlInsertReader.read(spark, dir, n.schema, "tpch.nation.*.sql*")
    assert(checksumOf(back) === checksumOf(n))
    // loader script: one INSERT..FROM INFILE per data chunk, reference
    // statement shape (mydumper_write.c:630-640)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    val chunks = files.filter(_.matches("""tpch\.nation\.\d{5}\.sql""")).sorted
    assert(chunks.nonEmpty)
    val script = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tpch.nation-load.sql")), "UTF-8")
    val stmts = script.trim.linesIterator.toSeq
    assert(stmts.size === chunks.length)
    chunks.zip(stmts).foreach { case (f, s) =>
      // qualified `db`.`table`: the CREATE artifact makes the table
      // under `tpch`, so the loader must not resolve against
      // clickhouse-client's default database
      assert(s === s"INSERT INTO `tpch`.`nation` FROM INFILE '$f' FORMAT MySQLDump;")
    }
    // CH-dialect DDL: keyed MergeTree, key column non-Nullable
    val ddl = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tpch.nation-schema-clickhouse.sql")), "UTF-8")
    assert(ddl.contains("ENGINE = MergeTree ORDER BY (`n_nationkey`)"))
    assert(!ddl.contains("Nullable(Int64)") || !ddl.contains("`n_nationkey` Nullable"))
    // the MySQL-dialect schema file still rides along for sourcesFromDir
    assert(files.contains("tpch.nation-schema.sql"))
    // router sends the new artifacts to their own types, never to Data
    assert(Load.classify("tpch.nation-load.sql") === Load.LoaderScript)
    assert(Load.classify("tpch.nation-schema-clickhouse.sql") === Load.SchemaClickHouse)
    assert(Load.discover(dir).keySet === Set("tpch.nation"))
  }

  test("clickhouse type mapping covers the dump surface") {
    import org.apache.spark.sql.types._
    assert(sources.ClickHouse.chType(LongType, nullable = true) === "Nullable(Int64)")
    assert(sources.ClickHouse.chType(BooleanType, nullable = false) === "UInt8")
    assert(sources.ClickHouse.chType(DecimalType(18, 2), nullable = false) === "Decimal(18, 2)")
    assert(sources.ClickHouse.chType(TimestampType, nullable = false) === "DateTime64(6, 'UTC')")
    assert(sources.ClickHouse.chType(DateType, nullable = false) === "Date32")
    assert(sources.ClickHouse.chType(ArrayType(StringType), nullable = true) === "Nullable(String)")
    // no key -> unordered MergeTree, no invented ORDER BY column
    val ddl = sources.ClickHouse.createTable("db", "t",
      StructType(Seq(StructField("a", LongType))), orderBy = Nil)
    assert(ddl.contains("ORDER BY tuple()"))
  }

  test("order-by-primary sorts by the WHOLE composite key, not just its head") {
    val li = Tables.lineitem(spark, sf).limit(2000)
    val dir = Files.createTempDirectory("graft_obp_").toString
    Dump.dumpTable(li, "lineitem", Dump.Config(
      outDir = dir, db = "tpch", orderByPrimary = true, targetChunks = 4,
      primaryKeys = Map("lineitem" -> Seq("l_orderkey", "l_linenumber"))))
    // parse (l_orderkey, l_linenumber) back out of each file's tuples in
    // FILE order: within a file they must be non-decreasing on the
    // composite key (head-only sorting leaves linenumbers shuffled)
    val tupleRe = """\((\d+),(\d+),(\d+),(\d+),""".r
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("""tpch\.lineitem\.\d{5}\.sql"""))
    assert(files.nonEmpty)
    files.foreach { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val keys = tupleRe.findAllMatchIn(text)
        .map(m => (m.group(1).toLong, m.group(4).toLong)).toSeq
      assert(keys.size > 1, s"${f.getName} parsed too few tuples")
      keys.sliding(2).foreach { case Seq(a, b) =>
        assert(Ordering[(Long, Long)].lteq(a, b),
          s"${f.getName}: $a before $b breaks composite PK order")
      }
    }
  }

  test("clickhouse schema-only and data-only dumps emit the right artifacts") {
    val n = Tables.nation(spark, sf)
    def names(dir: String): Set[String] =
      new java.io.File(dir).listFiles().map(_.getName).toSet
    // --no-data: the ClickHouse DDL must still be written (it is a schema
    // artifact), and no data chunks or loader script may appear
    val d1 = Files.createTempDirectory("graft_ch_nodata_").toString
    Dump.dumpTable(n, "nation", Dump.Config(outDir = d1, db = "tpch",
      format = Dump.ClickHouseFormat, noData = true))
    assert(names(d1).contains("tpch.nation-schema-clickhouse.sql"))
    assert(!names(d1).exists(_.matches("""tpch\.nation\.\d{5}\.sql""")))
    assert(!names(d1).contains("tpch.nation-load.sql"))
    // --no-schemas: data + loader script only, no DDL of either dialect
    val d2 = Files.createTempDirectory("graft_ch_noschema_").toString
    Dump.dumpTable(n, "nation", Dump.Config(outDir = d2, db = "tpch",
      format = Dump.ClickHouseFormat, noSchemas = true))
    assert(names(d2).exists(_.matches("""tpch\.nation\.\d{5}\.sql""")))
    assert(names(d2).contains("tpch.nation-load.sql"))
    assert(!names(d2).contains("tpch.nation-schema-clickhouse.sql"))
    assert(!names(d2).contains("tpch.nation-schema.sql"))
  }

  test("clickhouse loader script lists only THIS run's files (no stale chunks)") {
    val n = Tables.nation(spark, sf)
    val dir = Files.createTempDirectory("graft_ch_stale_").toString
    // plant a stale chunk from a hypothetical earlier, wider dump
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "tpch.nation.99999.sql"),
      "-- stale\n".getBytes("UTF-8"))
    Dump.dumpTable(n, "nation", Dump.Config(outDir = dir, db = "tpch",
      format = Dump.ClickHouseFormat))
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tpch.nation-load.sql")), "UTF-8")
    assert(!script.contains("99999"),
      "loader script replays a stale chunk from a previous dump")
    assert(script.contains("tpch.nation.00000"), "current chunks missing")
  }

  test("dotted database name surrogates across every format (specific_32)") {
    // reference test/specific_32: db `db.dot` triggers mydumper_N file
    // renaming in stream mode; here the SAME contract across all five
    // formats — raw dotted name never on disk, real name in DDL + a
    // schema-create file, data round-trips under the surrogate stem
    val o = Tables.region(spark, sf)
    val want = checksumOf(o)
    val formats = Seq[(String, Dump.Format)](
      ("sql", Dump.SqlFormat), ("csv", Dump.CsvFormat),
      ("jsonl", Dump.JsonlFormat), ("load_data", Dump.LoadDataFormat()),
      ("parquet", Dump.ParquetFormat))
    formats.foreach { case (label, format) =>
      val dir = Files.createTempDirectory("graft_dotdb_").toString
      val res = Dump.dumpTable(o, "region", Dump.Config(
        outDir = dir, format = format, db = "db.dot"))
      assert(res.rows === o.count(), label)
      val names = new java.io.File(dir).listFiles().map(_.getName)
      assert(!names.exists(_.startsWith("db.dot")),
        s"$label: raw dotted db leaked to disk: ${names.mkString(",")}")
      assert(names.exists(_.startsWith("mydumper_0.")), s"$label: ${names.mkString(",")}")
      if (format != Dump.ParquetFormat) {
        // real db name recoverable from the schema-create pair
        val sc = Files.readString(
          java.nio.file.Paths.get(dir, "mydumper_0-schema-create.sql"))
        assert(sc.contains("`db.dot`"), s"$label: $sc")
        val ddl = Files.readString(
          java.nio.file.Paths.get(dir, "mydumper_0.region-schema.sql"))
        assert(ddl.contains("db.dot"), s"$label DDL lost the real db: $ddl")
      }
      val back = format match {
        case Dump.SqlFormat =>
          SqlInsertReader.read(spark, dir, o.schema, "mydumper_0.region.*.sql*")
        case Dump.JsonlFormat =>
          spark.read.schema(o.schema).json(s"$dir/mydumper_0.region")
        case Dump.ParquetFormat =>
          spark.read.parquet(s"$dir/mydumper_0.region")
        case Dump.LoadDataFormat(_) =>
          graft.sources.LoadDataReader.read(spark, dir, o.schema)
        case _ =>
          CsvDump.reader(spark).schema(o.schema).csv(s"$dir/mydumper_0.region")
      }
      assert(checksumOf(back) === want, s"checksum mismatch after $label")
    }
  }

  test("charset-heavy strings round-trip across text formats (specific_16/21)") {
    // reference specific_16 (special characters/words in comments) and
    // specific_21 (utf8mb4): multibyte, emoji, RTL, combining marks,
    // quote-dense and escape-dense payloads must survive every TEXT
    // serialization byte-for-byte
    val rows = Seq(
      (1L, "café crème üß"),             // latin-1 supplement
      (2L, "日本語テスト"),          // CJK
      (3L, "😀🎉 emoji 🔥"),   // astral plane
      (4L, "العربية rtl"), // arabic
      (5L, "combining: á ë ñ"),
      (6L, "quotes '\" and `backticks` -- comment /* block */"),
      (7L, "tabs\tand\nnewlines\\backslash"),
      (8L, null.asInstanceOf[String]))
    import spark.implicits._
    val df = rows.toDF("id", "txt")
    val want = checksumOf(df)
    for (format <- Seq[Dump.Format](Dump.SqlFormat, Dump.LoadDataFormat(),
        Dump.JsonlFormat)) {
      val dir = Files.createTempDirectory("graft_charset_").toString
      Dump.dumpTable(df, "uni", Dump.Config(outDir = dir, format = format,
        db = "tpch", setNamesCharset = "utf8mb4"))
      val back = format match {
        case Dump.SqlFormat =>
          SqlInsertReader.read(spark, dir, df.schema, "tpch.uni.*.sql*")
        case Dump.JsonlFormat =>
          spark.read.schema(df.schema).json(s"$dir/tpch.uni")
        case _ => graft.sources.LoadDataReader.read(spark, dir, df.schema)
      }
      assert(back.count() === 8, format.toString)
      assert(checksumOf(back) === want, s"charset loss under $format")
    }
  }

  test("views + sequences + triggers dump together and phase-order correctly (specific_11/12/33/35)") {
    // the reference's schema-object suites exercise views, routines and
    // triggers in ONE dump; here: a data table with a trigger, a view
    // (placeholder + view file), and a sequence — every artifact
    // classified, the view placeholder excluded from the data phase,
    // and the restore phases ordered schemas < data < triggers < views/
    // sequences (myloader's intermediate/post queues)
    val dir = Files.createTempDirectory("graft_objs_").toString
    val o = Tables.region(spark, sf)
    Dump.run(spark, Seq(("region", o, true)),
      Dump.Config(outDir = dir, db = "tpch"))
    Dump.writeView(dir, "tpch", "v_region",
      columns = Seq(("r_regionkey", "bigint"), ("r_name", "varchar(64)")),
      createViewDdl =
        "CREATE VIEW `v_region` AS SELECT r_regionkey, r_name FROM region")
    Dump.writeSchemaObject(dir, "tpch", Dump.SchemaKind.Sequence,
      graft.sources.SchemaObjects.createSequenceFile("seq_r",
        "CREATE SEQUENCE `seq_r` START WITH 1"), Some("seq_r"))
    Dump.writeSchemaObject(dir, "tpch", Dump.SchemaKind.Triggers,
      graft.sources.SchemaObjects.createTriggersFile(
        Seq(("trg_r", "CREATE TRIGGER `trg_r` BEFORE INSERT ON `region` " +
          "FOR EACH ROW SET @x = 1", "utf8mb4", "utf8mb4_general_ci"))),
      Some("region"))
    val names = new java.io.File(dir).listFiles().map(_.getName).toSeq
    val classes = names.map(n => n -> Load.classify(n)).toMap
    assert(classes("tpch.v_region-schema-view.sql") === Load.SchemaView)
    assert(classes("tpch.seq_r-schema-sequence.sql") === Load.SchemaSequence)
    assert(classes("tpch.region-schema-triggers.sql") === Load.SchemaTriggers)
    assert(classes("tpch.v_region-schema.sql") === Load.Schema,
      "view dependency placeholder table missing")
    // phase order: the invariant the dependency scheduler runs on
    assert(Load.phaseOf(Load.Schema) < Load.phaseOf(Load.Data))
    assert(Load.phaseOf(Load.Data) < Load.phaseOf(Load.SchemaTriggers))
    assert(Load.phaseOf(Load.SchemaTriggers) < Load.phaseOf(Load.SchemaView))
    assert(Load.phaseOf(Load.SchemaView) === Load.phaseOf(Load.SchemaSequence))
    // the view placeholder must NOT become a data-phase table source
    val srcs = Load.sourcesFromDir(dir)
    assert(srcs.map(_.table) === Seq("tpch.region"),
      s"view placeholder leaked into the data phase: ${srcs.map(_.table)}")
    // and the real table still restores green
    val restored = Files.createTempDirectory("graft_objs_r_").toString
    val results = Load.run(spark, dir, srcs) { (stem, df) =>
      df.write.mode("overwrite").parquet(s"$restored/$stem")
    }
    assert(results.forall(_.checksumOk.contains(true)))
  }

  test("multicolumn-PK table: chunked dump + composite order round-trips (specific_17/31)") {
    // reference specific_17/31 (multicolumn / large multi-PK tables):
    // a (tenant_id, seq) key whose leading column cannot split — dumped
    // with order-by-primary over the COMPOSITE key and a rows cap, then
    // restored checksum-green; the nested chunk plan itself is covered
    // by ChunkPlannerSpec/ChunkStrategySpec
    val df = spark.range(0, 30000).select(
      (col("id") % 3 + 1).as("tenant_id"),
      expr("id div 3").as("seq"),
      concat(lit("payload-"), col("id")).as("payload"))
    val want = checksumOf(df)
    val dir = Files.createTempDirectory("graft_mcpk_").toString
    val res = Dump.dumpTable(df, "tenanted", Dump.Config(
      outDir = dir, db = "tpch", orderByPrimary = true,
      rowsPerChunk = Some(5000L),
      primaryKeys = Map("tenanted" -> Seq("tenant_id", "seq"))))
    assert(res.rows === 30000L)
    assert(res.chunks >= 1)
    val back = SqlInsertReader.read(spark, dir, df.schema,
      "tpch.tenanted.*.sql*")
    assert(checksumOf(back) === want)
    // composite ordering: within every file, rows sort by (tenant, seq)
    val first = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("tpch\\.tenanted\\.\\d{5}\\.sql")).head
    val pairs = scala.io.Source.fromFile(first).getLines()
      .flatMap(l => "\\((\\d+),(\\d+),".r.findAllMatchIn(l)
        .map(m => (m.group(1).toLong, m.group(2).toLong))).toSeq
    assert(pairs.nonEmpty)
    assert(pairs === pairs.sorted,
      "rows within a dump file must follow the composite PK order")
  }

  test("config matrix: format × compression × ordering all round-trip (specific_N analog)") {
    val o = Tables.orders(spark, sf)
    val want = checksumOf(o)
    val cases = for {
      format <- Seq(Dump.SqlFormat, Dump.CsvFormat, Dump.JsonlFormat)
      compress <- Seq(false, true)
      orderByPk <- Seq(false, true)
    } yield (format, compress, orderByPk)
    cases.foreach { case (format, compress, orderByPk) =>
      val label = s"$format/compress=$compress/obp=$orderByPk"
      val dir = Files.createTempDirectory("graft_matrix_").toString
      val res = Dump.dumpTable(o, "orders", Dump.Config(
        outDir = dir, format = format, db = "tpch",
        compress = compress, orderByPrimary = orderByPk,
        statementSize = 64 * 1024))
      assert(res.rows === o.count(), label)
      assert(res.checksum === want, label)
      val back = format match {
        case Dump.SqlFormat =>
          SqlInsertReader.read(spark, dir, o.schema, "tpch.orders.*.sql*")
        case Dump.JsonlFormat =>
          spark.read.schema(o.schema).json(s"$dir/tpch.orders")
        case _ =>
          CsvDump.reader(spark).schema(o.schema).csv(s"$dir/tpch.orders")
      }
      assert(checksumOf(back) === want, s"checksum mismatch after $label")
    }
  }
}

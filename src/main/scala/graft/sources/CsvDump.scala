package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** CSV / LOAD-DATA dump format (SURVEY §2.1 S6): the reference's
  * delimiter-configurable text output maps 1:1 onto Spark's csv writer
  * options; the companion `.sql` file carrying the `LOAD DATA LOCAL
  * INFILE` statement is generated alongside.
  *
  * Reference defaults (mydumper_write.c:252-365): fields terminated by
  * tab for load-data / comma for csv, optionally enclosed by '"',
  * escaped by backslash, lines terminated by newline.
  */
object CsvDump {

  final case class Options(
      fieldsTerminatedBy: String = ",",
      fieldsEnclosedBy: String = "\"",
      fieldsEscapedBy: String = "\\",
      header: Boolean = false,
      compress: Boolean = false,
      // any Hadoop text codec: gzip always; zstd where the cluster has
      // native Hadoop libs (reference S9's gzip/zstd pair); lz4/snappy/
      // bzip2/deflate also pass through
      codec: String = "gzip",
      // --load-data-character-set: CHARACTER SET clause, emitted only
      // when set (mydumper_write.c:519-520)
      characterSet: Option[String] = None,
      // --lines-starting-by: LINES STARTING BY clause, emitted only when
      // set (mydumper_write.c:528-529)
      linesStartingBy: Option[String] = None)

  val LoadDataDefaults: Options =
    Options(fieldsTerminatedBy = "\t", fieldsEnclosedBy = "", header = false)

  def write(df: DataFrame, outDir: String, opts: Options = Options()): Unit = {
    var w = df.write.mode("overwrite")
      .option("sep", opts.fieldsTerminatedBy)
      .option("escape", opts.fieldsEscapedBy)
      .option("header", opts.header.toString)
      // quoted-empty when enclosure is on: a BARE zero-length field
      // parses back as null (univocity yields Java null before any
      // option applies), so '' must be written as "" to survive a
      // Spark-side re-read. With enclosure off (LOAD DATA mode) the
      // zero-length field is the format's own empty-string encoding —
      // MySQL loads it as '' correctly; only Spark re-reads fold it to
      // NULL (documented reader limitation).
      .option("emptyValue",
        if (opts.fieldsEnclosedBy.nonEmpty)
          opts.fieldsEnclosedBy * 2 else "")
      .option("nullValue", "\\N") // reference NULL text for load-data
    w = if (opts.fieldsEnclosedBy.nonEmpty) w.option("quote", opts.fieldsEnclosedBy)
        else w.option("quote", "\u0000")
    w = if (opts.compress) w.option("compression", opts.codec) else w
    w.csv(outDir)
  }

  def reader(spark: SparkSession, opts: Options = Options()): DataFrameReader = {
    val r = spark.read
      .option("sep", opts.fieldsTerminatedBy)
      .option("escape", opts.fieldsEscapedBy)
      .option("header", opts.header.toString)
      .option("nullValue", "\\N")
      // NULL has its own dedicated text (\N), so a zero-length field IS
      // an empty string — without this the parser folds '' into null and
      // a dump/restore silently rewrites empty strings as NULLs (flips
      // checksums, breaks NOT NULL loads)
      .option("emptyValue", "")
    if (opts.fieldsEnclosedBy.nonEmpty) r.option("quote", opts.fieldsEnclosedBy)
    else r.option("quote", "\u0000")
  }

  /** The `LOAD DATA` companion statement the reference writes next to
    * each data file — prefix + per-table suffix, clause-for-clause
    * initialize_load_data_statement_suffix (mydumper_write.c:515-548,622;
    * LOAD_DATA_PREFIX mydumper_write.h:21):
    *
    *   - NO verb: `LOAD DATA LOCAL INFILE '<file>' INTO TABLE` — the
    *     reference never emits REPLACE/IGNORE here;
    *   - table NOT db-qualified (myloader selects the schema on the
    *     connection; the db travels in the file name);
    *   - CHARACTER SET only when configured; ENCLOSED BY / ESCAPED BY /
    *     STARTING BY ALWAYS present (the `_ld` globals are back-filled
    *     non-NULL, so defaults print `ENCLOSED BY ''` / `STARTING BY
    *     ''`); `ENCLOSED BY`, not `OPTIONALLY ENCLOSED BY`;
    *   - `IGNORE 1 LINES` when the files carry a header row (:531-532);
    *   - trailing column list (:533-545): binary columns route through a
    *     `@var` + `SET col=UNHEX(@var)` pair exactly when the data file
    *     carries them hex-encoded (append_load_data_columns's
    *     is_hex_blob branch); `columnsOnInsert` replaces the whole list
    *     verbatim (and then no SET is generated, :534-536).
    */
  def loadDataStatement(table: String, file: String,
      opts: Options = LoadDataDefaults,
      columns: Seq[String] = Nil,
      hexCols: Set[String] = Set.empty,
      columnsOnInsert: Option[String] = None): String = {
    val sb = new StringBuilder
    sb ++= s"LOAD DATA LOCAL INFILE '$file' INTO TABLE `$table` "
    opts.characterSet.foreach(cs => sb ++= s"CHARACTER SET $cs ")
    // every clause is ALWAYS present: the reference back-fills the _ld
    // spellings to non-NULL (empty) strings, so defaults print as
    // `ENCLOSED BY ''` / `STARTING BY ''` rather than dropping the
    // clause (mydumper_write.c:283-285,314-317 feed :523-530)
    sb ++= s"FIELDS TERMINATED BY '${escape(opts.fieldsTerminatedBy)}' "
    sb ++= s"ENCLOSED BY '${opts.fieldsEnclosedBy}' "
    sb ++= s"ESCAPED BY '${escape(opts.fieldsEscapedBy)}' "
    sb ++= "LINES "
    sb ++= s"STARTING BY '${escape(opts.linesStartingBy.getOrElse(""))}' "
    sb ++= "TERMINATED BY '\\n' "
    if (opts.header) sb ++= "IGNORE 1 LINES "
    columnsOnInsert match {
      case Some(c) => sb ++= s"($c)"
      case None if columns.nonEmpty =>
        sb ++= columns.map(c =>
          if (hexCols(c)) s"@$c" else s"`$c`").mkString("(", ",", ")")
        val sets = columns.filter(hexCols)
        if (sets.nonEmpty)
          sb ++= sets.map(c => s"`$c`=UNHEX(@$c)").mkString("SET ", ",", "")
      case None => ()
    }
    // statement ends `;\n` (initialize_load_data_statement_suffix :547)
    sb ++= ";\n"
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
}

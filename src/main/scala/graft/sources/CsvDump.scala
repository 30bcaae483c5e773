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
      codec: String = "gzip")

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
    * each data file (mydumper_write.c:549-580). */
  def loadDataStatement(db: String, table: String, file: String,
      opts: Options = LoadDataDefaults): String = {
    val enclosed =
      if (opts.fieldsEnclosedBy.nonEmpty)
        s" OPTIONALLY ENCLOSED BY '${opts.fieldsEnclosedBy}'" else ""
    s"LOAD DATA LOCAL INFILE '$file' REPLACE INTO TABLE `$db`.`$table` " +
      s"CHARACTER SET utf8mb4 FIELDS TERMINATED BY '${escape(opts.fieldsTerminatedBy)}'" +
      s"$enclosed ESCAPED BY '${escape(opts.fieldsEscapedBy)}' " +
      "LINES STARTING BY '' TERMINATED BY '\\n';"
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
}

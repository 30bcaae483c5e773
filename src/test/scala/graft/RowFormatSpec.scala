package graft

import graft.sources.{RowFormat, SqlInsertReader, SqlInsertWriter}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The `--fields-terminated-by` knob family: CLI escape decoding,
  * per-format default resolution, and the SQL statement-assembly byte
  * contract — each pinned to the reference helper it ports
  * (replace_escaped_strings common.c:494-528; initialize_write
  * mydumper_write.c:241-366; the write loop :946-1021). */
class RowFormatSpec extends AnyFunSuite with SparkTestBase {

  test("replaceEscapedStrings decodes n/t/r/f and keeps unknown escapes") {
    assert(RowFormat.replaceEscapedStrings("a\\tb") === "a\tb")
    assert(RowFormat.replaceEscapedStrings("\\n\\r\\f") === "\n\r\f")
    // unknown escape: backslash kept, next char REPROCESSED — so \\n is
    // a literal backslash followed by a decoded newline (common.c:516-518
    // advances one char on the default branch)
    assert(RowFormat.replaceEscapedStrings("\\x") === "\\x")
    assert(RowFormat.replaceEscapedStrings("\\\\n") === "\\\n")
    // trailing backslash survives
    assert(RowFormat.replaceEscapedStrings("ab\\") === "ab\\")
  }

  test("per-format default matrix matches initialize_write") {
    val sql = RowFormat.SqlDefaults
    assert(sql.fieldsTerminatedBy === ",")
    assert(sql.fieldsEnclosedBy === "\"") // detect_quote_character, backtick mode
    assert(sql.linesStartingBy === "(")
    assert(sql.linesTerminatedBy === ")\n")
    assert(sql.statementTerminatedBy === ";\n")
    assert(sql.rowDelimiter === ",")
    assert(RowFormat.resolve(RowFormat.SqlKind, ansiQuotes = true)
      .fieldsEnclosedBy === "'")

    val ld = RowFormat.LoadDataDefaults
    assert(ld.fieldsTerminatedBy === "\t" && ld.fieldsTerminatedByLd === "\\t")
    assert(ld.fieldsEnclosedBy === "")
    // the back-filled _ld defaults are PRESENT-but-empty — the LOAD DATA
    // statement says ENCLOSED BY '' / STARTING BY '' at defaults
    // (mydumper_write.c:283-285,314-317 leave non-NULL empty strings)
    assert(ld.fieldsEnclosedByLd === Some(""))
    assert(ld.linesStartingByLd === Some(""))
    assert(ld.linesTerminatedBy === "\n" && ld.linesTerminatedByLd === "\\n")
    assert(ld.statementTerminatedBy === "" && ld.rowDelimiter === "")
    assert(ld.fieldsEscapedBy === "\\\\" && ld.escapeChar === '\\')

    val csv = RowFormat.CsvDefaults
    assert(csv.fieldsTerminatedBy === "," && csv.fieldsEnclosedBy === "\"")
    assert(csv.fieldsEnclosedByLd === Some("\""))

    // user knobs decode through replace_escaped_strings
    val k = RowFormat.resolve(RowFormat.CsvKind, RowFormat.Knobs(
      fieldsTerminatedBy = Some("\\t"), linesTerminatedBy = Some("\\r\\n")))
    assert(k.fieldsTerminatedBy === "\t" && k.fieldsTerminatedByLd === "\\t")
    assert(k.linesTerminatedBy === "\r\n" && k.linesTerminatedByLd === "\\r\\n")

    // single-char gates (mydumper_write.c:245-248)
    intercept[IllegalArgumentException] {
      RowFormat.resolve(RowFormat.CsvKind,
        RowFormat.Knobs(fieldsEnclosedBy = Some("ab")))
    }
    intercept[IllegalArgumentException] {
      RowFormat.resolve(RowFormat.CsvKind,
        RowFormat.Knobs(fieldsEscapedBy = Some("||")))
    }
  }

  test("escape/replace char helpers port m_escape/m_replace_char_with_char") {
    val s = new java.lang.StringBuilder("a,b,,c")
    RowFormat.escapeCharWith(s, ',', '\\')
    assert(s.toString === "a\\,b\\,\\,c")
    val r = new java.lang.StringBuilder("a\\b\\")
    RowFormat.replaceCharWith(r, '\\', '|')
    assert(r.toString === "a|b|")
  }

  test("utf8Length counts bytes, not chars") {
    assert(RowFormat.utf8Length("abc") === 3L)
    assert(RowFormat.utf8Length("é") === 2L)     // U+00E9
    assert(RowFormat.utf8Length("€") === 3L) // €
    assert(RowFormat.utf8Length("😀") === 4L) // emoji, surrogate pair
  }

  test("statement packing: size checked BEFORE append; cap never exceeded") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val rows = (1 to 8).map(i => Row(i.toLong, "x" * 20))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = Files.createTempDirectory("graft_pack_").toString
    // each row is ~29 bytes; header ~33; cap 100 → 2 rows per statement
    SqlInsertWriter.write(df, "db", "t", dir,
      SqlInsertWriter.Options(statementSize = 100))
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".sql")).head
    val text = Files.readString(f.toPath)
    val stmts = text.split(";\n").filter(_.nonEmpty)
    // the reference's pre-append check (write.c:955) keeps EVERY
    // statement within statement_size
    stmts.foreach(s => assert(s.getBytes("UTF-8").length + 2 <= 100,
      s"statement exceeded cap: ${s.length} bytes"))
    assert(stmts.length === 4)
    stmts.foreach(s => assert(s.startsWith("INSERT INTO `t` (`id`,`s`) VALUES(")))
    // all rows survive the repack
    assert(SqlInsertReader.read(spark, dir, schema).count() === 8)
  }

  test("oversized single row ships as its own statement (write.c:956-963)") {
    val schema = StructType(Seq(StructField("s", StringType)))
    val rows = Seq(Row("a" * 300), Row("b"), Row("c"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = Files.createTempDirectory("graft_big_").toString
    SqlInsertWriter.write(df, "db", "t", dir,
      SqlInsertWriter.Options(statementSize = 100))
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".sql")).head
    val stmts = Files.readString(f.toPath).split(";\n").filter(_.nonEmpty)
    // oversized row alone in statement 1; b and c pack together after
    assert(stmts.length === 2)
    assert(stmts(0).contains("a" * 300))
    assert(stmts(1).contains("\"b\"") && stmts(1).contains("\"c\""))
    assert(SqlInsertReader.read(spark, dir, schema).count() === 3)
  }

  test("custom delimiters reshape the SQL statement byte-for-byte") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(2L, "b")), 1), schema)
    val dir = Files.createTempDirectory("graft_knob_").toString
    val fmt = RowFormat.resolve(RowFormat.SqlKind, RowFormat.Knobs(
      linesStartingBy = Some("ROW("),
      linesTerminatedBy = Some(")"),
      statementTerminatedBy = Some(";\\n")))
    SqlInsertWriter.write(df, "db", "t", dir,
      SqlInsertWriter.Options(format = fmt, completeInsert = false))
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".sql")).head
    assert(Files.readString(f.toPath) ===
      "INSERT INTO `t` VALUESROW(1,\"a\"),ROW(2,\"b\");\n")
  }
}

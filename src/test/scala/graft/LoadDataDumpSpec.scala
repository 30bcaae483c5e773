package graft

import graft.sources.{LoadDataReader, LoadDataWriter, RowFormat}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The LOAD-DATA/CSV data-file byte contract: the writer port of
  * write_load_data_column_into_string (mydumper_write.c:653-674) and a
  * reader implementing MySQL's LOAD DATA field semantics — producer and
  * consumer tested as a pair. */
class LoadDataDumpSpec extends AnyFunSuite with SparkTestBase {

  private def writeOne(rows: Seq[Row], schema: StructType,
      opts: LoadDataWriter.Options): (String, String) = {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = Files.createTempDirectory("graft_ld_").toString
    LoadDataWriter.write(df, "db", "t", dir, opts)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".dat")).head
    (dir, Files.readString(f.toPath))
  }

  test("LOAD_DATA defaults: tab-separated, no enclosure, \\N nulls, .dat name") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("f", DoubleType)))
    val (dir, text) = writeOne(
      Seq(Row(1L, "ab", 1.5), Row(2L, null, null)),
      schema, LoadDataWriter.Options())
    // bigint bare; string AND double enclosed — but enclosure is "" at
    // LOAD_DATA defaults, so they render bare too; NULL is \N
    assert(text === "1\tab\t1.5\n2\t\\N\t\\N\n")
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.matches("db\\.t\\.\\d{5}\\.dat")), files.mkString(","))
  }

  test("CSV defaults: only LONG/LONGLONG/INT24/SHORT go bare — TINY is enclosed") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("sh", ShortType),
      StructField("ti", ByteType), StructField("d", DoubleType),
      StructField("dec", DecimalType(6, 2)), StructField("s", StringType)))
    val (_, text) = writeOne(
      Seq(Row(7, 3.toShort, 5.toByte, 2.5, new java.math.BigDecimal("12.34"), "x")),
      schema,
      LoadDataWriter.Options(format = RowFormat.CsvDefaults))
    // the :661 type list omits TINY, FLOAT, DOUBLE, DECIMAL → enclosed
    assert(text === "7,3,\"5\",\"2.5\",\"12.34\",\"x\"\n")
  }

  test("terminator inside data is escape-char-escaped even when enclosed") {
    val schema = StructType(Seq(StructField("s", StringType)))
    val (dir, text) = writeOne(Seq(Row("a,b\nc\"d")), schema,
      LoadDataWriter.Options(format = RowFormat.CsvDefaults))
    // mysql_real_escape_string handles \n and ", then
    // m_escape_char_with_char escapes the comma (write.c:668)
    assert(text === "\"a\\,b\\nc\\\"d\"\n")
    val back = LoadDataReader.read(spark, dir, schema,
      LoadDataWriter.Options(format = RowFormat.CsvDefaults))
    assert(back.collect().map(_.getString(0)).toSeq === Seq("a,b\nc\"d"))
  }

  test("custom escape char replaces the backslashes (write.c:667)") {
    val schema = StructType(Seq(StructField("s", StringType)))
    val fmt = RowFormat.resolve(RowFormat.CsvKind,
      RowFormat.Knobs(fieldsEscapedBy = Some("|")))
    val (dir, text) = writeOne(Seq(Row("a,b\nc")), schema,
      LoadDataWriter.Options(format = fmt))
    assert(text === "\"a|,b|nc\"\n")
    val back = LoadDataReader.read(spark, dir, schema,
      LoadDataWriter.Options(format = fmt))
    assert(back.collect().map(_.getString(0)).toSeq === Seq("a,b\nc"))
  }

  test("hex-blob binaries are bare uppercase hex and round-trip via UNHEX semantics") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("b", BinaryType)))
    val all = Array.tabulate(256)(_.toByte)
    val (dir, text) = writeOne(
      Seq(Row(1L, Array[Byte](0x0a, 0x7f.toByte, 0xff.toByte)), Row(2L, all)),
      schema, LoadDataWriter.Options())
    assert(text.startsWith("1\t0A7FFF\n"), text.take(40))
    val back = LoadDataReader.read(spark, dir, schema).orderBy("id").collect()
    assert(back(0).getAs[Array[Byte]]("b").toSeq === Seq[Byte](0x0a, 0x7f, 0xff.toByte))
    assert(back(1).getAs[Array[Byte]]("b").toSeq === all.toSeq)
  }

  test("header row: enclosed column names, first line of every file (write.c:581-595)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val (dir, text) = writeOne(Seq(Row(1L, "a")), schema,
      LoadDataWriter.Options(format = RowFormat.CsvDefaults, header = true))
    assert(text === "\"id\",\"s\"\n1,\"a\"\n")
    val back = LoadDataReader.read(spark, dir, schema,
      LoadDataWriter.Options(format = RowFormat.CsvDefaults, header = true))
    assert(back.count() === 1L)
  }

  test("full-fidelity round trip across types, empties, and hostile strings") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("ti", ByteType), StructField("d", DoubleType),
      StructField("dt", DateType), StructField("b", BinaryType)))
    val rows = Seq(
      Row(1L, "plain", 1.toByte, 1.5, java.sql.Date.valueOf("2024-02-29"),
        "bin".getBytes("UTF-8")),
      Row(2L, "", 0.toByte, -0.25, null, Array[Byte]()),
      Row(3L, "tab\there, comma, \"quote\", back\\slash, nl\n.", null, null,
        java.sql.Date.valueOf("1970-01-01"), null),
      Row(4L, null, 5.toByte, 0.0, null, Array[Byte](0, 1, 2)))
    for (fmt <- Seq(RowFormat.LoadDataDefaults, RowFormat.CsvDefaults)) {
      val opts = LoadDataWriter.Options(format = fmt)
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      val dir = Files.createTempDirectory("graft_ldrt_").toString
      assert(LoadDataWriter.write(df, "db", "t", dir, opts) === 4L)
      val back = LoadDataReader.read(spark, dir, schema, opts)
        .orderBy("id").collect().toSeq
      val want = rows.sortBy(_.getLong(0))
      back.zip(want).foreach { case (g, w) =>
        assert(Option(g.getAs[Array[Byte]](5)).map(_.toSeq) ===
          Option(w.getAs[Array[Byte]](5)).map(_.toSeq), s"fmt=${fmt.kind}")
        assert(g.getAs[String](1) === w.getAs[String](1), s"fmt=${fmt.kind}")
        (3 to 4).foreach(i => assert(g.get(i) === w.get(i), s"fmt=${fmt.kind} col$i"))
      }
    }
  }

  test("empty string vs NULL survive the no-enclosure LOAD_DATA shape") {
    // '' renders as a zero-length field, NULL as \N — MySQL's LOAD DATA
    // distinguishes them; so must the reader
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val (dir, text) = writeOne(Seq(Row(1L, ""), Row(2L, null)), schema,
      LoadDataWriter.Options())
    assert(text === "1\t\n2\t\\N\n")
    val back = LoadDataReader.read(spark, dir, schema).orderBy("id").collect()
    assert(back(0).getString(1) === "")
    assert(back(1).isNullAt(1))
  }
}

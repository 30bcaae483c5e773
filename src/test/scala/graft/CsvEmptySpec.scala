package graft
import org.apache.spark.sql.functions._

/** Empty string vs NULL across the CSV dump surface: NULL has its own
  * dedicated text (\N), so '' must survive a round trip — silently
  * folding it to NULL flips checksums and breaks NOT NULL loads. */
class CsvEmptySpec extends SparkTestBase {
  test("quoted csv round-trip distinguishes empty string from NULL") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("")), (3L, None)).toDF("id", "s")
    val opts = sources.CsvDump.Options()
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_empty_").toString
    sources.CsvDump.write(df, dir, opts)
    val back = sources.CsvDump.reader(spark, opts).schema(df.schema).csv(dir)
      .orderBy("id").collect()
    assert(Option(back(1).getString(1)) === Some(""), "empty string lost")
    assert(Option(back(2).getString(1)) === None, "NULL lost")
  }

  test("load-data file encodes '' and NULL distinctly on disk (MySQL contract)") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("")), (3L, None)).toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_ld_").toString
    sources.CsvDump.write(df, dir, sources.CsvDump.LoadDataDefaults)
    val lines = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).sorted
    // row 2: zero-length field (MySQL loads as ''); row 3: \N (NULL)
    assert(lines.exists(_.matches("""2\t""")), s"'' not zero-length: ${lines.toSeq}")
    assert(lines.exists(_.matches("""3\t\\N""")), s"NULL not \\N: ${lines.toSeq}")
  }
}

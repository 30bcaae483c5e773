package graft
import org.apache.spark.sql.functions._
class LangIdSpec extends SparkTestBase {
  test("withLangId matches the single-expression langId exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val viaExpr = docs.select(col("doc_id"),
      functions.TextFunctions.langId(col("text")).as("lang_pred"))
    val viaFrame = functions.TextFunctions.withLangId(docs, "text")
      .select("doc_id", "lang_pred")
    assert(viaExpr.exceptAll(viaFrame).count() === 0)
    assert(viaFrame.exceptAll(viaExpr).count() === 0)
  }

  test("language-ID actually detects each marker language, including CJK") {
    // \b never fires adjacent to CJK characters (ASCII word-char regex
    // semantics in both engines), so boundary-wrapped zh markers scored
    // 0 on pure Chinese text and "zh" was unreachable before the
    // CJK-bare pattern fix
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog is with that other cat"),
      (2L, "el perro y la casa que por una ventana"),
      (3L, "le chat est avec les amis pour une fete"),
      (4L, "der hund und das haus ist mit ein fenster"),
      (5L, "我的书是好的 我有一本书 他在家里"),
      (6L, "xyzzy plugh 12345")).toDF("doc_id", "text")
    val got = functions.TextFunctions.withLangId(docs, "text")
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de",
      5L -> "zh", 6L -> "und"))
  }

  test("langSegments: run-length segments, dominant share, empty-doc survival") {
    import spark.implicits._
    val en = "the cat and the dog is with that"
    val de = "der hund und die katze ist mit ein"
    val docs = Seq(
      (1L, s"$en\n$en\n$de\n$en"),  // en,en,de,en -> 3 segments, en 3/4
      (2L, s"$de\n$de"),            // one segment
      (3L, ""),                     // no lines
      (4L, s"$en\n\n  \n$de")       // blank lines dropped before RLE
    ).toDF("doc_id", "text")
    val r = graft.functions.TextFunctions
      .langSegments(docs, "text", "doc_id").orderBy("doc_id").collect()
    assert(r(0).getLong(1) === 4L && r(0).getLong(2) === 3L)
    assert(r(0).getString(3) === "en" && r(0).getLong(4) === 750L)
    assert(r(1).getLong(2) === 1L && r(1).getString(3) === "de" &&
      r(1).getLong(4) === 1000L)
    assert(r(2).getLong(1) === 0L && r(2).getLong(2) === 0L &&
      r(2).getString(3) === "und" && r(2).getLong(4) === 0L)
    assert(r(3).getLong(1) === 2L && r(3).getLong(2) === 2L,
      "blank lines must not split or pad segments")
  }

  test("langSegments dominant tie breaks deterministically toward the " +
      "lexicographically larger lang (max(struct) contract)") {
    import spark.implicits._
    val docs = Seq((1L, "the cat and the dog is with that\n" +
      "der hund und die katze ist mit ein")).toDF("doc_id", "text")
    val r = graft.functions.TextFunctions
      .langSegments(docs, "text", "doc_id").collect()(0)
    assert(r.getString(3) === "en", "en > de lexicographically on a 1-1 tie")
    assert(r.getLong(4) === 500L)
  }
}

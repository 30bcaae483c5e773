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
}

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
}

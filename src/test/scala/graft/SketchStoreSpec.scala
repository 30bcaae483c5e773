package graft

import graft.operators.SketchStore
import org.apache.spark.sql.functions._

/** Mergeable HLL sketch store: merged-equals-one-shot EXACT equality
  * (register max is partitioning-invariant), replay idempotence, and
  * estimate accuracy against true distinct counts. */
class SketchStoreSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sf)

  private def collectEst(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("two-batch store estimates EQUAL the one-shot sketch exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_").toString + "/s"
    SketchStore.writeDistinct(docs.where(col("doc_id") % 2 === 0),
      "text", "lang", dir, batchId = "even")
    SketchStore.appendDistinct(docs.where(col("doc_id") % 2 === 1),
      "text", "lang", dir, batchId = "odd")
    val merged = collectEst(SketchStore.estimateDistinct(spark, dir, "lang"))
    val direct = collectEst(SketchStore.distinctDirect(docs, "text", "lang"))
    assert(merged === direct,
      "HLL register max must make merged == one-shot, not approximately")
    assert(merged.nonEmpty)
  }

  test("a replayed batch is a no-op (register max is idempotent)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_").toString + "/s"
    SketchStore.writeDistinct(docs, "text", "lang", dir, batchId = "b0")
    val before = collectEst(SketchStore.estimateDistinct(spark, dir, "lang"))
    SketchStore.appendDistinct(docs, "text", "lang", dir, batchId = "b0")
    val after = collectEst(SketchStore.estimateDistinct(spark, dir, "lang"))
    assert(before === after, "merging the same sketch twice must change nothing")
  }

  test("estimates land within HLL error of the true distinct counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_").toString + "/s"
    SketchStore.writeDistinct(docs, "text", "lang", dir)
    val est = collectEst(SketchStore.estimateDistinct(spark, dir, "lang"))
    val truth = docs.groupBy("lang").agg(countDistinct("text").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (lang, n) =>
      val e = est(lang)
      assert(math.abs(e - n) <= math.max(2L, (n * 0.05).toLong),
        s"$lang: estimate $e vs true $n outside 5%")
    }
  }
}

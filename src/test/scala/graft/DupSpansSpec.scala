package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Substring-level dedup semantics on a constructed corpus: a shared
  * boilerplate block inside otherwise-distinct documents must surface
  * as duplicated spans; unique text must not. */
class DupSpansSpec extends SparkTestBase {

  private val boiler = "this content is licensed under the creative commons attribution share alike"

  test("shared boilerplate inside distinct docs surfaces; unique text does not") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"alpha beta gamma delta $boiler epsilon zeta"),
      (2L, s"one two three four five six seven $boiler"),
      (3L, "completely unique text with no repeated block against others " +
        "written entirely fresh for this row of the corpus table")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "text", "doc_id", window = 8)
      .collect()
    // boiler is 11 words -> 4 duplicated 8-word windows, each in docs 1+2
    assert(spans.length === 4, spans.mkString("\n"))
    assert(spans.forall(r => r.getAs[Long]("n_docs") === 2L))
    assert(spans.forall(r => r.getAs[Long]("keep_id") === 1L))
  }

  test("spanDupRatio: boilerplate-dominated doc scores high, fresh doc zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, boiler),                                   // 11 words, all boiler
      (2L, s"$boiler plus a few original words here"),
      (3L, "entirely original content that matches no other row of the corpus")
    ).toDF("doc_id", "text")
    val r = Dedup.spanDupRatio(docs, "text", "doc_id", window = 8)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("dup_ratio")).toMap
    assert(r(1L) === 1.0, s"pure boilerplate must score 1.0: $r")
    assert(r(2L) > 0.0 && r(2L) < 1.0, s"mixed doc strictly between: $r")
    assert(r(3L) === 0.0, s"original doc must score 0.0: $r")
  }

  test("a span repeated only WITHIN one doc stays below the cross-doc bar") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "other words entirely distinct from the first document here now")
    ).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(docs, "text", "doc_id", window = 8)
      .count() === 0)
    // but minDocs = 1 reports the intra-doc repetition
    val intra = Dedup.duplicatedSpans(docs, "text", "doc_id", window = 8,
      minDocs = 1).where(col("n_occurrences") > 1)
    assert(intra.count() === 1) // all 5 windows of doc 1 are the same span
  }
}

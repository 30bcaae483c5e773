package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Hashed linear quality classifier: the zero-shuffle inline scorer and
  * the broadcast-table scorer must be value-identical (same model), the
  * arithmetic must be exactly integer, and edge docs (empty, null-ish
  * whitespace) must survive with zero scores. */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "spark catalyst tungsten codegen shuffle exchange"),
    (3L, ""),
    (4L, "   "),
    (5L, "single"),
    (6L, "the the the the the")
  ).toDF("doc_id", "text")

  test("inline and table scorers are value-identical on the hash model") {
    val a = QualityClassifier.scoreInline(docs, "text", "doc_id", 512)
      .orderBy("doc_id").collect()
    val b = QualityClassifier.scoreWithTable(docs, "text", "doc_id",
      QualityClassifier.hashWeightTable(spark, 512), 512)
      .orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("empty / whitespace docs score zero features and keep by default") {
    val r = QualityClassifier.scoreInline(docs, "text", "doc_id", 512)
      .where(col("doc_id").isin(3L, 4L)).orderBy("doc_id").collect()
    r.foreach { row =>
      assert(row.getLong(1) === 0L, "n_feats")
      assert(row.getLong(2) === 0L, "score_milli")
      assert(row.getLong(3) === 0L, "avg_micro")
      assert(row.getBoolean(4), "keep (0 >= 0*0)")
    }
  }

  test("repeated token scores exactly n times its bucket weight") {
    val one = QualityClassifier.scoreInline(
      Seq((1L, "the")).toDF("doc_id", "text"), "text", "doc_id", 512)
      .collect()(0).getLong(2)
    val five = QualityClassifier.scoreInline(
      Seq((1L, "the the the the the")).toDF("doc_id", "text"),
      "text", "doc_id", 512).collect()(0)
    assert(five.getLong(1) === 5L)
    assert(five.getLong(2) === 5L * one)
    assert(five.getLong(3) === math.floor(one * 1000.0).toLong,
      "per-feature average is the single-token weight in micro units")
  }

  test("threshold moves the keep verdict as an integer compare") {
    val scored = QualityClassifier.scoreInline(docs, "text", "doc_id", 512,
      thresholdMilli = 1000L).where(col("n_feats") > 0).collect()
    scored.foreach { r =>
      assert(r.getBoolean(4) === (r.getLong(2) >= 1000L * r.getLong(1)))
    }
  }

  test("sparse learned table: absent buckets weigh 0, tokens still count") {
    val full = QualityClassifier.hashWeightTable(spark, 512)
    val sparse = full.where(col("bucket") % 2 === 0) // half the model gone
    val a = QualityClassifier.scoreWithTable(docs, "text", "doc_id",
      sparse, 512).orderBy("doc_id").collect()
    val b = QualityClassifier.scoreWithTable(docs, "text", "doc_id",
      full, 512).orderBy("doc_id").collect()
    a.zip(b).foreach { case (s, f) =>
      assert(s.getLong(1) === f.getLong(1),
        "n_feats must not shrink when buckets are absent")
    }
    // doc 6 is 'the' x5: one bucket — score is either unchanged (bucket
    // present) or exactly 0 (absent), never a dropped-feature hybrid
    val one = QualityClassifier.bucket(lit("the"), 512)
    val present = spark.range(1).select(one.as("b")).collect()(0).getLong(0) % 2 == 0
    val s6 = a.find(_.getLong(0) == 6L).get
    val f6 = b.find(_.getLong(0) == 6L).get
    assert(if (present) s6.getLong(2) === f6.getLong(2) else s6.getLong(2) === 0L)
  }

  test("hash weights stay in [-1000, 1000] milli and the table has nBuckets rows") {
    val w = QualityClassifier.hashWeightTable(spark, 256)
    assert(w.count() === 256L)
    val mm = w.agg(min("w_milli"), max("w_milli")).collect()(0)
    assert(mm.getLong(0) >= -1000L && mm.getLong(1) <= 1000L)
  }

  test("keepFilter keeps exactly the scoreInline keep && n_feats > 0 rows") {
    // the round-15 inline filter (assembly chain: no score/join-back) —
    // pin it against the scorer's verdict at both the default and a
    // binding threshold
    for (th <- Seq(0L, 1000L)) {
      val expected = QualityClassifier
        .scoreInline(docs, "text", "doc_id", 512, thresholdMilli = th)
        .where(col("keep") && col("n_feats") > 0)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val got = QualityClassifier
        .keepFilter(docs, "text", 512, thresholdMilli = th)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === expected, s"thresholdMilli=$th")
    }
  }
}

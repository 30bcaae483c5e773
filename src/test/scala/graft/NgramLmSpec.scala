package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._

/** Stupid-backoff LM scoring semantics on a corpus small enough to check
  * by hand: seen-bigram, seen-unigram-backoff, OOV-floor, and the
  * degenerate sub-two-token document all exercise distinct paths. */
class NgramLmSpec extends SparkTestBase {

  private def fixed(p: Double): Long = math.floor(math.log(p) * 10000.0).toLong

  test("backoff paths score hand-computed fixed-point log-probs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b"), // train: bigrams (a,b)x2, (b,a)
      (1L, "a b c"),   // train: (a,b), (b,c)
      (2L, "a b z"),   // test: (a,b) seen; (b,z) OOV floor
      (3L, "x")        // test: no bigrams
    ).toDF("doc_id", "text")
    val out = NgramLm.score(docs, "text", "doc_id", col("doc_id") < 2)
      .orderBy("doc_id").collect()
    // train tokens: a b a b a b c -> T=7, c1(a)=3 c1(b)=3 c1(c)=1
    // bigram counts: (a,b)=3 (b,a)=1 (b,c)=1
    val pAB = 3.0 / 3.0; val pBA = 1.0 / 3.0; val pBC = 1.0 / 3.0
    val pOov = (0.4 * 1.0) / 7.0
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getLong(2) === fixed(pAB) * 2 + fixed(pBA))
    assert(out(1).getLong(1) === 2L)
    assert(out(1).getLong(2) === fixed(pAB) + fixed(pBC))
    assert(out(2).getLong(1) === 2L)
    assert(out(2).getLong(2) === fixed(pAB) + fixed(pOov))
    assert(out(3).getLong(1) === 0L && out(3).getLong(2) === 0L)
  }

  test("seen-unigram backoff uses 0.4*c1(w2)/T, not the OOV floor") {
    import spark.implicits._
    // bigram (c,a) never seen in train, but both unigrams are
    val docs = Seq(
      (0L, "a b c d"),
      (2L, "c a")
    ).toDF("doc_id", "text")
    val out = NgramLm.score(docs, "text", "doc_id", col("doc_id") === 0)
      .orderBy("doc_id").collect()
    // T=4, c1(a)=1; backoff p = 0.4*1/4
    assert(out(1).getLong(2) === fixed((0.4 * 1.0) / 4.0))
  }

  test("trainPred may reference any docs column, not just the id") {
    import spark.implicits._
    // regression: the predicate used to be applied to the projected
    // bigram frame (id, w1, w2 only), so anything beyond the id column
    // threw UNRESOLVED_COLUMN
    val docs = Seq((0L, "a b c d"), (1L, "xx"), (2L, "c a"))
      .toDF("doc_id", "text")
    val out = NgramLm.score(docs, "text", "doc_id",
      length(col("text")) > 3).orderBy("doc_id").collect()
    // only doc 0 trains (len 7): same counts as the seen-unigram case
    assert(out(2).getLong(2) === fixed((0.4 * 1.0) / 4.0))
  }

  test("training docs outscore gibberish on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val scored = NgramLm.score(docs, "text", "doc_id", col("doc_id") % 10 < 8)
    val means = scored.where(col("n_bigrams") > 0)
      .withColumn("mean_lp", col("lp_sum").cast("double") / col("n_bigrams"))
      .agg(
        avg(when(col("doc_id") % 10 < 8, col("mean_lp"))).as("train"),
        avg(when(col("doc_id") % 10 >= 8, col("mean_lp"))).as("held"))
      .head()
    // held-out docs pay backoff penalties; train docs never do
    assert(means.getDouble(0) > means.getDouble(1),
      s"train ${means.getDouble(0)} vs held ${means.getDouble(1)}")
  }
}

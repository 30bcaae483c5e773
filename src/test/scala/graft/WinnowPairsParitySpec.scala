package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity pin for the round-16 winnowPairs restructure (per-doc
  * fingerprint sets + nf derived ROW-LOCALLY from the pre-explode key
  * array, one shared fp exchange — guide §2.4): scores must equal the
  * round-13 form computed from the PUBLIC primitive
  * ([[Dedup.winnowFingerprints]]): distinct (doc, fp) → per-doc counts
  * → document-frequency cap → pair join → shared / min(nf) overlap.
  * The corpus deliberately includes: a fingerprint selected at TWO
  * positions of one doc (the per-doc distinct), a boilerplate
  * fingerprint above the df cap (stop-fingerprint removal), and pairs
  * on both sides of minShared. */
class WinnowPairsParitySpec extends SparkTestBase {

  private def reference(docs: DataFrame, k: Int, w: Int, minShared: Int,
      maxDocsPerFp: Int): Set[(Long, Long, Long, Double)] = {
    val fps = Dedup.winnowFingerprints(docs, "text", "doc_id", k, w)
      .select(col("doc_id"), col("fp")).distinct()
    val nf = fps.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    val liveFps = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocsPerFp).select("fp")
    val live = fps.join(liveFps, Seq("fp"))
    val pairs = live.select(col("doc_id").as("id1"), col("fp"))
      .join(live.select(col("doc_id").as("id2"), col("fp")), Seq("fp"))
      .where(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    pairs
      .join(nf.select(col("doc_id").as("id1"), col("nf").as("nf1")), Seq("id1"))
      .join(nf.select(col("doc_id").as("id2"), col("nf").as("nf2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("shared"),
        (floor(col("shared") / least(col("nf1"), col("nf2")) * 10000.0)
          / 10000.0).as("overlap"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
  }

  test("winnowPairs equals the reference composition over " +
      "winnowFingerprints (per-doc dedup, df cap, overlap score)") {
    import spark.implicits._
    val boiler = "all rights reserved by the site owner and operators"
    val a = "the quick brown fox jumps over the lazy dog near a river bank today"
    val b = "the quick brown fox jumps over the lazy dog near a mountain trail today"
    val c = "completely different content about spark shuffle exchange reuse and joins"
    // repeat a phrase inside ONE doc so a fingerprint is selected at
    // two positions (per-doc distinct must collapse it)
    val rep = s"$a $a"
    val docs = (Seq.tabulate(6)(i => (i.toLong, s"$boiler $a variant $i")) ++
      Seq((10L, rep), (11L, b), (12L, c), (13L, s"$boiler $c")))
      .toDF("doc_id", "text")
    for ((minShared, cap) <- Seq((1, 3), (2, 100), (1, 100))) {
      val got = Dedup.winnowPairs(docs, "text", "doc_id", k = 3, w = 2,
        minShared = minShared, maxDocsPerFp = cap)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val want = reference(docs, k = 3, w = 2, minShared, cap)
      assert(got == want, s"minShared=$minShared cap=$cap " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty || minShared > 1)
    }
  }
}

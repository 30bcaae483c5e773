package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR semantics (Xie et al. 2023): target-likeness separation, the
  * smoothed complete ratio table, the order-free fixed-point weight
  * contract, and seeded Gumbel resampling determinism. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 256

  // target reads like "wiki"; raw is a mix of target-like and junk docs
  private val target = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "the sun rises over the quiet river valley"),
    (102L, "a history of the river valley and the fox")
  ).toDF("doc_id", "text")
  private val raw = Seq(
    (0L, "the quick brown fox by the river"),        // target-like
    (1L, "the lazy dog sleeps in the sun"),          // target-like
    (2L, "buy buy buy cheap pills pills now now"),   // junk
    (3L, "zzz qqq xxx kkk vvv www yyy")               // junk, novel tokens
  ).toDF("doc_id", "text")

  private def weights() = {
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", B,
      portableHash = true)
    Dsir.importanceWeights(raw, "text", "doc_id", ratios, B,
      portableHash = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("target-like raw docs outweigh junk (mean per-feature log-ratio)") {
    val w = weights()
    // normalize by feature count: weight is a sum over n_feats features
    def mean(id: Long) = w(id)._2.toDouble / w(id)._1
    assert(mean(0L) > mean(2L) && mean(1L) > mean(2L),
      s"target-like docs must out-score the spam doc: $w")
    assert(mean(0L) > mean(3L) && mean(1L) > mean(3L),
      s"target-like docs must out-score the novel-token doc: $w")
  }

  test("ratio table is complete over the bucket space with smoothed tails") {
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", B,
        portableHash = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ratios.size === B, "one row per bucket, seen or not")
    // a bucket untouched by BOTH corpora carries the smoothed constant
    // ln(1/(Tt+B)) - ln(1/(Tr+B)), not zero
    val tt = featureCount(target)
    val tr = featureCount(raw)
    val expectedUnseen = math.floor(
      (math.log(1.0 / (tt + B)) - math.log(1.0 / (tr + B))) * Dsir.LogScale).toLong
    val unseen = ratios.values.groupBy(identity).maxBy(_._2.size)._1
    assert(unseen === expectedUnseen,
      s"modal (unseen-bucket) ratio $unseen != smoothed constant $expectedUnseen")
  }

  test("weights match an independent driver-side reference") {
    // re-derives hashing, smoothing, and the fixed-point sum from
    // scratch — no shared code with the operator
    def feats(text: String): Seq[String] = {
      val w = text.trim.toLowerCase.split("\\s+").toSeq
      w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % B
    }
    val tDocs = Seq("the quick brown fox jumps over the lazy dog",
      "the sun rises over the quiet river valley",
      "a history of the river valley and the fox")
    val rDocs = Map(
      0L -> "the quick brown fox by the river",
      1L -> "the lazy dog sleeps in the sun",
      2L -> "buy buy buy cheap pills pills now now",
      3L -> "zzz qqq xxx kkk vvv www yyy")
    val ct = tDocs.flatMap(feats).map(bucket).groupBy(identity).map { case (k, v) => k -> v.size }
    val cr = rDocs.values.flatMap(feats).map(bucket).groupBy(identity).map { case (k, v) => k -> v.size }
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    def lrFp(b: Long): Long = math.floor(
      (math.log((ct.getOrElse(b, 0) + 1).toDouble / (tt + B))
        - math.log((cr.getOrElse(b, 0) + 1).toDouble / (tr + B))) * Dsir.LogScale).toLong
    val expected = rDocs.map { case (id, t) =>
      val bs = feats(t).map(bucket)
      id -> (bs.size.toLong, bs.map(lrFp).sum)
    }
    assert(weights() === expected)
  }

  test("zero-feature docs come back as (0, 0), not dropped") {
    val withNull = raw.unionByName(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", B)
    val w = Dsir.importanceWeights(withNull, "text", "doc_id", ratios, B)
      .where(col("doc_id") === 9L).collect()
    assert(w.length === 1 && w(0).getLong(1) === 0L && w(0).getLong(2) === 0L)
  }

  test("gumbel top-k: seed-deterministic, k-bounded, seed-sensitive") {
    val ratios = Dsir.logRatios(target, raw, "text", "doc_id", B)
    val w = Dsir.importanceWeights(raw, "text", "doc_id", ratios, B)
    def sel(seed: String) =
      Dsir.gumbelTopK(w, "doc_id", 2, seed).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = sel("s1"); val b = sel("s1"); val c = sel("s2")
    assert(a === b, "same seed must select identical docs and keys")
    assert(a.length === 2)
    assert(a.map(_._2) !== c.map(_._2),
      "a different seed must perturb the keys")
  }

  test("hash tiers differ only in bucketing: n_feats identical, both separate") {
    // production tier (xxhash64) vs oracle tier (md5): same feature
    // stream, different fold — feature counts must match exactly and
    // the target-likeness ordering must survive either fold
    val rp = Dsir.logRatios(target, raw, "text", "doc_id", B, portableHash = true)
    val rx = Dsir.logRatios(target, raw, "text", "doc_id", B)
    val wp = Dsir.importanceWeights(raw, "text", "doc_id", rp, B, portableHash = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wx = Dsir.importanceWeights(raw, "text", "doc_id", rx, B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(wp.view.mapValues(_._1).toMap === wx.view.mapValues(_._1).toMap,
      "feature counts are hash-independent")
    def mean(w: Map[Long, (Long, Long)], id: Long) = w(id)._2.toDouble / w(id)._1
    for (good <- Seq(0L, 1L); junk <- Seq(2L, 3L))
      assert(mean(wx, good) > mean(wx, junk),
        s"xxhash tier must also separate: $wx")
  }

  private def featureCount(df: org.apache.spark.sql.DataFrame): Long = {
    val texts = df.select("text").collect().map(_.getString(0))
    texts.map { t =>
      val n = t.trim.toLowerCase.split("\\s+").length
      n + math.max(0, n - 1)
    }.sum.toLong
  }
}

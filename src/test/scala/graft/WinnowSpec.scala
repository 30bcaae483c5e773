package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Winnowing (Schleimer et al. 2003): the coverage guarantee, the
  * rightmost-min tie rule, density, and the independent reference. */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 5
  private val w = 4

  private def fps(rows: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] =
    Dedup.winnowFingerprints(rows.toDF("doc_id", "text"), "text", "doc_id",
        k, w)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("matches an independent driver-side reference (min, rightmost tie)") {
    val docs = Seq(
      0L -> "a b c d e f g h i j k l m",
      1L -> "the cat sat on the mat while the dog sat on the log today",
      2L -> "x x x x x x x x x x") // all grams identical: tie everywhere
    def reference(text: String): Set[(Long, Long)] = {
      val wd = text.trim.toLowerCase.split("\\s+")
      if (wd.length < k + w - 1) return Set.empty
      val hs = (0 to wd.length - k).map { i =>
        val gram = wd.slice(i, i + k).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md.take(7), 16)
      }
      (0 to hs.length - w).map { a =>
        // rightmost index of the window minimum
        val win = hs.slice(a, a + w)
        val m = win.min
        val pos = a + win.lastIndexOf(m)
        (pos.toLong, m)
      }.toSet
    }
    val got = fps(docs)
    docs.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) === reference(t),
        s"doc $id winnow mismatch")
    }
    // the all-identical doc: rightmost tie-break selects exactly the
    // LAST position of each window — positions w-1..m-1, one fp
    assert(got(2L).map(_._2).size === 1)
    assert(got(2L).map(_._1) === (w - 1 until (10 - k + 1)).map(_.toLong).toSet)
  }

  test("guarantee: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 = w+k-1
    val docs = Seq(
      10L -> s"completely unrelated prefix words here $shared",
      11L -> s"$shared and then a different suffix entirely follows")
    val got = fps(docs)
    val common = got(10L).map(_._2) intersect got(11L).map(_._2)
    assert(common.nonEmpty,
      s"winnowing guarantee violated: no shared fp across a shared run")
  }

  test("density: selected positions are a small fraction of grams") {
    val docs = Tables.documents(spark, sf).limit(200)
    val sel = Dedup.winnowFingerprints(docs, "text", "doc_id", k, w)
      .groupBy("doc_id").agg(count(lit(1)).as("n_sel"))
    val grams = docs.select(col("doc_id"),
      (size(split(lower(trim(col("text"))), "\\s+")) - (k - 1)).as("n_grams"))
    val r = sel.join(grams, "doc_id")
      .agg(sum("n_sel").cast("double") / sum("n_grams")).head().getDouble(0)
    // expected density 2/(w+1) = 0.4; distinct-dedup pushes it lower
    assert(r > 0.1 && r < 0.6, s"winnow density $r outside sanity band")
  }

  test("winnowPairs recovers >=90% of the verified near-dup pairs") {
    // cross-operator recall vs the exact-shingle ngram path. NOT 100%
    // by design: a Jaccard-0.5 pair may share only SCATTERED 5-gram
    // shingles — the winnow guarantee needs a contiguous run of
    // w+k-1 = 8 tokens, so run-less pairs can legitimately miss
    // (measured: exactly one such pair in this corpus, J≈0.5 with no
    // 8-token run)
    val docs = Tables.documents(spark, sf)
    val truth = Dedup.ngramJaccardPairs(docs, "text", "doc_id")
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.winnowPairs(docs, "text", "doc_id")
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test premise: corpus contains near-dups")
    val recall = (truth intersect got).size.toDouble / truth.size
    assert(recall >= 0.9,
      s"winnow recall $recall; missed: ${(truth -- got).take(5)}")
  }

  test("the df cap drops stop-fingerprints before pairing") {
    import spark.implicits._
    // 30 IDENTICAL boilerplate docs: every selected fp has df=30, so
    // with maxDocsPerFp=10 nothing pairs; lifting the cap pairs all
    // C(30,2). The cap applies to SELECTED-set document frequency (the
    // index, as in MOSS) — which is the quantity that drives the
    // pair-join blowup.
    val docs = (0L until 30L).map(i =>
      (i, "all rights reserved copyright notice footer text here"))
      .toDF("doc_id", "text")
    assert(Dedup.winnowPairs(docs, "text", "doc_id",
      minShared = 1, maxDocsPerFp = 10).count() === 0,
      "df-capped boilerplate must not explode into O(n^2) pairs")
    assert(Dedup.winnowPairs(docs, "text", "doc_id",
      minShared = 1, maxDocsPerFp = 100).count() === 435L)
  }

  test("short docs (< w+k-1 tokens) emit nothing") {
    val got = fps(Seq(5L -> "only seven words in this tiny doc"))
    assert(got.getOrElse(5L, Set.empty).isEmpty)
  }
}

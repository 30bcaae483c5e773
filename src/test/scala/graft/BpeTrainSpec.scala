package graft

import graft.operators.BpeTrain
import org.apache.spark.sql.functions._

/** BPE training semantics: hand-checkable merges on a tiny corpus, the
  * classic overlapping-pair rule, early exhaustion, and the apply-side
  * reconstruction property (subwords concatenate back to the word). */
class BpeTrainSpec extends SparkTestBase {

  test("merges learn the most frequent pair first, with deterministic ties") {
    import spark.implicits._
    // "aaab" x3: pairs (a,a)x2, (a,b) per word -> (a,a) f=6 wins round 1;
    // round 2: " aa a b </w> " pairs (aa,a) f=3, (a,b) f=3, (b,</w>) f=3
    // -> tie broken by lhs ASC: ("a","b") < ("aa","a") < ("b","</w>")
    val docs = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    val m = BpeTrain.merges(docs, "text", 2).orderBy("rank").collect()
    assert(m(0).getString(1) === "a" && m(0).getString(2) === "a" &&
      m(0).getLong(3) === 6L, m.mkString(";"))
    assert(m(1).getString(1) === "a" && m(1).getString(2) === "b" &&
      m(1).getLong(3) === 3L, m.mkString(";"))
  }

  test("overlapping pairs merge left-to-right non-overlapping (aaa -> aa a)") {
    import spark.implicits._
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m = BpeTrain.merges(docs, "text", 1).collect()
    // pairs of " a  a  a  </w> ": (a,a)x2 beats (a,</w>)x1
    assert(m(0).getString(1) === "a" && m(0).getString(2) === "a" &&
      m(0).getLong(3) === 2L)
  }

  test("immediately-repeating pairs all merge in one pass (abab -> ab ab)") {
    import spark.implicits._
    // the double-space separator is what makes this work: a match
    // consumes one space from each boundary, so back-to-back
    // occurrences keep their delimiter — single-space forms lose the
    // shared space and leave "ab a b" (divergent from reference BPE)
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val seg = BpeTrain.segment(docs, "text", Seq(("a", "b")))
    val subs = seg.select("subwords").head().getSeq[String](0)
    assert(subs === Seq("ab", "ab", "</w>"), subs.mkString("|"))
    // and "aaaa" + (a,a) -> aa aa, not aa a a
    val docs2 = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val subs2 = BpeTrain.segment(docs2, "text", Seq(("a", "a")))
      .select("subwords").head().getSeq[String](0)
    assert(subs2 === Seq("aa", "aa", "</w>"), subs2.mkString("|"))
    // odd run stays greedy: "aaa" -> aa a
    val subs3 = BpeTrain.segment(Seq((1L, "aaa")).toDF("doc_id", "text"),
      "text", Seq(("a", "a"))).select("subwords").head().getSeq[String](0)
    assert(subs3 === Seq("aa", "a", "</w>"), subs3.mkString("|"))
  }

  test("training stops early when every word is fully merged") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    // " a b </w> " -> (a,b) -> " ab </w> " -> (ab,</w>) -> one symbol;
    // requesting 10 yields exactly 2 rows
    val m = BpeTrain.merges(docs, "text", 10).collect()
    assert(m.length === 2, m.mkString(";"))
  }

  test("driver fast path and distributed loop learn IDENTICAL merges") {
    // the two-tier switch must be invisible: same pair counts
    // (overlapping adjacencies), same UTF-8 tie order, same greedy
    // replace — pinned on a real corpus slice deep enough to hit ties
    val docs = Tables.documents(spark, sf).limit(200)
    val fast = BpeTrain.merges(docs, "text", 24).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val dist = BpeTrain.merges(docs, "text", 24, driverVocabLimit = 0L)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(fast.toSeq === dist.toSeq)
  }

  test("path parity holds on the 32k-probe's vocabulary shape (stem × " +
      "suffix morphemes, zipf-ish repetition) — the slice spot-check " +
      "backing the SCALE.md bpe_train_32k record") {
    import spark.implicits._
    val sfx = Array("", "s", "ed", "ing", "er", "ly", "tion", "est")
    val docs = (0L until 600L).map { id =>
      val h = graft.functions.Hashing.mix64(id)
      val stemLen = 3 + (h & 3).toInt + ((h >>> 2) & 1).toInt
      val sb = new StringBuilder
      var s = graft.functions.Hashing.mix64(id % 40)
      var i = 0
      while (i < stemLen) { sb += ('a' + ((s >>> (8 * (i % 8))) & 0x7f).toInt % 26).toChar
        if (i % 8 == 7) s = graft.functions.Hashing.mix64(s); i += 1 }
      sb ++= sfx(((h >>> 8) & 7).toInt)
      val reps = 1 + (16 / (1 + (id % 31))).toInt
      (id, Array.fill(reps)(sb.toString).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = BpeTrain.merges(docs, "text", 64).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val dist = BpeTrain.merges(docs, "text", 64, driverVocabLimit = 0L)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(fast.toSeq === dist.toSeq)
    // the batched rounds must actually batch (fewer pair-count rounds
    // than merges) with the learned table still sequential-exact (the
    // parity assert above). Early ranks are the CONFLICT-DENSE worst
    // case — top pairs share the frequent letters — so the ratio here
    // is modest (measured 33 rounds / 64 merges on this fixture); the
    // deep-rank ratio is the SCALE.md round-15 measurement.
    assert(BpeTrain.lastDistributedRounds < 64,
      s"batching inert: ${BpeTrain.lastDistributedRounds} rounds for 64 merges")
  }

  test("BATCHED distributed rounds stay sequential-exact through tie " +
      "boundaries and symbol conflicts (adversarial equal-count fixture)") {
    import spark.implicits._
    // words engineered so the stale ranking carries (a) equal-count
    // DISJOINT pairs (batchable, in-batch tie-break order must hold),
    // (b) an equal-count CONFLICTING pair right at a batch boundary
    // (the strict-gap rule must truncate), and (c) chains where a merge
    // creates a new pair ("xl"+"r" after l,r merge) that a stale-count
    // batch must not outrank. 97/89/83 multiplicities keep counts
    // distinct where distinctness matters and EQUAL where the trap is.
    val words = Seq(
      ("qe we", 97),  // (q,e) and (w,e): equal counts, SHARE e -> conflict
      ("ab ab", 89),  // (a,b) twice per doc
      ("cd", 89),     // (c,d): ties (a,b)? No -- ab occurs 2x89=178
      ("xlr", 83),    // l,r merge creates (x,lr) chain
      ("lr", 83),
      ("mn", 61),
      ("mo", 61)      // (m,n) vs (m,o): share m, equal counts
    ).flatMap { case (t, n) => Seq.fill(n)(t) }
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fast = BpeTrain.merges(words, "text", 16).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val dist = BpeTrain.merges(words, "text", 16, driverVocabLimit = 0L)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(fast.toSeq === dist.toSeq,
      s"batched loop diverged:\nseq:   ${fast.toSeq}\nbatch: ${dist.toSeq}")
  }

  test("the in-memory loop trains 1k merges fast (vocab-bounded rounds)") {
    import spark.implicits._
    // synthetic vocab rich enough to sustain 1000 merges: distinct
    // pseudo-words from a seeded generator (deterministic)
    val rnd = new scala.util.Random(11)
    val alpha = "abcdefghijklmnop"
    val docs = (0 until 4000).map { i =>
      (i.toLong, (0 until 6).map(_ =>
        (0 until (4 + rnd.nextInt(8))).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString).mkString(" "))
    }.toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val m = BpeTrain.merges(docs, "text", 1000).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1000 merges in $secs%.1f s (${m.length} learned)")
    assert(m.length === 1000, s"exhausted at ${m.length}")
    // driver-round-bound would be ~0.1 s/round (100 s); the in-memory
    // loop must stay way under that
    assert(secs < 60.0, f"1k merges took $secs%.1f s — not the fast path?")
  }

  test("segmentLarge (vocab-scale apply) is byte-identical to the replace chain") {
    val docs = Tables.documents(spark, sf).limit(200)
    val table = BpeTrain.merges(docs, "text", 24).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val chain = BpeTrain.segment(docs, "text", table)
      .select("doc_id", "word", "subwords").orderBy("doc_id", "word")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    val large = BpeTrain.segmentLarge(docs, "text", table)
      .select("doc_id", "word", "subwords").orderBy("doc_id", "word")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    assert(chain.toSeq === large.toSeq)
    // overlap semantics too: the spec-pinned replace-chain edge cases
    for ((txt, mt, want) <- Seq(
      ("abab", Seq(("a", "b")), Seq("ab", "ab", "</w>")),
      ("aaaa", Seq(("a", "a")), Seq("aa", "aa", "</w>")),
      ("aaa", Seq(("a", "a")), Seq("aa", "a", "</w>")))) {
      import spark.implicits._
      val got = BpeTrain.segmentLarge(Seq((1L, txt)).toDF("doc_id", "text"),
        "text", mt).select("subwords").head().getSeq[String](0)
      assert(got === want, s"$txt with $mt")
    }
  }

  test("segment applies learned merges and reconstructs words exactly") {
    val docs = Tables.documents(spark, sf).limit(100)
    val table = BpeTrain.merges(docs, "text", 16).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(table.size === 16)
    val seg = BpeTrain.segment(docs, "text", table)
    // lossless: subwords concatenate (minus the </w> marker) back to
    // the word, for every word occurrence in the corpus slice
    val broken = seg.withColumn("rebuilt",
        regexp_replace(concat_ws("", col("subwords")), "</w>$", ""))
      .where(col("rebuilt") =!= col("word"))
    assert(broken.count() === 0)
    // merges actually fire: some word segments to fewer symbols than
    // chars+1 (the unmerged spaced form)
    val fused = seg.where(size(col("subwords")) < length(col("word")) + 1)
    assert(fused.count() > 0, "no merge ever applied")
  }

  test("heap-derived vocab limit: bytes-per-word model, and a lowered " +
      "limit actually ENGAGES the distributed loop (crossover observable)") {
    import spark.implicits._
    // the model: quarter-heap over 2 KiB/word, floored at 10k
    assert(BpeTrain.driverVocabLimitForHeap(32L << 30) === (32L << 30) / 4 / 2048)
    assert(BpeTrain.driverVocabLimitForHeap(8L << 30) === (8L << 30) / 4 / 2048)
    assert(BpeTrain.driverVocabLimitForHeap(1L << 20) === 10000L) // floor
    // crossover: 6 distinct words under a limit of 3 must take the
    // distributed path; the default (heap-derived, >> 6) the driver path
    val docs = Seq("aa ab ba bb ca cb", "aa ab ba bb").toDF("text")
    val viaDriver = BpeTrain.merges(docs, "text", 8)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    assert(!BpeTrain.lastPathDistributed, "default limit must use the driver path")
    val viaDist = BpeTrain.merges(docs, "text", 8, driverVocabLimit = 3L)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    assert(BpeTrain.lastPathDistributed,
      "a limit below the vocab size must engage the distributed loop")
    assert(viaDriver.toSeq === viaDist.toSeq, "paths must agree (parity)")
  }
}

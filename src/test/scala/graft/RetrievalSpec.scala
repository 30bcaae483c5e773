package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** BM25 semantics: tf saturation, length normalization, idf ordering,
  * and the integer-micro determinism contract the value gate relies on. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark spark spark join"),          // dense in query terms
    (1L, "spark and some other words here"), // one hit, longer
    (2L, "join filter"),                     // two distinct terms, short
    (3L, "nothing relevant at all"),         // no hits
    (4L, "rare rare rare rare")              // no hits
  ).toDF("doc_id", "text")

  private def scores(terms: Seq[String]): Map[Long, (Long, Long)] =
    Retrieval.bm25(docs, "text", "doc_id", terms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("docs without query terms never appear; matched counts distinct terms") {
    val s = scores(Seq("spark", "join", "filter"))
    assert(!s.contains(3L) && !s.contains(4L))
    assert(s(0L)._1 === 2L, "doc 0 matches spark + join")
    assert(s(2L)._1 === 2L, "doc 2 matches join + filter")
    assert(s(1L)._1 === 1L)
  }

  test("higher tf and shorter docs score higher; all scores positive") {
    val s = scores(Seq("spark"))
    assert(s(0L)._2 > s(1L)._2,
      "3x tf in a shorter doc must outscore 1x tf in a longer doc")
    assert(s.values.forall(_._2 > 0L), "Okapi +1 idf keeps scores positive")
  }

  test("a rarer term contributes more than a common one (idf ordering)") {
    val common = Seq((0L, "x a"), (1L, "x b"), (2L, "x c"), (3L, "x d"),
      (4L, "y e")).toDF("doc_id", "text")
    val sx = Retrieval.bm25(common, "text", "doc_id", Seq("x"))
      .where(col("doc_id") === 0).head().getLong(2)
    val sy = Retrieval.bm25(common, "text", "doc_id", Seq("y"))
      .where(col("doc_id") === 4).head().getLong(2)
    assert(sy > sx, s"df=1 term must outscore df=4 term: y=$sy x=$sx")
  }

  test("bm25 equals an independent driver-side reference on random corpora") {
    // the reference re-derives every quantity from scratch (no shared
    // code with the operator), so an op-order or aggregation bug in the
    // DataFrame pipeline cannot cancel itself out of the comparison
    val words = Vector("spark", "join", "filter", "a", "b", "c", "dd", "eee")
    val terms = Seq("spark", "join", "filter")
    for (seed <- Seq(1, 2, 3, 4)) {
      val rnd = new scala.util.Random(seed)
      val corpus = (0L until 30L).map(i =>
        i -> (1 to (1 + rnd.nextInt(20)))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" "))
      val tok = corpus.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").toSeq }
      val n = corpus.size.toDouble
      val avgdl = tok.map(_._2.size).sum.toDouble / n
      val dfreq = terms.map(t => t -> tok.count(_._2.contains(t)).toDouble).toMap
      val expect = tok.flatMap { case (id, ws) =>
        val micro = terms.flatMap { t =>
          val tf = ws.count(_ == t).toDouble
          if (tf == 0) None
          else {
            val idf = math.log(1.0 + ((n - dfreq(t)) + 0.5) / (dfreq(t) + 0.5))
            val denom = tf +
              1.2 * ((1.0 - 0.75) + 0.75 * (ws.size.toDouble / avgdl))
            Some(math.floor(idf * ((tf * (1.2 + 1.0)) / denom) * 1000000.0).toLong)
          }
        }
        if (micro.isEmpty) None else Some(id -> (micro.size.toLong, micro.sum))
      }.toMap
      val got = Retrieval.bm25(corpus.toDF("doc_id", "text"), "text",
          "doc_id", terms)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === expect, s"seed=$seed")
    }
  }

  test("a NULL-text doc counts toward N (oracle parity) but never scores") {
    // explode drops the null doc's (absent) tokens, but N is a corpus
    // fact: the oracle counts ALL documents, so the engine must too —
    // deriving N from the token aggregate silently deflated idf/avgdl
    val corpus = Seq((0L, "spark x"), (1L, "spark y z"), (2L, "w"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Retrieval.bm25(corpus, "text", "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!got.contains(3L), "a null doc can never match")
    // exact expectation with N=4 (null counted), tok_total=6, df=2
    def expect(tf: Double, dl: Double): Long = {
      val idf = math.log(1.0 + ((4.0 - 2.0) + 0.5) / (2.0 + 0.5))
      val denom = tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (6.0 / 4.0)))
      math.floor(idf * ((tf * (1.2 + 1.0)) / denom) * 1000000.0).toLong
    }
    assert(got === Map(0L -> expect(1, 2), 1L -> expect(1, 3)))
  }

  test("a repeated query term neither throws nor double-counts") {
    val once = Retrieval.bm25(docs, "text", "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val twice = Retrieval.bm25(docs, "text", "doc_id", Seq("spark", "spark"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(twice === once)
  }

  test("bm25Batch per-query scores equal the single-query operator exactly") {
    // the batching claim: sharing one corpus pass must not move a single
    // micro-point — per-(doc, term) contributions are query-independent
    val queries = Map("a" -> Seq("spark", "join"), "b" -> Seq("filter"))
    val batch = Retrieval.bm25Batch(docs, "text", "doc_id", queries)
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq).toMap
    for ((q, terms) <- queries) {
      val single = Retrieval.bm25(docs, "text", "doc_id", terms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      assert(batch(q) === single, s"query $q diverged from the single path")
    }
  }

  test("rrf: a doc in both lists outscores a doc in one; absent docs contribute 0") {
    val lex = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("doc_id", "rank")
    val den = Seq((11L, 1), (13L, 2)).toDF("doc_id", "rank")
    val f = Retrieval.rrfFuse(Seq(lex, den), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 11: rank 2 lexical + rank 1 dense beats doc 10's rank-1 single list
    assert(f(11L) > f(10L))
    // single-list docs score exactly 1/(60+rank) micro-floored
    assert(f(10L) === math.floor(1.0 / 61.0 * 1e6).toLong)
    assert(f(13L) === math.floor(1.0 / 62.0 * 1e6).toLong)
    assert(f.keySet === Set(10L, 11L, 12L, 13L), "full outer union of lists")
  }

  test("rrf: better rank in either list never scores lower") {
    val lex = Seq((0L, 1), (1L, 2)).toDF("doc_id", "rank")
    val den = Seq((0L, 5), (1L, 5)).toDF("doc_id", "rank")
    val f = Retrieval.rrfFuse(Seq(lex, den), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f(0L) > f(1L))
  }

  test("scores are stable under repartitioning (integer-sum contract)") {
    val base = Retrieval.bm25(docs, "text", "doc_id", Seq("spark", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    val re = Retrieval.bm25(docs.repartition(5), "text", "doc_id",
        Seq("spark", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    assert(base.sameElements(re))
  }
}

package graft

import graft.operators.DocChunker
import org.apache.spark.sql.functions._

class DocChunkerSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, (1 to nTokens).map(i => s"w$i").mkString(" "))

  test("chunking: window starts, overlap, and short-final-window shape") {
    // K=10, overlap=4 -> stride 6. 23 tokens -> nc = 1 + ceil(13/6) = 4
    val df = Seq(doc(1L, 23)).toDF("doc_id", "text")
    val got = DocChunker.chunk(df, "text", "doc_id", chunkTokens = 10, overlap = 4)
      .orderBy("chunk_id").collect()
    assert(got.length === 4)
    assert(got.map(_.getAs[Long]("n_tokens")).toSeq === Seq(10L, 10L, 10L, 5L))
    // chunk 1 starts at token 7 (stride 6, 1-based): w7..w16
    assert(got(1).getAs[String]("chunk_text").startsWith("w7 "))
    assert(got(1).getAs[String]("chunk_text").endsWith(" w16"))
    // last chunk starts at 19: w19..w23 (short, still emitted)
    assert(got(3).getAs[String]("chunk_text") === "w19 w20 w21 w22 w23")
  }

  test("chunking: doc shorter than the window yields exactly one chunk") {
    val df = Seq(doc(1L, 3)).toDF("doc_id", "text")
    val got = DocChunker.chunk(df, "text", "doc_id", 10, 4).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("n_tokens") === 3L)
  }

  test("chunking: every token is covered and consecutive chunks overlap") {
    val df = Seq(doc(7L, 100)).toDF("doc_id", "text")
    val rows = DocChunker.chunk(df, "text", "doc_id", 16, 4)
      .orderBy("chunk_id").collect()
    val seen = rows.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(seen === (1 to 100).map(i => s"w$i").toSet) // lossless cover
    rows.sliding(2).foreach { case Array(a, b) =>
      val at = a.getAs[String]("chunk_text").split(" ").toSet
      val bt = b.getAs[String]("chunk_text").split(" ").toSet
      assert((at intersect bt).size >= 4, "adjacent chunks must overlap")
    }
  }

  test("chunking invariants hold across a (n, K, overlap) grid") {
    // lossless cover, closed-form chunk count, all-full-except-last —
    // one Spark job for the whole grid (docs keyed by combo id)
    val combos = for {
      (k, ov) <- Seq((8, 0), (8, 3), (16, 4), (16, 15), (64, 16))
      n <- Seq(1, 7, 8, 9, 63, 64, 65, 200)
    } yield (k, ov, n)
    combos.zipWithIndex.foreach { case ((k, ov, n), i) =>
      val stride = k - ov
      val df = Seq(doc(i.toLong, n)).toDF("doc_id", "text")
      val rows = DocChunker.chunk(df, "text", "doc_id", k, ov)
        .orderBy("chunk_id").collect()
      val expectChunks =
        if (n <= k) 1 else 1 + math.ceil((n - k).toDouble / stride).toInt
      assert(rows.length === expectChunks, s"combo K=$k ov=$ov n=$n")
      val seen = rows.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
      assert(seen === (1 to n).map(j => s"w$j").toSet,
        s"lost tokens at K=$k ov=$ov n=$n")
      rows.dropRight(1).foreach(r =>
        assert(r.getAs[Long]("n_tokens") === k.toLong,
          s"non-final chunk not full at K=$k ov=$ov n=$n"))
    }
  }

  test("shingles: n-gram count and content") {
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val got = DocChunker.shingles(df, "text", "doc_id", 5)
      .orderBy("shingle").collect().map(_.getAs[String]("shingle"))
    assert(got.toSeq === Seq("a b c d e", "b c d e f"))
    // too-short doc emits nothing
    assert(DocChunker.shingles(Seq((2L, "a b c")).toDF("doc_id", "text"),
      "text", "doc_id", 5).count() === 0)
  }

  test("decontaminate: flags shared 5-grams, reports 0 for clean docs") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "xx the quick brown fox jumps yy"), // shares "the quick brown fox jumps"
      (11L, "entirely different content with no overlap at all")
    ).toDF("doc_id", "text")
    val got = DocChunker.decontaminate(corpus, bench, "text", "doc_id", 5)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((10L, 1L), (11L, 0L)))
    // the 8-byte-key scale path reports the same hits
    val hashed = DocChunker.decontaminate(corpus, bench, "text", "doc_id", 5,
      hashShingles = true)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hashed.toSeq === got.toSeq)
  }
}

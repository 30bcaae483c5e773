package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-scale BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"): learn the
  * top-N byte-pair merges over a document corpus — the step an LLM data
  * pipeline runs once per tokenizer revision, and the one that actually
  * needs the cluster: the corpus scan. After the initial word-count
  * aggregation every iteration runs on the VOCABULARY table (distinct
  * words × counts — bounded by language, not corpus size), so 100× the
  * corpus pays 100× only in the first groupBy; the merge loop's cost is
  * corpus-size-independent.
  *
  * Representation trick that keeps the whole loop in Column expressions
  * AND makes a DuckDB oracle replay possible: a word's symbol sequence
  * is a DOUBLE-space-joined string with single sentinel spaces
  * (`" h  e  l  l  o  </w> "`), and applying merge (l, r) is the
  * literal `replace(s, " l  r ", " lr ")`. The double separator is
  * load-bearing: every symbol boundary carries two spaces, a match
  * consumes ONE from each end, so immediately-repeating pairs still
  * find their delimiter and the scan implements exactly the reference
  * BPE's greedy left-to-right non-overlapping merge — "abab" + (a,b) →
  * "ab ab" (a single-space form loses the shared delimiter and yields
  * "ab a b"), "aaa" + (a,a) → "aa a". Literal replace semantics are
  * identical in Spark and DuckDB; symbols never contain spaces, so a
  * match can only align on symbol boundaries. No UDF anywhere.
  *
  * Each round: pair counts (weighted by word count) → argmax with a
  * total tie-break (freq DESC, then both symbols ASC — deterministic
  * across engines and runs) → one replace over the vocab. The vocab is
  * localCheckpointed per round with tracked release (the
  * Dedup.clusters lifecycle), so round k's pair scan never replays
  * rounds 1..k-1's replaces.
  */
object BpeTrain {

  /** `" h  e  l  l  o  </w> "` — double-space separators, single
    * sentinel spaces (see class doc for why double). */
  private def spacedSymbols(word: org.apache.spark.sql.Column) =
    concat(lit(" "), array_join(split(word, ""), "  "), lit("  </w> "))

  /** Learned merge table: (rank 1..numMerges, lhs, rhs, freq). Stops
    * early if the vocabulary runs out of adjacent pairs (every word
    * fully merged) — rank is then < numMerges. */
  def merges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val wc = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(spacedSymbols(col("w")).as("s"), col("cnt"))

    val sc = spark.sparkContext
    def checkpointTracked(df: DataFrame): (DataFrame, () => Unit) = {
      val before = sc.getPersistentRDDs.keySet
      val cp = df.localCheckpoint()
      val added = (sc.getPersistentRDDs -- before.toSeq).values.toSeq
      (cp, () => added.foreach(_.unpersist(blocking = false)))
    }

    var (vocab, release) = checkpointTracked(wc)
    val learned = scala.collection.mutable.ArrayBuffer.empty[Row]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val pairs = vocab
        .select(col("cnt"), split(trim(col("s")), "  ").as("a"))
        .select(col("cnt"), explode(TextFunctions.adjacentPairs(col("a"))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("f"))
      val best = pairs.orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        k += 1
        learned += Row(k.toLong, l, r, f)
        val merged = vocab.select(
          call_function("replace", col("s"),
            lit(s" $l  $r "), lit(s" $l$r ")).as("s"), col("cnt"))
        val (next, nextRelease) = checkpointTracked(merged)
        release(); vocab = next; release = nextRelease
      }
    }
    release()
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(learned.toSeq).asJava),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
  }

  /** Segment a corpus with a learned merge table — the APPLY side of
    * BPE (what the tokenizer does to new text): explode words, replay
    * the merges in rank order over each word's spaced-symbol form. The
    * merge table rides as a rank-ordered literal replace chain folded
    * into ONE Column expression tree (codegen'd, no UDF, no join) —
    * exactly how a 100 TB tokenization pass wants its merges: a
    * broadcast-free constant in every task. Output: one row per word
    * occurrence, (original id columns…, word, subwords array). */
  def segment(docs: DataFrame, textCol: String,
      mergeTable: Seq[(String, String)], outCol: String = "subwords"): DataFrame = {
    val word = explode(split(lower(trim(col(textCol))), "\\s+")).as("word")
    val appliedAll = mergeTable.foldLeft(spacedSymbols(col("word"))) {
      case (s, (l, r)) =>
        call_function("replace", s, lit(s" $l  $r "), lit(s" $l$r "))
    }
    docs.select(col("*"), word).drop(textCol)
      .withColumn(outCol, split(trim(appliedAll), "  "))
  }
}

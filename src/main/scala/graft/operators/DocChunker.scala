package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document → training-window chunking (builder brief: the op every
  * pretraining pipeline runs between cleaning and packing): split each
  * document into fixed-size token windows with overlap, token boundaries
  * = whitespace (swap the tokenizer column expression for a BPE regex
  * where needed — the window algebra is tokenizer-agnostic).
  *
  * Built entirely from codegen'd collection expressions
  * (split/size/sequence/slice/array_join) — a narrow map + generate, no
  * UDF, no shuffle: at 100 TB this runs at scan speed and parallelism is
  * the input partitioning. Chunk count per doc is closed-form
  * (`1 + ceil(max(n-K,0)/S)` for window K and stride S = K-overlap), so
  * the output is exactly reproducible by any engine — the DuckDB oracle
  * replays it with list_slice + unnest(generate_series).
  */
object DocChunker {

  /** Whitespace tokens of a (trimmed) text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** One row per (doc, window): (idCol, chunk_id, n_tokens, chunk_text).
    * Windows start at multiples of stride = chunkTokens - overlap; the
    * final window may be short (it still starts < n). Docs with n ≤
    * chunkTokens yield exactly one window. */
  def chunk(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int = 512, overlap: Int = 64): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens, "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nChunks = when(n <= chunkTokens, lit(1L))
      .otherwise(ceil((n - lit(chunkTokens)).cast("double") / lit(stride.toDouble))
        .cast("long") + lit(1L))
    val chunkToks = slice(col("toks"), col("chunk_id") * stride + 1, lit(chunkTokens))
    docs.select(col(idCol), toks.as("toks"), nChunks.as("nc"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L), col("nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        size(chunkToks).cast("long").as("n_tokens"),
        array_join(chunkToks, " ").as("chunk_text"))
  }

  /** Word n-gram shingles: one row per (doc, shingle) — the candidate
    * unit for benchmark decontamination. Docs shorter than `n` tokens
    * emit nothing. Same codegen-only construction as [[chunk]]. */
  def shingles(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0)
    val toks = tokens(col(textCol))
    docs.select(col(idCol), toks.as("toks"))
      .where(size(col("toks")) >= n)
      .select(col(idCol),
        explode(sequence(lit(0), size(col("toks")) - n)).as("i"), col("toks"))
      .select(col(idCol),
        array_join(slice(col("toks"), col("i") + 1, lit(n)), " ").as("shingle"))
  }

  /** Benchmark decontamination report: for every corpus doc, how many of
    * its distinct word `n`-grams also appear in the benchmark set
    * (0 = clean). Shuffle is bounded by the distinct-shingle key — the
    * standard eval-overlap check run before training. The benchmark side
    * is distinct-shingle only (small — broadcastable by AQE); the corpus
    * side stays (doc, shingle) distinct pairs. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 5,
      hashShingles: Boolean = false): DataFrame = {
    // scale path: join on xxhash64(shingle) — an 8-byte shuffle key
    // instead of an n-word string. A 64-bit collision adds a false hit
    // with probability ~#bench-shingles/2^64 per distinct corpus
    // shingle — negligible against LSH-style recall error elsewhere in
    // the pipeline; keep strings when exact parity matters (the oracle
    // query does).
    def keyed(df: DataFrame): DataFrame =
      if (hashShingles) df.withColumn("shingle", xxhash64(col("shingle"))) else df
    val corpusSh = keyed(shingles(corpus, textCol, idCol, n))
      .dropDuplicates(idCol, "shingle")
    val benchSh = keyed(shingles(benchmark, textCol, idCol, n))
      .select("shingle").distinct()
    val hits = corpusSh.join(benchSh, "shingle")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** [[decontaminate]] with a broadcast Bloom prefilter — the 100 TB
    * path. The benchmark side is tiny next to the corpus (eval sets are
    * thousands of docs; the corpus is the 100 TB), so instead of
    * shuffling every distinct (doc, shingle) pair of the corpus into a
    * join, build a Bloom filter over the benchmark shingles once
    * (`df.stat.bloomFilter` — a distributed aggregation producing one
    * driver-side sketch), broadcast it, and drop the overwhelmingly-
    * clean corpus shingles map-side. Only bloom survivors (true hits +
    * ~fpp false positives) reach the exact verify join, so the result is
    * IDENTICAL to [[decontaminate]] — Bloom has no false negatives and
    * the join removes the false positives — which is exactly what the
    * gate checks (q_decontam_bloom shares q_decontam's oracle). */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 5,
      fpp: Double = 0.01): DataFrame = {
    // persisted: the benchmark shingle set feeds THREE consumers (the
    // sizing count, the bloomFilter aggregation, the exact-verify join) —
    // unpersisted it would re-run the explode+distinct shuffle for each.
    // O(benchmark) residency by contract (eval sets are small); Spark
    // evicts LRU if not.
    val benchSh = shingles(benchmark, textCol, idCol, n)
      .select("shingle").distinct().persist()
    val expected = benchSh.count()
    // empty benchmark (no doc reaches n tokens): nothing can hit — and
    // Spark's stat.bloomFilter NPEs on an empty aggregation buffer
    if (expected == 0L) {
      benchSh.unpersist()
      return corpus.select(col(idCol), lit(0L).as("n_hits"))
    }
    val bloom = benchSh.stat.bloomFilter("shingle", expected, fpp)
    val bloomBc = corpus.sparkSession.sparkContext.broadcast(bloom)
    // deliberately a UDF over a BROADCAST filter, not a native
    // expression: a multi-MB bloom image embedded in the plan (the
    // addReferenceObj route a codegen Expression would take) ships with
    // EVERY task binary, while the broadcast moves it once per executor
    // — at 100 TB the broadcast wins and the per-row boxing is dwarfed
    // by the string shingle work either side of it
    val mightContain = udf((s: String) => s != null && bloomBc.value.mightContainString(s))
    val survivors = shingles(corpus, textCol, idCol, n)
      .where(mightContain(col("shingle")))
      .dropDuplicates(idCol, "shingle")
    // deliberately NOT checkpoint-and-released: truncating the plan here
    // (localCheckpoint + unpersist, tried) made downstream
    // exceptAll-comparisons against sibling frames mis-bind attributes
    // and report every row as different — the shingle cache + broadcast
    // stay resident (O(benchmark), small by contract; storage memory is
    // LRU-evicted) in exchange for a plan that stays a plain lazy tree
    val hits = survivors.join(benchSh, "shingle")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }
}

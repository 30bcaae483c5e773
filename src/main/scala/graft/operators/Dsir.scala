package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data Selection with Importance Resampling — DSIR (Xie et al.,
  * NeurIPS 2023): pick raw-corpus documents that look like a small
  * high-quality TARGET corpus. Both distributions are modeled as bags of
  * HASHED n-gram features (unigrams + bigrams folded into a fixed bucket
  * space), a document's importance weight is
  *
  *   log w(doc) = Σ_features [ log p̂_target(b) − log p̂_raw(b) ]
  *
  * with add-one smoothing over the bucket space, and selection is Gumbel
  * top-k over the weights (importance resampling without replacement).
  * This is the standard pre-training recipe for "give me web documents
  * that read like Wikipedia" at corpus scale.
  *
  * Scale shape (100 TB raw corpus):
  *  - the two feature-count tables are BUCKET-BOUNDED (B rows, B ~ 10⁴):
  *    one tokenize+hash pass per corpus with map-side partial
  *    aggregation; the shuffle carries at most B keys per partition, not
  *    token occurrences;
  *  - the per-bucket log-ratio table is B rows → broadcast; scoring is
  *    ONE corpus pass (hash features, map-side-combine per doc, one
  *    exchange keyed by doc id) — no corpus-×-corpus join anywhere;
  *  - Gumbel top-k is a TakeOrdered over per-row scalars, no extra
  *    shuffle.
  *
  * Determinism contract (the reason the gate can hash values): each
  * bucket's log-ratio is floor-truncated to fixed-point (·10⁴, long)
  * BEFORE any per-document aggregation, so a document's weight is an
  * order-free integer sum. Feature hashing has two tiers (see
  * [[bucketOf]]): codegen xxhash64 by default, md5-prefix arithmetic
  * under `portableHash = true` — identical in any engine, which is what
  * the oracle gates pin. The Gumbel noise is md5-seeded (no RNG):
  * u = (md5-prefix + 0.5) / 2⁶⁰, g = −ln(−ln u) — a fixed IEEE op chain
  * DuckDB replays (ln's 1-ulp caveat as in [[NgramLm]], recorded there).
  */
object Dsir {

  /** Fixed-point scale for per-bucket log-ratios (matches NgramLm). */
  val LogScale = 10000.0

  /** Feature hash into the bucket space. Two tiers (weights only need
    * the SAME fold on both sides of the ratio, so any stable hash is
    * correct): the default is codegen `xxhash64` — measured 1.8× faster
    * end-to-end than md5 at the 10× probe (20.8 → 11.5 s; the hash is
    * this operator's dominant CPU); `portable = true` switches to the md5-prefix
    * arithmetic the DuckDB value gate replays (the checksum/mixture
    * trick), which is what the oracle-gated queries pin. */
  private def bucketOf(feature: Column, buckets: Int,
      portable: Boolean): Column =
    (if (portable)
      conv(substring(md5(feature), 1, 15), 16, 10).cast(LongType) % buckets
    else pmod(xxhash64(feature), lit(buckets.toLong))).as("bucket")

  /** One row per hashed feature occurrence: unigrams + space-joined
    * bigrams, each folded to (idCol, bucket). Narrow until the caller's
    * aggregate — no shuffle here. */
  private def features(docs: DataFrame, textCol: String, idCol: String,
      buckets: Int, portable: Boolean): DataFrame = {
    val toks = docs.select(col(idCol),
      split(lower(trim(col(textCol))), "\\s+").as("w"))
    // two explodes unioned, NOT one Generate over a concatenated
    // feature array: the single-Generate form (transform(adjacentPairs)
    // → concat → explode) was MEASURED 40% slower warm (3.1 vs 2.2 s at
    // sf0.1) — building the per-row combined array costs more than the
    // second scan, and the union's two branches pipeline independently
    val uni = toks.select(col(idCol), explode(col("w")).as("f"))
    val bi = toks.select(col(idCol),
        explode(graft.functions.TextFunctions.adjacentPairs(col("w"))).as("bg"))
      .select(col(idCol),
        concat(col("bg.l"), lit(" "), col("bg.r")).as("f"))
    uni.unionByName(bi).select(col(idCol),
      bucketOf(col("f"), buckets, portable))
  }

  /** Per-bucket fixed-point log-ratio table — COMPLETE over [0, B): a
    * scored document may hit buckets absent from both training corpora,
    * and the smoothed ratio of an unseen bucket is a nonzero constant,
    * so missing rows would silently zero it. B is bounded (~10⁴), so the
    * result broadcasts into the scoring pass.
    *
    * lr_fp(b) = floor( (ln((ct+1)/(Tt+B)) − ln((cr+1)/(Tr+B))) · 10⁴ )
    */
  def logRatios(target: DataFrame, raw: DataFrame, textCol: String,
      idCol: String, buckets: Int, portableHash: Boolean = false): DataFrame = {
    val spark = target.sparkSession
    def bucketCounts(c: DataFrame, name: String): DataFrame =
      features(c, textCol, idCol, buckets, portableHash)
        .groupBy("bucket").agg(count(lit(1)).as(name))
    val ct = bucketCounts(target, "ct")
    val cr = bucketCounts(raw, "cr")
    // feature totals ride along as broadcast one-row joins (bm25's
    // stats idiom) — never a driver-side collect
    val tTot = ct.agg(coalesce(sum("ct"), lit(0L)).as("tt"))
    val rTot = cr.agg(coalesce(sum("cr"), lit(0L)).as("tr"))
    val b = lit(buckets.toLong)
    val d = "double"
    spark.range(buckets).select(col("id").as("bucket"))
      .join(ct, Seq("bucket"), "left")
      .join(cr, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        floor((log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast(d)
                 / (col("tt") + b).cast(d))
             - log((coalesce(col("cr"), lit(0L)) + lit(1L)).cast(d)
                 / (col("tr") + b).cast(d)))
          * lit(LogScale)).cast(LongType).as("lr_fp"))
  }

  /** Per-document importance weights: (idCol, n_feats, w_fp) with
    * w_fp = Σ lr_fp over the doc's hashed features — an order-free
    * integer sum. Feature-less documents (empty/NULL text never reaches
    * a Generate row) come back as (0, 0) via the left join. */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
      ratios: DataFrame, buckets: Int,
      portableHash: Boolean = false): DataFrame = {
    val agg = features(docs, textCol, idCol, buckets, portableHash)
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum("lr_fp").as("w_fp"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("w_fp"), lit(0L)).as("w_fp"))
  }

  // (Round 15: a fused one-pass corpusWeights — one tokenize+hash pass
  // into a per-(doc, bucket, side) count table feeding both the ratio
  // build and the scoring — was implemented, spec-proven value-identical
  // to logRatios+importanceWeights, and REJECTED with data: the
  // (doc, bucket) aggregate's shuffle carries a near-feature-stream-sized
  // table (distinct buckets/doc ≈ features/doc at B=512) and its final
  // aggregate runs once per consumer, measured 6.0 vs 3.9 task-seconds
  // against the split form on q_dsir at sf0.1. The split form's two
  // passes shuffle only B-bounded and per-doc rows — guide §2.3's
  // "aggregate before you shuffle" beats "scan once" here.)

  /** Gumbel top-k resampling over importance weights — the paper's
    * without-replacement sampler, made engine-deterministic: the Gumbel
    * noise is md5-seeded per id instead of RNG-drawn, so any engine (and
    * any retry) selects the IDENTICAL k documents. Returns
    * (idCol, key_micro) ordered by the perturbed key descending;
    * key = w_fp/10⁴ + g, floor-truncated to micro-points. */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int,
      seed: String): DataFrame = {
    val d = "double"
    // u ∈ (0,1): 60-bit md5 prefix, offset half a step — never 0 or 1,
    // so −ln(−ln u) is always finite
    val u = (conv(substring(md5(concat(lit(seed), lit(":"),
        col(idCol).cast("string"))), 1, 15), 16, 10).cast(LongType).cast(d)
      + lit(0.5)) / lit(1152921504606846976.0d) // 2^60
    val g = -log(-log(u))
    weights.select(col(idCol),
        floor((col("w_fp").cast(d) / lit(LogScale) + g) * lit(1000000.0))
          .cast(LongType).as("key_micro"))
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
  }
}

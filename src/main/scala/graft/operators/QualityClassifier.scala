package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hashed linear text classifier — the fastText-style quality scorer
  * every web-corpus pipeline runs between heuristic cleaning and
  * mixture sampling (GPT-3's WebText-vs-CommonCrawl logistic filter,
  * CCNet's fastText step). The model is a bucketed weight vector:
  * features are unigrams hashed into `nBuckets` buckets (the hashing
  * trick), the document score is the sum of its features' bucket
  * weights, and keep/drop is a per-feature-average threshold.
  *
  * All arithmetic is integer (weights in milli-units, exact Long sums),
  * so scores are bit-stable across engines, retries, and partitionings
  * — no float summation order anywhere. The feature hash is the
  * portable md5 bridge used by [[Dsir]] (`hex15(md5(tok)) % nBuckets`),
  * replayable in any SQL engine.
  *
  * Two physical plans, value-identical by construction and gated
  * against the same oracle:
  *
  *   - [[scoreInline]] — the 100 TB path: the weight of every token is
  *     computed INLINE inside a single `aggregate` over the token
  *     array. Zero shuffle, zero join, whole-stage codegen end to end;
  *     the only exchange in the query is whatever the caller does with
  *     the result. Usable whenever the model is a closed form of the
  *     bucket id (here: a deterministic hash model standing in for
  *     trained weights).
  *   - [[scoreWithTable]] — the general path for LEARNED weights: the
  *     model is a (bucket, w_milli) table, broadcast (it is at most
  *     `nBuckets` rows), tokens explode and probe it map-side, and the
  *     per-doc Long sum partial-aggregates before the only shuffle
  *     (by doc id). Docs with no features survive via a left join.
  *
  * Reference anchor: the reference engine has no ML surface; this is
  * part of the LLM-data-pipeline layer the brief adds on top
  * (quality scoring alongside `TextFunctions.qualityScore`'s
  * heuristics).
  */
object QualityClassifier {

  /** Feature bucket of a token: portable md5 hash bridge (same form as
    * Dsir.scala:56) — `CAST(('0x' || substr(md5(t),1,15)) AS BIGINT)
    * % nBuckets` in DuckDB. */
  def bucket(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast(LongType) % nBuckets

  /** Deterministic stand-in for trained weights: bucket b weighs
    * `hex15(md5('qw:' || b)) % 2001 - 1000` milli-units, i.e. uniform
    * in [-1000, 1000]. A real deployment swaps this for learned values;
    * every gate and spec replays it exactly in SQL. */
  def hashWeightMilli(bucketCol: Column): Column =
    conv(substring(md5(concat(lit("qw:"), bucketCol.cast("string"))), 1, 15),
      16, 10).cast(LongType) % 2001 - 1000

  /** The hash model as a table: (bucket BIGINT, w_milli BIGINT),
    * `nBuckets` rows — the shape a trained model arrives in. */
  def hashWeightTable(spark: SparkSession, nBuckets: Int): DataFrame =
    spark.range(nBuckets.toLong).select(
      col("id").as("bucket"), hashWeightMilli(col("id")).as("w_milli"))

  private def toks(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => t =!= "")

  /** Zero-shuffle scorer: per-doc feature count, exact milli score sum,
    * per-feature average (fixed-point floor), and the keep verdict
    * `score_milli >= thresholdMilli * n_feats` — all inside one codegen
    * stage. No explode, no join, no exchange. */
  def scoreInline(df: DataFrame, textCol: String, idCol: String,
                  nBuckets: Int, thresholdMilli: Long = 0L): DataFrame = {
    val ts = toks(col(textCol))
    val score = aggregate(ts, lit(0L),
      (acc, t) => acc + hashWeightMilli(bucket(t, nBuckets)))
    finish(df.select(col(idCol), size(ts).cast(LongType).as("n_feats"),
      score.as("score_milli")), idCol, thresholdMilli)
  }

  /** Learned-weights scorer: explode tokens, probe the broadcast weight
    * table map-side, partial-aggregate the Long sum before the doc-id
    * shuffle, left-join back so feature-less docs keep a 0 score.
    * Value-identical to [[scoreInline]] when `weights` =
    * [[hashWeightTable]] — the gate proves it by sharing the oracle. */
  def scoreWithTable(df: DataFrame, textCol: String, idCol: String,
                     weights: DataFrame, nBuckets: Int,
                     thresholdMilli: Long = 0L): DataFrame = {
    val feats = df.select(col(idCol), explode(toks(col(textCol))).as("tok"))
      .select(col(idCol), bucket(col("tok"), nBuckets).as("bucket"))
    // LEFT join + weight-0 default: a learned table may be SPARSE (only
    // buckets seen in training) — an absent bucket must contribute
    // weight 0, not silently drop the token from n_feats (which would
    // skew the per-feature average and diverge from the inline path's
    // every-token contract)
    val scored = feats.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w_milli"), lit(0L))).as("score_milli"))
    val base = df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_milli"), lit(0L)).as("score_milli"))
    finish(base, idCol, thresholdMilli)
  }

  /** Shared tail: fixed-point per-feature mean (milli), integer-compare
    * verdict. `avg_milli` floors toward negative infinity (Spark and
    * DuckDB integer `//` agree via explicit floor-div on positives;
    * we use floor(double) on an exact ratio of Longs, deterministic
    * because the quotient is exact-rounded IEEE division). */
  /** The keep verdict applied INLINE as a pure filter — for pipelines
    * that score and immediately gate (the assembly chain): the
    * score-then-join-back form re-evaluates the upstream subtree on
    * BOTH join sides (the two branches exchange differently-shaped
    * inputs, so Catalyst cannot reuse one for the other), which ran the
    * pipeline's dominant stage — corpus-global sentence dedup — twice
    * (round 15; guide §2.4). Value-identical to keeping the rows where
    * [[scoreInline]] yields `keep && n_feats > 0`: same tokenizer, same
    * bucket hash, same milli-score sum, same threshold comparison. */
  def keepFilter(df: DataFrame, textCol: String,
      nBuckets: Int, thresholdMilli: Long = 0L): DataFrame = {
    val ts = toks(col(textCol))
    val score = aggregate(ts, lit(0L),
      (acc, t) => acc + hashWeightMilli(bucket(t, nBuckets)))
    val n = size(ts).cast(LongType)
    df.where(n > lit(0L) && score >= lit(thresholdMilli) * n)
  }

  private def finish(scored: DataFrame, idCol: String,
                     thresholdMilli: Long): DataFrame =
    scored.select(col(idCol), col("n_feats"), col("score_milli"),
      when(col("n_feats") === 0, lit(0L))
        .otherwise(floor(col("score_milli").cast("double") /
          col("n_feats").cast("double") * 1000.0).cast(LongType))
        .as("avg_micro"),
      (col("score_milli") >= lit(thresholdMilli) * col("n_feats")).as("keep"))
}

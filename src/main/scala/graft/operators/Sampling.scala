package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus sampling/rebalancing for training-data pipelines.
  *
  * Stratified sampling re-weights a mixed corpus (e.g. downsample web
  * text, keep all code) without collecting anything: `sampleBy` keeps
  * each row with its stratum's probability via a per-row Bernoulli draw,
  * one codegen'd map over the data. Deterministic under a fixed seed —
  * retries/re-runs keep the same rows (the same requirement the sketch
  * kernels satisfy).
  *
  * `weightedUnion` composes per-source fractions into one mixture scan —
  * the "data recipe" step of corpus assembly.
  */
object Sampling {

  /** Keep each stratum at its configured fraction (missing strata keep
    * fraction 0). */
  def stratified(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic hash-based sampling: keeps exactly the rows whose
    * key-hash falls under the fraction — stable across runs AND across
    * engines (no RNG), so joins between samples of different tables
    * stay consistent (sample lineitem and orders by the same key →
    * referential integrity preserved). */
  def byKeyHash(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    val buckets = 1000000L
    df.where(pmod(xxhash64(col(keyCol), lit(seed)), lit(buckets))
      < lit((fraction * buckets).toLong))
  }

  /** Engine-portable deterministic sampler: 16-bit md5-prefix bucket of
    * the key compared against the fraction's hex threshold — any engine
    * with md5() replays the IDENTICAL sample (the cross-engine variant
    * of [[byKeyHash]]; xxhash64 is faster but Spark-only). */
  def byMd5Prefix(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    val threshold = f"${(fraction * 65536).toInt}%04x"
    df.where(substring(md5(col(keyCol).cast("string")), 1, 4) < lit(threshold))
  }

  /** Mixture of sources at given fractions (a training-data recipe):
    * each (df, fraction) sampled by key hash, unioned by name. */
  def weightedUnion(sources: Seq[(DataFrame, String, Double)],
      seed: Long = 42L): DataFrame =
    sources.map { case (df, key, frac) => byKeyHash(df, key, frac, seed) }
      .reduce(_ unionByName _)
}

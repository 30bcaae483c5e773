package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE cardinality sketches — the third member of the
  * blind-append store family (BM25 index: pruned postings; LM store:
  * additive counts; here: HLL registers). A corpus-stat question like
  * "how many distinct URLs / tokens / fingerprints per language across
  * the whole lake?" must not cost a corpus rescan at 100 TB: each
  * ingest batch writes its per-group HLL sketch (KB per group), and an
  * estimate is one read + `hll_union_agg` over sketches — never over
  * rows.
  *
  * Why HLL makes this exact-composable: a register is a MAX over hashed
  * observations, so (a) merging partition/batch sketches equals
  * sketching the whole (the estimate is partitioning-invariant — the
  * spec pins merged == one-shot EQUALITY, not approximate agreement),
  * and (b) re-merging a replayed batch is a no-op (max is idempotent) —
  * retry neutrality needs no batch_id dedup, unlike the additive LM
  * counts. batch_id is still recorded for lineage/debugging.
  */
object SketchStore {

  /** Write one batch's per-group distinct sketches:
    * `(groupCol, sketch, batch_id)` — one row per group, KBs each
    * (lgConfigK=12 → ≤4 KiB registers). */
  def writeDistinct(df: DataFrame, valueCol: String, groupCol: String,
      path: String, batchId: String = "batch-0",
      mode: String = "overwrite"): Unit =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))
      .withColumn("batch_id", lit(batchId))
      .write.mode(mode).parquet(path)

  /** Blind-append another batch's sketches (idempotent under replay —
    * see object doc). */
  def appendDistinct(df: DataFrame, valueCol: String, groupCol: String,
      path: String, batchId: String): Unit =
    writeDistinct(df, valueCol, groupCol, path, batchId, mode = "append")

  /** Per-group distinct estimates from the store: one sketch-union over
    * the (groups × batches) rows — row count is independent of corpus
    * size. */
  def estimateDistinct(spark: org.apache.spark.sql.SparkSession,
      path: String, groupCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("distinct_est"))

  /** The one-shot equivalent (no store) — what the merged estimate must
    * EQUAL, register-exactly. */
  def distinctDirect(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol)))
        .as("distinct_est"))
}

package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The LAST MILE of training-data assembly: curated chunks → token-budget
  * bins ([[Packing.packByTokenBudget]]) → deterministic shuffled shards
  * ([[Sampling.shuffledShards]]) → written parquet shard files a trainer
  * streams in order. The q_assembly gate pins the upstream composition
  * (sentence dedup → classifier → chunking); this operator pins the
  * write: every knob is deterministic (md5 shard keys, fully-tiebroken
  * sorts, hash repartition before packing), so a retried or re-run job
  * produces BYTE-IDENTICAL shard contents — the property that makes
  * training reproducible and retries safe (AssemblyShardsSpec proves it
  * by writing twice and comparing per-shard read order).
  *
  * Scale shape: one hash exchange into `packParallelism` packing tasks
  * (greedy first-fit runs per partition — bin quality is per-task, which
  * is the standard distributed-packing trade), one range exchange for
  * the shard write. The range partitioner leads with `shard`, so the
  * dynamic-partition writer sees its required clustering already
  * satisfied and every shard file is written in (ord, id, chunk) order —
  * the [[Sampling.shuffledShards]] scaladoc's trap (sorting by ord alone
  * lets the writer's unstable partition re-sort scramble file order)
  * stays dodged here. */
object Assembly {

  /** Pack `chunks` into ≤`tokenBudget` bins and write them as `nShards`
    * hive-partitioned parquet shards under `outDir` (shard=N/...). Bins
    * stay whole inside one shard (the shard key is the BIN, so a
    * training sequence never splits); rows inside every shard file are
    * (ord, id, chunk) sorted. Returns the written row count. */
  def writeShards(chunks: DataFrame, textCol: String, idCol: String,
      chunkIdCol: String, tokenBudget: Int, nShards: Int, outDir: String,
      packParallelism: Int = 32): Long = {
    require(tokenBudget > 0 && nShards > 0)
    // empty input would otherwise leave a partition-less directory
    // (only _SUCCESS) whose re-read fails schema inference; write the
    // empty frame UNpartitioned instead — one zero-row parquet file
    // carrying the full schema (shard as a regular int column), so
    // readShards and any consumer see the same columns and count 0.
    // The isEmpty probe is a limit-1 job on the raw input, not a run
    // of the packing pipeline.
    if (chunks.isEmpty) {
      val empty = chunks
        .withColumn("n_tokens", lit(0L))
        .withColumn("bin_id", lit(0L))
        .withColumn("ord", lit("")) // md5 hex in the non-empty path
        .withColumn("shard", lit(0).cast("int"))
        .limit(0)
      empty.coalesce(1).write.mode("overwrite").parquet(outDir)
      return 0L
    }
    // deterministic packing input: fixed hash partitioning (retry- and
    // AQE-invariant), fully-tiebroken in-partition order (n_tokens desc
    // alone leaves equal-length chunks at the sorter's mercy)
    val pre = chunks
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col(textCol)).cast(LongType))
      .repartition(packParallelism, col(idCol))
      .sortWithinPartitions(col("n_tokens").desc, col(idCol), col(chunkIdCol))
    val packed = Packing.packByTokenBudget(pre, textCol, tokenBudget,
      sortByLength = false)
    val sharded = Sampling
      .shuffledShards(packed.withColumn("bin_key", col("bin_id").cast("string")),
        "bin_key", nShards)
      .drop("bin_key")
    val out = sharded
      .repartitionByRange(nShards, col("shard"), col("ord"),
        col(idCol), col(chunkIdCol))
      .sortWithinPartitions(col("shard"), col("ord"), col(idCol), col(chunkIdCol))
    out.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    chunks.sparkSession.read.parquet(outDir).count()
  }

  /** Read shards back for verification/consumption: the parquet under
    * `outDir` with the hive `shard` column restored as int. */
  def readShards(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).withColumn("shard", col("shard").cast("int"))
}

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

  /** Producer half of the STREAMED shard handoff — the reference's
    * dump→stream→load pipe (SURVEY §3.3, `mydumper_stream.c`) applied
    * to the training last mile: announce each written shard directory
    * on the [[graft.streaming.LandingStream]] file-event protocol, in
    * shard order, then the terminal `done` event carrying the shard
    * count (the consumer's stop-and-completeness signal, exactly the
    * CLI stream-load contract). Returns the announced shard count. */
  def announceShards(outDir: String, eventsDir: String): Int = {
    val shardDirs = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .sortBy(_.getName.stripPrefix("shard=").toInt)
    shardDirs.foreach { d =>
      graft.streaming.LandingStream.announceFile(eventsDir, "data",
        d.getName.stripPrefix("shard="), d.getAbsolutePath)
    }
    graft.streaming.LandingStream.announceFile(eventsDir, "done", "-",
      shardDirs.length.toString)
    shardDirs.length
  }

  /** Trainer-side consumer of [[announceShards]]: FOLLOW the events dir
    * (ProcessingTime stream over a checkpoint — the concurrent mode, so
    * shards announced after query start are still seen) and run
    * `handle(shard, rows)` per shard IN ANNOUNCE ORDER; returns once
    * every announced shard up to the terminal `done` has been handled.
    * Delivery is AT-LEAST-ONCE, the file-event contract: a consumer
    * that dies mid-run resumes from the checkpoint and re-handles the
    * failed micro-batch's shards (StreamingSpec pins both the order and
    * the redelivery), so `handle` must be idempotent per shard — which
    * a trainer's "read shard k" naturally is. Ordering holds because
    * announce names encode wall-clock arrival and
    * [[graft.streaming.LandingStream.consumeFileEvents]] sorts each
    * micro-batch by event-file name. */
  def followShards(spark: SparkSession, eventsDir: String,
      checkpoint: String, timeoutMs: Long = 120000L)(
      handle: (Int, DataFrame) => Unit): Long = {
    @volatile var expected = -1L
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = graft.streaming.LandingStream.consumeFileEvents(spark,
      eventsDir, checkpoint, follow = true) { (kind, table, path) =>
      kind match {
        case "data" =>
          handle(table.toInt, spark.read.parquet(path))
          seen.incrementAndGet()
        case "done" => expected = path.toLong
        case other => throw new IllegalArgumentException(
          s"unexpected shard event kind '$other'")
      }
    }
    // completion keys on the DONE event alone: micro-batches process
    // sequentially, so by the time done is handled every earlier data
    // event was either handled this run or committed by a previous one
    // — counting handled shards instead would spuriously fail a
    // crash-resume whose early batches committed before the crash
    val deadline = System.currentTimeMillis() + timeoutMs
    while (q.isActive && expected < 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(25)
    if (q.isActive) q.stop()
    q.awaitTermination()
    require(expected >= 0,
      s"no terminal done event within ${timeoutMs}ms — producer died?")
    seen.get()
  }
}

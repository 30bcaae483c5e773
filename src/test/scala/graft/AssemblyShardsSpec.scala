package graft

import graft.operators.Assembly
import org.apache.spark.sql.functions._

/** The assembly last mile (Assembly.writeShards): shard-file DETERMINISM
  * across re-runs/retries (the RoundTripSpec contract applied to
  * training shards), bin wholeness, budget respect, and lossless
  * round-trip. */
class AssemblyShardsSpec extends SparkTestBase {
  import spark.implicits._

  private def chunks() = {
    // 300 chunks over 60 docs, varied lengths, deterministic text
    val rows = for (d <- 1L to 60L; c <- 0L until 5L) yield {
      val n = 3 + ((d * 7 + c * 13) % 40).toInt
      (d, c, Seq.tabulate(n)(i => s"w${(d + c * 31 + i) % 97}").mkString(" "))
    }
    rows.toDF("doc_id", "chunk_id", "chunk_text")
  }

  private def readOrdered(dir: String) =
    Assembly.readShards(spark, dir)
      .withColumn("file", regexp_extract(input_file_name(), "(part-\\d+)", 1))
      .withColumn("seq", monotonically_increasing_id())

  test("writeShards round-trips losslessly: every chunk exactly once, " +
      "bins whole within one shard, bins within budget") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val n = Assembly.writeShards(chunks(), "chunk_text", "doc_id", "chunk_id",
      tokenBudget = 128, nShards = 8, outDir = dir)
    assert(n === 300L)
    val back = Assembly.readShards(spark, dir)
    // lossless: the (doc, chunk) key set is exactly the input's
    val keys = back.select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(keys.toSeq === chunks().select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // bins never split across shards (the shard key IS the bin)
    val split = back.groupBy("bin_id")
      .agg(countDistinct("shard").as("ns")).where(col("ns") > 1).count()
    assert(split === 0L, "a bin must land whole in one shard")
    // bins respect the token budget (no chunk here exceeds it alone)
    val over = back.groupBy("bin_id").agg(sum("n_tokens").as("t"))
      .where(col("t") > 128).count()
    assert(over === 0L)
  }

  test("empty input writes a readable empty shard table (schema-carrying " +
      "file, not a partition-less dir), returns 0, and readShards counts 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_e").toString
    val n = Assembly.writeShards(chunks().limit(0), "chunk_text", "doc_id",
      "chunk_id", tokenBudget = 128, nShards = 8, outDir = dir)
    assert(n === 0L)
    val back = Assembly.readShards(spark, dir)
    assert(back.count() === 0L)
    // consumers see the same columns an occupied shard table carries
    for (c <- Seq("doc_id", "chunk_id", "chunk_text", "n_tokens", "bin_id",
        "ord", "shard"))
      assert(back.columns.contains(c), s"missing column $c")
  }

  test("shard files are DETERMINISTIC across re-runs: same shard dirs, " +
      "same rows in the same in-file order, files internally ord-sorted") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_shards_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_shards_b").toString
    Assembly.writeShards(chunks(), "chunk_text", "doc_id", "chunk_id",
      tokenBudget = 128, nShards = 8, outDir = dirA)
    Assembly.writeShards(chunks(), "chunk_text", "doc_id", "chunk_id",
      tokenBudget = 128, nShards = 8, outDir = dirB)
    def snapshot(dir: String): Seq[(Int, String, Long, Long, Long)] =
      readOrdered(dir)
        .select("shard", "file", "seq", "doc_id", "chunk_id")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(t => (t._1, t._2, t._3))
        .map(t => (t._1, t._2, t._4, t._5, 0L)).toSeq
    assert(snapshot(dirA) === snapshot(dirB),
      "re-running the write must produce identical shard contents in order")
    // and within every file the rows are ord-sorted (the trainer reads
    // the shuffled order straight off disk, no re-sort)
    val viol = readOrdered(dirA)
      .withColumn("prev", lag("ord", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard", "file").orderBy("seq")))
      .where(col("prev").isNotNull && col("prev") > col("ord"))
      .count()
    assert(viol === 0L, "rows inside a shard file must be ord-sorted")
  }
}

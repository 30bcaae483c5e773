package graft.operators

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for the training-data pipeline (builder brief):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is shuffle-bounded by a *bucket key*
  * (fingerprint / LSH band / simhash prefix), never an all-pairs join —
  * candidate generation is groupBy on the bucket, verification is a join
  * restricted to bucket-mates. All hashing is keyed (xxhash64/md5) and
  * deterministic, so re-runs and retries agree.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on a normalized fingerprint, keep the
    * smallest id per group (deterministic winner). One shuffle on the
    * 16-char digest — uniform keys, no skew. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextFunctions.fingerprint(col(textCol))
    docs.withColumn("fp", fp)
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  /** Survivors of exact dedup (the kept rows, all columns). */
  def exactSurvivors(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exact(docs, textCol, idCol).select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash signature: array of `numHashes` minima over shingle hashes.
    * Hash family k = xxhash64(k, shingle) — independent-enough keyed
    * hashes, no stored model. */
  def minhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column = {
    val sh = TextFunctions.shingles(text, shingleSize)
    array((0 until numHashes).map { k =>
      array_min(transform(sh, s => xxhash64(lit(k), s)))
    }: _*)
  }

  /** MinHash + LSH banding: signature split into `bands` bands of
    * `rowsPerBand`; docs sharing any band bucket are candidate pairs.
    * Returns (band, bucket, id) — groupBy(band,bucket) gives clusters.
    * Shuffle key is the band digest: cardinality ≈ #docs × bands, uniform. */
  def minhashBands(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val sig = minhashSignature(col(textCol), shingleSize, bands * rowsPerBand)
    docs.select(col(idCol), sig.as("sig"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => md5(to_json(struct(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** MinHash-LSH candidate pairs (id1 < id2), optionally verified with
    * true shingle-set Jaccard ≥ threshold. */
  def minhashPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      verifyJaccard: Option[Double] = Some(0.7)): DataFrame = {
    val b = minhashBands(docs, textCol, idCol, shingleSize, bands, rowsPerBand)
    val l = b.select(col("band"), col("bucket"), col(idCol).as("id1"))
    val r = b.select(col("band"), col("bucket"), col(idCol).as("id2"))
    val cand = l.join(r, Seq("band", "bucket"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    verifyJaccard match {
      case None => cand
      case Some(th) =>
        val sh = docs.select(col(idCol),
          array_distinct(TextFunctions.shingles(col(textCol), shingleSize)).as("sh"))
        val withSets = cand
          .join(sh.select(col(idCol).as("id1"), col("sh").as("sh1")), "id1")
          .join(sh.select(col(idCol).as("id2"), col("sh").as("sh2")), "id2")
        withSets
          .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
          .withColumn("uni", size(col("sh1")) + size(col("sh2")) - col("inter"))
          .withColumn("jaccard", round(col("inter").cast(DoubleType) / col("uni"), 4))
          .where(col("jaccard") >= th)
          .select("id1", "id2", "jaccard")
    }
  }

  /** 64-bit SimHash over tokens: per bit, sum ±1 across token hashes, take
    * the sign. Computed row-local with higher-order functions (no explode,
    * no shuffle): fold token hashes into 64 counters. */
  def simhash(text: Column): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    val hashes = transform(tokens, t => xxhash64(t))
    // counters[i] = sum over tokens of (bit i set ? 1 : -1)
    val counters = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, i) => a + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1)
          .otherwise(-1)))
    // assemble the sign bits into a long
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, i) => when(c >= 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** SimHash near-dup pairs: bucket by 16-bit prefix (near-dups almost
    * always share it), verify hamming distance ≤ maxHamming within the
    * bucket. Bucket key keeps the join local; 64-bit popcount via
    * bit_count. */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSh = docs.select(col(idCol), simhash(col(textCol)).as("sh"))
      .withColumn("bucket", shiftright(col("sh"), 48))
    val l = withSh.select(col("bucket"), col(idCol).as("id1"), col("sh").as("sh1"))
    val r = withSh.select(col("bucket"), col(idCol).as("id2"), col("sh").as("sh2"))
    l.join(r, Seq("bucket"))
      .where(col("id1") < col("id2"))
      .withColumn("hamming", call_function("bit_count", col("sh1").bitwiseXOR(col("sh2"))))
      .where(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** n-gram Jaccard similarity of two text columns (row-local). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = array_distinct(TextFunctions.shingles(a, n))
    val sb = array_distinct(TextFunctions.shingles(b, n))
    val inter = size(array_intersect(sa, sb))
    round(inter.cast(DoubleType) / (size(sa) + size(sb) - inter), 4)
  }

  /** Embedding-cosine near-dup: LSH-bucket by random-hyperplane signs,
    * verify cosine ≥ threshold within buckets (never all-pairs). */
  def embeddingNearDups(embs: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, bits: Int = 8): DataFrame = {
    val withB = embs.select(col(idCol), col(vecCol))
      .withColumn("bucket", VectorFunctions.lshBucket(col(vecCol), bits))
    val l = withB.select(col("bucket"), col(idCol).as("id1"), col(vecCol).as("v1"))
    val r = withB.select(col("bucket"), col(idCol).as("id2"), col(vecCol).as("v2"))
    l.join(r, Seq("bucket"))
      .where(col("id1") < col("id2"))
      .withColumn("cos", VectorFunctions.cosine(col("v1"), col("v2")))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cosine"))
  }
}

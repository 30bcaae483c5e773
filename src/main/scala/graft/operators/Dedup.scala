package graft.operators

import graft.functions.{Hashing, TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for the training-data pipeline (builder brief):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is shuffle-bounded by a *bucket key*
  * (fingerprint / LSH band / simhash prefix / hyperplane cell), never an
  * all-pairs join — candidate generation is a groupBy/join on the bucket,
  * verification runs only on bucket-mates. Sketches (minhash/simhash) are
  * computed by compiled per-row kernels ([[Hashing]]) in a single pass —
  * a pure map, no shuffle — because Spark's higher-order functions are
  * interpreted and re-evaluate shared subtrees per hash. All hashing is
  * seeded + deterministic so retries and re-runs agree.
  */
object Dedup {

  /** A frame backed by materialized local-checkpoint blocks plus the
    * `release()` that frees them. Callers consume `df` (materialize the
    * downstream action), then call `release()` — at 100 TB batch
    * cadence this is not optional: un-freed checkpoint blocks pin
    * executor storage memory until JVM exit, so a daemonized pipeline
    * that skips the release leaks one band-table copy per batch. */
  final case class Scoped(df: DataFrame, release: () => Unit) {
    /** Run `use` against the frame and release in a finally — the
      * can't-forget form for callers that fully consume the frame
      * (counts, writes) inside the scope. */
    def apply[T](use: DataFrame => T): T =
      try use(df) finally release()
  }

  /** Checkpoint `df` and capture exactly the storage blocks the
    * checkpoint added, so the caller can free them without guessing
    * (Dataset.localCheckpoint offers no public handle to its RDD).
    * Eager by design — measured on the curation narrow frame (round
    * 13): lazy variants lose (lazy localCheckpoint +15%, columnar
    * cache() 2.6×, no materialization 6×: every consuming subtree
    * re-runs the upstream scan). */
  private[graft] def checkpointTracked(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = df.localCheckpoint() // eager: materializes before we diff
    val added = (sc.getPersistentRDDs -- before.toSeq).values.toSeq
    (cp, () => added.foreach(_.unpersist(blocking = false)))
  }

  /** Materialize a LOOP-INVARIANT table hash-laid-out on `keyCols` and
    * DECLARE that layout to the planner
    * ([[org.apache.spark.sql.graftbridge.DatasetBridge
    * .fromInternalRowsPartitioned]]): every later join/aggregation
    * keyed on `keyCols` (or a superset) consumes the frame with NO
    * Exchange — the edge table of an iterative graph operator shuffles
    * once instead of once per round (guide §2.4).
    *
    * The layout WIDTH is derived from the table's MEASURED bytes, not
    * from a constant: `df` is materialized as-is first (its own plan,
    * partial aggs and all), the checkpointed blocks' actual storage
    * size picks `width = clamp(bytes / advisoryPartitionSize, 1,
    * shufflePartitions)`, and one narrow re-layout exchange over the
    * in-memory blocks establishes the declared layout. Catalyst's
    * estimate is NOT trusted for this (post-UDF estimates are garbage —
    * the selfTopKLsh broadcast lesson), and a constant width is wrong
    * at BOTH ends: the loop's per-round stages inherit the declared
    * width verbatim (a fixed-partitioning join side disables AQE
    * coalescing), so a local[32]-sized constant ran 32 near-empty tasks
    * per stage per round — measured 70-100× task-time inflation at
    * sf0.1 — while any local-sized constant would under-partition a
    * real corpus. Costs one extra pass over the cached blocks at setup;
    * saves an edge-table exchange per round.
    *
    * Explicit-N repartition (REPARTITION_BY_NUM) is exempt from AQE
    * coalescing, so the declared layout is exactly what the blocks
    * hold. The count() drains every partition iterator — a
    * foreachPartition that ignores its iterator caches NOTHING and
    * every downstream scan silently replays the full upstream lineage
    * (measured: 20-100× task time before this was caught). */
  private[graft] def partitionedCheckpointCut(df: DataFrame,
      keyCols: Seq[String]): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val rdd0 = df.queryExecution.toRdd.map(_.copy())
    rdd0.localCheckpoint()
    // rdd0 is setup-transient: free it even when the re-layout drain
    // throws (the un-laid-out and laid-out copies are both resident
    // only inside this try — ADVICE r15 flagged the leak on throw)
    try relayoutCheckpointed(spark, rdd0, df.schema, keyCols)
    finally rdd0.unpersist(blocking = false)
  }

  /** Measure + hash-lay-out an ALREADY-MATERIALIZED internal-row RDD
    * and declare the layout (the shared tail of
    * [[partitionedCheckpointCut]]). Taking the materialized RDD
    * directly matters for the mid-loop adaptive re-layout
    * ([[clustersScoped]]): wrapping the blocks in a second checkpoint
    * first would hold THREE copies of the edge table transiently (old
    * blocks + wrap + laid-out) where this holds two — the peak-storage
    * concern the r15 verdict flagged on the setup path.
    *
    * ONE job drains/reads `src` AND measures it: Σ UnsafeRow bytes is
    * the shuffle-comparable size the advisory partition size is
    * calibrated against. (A block memSize read would reflect JVM
    * OBJECT size — several × the serialized scale — over-widening real
    * corpora's fixed layouts and disabling AQE coalescing for every
    * per-round stage: ADVICE r15.) */
  private[graft] def relayoutCheckpointed(
      spark: org.apache.spark.sql.SparkSession,
      src: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      keyCols: Seq[String]): (DataFrame, () => Unit) = {
    val bytes = src.mapPartitions { it =>
      var b = 0L
      while (it.hasNext) b += (it.next() match {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          u.getSizeInBytes.toLong
        case _ => 64L // non-unsafe rows: a coarse floor, never 0
      })
      Iterator.single(b)
    }.collect().sum
    val conf = spark.sessionState.conf
    val advisory = math.max(1L, conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val width = math.max(1L, math.min(conf.numShufflePartitions.toLong,
      (bytes + advisory - 1) / advisory)).toInt
    val laid = org.apache.spark.sql.graftbridge.DatasetBridge
      .fromInternalRows(spark, src, schema)
      .repartition(width, keyCols.map(col): _*)
    val rdd = laid.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // drain every partition (see scaladoc)
    (org.apache.spark.sql.graftbridge.DatasetBridge.fromInternalRowsPartitioned(
      spark, rdd, schema, keyCols, width),
      () => { rdd.unpersist(blocking = false); () })
  }

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

  /** MinHash + LSH banding: the signature (bands×rowsPerBand minima) is
    * folded to one 64-bit key per band; docs sharing any band key are
    * candidate pairs. Returns (band, bucket, id). Shuffle key is the band
    * digest: cardinality ≈ #docs × bands, uniform. */
  def minhashBands(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // Native codegen expression over the compiled sketch kernel —
    // bit-identical band digests to the former UDF (null → empty array),
    // minus the per-row converter round trip on the corpus-wide map.
    val bandCol = ColumnBridge.column(
      org.apache.spark.sql.graftnative.MinHashBandKeys(
        ColumnBridge.expression(col(textCol)), shingleSize, bands, rowsPerBand))
    docs.select(col(idCol), posexplode(bandCol))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** MinHash-LSH candidate pairs (id1 < id2), optionally verified with
    * true shingle-set Jaccard ≥ threshold (verification joins the text
    * back only for candidates — the pair set, not the corpus). */
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
      case None     => cand
      case Some(th) =>
        // convenience overload: verification blocks live until the
        // session sweeps persistent RDDs (bench/verify harnesses do);
        // lifecycle-strict callers use [[minhashPairsScoped]]
        verifyCandidates(cand, docs, textCol, idCol, shingleSize, th).df
    }
  }

  /** [[minhashPairs]] with the verification pair-set's storage
    * lifecycle in the caller's hands: consume `df`, then `release()`. */
  def minhashPairsScoped(docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      verifyJaccard: Option[Double] = Some(0.7)): Scoped = {
    val b = minhashBands(docs, textCol, idCol, shingleSize, bands, rowsPerBand)
    val l = b.select(col("band"), col("bucket"), col(idCol).as("id1"))
    val r = b.select(col("band"), col("bucket"), col(idCol).as("id2"))
    val cand = l.join(r, Seq("band", "bucket"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    verifyJaccard match {
      case None     => Scoped(cand, () => ())
      case Some(th) => verifyCandidates(cand, docs, textCol, idCol, shingleSize, th)
    }
  }

  /** Adaptive-verify regime switch: a corpus is "dup-dense" when the
    * candidate set carries at least this many pairs per involved doc
    * (and enough absolute pairs for the extra stages to amortize).
    * Per-pair UDF verify re-tokenizes BOTH texts for every pair — cost
    * ∝ pairs — so it loses when duplicate density multiplies pairs per
    * doc; per-doc hash-array verify tokenizes each involved doc ONCE
    * and pays a long-array intersect per pair, but its build stages
    * (semi-join + array exchange) are pure overhead when candidates are
    * few. Measured crossover on the sf0.1 corpus at duplicate
    * multiplicities K = 2/8/16/32 (pairs/doc 1.1/4.4/10.4/18.5): UDF
    * wins 2.0×/1.3× below ratio ~10, the branches tie at ~10, hash-array
    * wins from there and its lead grows with density (SCALE.md round-10
    * table; the intersect's per-pair cost is ~3× cheaper than the
    * UDF's double tokenization, so the asymptotic win tracks ratio). */
  private[graft] val DenseVerifyPairsPerDoc = 10.0
  private[graft] val DenseVerifyMinPairs = 512L

  /** Exact shingle-Jaccard verification of candidate (id1, id2) pairs —
    * texts join back only for the candidate ids, never the corpus.
    *
    * REGIME-ADAPTIVE (one code path, the engine picks): the pair set is
    * localCheckpointed once (it feeds the stats probe and the verify —
    * without it each action would replay the band join), its pair count
    * and involved-doc count read from the materialized blocks, and the
    * pairs-per-doc ratio picks the branch:
    *   - few-candidate (clean corpus): per-pair UDF over the raw texts —
    *     two joins and one tokenization per pair, no per-doc build cost;
    *   - dup-dense ([[DenseVerifyPairsPerDoc]]+ pairs/doc): per-doc
    *     64-bit shingle-hash arrays built ONCE per involved id
    *     (candidate-id semi-join, pure codegen Columns), pairs verified
    *     by long-array intersect — identical Jaccard values (64-bit
    *     collisions across ~10²-shingle sets are ~2⁻⁵⁰ events; same
    *     argument as [[ngramJaccardPairs]]).
    *
    * The explicit-width repartition is load-bearing in BOTH branches:
    * AQE coalesces the upstream candidate `distinct()` by BYTES, and a
    * pair is 16 bytes — a dup-dense corpus' 200 k pairs look like one
    * ~3 MB partition, so the whole verify pipeline (two joins +
    * per-pair work, the per-ROW-expensive part) collapsed onto 1-2
    * tasks (measured 8.8 s on 2 tasks at sf1; the numbered repartition
    * is exempt from AQE coalescing and restores session-width
    * parallelism for ~0.1 s of exchange). */
  private def verifyCandidates(cand0: DataFrame, texts: DataFrame,
      textCol: String, idCol: String, shingleSize: Int, th: Double): Scoped = {
    val (cand, release) = checkpointTracked(cand0)
    val width = cand.sparkSession.sessionState.conf.numShufflePartitions
    val stats = cand.agg(count(lit(1)).as("n"),
      approx_count_distinct(col("id1")).as("d1"),
      approx_count_distinct(col("id2")).as("d2")).head()
    val nPairs = stats.getLong(0)
    // every pair's ids split across the two columns; the larger side's
    // distinct count lower-bounds involved docs well enough to branch
    val docsInvolved = math.max(math.max(stats.getLong(1), stats.getLong(2)), 1L)
    val ratioTh = cand.sparkSession.conf
      .getOption("spark.graft.verify.densePairsPerDoc")
      .map(_.toDouble).getOrElse(DenseVerifyPairsPerDoc)
    val dense = nPairs >= DenseVerifyMinPairs &&
      nPairs.toDouble / docsInvolved >= ratioTh
    if (sys.env.contains("GRAFT_VERIFY_DEBUG"))
      System.err.println(s"[graft] verifyCandidates: pairs=$nPairs " +
        s"docsInvolved=$docsInvolved ratio=${nPairs.toDouble / docsInvolved}" +
        s" branch=${if (dense) "hash-array" else "udf"}")
    val part = cand.repartition(width, col("id1"))
    var releaseSh: () => Unit = () => ()
    val verified =
      if (!dense) {
        val jaccardUdf = udf((a: String, b: String) =>
          Hashing.jaccard(a, b, shingleSize))
        val txt = texts.select(col(idCol), col(textCol))
        part
          .join(txt.select(col(idCol).as("id1"), col(textCol).as("t1")), "id1")
          .join(txt.select(col(idCol).as("id2"), col(textCol).as("t2")), "id2")
          .withColumn("jaccard",
            TextFunctions.trunc4(jaccardUdf(col("t1"), col("t2"))))
          .where(col("jaccard") >= th)
          .select("id1", "id2", "jaccard")
      } else {
        // distinct shingle-hash set per involved doc, built once —
        // CHECKPOINTED once too: the array table feeds BOTH join sides
        // as separate plan branches, so without it the corpus
        // tokenization (the dominant build cost) runs twice
        val ids = cand.select(col("id1").as(idCol))
          .unionByName(cand.select(col("id2").as(idCol))).distinct()
        // the token array materializes in its OWN projection before the
        // shingle transform slices it (same shape as ngramJaccardPairs):
        // inlining the split into the lambda re-evaluates it per shingle
        // element — interpreted HOFs don't share subtrees — which made
        // the array build O(words²) per doc (measured 7 s vs 0.9 s for
        // a 35 k-doc build)
        val (sh, relSh) = checkpointTracked(
          texts.join(ids, Seq(idCol), "left_semi")
            .select(col(idCol),
              split(lower(trim(col(textCol))), "\\s+").as("w"))
            .select(col(idCol), array_distinct(
              when(size(col("w")) < shingleSize,
                array(xxhash64(concat_ws(" ", col("w")))))
              .otherwise(transform(
                sequence(lit(1), size(col("w")) - (shingleSize - 1)),
                i => xxhash64(concat_ws(" ",
                  slice(col("w"), i, lit(shingleSize))))))).as("sh")))
        releaseSh = relSh
        val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
        val j = inter / (size(col("sh1")) + size(col("sh2")) - inter)
        part
          .join(sh.select(col(idCol).as("id1"), col("sh").as("sh1")), "id1")
          .join(sh.select(col(idCol).as("id2"), col("sh").as("sh2")), "id2")
          .withColumn("jaccard", TextFunctions.trunc4(j))
          .where(col("jaccard") >= th)
          .select("id1", "id2", "jaccard")
      }
    Scoped(verified, () => { release(); releaseSh() })
  }

  /** Incremental MinHash dedup — the 100 TB workflow: the corpus is
    * never re-sketched. Persisted state is the band table
    * (band, bucket, id) from [[minhashBands]] (~`bands` 20-byte rows per
    * doc); a new batch is sketched alone, candidate pairs are every pair
    * touching a new doc — (new × store) ∪ (new × new) via the same band
    * equi-join — and verification joins text only for candidate ids
    * (`allTexts` must cover store ids too, e.g. the lake table the store
    * indexes). The state update is a blind append of the new batch's
    * bands — no read-modify-write, so batches commit independently.
    * Equivalence to the full-batch run is gated: pairs(full corpus) =
    * pairs(old corpus) ∪ incremental(new, store) — q_dedup_incremental
    * asserts exactly this set equality.
    *
    * Returns a [[Scoped]]: the batch's band sketch is materialized once
    * (localCheckpoint — it feeds BOTH join sides as different plan
    * branches, so without it the per-doc sketch UDF, the dominant batch
    * cost, runs twice) and `release()` frees exactly those blocks once
    * the pairs have been consumed. */
  def minhashIncrementalPairs(newDocs: DataFrame, store: DataFrame,
      allTexts: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      verifyJaccard: Option[Double] = Some(0.7)): Scoped = {
    val (newBands, release) = checkpointTracked(
      minhashBands(newDocs, textCol, idCol, shingleSize, bands, rowsPerBand))
    val l = newBands.select(col("band"), col("bucket"), col(idCol).as("idN"))
    val r = store.unionByName(newBands)
      .select(col("band"), col("bucket"), col(idCol).as("idO"))
    val cand = l.join(r, Seq("band", "bucket"))
      .where(col("idN") =!= col("idO"))
      .select(least(col("idN"), col("idO")).as("id1"),
        greatest(col("idN"), col("idO")).as("id2"))
      .distinct()
    verifyJaccard match {
      case None     => Scoped(cand, release)
      case Some(th) =>
        val v = verifyCandidates(cand, allTexts, textCol, idCol, shingleSize, th)
        Scoped(v.df, () => { release(); v.release() })
    }
  }

  /** 64-bit SimHash column — native codegen expression over the
    * compiled kernel (bit-identical to the former UDF; null → 0L). */
  def simhash(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(org.apache.spark.sql.graftnative.SimHash64(
      ColumnBridge.expression(text)))
  }

  /** SimHash near-dup pairs: bucket by 16-bit prefix (near-dups almost
    * always share it), verify hamming distance ≤ maxHamming within the
    * bucket only. */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    // Pigeonhole-COMPLETE bucketing: split the 64-bit signature into
    // maxHamming+1 disjoint bit segments — a pair differing in at most
    // maxHamming bits cannot touch every segment, so it agrees exactly
    // on at least one and is guaranteed to co-bucket there. (A single
    // 16-bit prefix bucket — the earlier design — silently missed any
    // near-dup whose flipped bits landed in the prefix; measured recall
    // vs shingle-Jaccard ground truth was ~0.4 on the test corpus from
    // exactly that.) Shuffle cost: maxHamming+1 rows per doc keyed by
    // (segment-id, segment-value) — still ≈ rows × (h+1), uniform, never
    // all-pairs. The distinct() dedups pairs that co-bucket in several
    // segments before the hamming verify.
    //
    // COST MODEL (multi-index-hashing tradeoff): segment width is
    // 64/(h+1) bits, so random-collision candidates scale as
    // n² · (h+1) / 2^(64/(h+1)) — the hamming budget is a superlinear
    // cost knob. h=3 → 16-bit segments (65k buckets) stays selective to
    // very large n; h=6 → 9-bit segments (512 buckets) measured 17×
    // slower at 50k docs. For loose budgets at 100 TB-corpus scale,
    // widen the signature (128-bit simhash → h=7 keeps 16-bit segments)
    // rather than narrowing the segments.
    val fields = maxHamming + 1
    val width = 64 / fields
    val withSh = docs.select(col(idCol), simhash(col(textCol)).as("sh"))
    val segmented = withSh.select(col(idCol), col("sh"),
      posexplode(array((0 until fields).map { f =>
        // segment f: bits [f*width, (f+1)*width) — last segment keeps
        // the remainder bits via unsigned shift
        shiftrightunsigned(col("sh"), f * width)
          .bitwiseAND(lit(if (f == fields - 1) -1L >>> (f * width)
                          else (1L << width) - 1))
      }: _*)))
      .withColumnRenamed("pos", "seg")
      .withColumnRenamed("col", "segval")
    val l = segmented.select(col("seg"), col("segval"),
      col(idCol).as("id1"), col("sh").as("sh1"))
    val r = segmented.select(col("seg"), col("segval"),
      col(idCol).as("id2"), col("sh").as("sh2"))
    l.join(r, Seq("seg", "segval"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        call_function("bit_count", col("sh1").bitwiseXOR(col("sh2"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** n-gram Jaccard similarity of two text columns (row-local). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val jUdf = udf((x: String, y: String) => Hashing.jaccard(x, y, n))
    TextFunctions.trunc4(jUdf(a, b))
  }

  /** n-gram Jaccard dedup with prefix-bucket candidate generation: docs
    * sharing their first `n`-word shingle are candidate pairs, verified
    * with exact shingle-set Jaccard ≥ threshold. The bucket key bounds the
    * self-join (shuffle on a short string, no all-pairs); boilerplate-
    * prefix skew at corpus scale is handled by AQE skew-join — or swap the
    * bucket for minhash bands ([[minhashPairs]]) when prefixes collide.
    *
    * Verification cost shape: each doc's DISTINCT shingle set is built
    * ONCE, pre-join, as a 64-bit-hash array (pure codegen Columns — one
    * tokenize + one xxhash64 per shingle per doc); a candidate pair then
    * costs a single long-array intersect. The earlier shape verified
    * with a per-pair UDF over the raw texts — re-tokenizing both sides
    * for every candidate — which goes quadratic-in-CPU exactly when
    * duplicate density rises (a dup-dense corpus multiplies pairs per
    * bucket; measured 28× at a 10× inflation with 4 verbatim copies per
    * doc). Hashing shingles before the set ops keeps the Jaccard counts
    * identical to the oracle's string-set semantics (64-bit collisions
    * across a doc pair's ~10²-shingle sets are ~2⁻⁵⁰ events) while the
    * exchange carries 8 B per distinct shingle instead of its text. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.4): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    val keyed = docs
      .select(col(idCol), words.as("w"))
      .select(col(idCol),
        concat_ws(" ", slice(col("w"), 1, n)).as("bucket"),
        array_distinct(
          when(size(col("w")) < n,
            array(xxhash64(concat_ws(" ", col("w")))))
          .otherwise(transform(
            sequence(lit(1), size(col("w")) - (n - 1)),
            i => xxhash64(concat_ws(" ", slice(col("w"), i, lit(n)))))))
          .as("sh"))
    val l = keyed.select(col("bucket"), col(idCol).as("id1"), col("sh").as("sh1"))
    val r = keyed.select(col("bucket"), col(idCol).as("id2"), col("sh").as("sh2"))
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    val j = inter / (size(col("sh1")) + size(col("sh2")) - inter)
    l.join(r, Seq("bucket"))
      .where(col("id1") < col("id2"))
      .withColumn("j", j)
      .where(col("j") >= threshold)
      .select(col("id1"), col("id2"), TextFunctions.trunc4(col("j")).as("jaccard"))
  }

  /** Connected components over near-dup pairs → dedup clusters, each
    * doc labeled with its cluster's minimum id (the canonical survivor).
    * Each round does (a) one hop of min-label propagation across the
    * edge list, then (b) a pointer-doubling shortcut — relabel through
    * the label's own label (`cluster ← label(cluster)`). Hop alone
    * needs O(diameter) rounds; doubling compresses label CHAINS, but on
    * adversarial shapes — long paths whose node ids are in random order
    * along the path — the label forest flattens to per-region local
    * minima (doubling becomes a no-op) and progress reverts to
    * region-merge hops, observed at ~2× the ideal log bound (17 rounds
    * on a 2 000-node near-path graph, the sf0.1 embedding-similarity
    * shape). `maxIter` is a SAFETY RAIL against genuinely divergent
    * input, not a tuning knob — a converged result is exact regardless
    * of round count (labels are monotone non-increasing with a strict-
    * decrease probe), and extra headroom costs nothing when the loop
    * exits early — so it defaults generously.
    * Each iteration is a bounded number of shuffles on id;
    * `localCheckpoint` truncates the growing lineage so round N's plan
    * doesn't replay rounds 1..N-1 (the standard Spark pattern for
    * iterative graph algorithms — GraphX/Pregel does the same).
    * If the loop exhausts `maxIter` while labels are still changing,
    * this THROWS rather than return silently-wrong clusters.
    *
    * Input: pairs (id1, id2); ids absent from any pair are their own
    * cluster (callers usually only care about docs that appear in pairs).
    * Output: (id, cluster) — cluster = min id reachable.
    *
    * State lifecycle: every intermediate checkpoint (edges, per-round
    * labels) is freed as soon as the round that consumed it has
    * materialized — only the FINAL label table's blocks survive the
    * call (they hold the result). [[clustersScoped]] hands back their
    * release; this convenience overload is for callers whose session
    * sweeps persistent blocks itself (bench/verify harnesses). */
  def clusters(pairs: DataFrame, maxIter: Int = 64): DataFrame =
    clustersScoped(pairs, maxIter).df

  /** [[clusters]] with the result's storage lifecycle in the caller's
    * hands: consume `df`, then `release()`. */
  def clustersScoped(pairs: DataFrame, maxIter: Int = 64): Scoped = {
    // localCheckpoint truncates LINEAGE but carries the origin plan's
    // ESTIMATED stats into the checkpoint (LogicalRDD originStats).
    // In an iterative loop that estimate COMPOUNDS: each round's join
    // estimate is the product of its children's, the checkpoint bakes
    // the product in, and the next round multiplies again — the BigInt
    // sizeInBytes doubles its bit-length every round until Catalyst's
    // stats visitor spends minutes on million-bit arithmetic and
    // finally overflows BigInteger (observed at ~25 rounds). Cutting
    // stats by re-wrapping the checkpointed RDD resets every round to
    // the default estimate; cost is one row-conversion pass per use of
    // a frame that is already materialized and loop-bounded in size.
    // round 15: the stats-cut re-wrap goes through DatasetBridge — the
    // public `createDataFrame(cp.rdd, schema)` form deserialized every
    // InternalRow to an external Row and serialized it straight back on
    // every downstream read, one full copy of the label table per use
    // per round, pure conversion overhead at any scale.
    // round 16: checkpoint drain and the convergence probe are ONE job —
    // `sumOf` (when set) folds the label sum over the SAME action that
    // materializes the checkpoint blocks, so a round costs 3 sequential
    // actions instead of 5 (the probe was a separate job per frame; at
    // sf-scale these gates are action-barrier-bound — JobCount r15/16).
    def checkpointCut(df: DataFrame,
        sumOf: Option[org.apache.spark.sql.catalyst.InternalRow => Long])
        : (DataFrame, () => Unit, Option[BigInt]) = {
      val rdd = df.queryExecution.toRdd.map(_.copy())
      rdd.localCheckpoint()
      val sum = sumOf match {
        case Some(f) =>
          Some(rdd.mapPartitions { it =>
            var s = BigInt(0)
            while (it.hasNext) s += f(it.next())
            Iterator.single(s)
          }.collect().sum)
        case None => rdd.count(); None
      }
      (org.apache.spark.sql.graftbridge.DatasetBridge.fromInternalRows(
        df.sparkSession, rdd, df.schema),
        () => { rdd.unpersist(blocking = false); () }, sum)
    }
    // undirected edge list, both directions, symmetrized via ONE
    // Generate, not a self-union: the union form reads `pairs` twice as
    // two differently-projected plan branches, and when the caller
    // hands an un-materialized pair pipeline the whole upstream runs
    // twice unless exchange reuse happens to fire (round 15 —
    // explode(array(fwd, swapped)) evaluates it once).
    // The DECLARED-layout form ([[partitionedCheckpointCut]], used by
    // pageRank where 6 fixed rounds amortize its setup: −21% at the
    // alternating X=100 A/B) was ALSO tried here and REJECTED with
    // data: clusters converges in ONE round on duplicate-cluster
    // corpora (star-shaped, SCALE.md round-10), so the setup's extra
    // materialization + re-layout exchange never pays — alternating
    // X=100 A/B measured 233.7 vs 190.1 s min (+23%). A plain
    // checkpoint keeps setup minimal; the SHUFFLE_HASH hop below still
    // removes the per-round edge SORT (the round-12 LPA lesson).
    var (edges, releaseEdges, _) = checkpointCut(
      pairs.select(explode(array(
          struct(col("id1").as("src"), col("id2").as("dst")),
          struct(col("id2").as("src"), col("id1").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct(), None)
    // init = hop 0 fused: label(v) = min(v, min neighbor) — one agg
    // instead of a full identity-labeled first round
    val labelsInit = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("cluster"))
    // convergence probe: labels are monotonically non-increasing per
    // node, so the label sum strictly decreases until fixpoint — an
    // unchanged exact sum proves convergence with no compare-join.
    // The cluster-column reader is chosen ONCE from the actual schema:
    // getLong on a non-Long column is an undefined word read off the
    // unsafe row (ADVICE r15 — clusters() is public and never casts its
    // ids), so integral types get their exact reader and anything else
    // falls back to a type-generic Decimal(38,0) aggregate probe (the
    // pre-r15 form: one extra job per probe, correctness first).
    val clusterReader: Option[org.apache.spark.sql.catalyst.InternalRow => Long] =
      labelsInit.schema(1).dataType match {
        case LongType    => Some(_.getLong(1))
        case IntegerType => Some(r => r.getInt(1).toLong)
        case ShortType   => Some(r => r.getShort(1).toLong)
        case ByteType    => Some(r => r.getByte(1).toLong)
        case _           => None
      }
    def genericSum(df: DataFrame): BigInt = {
      val d = df.agg(sum(col(df.columns(1)).cast(DecimalType(38, 0)))).head()
      if (d.isNullAt(0)) BigInt(0) else BigInt(d.getDecimal(0).toBigInteger)
    }
    var (labels, releaseLabels, sum0) = checkpointCut(labelsInit, clusterReader)
    var prevSum = sum0.getOrElse(genericSum(labels))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // ADAPTIVE declared edge layout (round 16, VERDICT r15 #5): the
      // loop-invariant edge table is exchanged by the hop join EVERY
      // round, and the r15 adjudication split by corpus shape —
      // duplicate-cluster (star) corpora converge in 1 round, where the
      // declared layout's setup (one measure job + one re-layout
      // exchange + one drain) never pays (+23% at X=100), while deep
      // chain-shaped graphs replay the edge exchange O(log n) times.
      // Resolution: keep the minimal setup AND declare the layout, but
      // only once the loop has PROVEN it is long — after round 2 the
      // remaining-rounds estimate is already ≥ the setup cost, and the
      // re-layout runs over the already-materialized checkpoint blocks
      // (never the upstream pair pipeline; relayoutCheckpointed reads
      // them directly, so peak residency is old + laid-out — two edge
      // copies transiently, not three). 1-round corpora keep the
      // r15-adjudicated minimal form verbatim.
      if (iter == 2) {
        val (laid, releaseLaid) = relayoutCheckpointed(edges.sparkSession,
          edges.queryExecution.toRdd, edges.schema, Seq("src"))
        releaseEdges()
        edges = laid
        releaseEdges = releaseLaid
      }
      // Each round is the small-star / large-star contraction cycle of
      // the MapReduce CC algorithms (Kiveris et al. 2014), expressed on
      // a label table instead of an edge rewrite:
      //  (a) graph hop — min over graph-neighbors' labels ∪ own;
      //  (b) small-star — group members' POST-hop labels by their
      //      PRE-hop center and let the center adopt the min (a member
      //      that just learned a smaller min from an adjacent region
      //      teaches its star center THIS round, not after O(region)
      //      graph hops);
      //  (c) large-star / pointer doubling — members adopt their
      //      center's new label.
      // Regions then merge pairwise in parallel (label count decreases
      // geometrically), which is what makes rounds logarithmic on
      // chain-shaped similarity graphs — smooth embedding manifolds
      // produce exactly those chains, and (a)+(c) alone degrade to
      // O(diameter) graph hops there (a 3 000-node random-id path
      // exhausted 64 rounds before (b) was added; with it: ~12).
      // SHUFFLE_HASH on the label side: the hash build is the label
      // table; the default sort-merge SORTED THE EDGE SIDE every round
      // (the labelPropagation round-12 lesson). Edge side: declared
      // layout — no exchange, no sort, streams from checkpoint blocks.
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("id"), col("cluster"))
      // checkpoint before the self-join: materializes the hop once (both
      // join sides read it) and sidesteps Catalyst's Union-constraint
      // attribute-rewrite bug on self-joined union plans
      val (hopped0, releaseHopped0, _) = checkpointCut(
        labels.unionAll(viaNeighbors)
          .groupBy("id").agg(min("cluster").as("cluster")), None)
      // (b) small-star: centers (pre-hop labels) adopt the min of what
      // their members just learned. Deliberately SMJ (no SHUFFLE_HASH):
      // pinning SHJ here and on the doubling join was tried in round 16
      // and REJECTED with data — X=100 chain A/B (19 rounds, 5M-node
      // path) measured +16% summed task time (6586/6704 vs 5858/5537 s)
      // for −49% peak stage memory; both join inputs are LABEL-scale
      // long-key tables, where Spark's radix sort is cheaper than a
      // per-round per-partition hash build. The hop join's SHJ pin is
      // different: it avoids sorting the EDGE side, which dominates the
      // labels. Plans of both forms: plans/r16/round_clusters_{star,
      // double}_{before,after}.txt; rows in SCALE.md round 16.
      val viaMembers = labels.where(col("id") =!= col("cluster"))
        .select(col("id").as("mid"), col("cluster").as("center"))
        .join(hopped0.withColumnRenamed("id", "mid"), "mid")
        .select(col("center").as("id"), col("cluster"))
      val (hopped, releaseHopped, hopSum0) = checkpointCut(
        hopped0.unionAll(viaMembers)
          .groupBy("id").agg(min("cluster").as("cluster")), clusterReader)
      releaseHopped0()
      // the round's reads of the previous labels are done
      releaseLabels()
      val hopSum = hopSum0.getOrElse(genericSum(hopped))
      if (hopSum == prevSum) {
        // the hop moved nothing → fixpoint; skip the doubling join
        labels = hopped
        releaseLabels = releaseHopped
        converged = true
      } else {
        // (c) pointer doubling: follow the label one more step. Labels
        // only ever shrink (cluster ≤ id and label(c) ≤ c), so the
        // shortcut label is min(cluster, label(cluster)) = label(cluster).
        // deliberately SMJ — see the small-star join's rejection note
        val (next, releaseNext, nextSum0) = checkpointCut(
          hopped.alias("a")
            .join(hopped.select(col("id").as("cluster"), col("cluster").as("c2")).alias("b"),
              Seq("cluster"), "left")
            .select(col("id"), coalesce(col("c2"), col("cluster")).as("cluster")),
          clusterReader)
        releaseHopped() // doubling result materialized → hop is dead
        prevSum = nextSum0.getOrElse(genericSum(next))
        labels = next
        releaseLabels = releaseNext
      }
      iter += 1
    }
    releaseEdges()
    if (!converged) {
      releaseLabels()
      throw new IllegalStateException(
        s"clusters() did not converge in $maxIter rounds — raise maxIter")
    }
    if (sys.env.contains("GRAFT_VERIFY_DEBUG"))
      System.err.println(s"[graft] clusters: converged after $iter rounds")
    Scoped(labels, releaseLabels)
  }

  /** Embedding-cosine near-dup, three-stage at scale:
    *  1. per-row 64-bit hyperplane signature (compiled UDF, one map);
    *     low `bits` bits double as the LSH bucket key; L2 norm computed
    *     once per row (codegen vec_dot, no UDF);
    *  2. bucket equi-join with a codegen'd hamming prefilter
    *     `bit_count(sig1^sig2) ≤ 64·acos(t)/π + slack` — kills the bulk
    *     of bucket-mate pairs before any array work;
    *  3. exact cosine only on survivors — the native codegen'd
    *     [[VectorFunctions.dot]] over the ORIGINAL float vectors
    *     (half the shuffle bytes of normalized doubles, primitive loop
    *     inside whole-stage codegen), divided by the precomputed norms.
    * Approximate by construction (LSH recall < 1); `dim` fixes the
    * hyperplanes host-side so every executor regenerates them.
    * Degenerate-exact mode: `bits = 0` puts every row in one bucket and a
    * window of ≥64 bits (the clamp) makes the hamming predicate vacuously
    * true, so the pipeline computes exact all-pairs cosine — the
    * value-gate setting (`q_dedup_embedding_exact`); the clamp is 64, not
    * 63, because a full-complement signature pair differs in all 64 bits
    * and a 63-bit window would silently drop it from "exact" output. */
  /** Hamming prefilter budget for [[embeddingNearDups]]: expected
    * differing bits at angle acos(threshold) plus slack, clamped to the
    * 64-bit signature. Public so the DuckDB oracle replay
    * (Queries.qDedupEmbeddingSql) derives the SAME constant. */
  def hammingLimit(threshold: Double, slackBits: Int): Int = math.min(
    math.round(64.0 * math.acos(math.max(math.min(threshold, 1.0), -1.0)) / math.Pi).toInt
      + slackBits, 64)

  def embeddingNearDups(embs: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, bits: Int = 8, dim: Int = 64,
      slackBits: Int = 4): DataFrame = {
    val planes = Hashing.hyperplanes(64, dim)
    val hamLimit = hammingLimit(threshold, slackBits)
    val mask = (1L << bits) - 1
    val withB = embs.select(col(idCol), col(vecCol))
      .withColumn("sig", VectorFunctions.lshSig(col(vecCol), planes))
      .withColumn("nrm", VectorFunctions.norm(col(vecCol)))
      .withColumn("bucket", col("sig").bitwiseAND(lit(mask)))
    // candidate generation joins only (bucket, id, sig) — 24-byte rows —
    // vectors are re-attached to the (much smaller) hamming-survivor set
    val slim = withB.select(col("bucket"), col(idCol), col("sig"))
    val l = slim.select(col("bucket"), col(idCol).as("id1"), col("sig").as("sig1"))
    val r = slim.select(col("bucket"), col(idCol).as("id2"), col("sig").as("sig2"))
    val survivors = l.join(r, Seq("bucket"))
      .where(col("id1") < col("id2") &&
        call_function("bit_count", col("sig1").bitwiseXOR(col("sig2"))) <= hamLimit)
      .select("id1", "id2")
    val vecs = withB.select(col(idCol), col(vecCol), col("nrm"))
    // no broadcast hint: AQE picks broadcast when the vector side is
    // small; at 100 TB this correctly degrades to a shuffle join
    survivors
      .join(vecs.select(col(idCol).as("id1"), col(vecCol).as("v1"), col("nrm").as("n1")), "id1")
      .join(vecs.select(col(idCol).as("id2"), col(vecCol).as("v2"), col("nrm").as("n2")), "id2")
      .withColumn("cos",
        when(col("n1") === 0.0 || col("n2") === 0.0, lit(0.0))
          .otherwise(VectorFunctions.dot(col("v1"), col("v2")) / (col("n1") * col("n2"))))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"),
        (floor(col("cos") * lit(10000.0)) / lit(10000.0)).as("cosine"))
  }

  /** Cross-document duplicated-SPAN detection — substring-level dedup,
    * the training-data op of Lee et al., "Deduplicating Training Data
    * Makes Language Models Better" (ACL 2022): whole-document dedup
    * misses boilerplate/license blocks/templates repeated INSIDE
    * otherwise-distinct documents. Every `window`-word sliding span is
    * fingerprinted and fingerprints seen in ≥ `minDocs` distinct
    * documents are duplicated spans.
    *
    * Spark shape: one generate (explode of the per-position span list —
    * no shuffle, like DocChunker) into one hash-aggregate on the
    * 16-hex-char md5 fingerprint. The fingerprint — not the raw span
    * text — is the grouping key, so the exchange carries 16 bytes per
    * span instead of the span itself; at 100 TB the shuffle is bounded
    * by span count × 16 B and the aggregate state by DISTINCT spans
    * (boilerplate collapses map-side via partial aggregation). md5 (not
    * xxhash64) keeps the gate DuckDB-replayable, same trade as
    * [[exact]]'s fingerprint.
    *
    * Output: (fp, n_docs, n_occurrences, keep_id) per duplicated span —
    * keep_id = the lowest doc id, the canonical survivor convention of
    * [[clusters]]. */
  /** (doc_id, fp) for every `window`-word sliding span — the shared
    * front half of [[duplicatedSpans]] and [[spanDupRatio]]. */
  private def spanFps(docs: DataFrame, textCol: String, idCol: String,
      window: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        split(lower(trim(col(textCol))), "\\s+").as("w"))
      .where(size(col("w")) >= window)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${window - 1}), " +
          s"i -> concat_ws(' ', slice(w, i, $window)))")).as("span"))
      .select(col("doc_id"), substring(md5(col("span")), 1, 16).as("fp"))

  def duplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
      window: Int = 8, minDocs: Int = 2): DataFrame = {
    require(window >= 1 && minDocs >= 1)
    spanFps(docs, textCol, idCol, window)
      .groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("keep_id"))
      .where(col("n_docs") >= minDocs)
  }

  /** Per-document duplicated-span COVERAGE — the quality-filter signal
    * built on [[duplicatedSpans]]: what fraction of a doc's spans also
    * appear in other documents (1.0 = pure boilerplate, 0.0 = fully
    * original). Training-data pipelines threshold on this to drop
    * template-dominated documents rather than just cutting the spans.
    * Shape: span fps → ONE hash-aggregate to (fp, doc_id, n_occ) pairs
    * → a COUNT-over-fp window marks each pair with its fingerprint's
    * distinct-doc count (pairs are unique per (fp, doc), so plain
    * window COUNT IS the distinct-doc count — no second corpus scan,
    * no join-back) → per-doc rollup. The corpus-sized span stream is
    * generated and shuffled exactly once (plan: a single Generate
    * subtree); every later exchange moves only the slim pair set
    * (distinct (fp, doc) × ~28 B), the bound that survives a dup-dense
    * 100 TB corpus. Ratio floor-truncated to 4 decimals (oracle
    * determinism, the engine's ratio convention). */
  def spanDupRatio(docs: DataFrame, textCol: String, idCol: String,
      window: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = spanFps(docs, textCol, idCol, window)
      .groupBy("fp", "doc_id").agg(count(lit(1)).as("n_occ"))
    pairs
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("fp")))
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_spans"),
        sum(when(col("nd") >= 2, col("n_occ")).otherwise(lit(0))).as("n_dup"))
      .select(col("doc_id"), col("n_spans"), col("n_dup"),
        (floor(col("n_dup") / col("n_spans") * 10000.0) / 10000.0).as("dup_ratio"))
  }

  /** WINNOWING fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    * 2003) — the local document-fingerprinting algorithm with the
    * guarantee sliding-span hashing lacks: from every window of `w`
    * consecutive k-gram hashes, select the MINIMUM (rightmost on ties),
    * so any shared substring of length ≥ w + k − 1 between two
    * documents is caught by at least one shared fingerprint while only
    * ~2/(w+1) of positions are kept. The sparse (pos, fp) set is what
    * plagiarism/near-dup systems (MOSS) store instead of every span.
    *
    * Scale shape: ZERO shuffle — gram hashing, window minima, and
    * per-doc dedup are all array arithmetic inside one codegen
    * projection + one Generate; nothing exchanges until whatever the
    * caller aggregates. (The window-function formulation — min OVER
    * (PARTITION BY doc ROWS w−1 PRECEDING) — costs a full corpus
    * exchange keyed by doc; per-row arrays need none.)
    *
    * Engine portability (the gate replays bit-for-bit in DuckDB): gram
    * hash = 28-bit md5 prefix; rightmost-min tie-break is encoded
    * arithmetically as key = h·2³¹ + (2³¹−1−pos), so ONE integer
    * `array_min` per window picks both the min hash and its rightmost
    * position — no argmin lambda, no float anywhere.
    *
    * Output: (doc_id, pos, fp) — 0-based gram position, one row per
    * distinct selected fingerprint position; docs with fewer than
    * w + k − 1 tokens emit nothing (no complete window). */
  def winnowFingerprints(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4, portableHash: Boolean = true): DataFrame = {
    require(k >= 1 && w >= 1)
    val M = 2147483648L // 2^31: pos fits far below, h is 28-bit
    // gram-hash tiers, the Dsir trade: md5 prefix (default — the value
    // gates replay it in DuckDB) vs codegen xxhash64 folded to 28 bits
    // (for production corpora where the hash dominates the scan CPU;
    // any stable hash selects valid winnow fingerprints)
    val gramHash =
      if (portableHash)
        "conv(substring(md5(concat_ws(' ', slice(wd, i, %d))), 1, 7), 16, 10)".format(k)
      else
        "(xxhash64(concat_ws(' ', slice(wd, i, %d))) & 268435455)".format(k)
    // The selected-keys array feeds the Generate as an inline
    // EXPRESSION deliberately — do NOT factor it into its own
    // projection so the explode consumes an attribute. Round 16
    // measured that trap: an attribute-input explode passes
    // InferFiltersFromGenerate's cheap-input check (SPARK-33544), the
    // inferred `size(..) > 0` then pushes through the projections BY
    // SUBSTITUTION, and the scan filter ends up re-evaluating the
    // whole gram-hash chain once per row while column pruning below
    // the now-divergent branches breaks exchange reuse — q_winnow_pairs
    // went 5 → 415 task-seconds at sf0.1 before the form was reverted.
    docs
      .select(col(idCol).as("doc_id"),
        split(lower(trim(col(textCol))), "\\s+").as("wd"))
      .where(size(col("wd")) >= k + w - 1)
      // keys[i] = h(gram at i)·2³¹ + (2³¹−1−i), i 0-based
      .select(col("doc_id"), expr(
        s"""transform(sequence(1, size(wd) - ${k - 1}),
           |  i -> $gramHash
           |       * ${M}L + (${M - 1}L - (i - 1)))""".stripMargin).as("keys"))
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(transform(sequence($w, size(keys)),
           |  e -> array_min(slice(keys, e - ${w - 1}, $w))))""".stripMargin))
        .as("key"))
      .select(col("doc_id"),
        (lit(M - 1) - col("key").bitwiseAND(lit(M - 1))).as("pos"),
        shiftright(col("key"), 31).as("fp"))
  }

  /** MOSS-style near-dup pairs over [[winnowFingerprints]] — candidate
    * generation AND scoring from the same sparse fingerprint set, so
    * (unlike the seeded minhash path) the ENTIRE pipeline is integer
    * md5 arithmetic a value oracle replays. Output: (id1, id2, shared,
    * overlap) with overlap = shared / min(|fps₁|, |fps₂|) floored to 4
    * decimals — the containment-style score plagiarism detectors rank
    * by.
    *
    * Scale shape: fingerprints are ~2/(w+1) of gram positions, so the
    * pair join moves a fraction of what span-level joins move; the
    * quadratic hot-key risk (a boilerplate fingerprint shared by
    * thousands of docs) is cut by STOP-FINGERPRINT removal —
    * `maxDocsPerFp` drops fps above the document-frequency cap before
    * pairing, the standard MOSS move (an fp that common is boilerplate,
    * not evidence of copying). The cap is computed with one aggregate
    * on the already-shuffled fp key, no extra corpus pass. */
  def winnowPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4, minShared: Int = 2,
      maxDocsPerFp: Int = 100, portableHash: Boolean = true): DataFrame = {
    require(minShared >= 1 && maxDocsPerFp >= 2)
    // (Round 16 tried a row-local nf + shared-fp-exchange restructure
    // here — per-doc fingerprint arrays pre-explode, nf riding the
    // stream, no distinct / nf-join exchanges. REJECTED with data:
    // the attribute-input explode it required triggers
    // InferFiltersFromGenerate + pushdown-by-substitution (the whole
    // gram-hash chain re-evaluated per row inside the scan filter) and
    // column pruning below the no-longer-identical branches broke
    // exchange reuse — measured 415 vs 5 task-seconds at sf0.1. The
    // distinct() below is the load-bearing shared materialization
    // point all three consumers reuse; see winnowFingerprints' inline
    // scaladoc for the Generate-input rule.)
    val fps = winnowFingerprints(docs, textCol, idCol, k, w, portableHash)
      .select(col("doc_id"), col("fp")).distinct()
    val nf = fps.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    // df via aggregate + semi-style join, NOT a count-over-fp window:
    // the window form sorts the ENTIRE selected set per partition and
    // spilled 31 GiB at the 100× probe; the aggregate collapses to
    // (fp, df) map-side and hot fps are excluded BEFORE the pair join
    // ever sees their rows
    val liveFps = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocsPerFp).select("fp")
    val live = fps.join(liveFps, Seq("fp"))
    val pairs = live.select(col("doc_id").as("id1"), col("fp"))
      .join(live.select(col("doc_id").as("id2"), col("fp")), Seq("fp"))
      .where(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    pairs
      .join(nf.select(col("doc_id").as("id1"), col("nf").as("nf1")), Seq("id1"))
      .join(nf.select(col("doc_id").as("id2"), col("nf").as("nf2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("shared"),
        (floor(col("shared") / least(col("nf1"), col("nf2")) * 10000.0)
          / 10000.0).as("overlap"))
  }

  /** Edit-distance (Levenshtein) near-dup join via deletion
    * neighborhoods — FastSS (Bocek et al., 2007). Completeness: an
    * optimal edit script with k ≤ d operations names ≤ k positions per
    * side; deleting exactly those positions from each string leaves the
    * two sides IDENTICAL, so any pair within distance d shares at least
    * one member of their ≤d-deletion neighborhoods. Candidate
    * generation is a self-equi-join on a 64-bit hash of the deletion
    * variant — bucket-bounded like every dedup variant in this file,
    * never all-pairs — with the deletion-INDEX compatibility filter
    * before verification AT d = 1 ONLY: a same-length lev≤1 pair
    * differs at ≤ 1 position p and always shares the del-p/del-p
    * variant, so same-count (cnt=1/cnt=1) entries may be required to
    * agree on the deletion index exactly. On a padded-digit key space
    * this filter is what separates the ~4.5× candidate blow-up of
    * cross-position junk (e.g. "…12…"/"…21…" transpositions, genuine
    * distance 2) from the true pair set: measured 15.2 M → 3.3 M
    * candidates at the 10× probe, with candidates == verified pairs
    * (zero waste) at d = 1. At d = 2 NO deletion-INDEX filter is sound:
    * shift-shaped pairs ("9012345"/"0123458", lev 2 via delete-front +
    * append-back) share only deletion variants whose indices differ by
    * up to L−1 (an earlier ±d per-coordinate bound silently dropped
    * such pairs), and no CONTENT prefilter is worth having either —
    * multiset bounds (char histograms) are vacuous on index-matched
    * pairs (sharing a ≤d-deletion variant bounds the multiset diff at
    * 2d by construction) and the residual positional cut measured
    * ≤ 1.35× (the candidates are mostly TRUE pairs). The d=2 cost
    * center is instead attacked by verifying each pair ONCE: the raw
    * variant join emits every pair ~O(d·L) times (7.7× measured), so
    * candidates dedup on (id1, id2) — map-side combined — before the
    * banded-DP verify.
    *
    * Null strings are excluded up front (explicitly, not silently):
    * a NULL key has no deletion neighborhood and `levenshtein` would
    * null out any distance against it; callers wanting empty-string
    * semantics must coalesce before the call.
    *
    * Plan shape pinned by construction: the short strings ride THROUGH
    * the variant pipeline (verification is an inline codegen
    * `levenshtein`, no join-back to the source — a string-table
    * re-join was measured 2× the whole operator), and the self-join is
    * hinted SHUFFLE_HASH: Catalyst's scan-derived estimate does not see
    * the ~L× explode inflation and otherwise BROADCASTS the exploded
    * side (measured: a 3 M-row / ~150 MB driver-built broadcast wall —
    * at corpus scale an OOM).
    *
    * Entry generation is the compiled [[Hashing.deletionEntries]]
    * kernel (UDF-per-row like the minhash sketch: the HOF form is
    * interpreted and was ~25 µs/row). Intended domain: SHORT key-like
    * strings — names, titles, URLs, IDs (≤ ~64 chars); the neighborhood
    * is O(L^d) entries per row, so long-document near-dup belongs to
    * minhash/simhash/winnowing, not here. `maxBucket > 0` drops variant
    * keys shared by more than that many rows before the pair join — the
    * stop-fingerprint pattern from [[winnowPairs]] for adversarially
    * dense key spaces; 0 keeps the operator exact (the gate's setting).
    *
    * Character model: deletions operate on UTF-16 units while
    * `levenshtein` counts code points, so completeness is guaranteed
    * for BMP text only — an astral-plane character (emoji, rare CJK)
    * is two units, and a pair differing by one such character needs
    * d+1 unit-deletions to meet. Key-like strings (names, URLs, IDs)
    * are BMP in practice; normalize or widen d by one if the key space
    * is emoji-bearing.
    *
    * Output: (id1, id2, dist) with id1 < id2, dist ≤ maxDist.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucket: Int = 0): DataFrame =
    editCandidates(df, idCol, strCol, maxDist, maxBucket)
      // verify each PAIR once, not once per shared variant: a true ≤d
      // pair shares O(d·L) deletion variants, so the raw join emits
      // every pair with ~L-fold multiplicity (measured 7.7× on the
      // probe's padded-digit keys at d=2) and the banded-DP verify was
      // paying it in full. Map-side partial aggregation collapses the
      // duplicates before the exchange; dist is a pure function of the
      // pair, so first-row semantics are deterministic.
      .dropDuplicates("id1", "id2")
      // thresholded levenshtein (banded DP, early exit; returns -1 past
      // the bound) — measured 1.7× faster than the unbounded form on
      // the d=2 verify
      .withColumn("dist", levenshtein(col("s1"), col("s2"), maxDist))
      .where(col("dist") >= 0)
      .select(col("id1"), col("id2"), col("dist").cast(LongType).as("dist"))

  /** Pre-verification candidate rows of [[editDistancePairs]] (shared so
    * the scale probe can count the per-pair multiplicity cut without
    * forking the pipeline): all index-matched pairs surviving the
    * length band and the d=1 exact index filter, one row per SHARED
    * VARIANT. No per-pair content prefilter exists at d=2 by
    * measurement and proof: any multiset bound (char histograms) is
    * vacuous — two strings sharing a ≤d-deletion variant differ by ≤ 2d
    * multiset mass BY CONSTRUCTION — and the residual positional cut is
    * ≤ 1.35× on the probe keys (74% of distinct candidates verify as
    * true pairs; the key space is output-bound), so the win is
    * verify-once-per-pair, not a filter. */
  private[graft] def editCandidates(df: DataFrame, idCol: String,
      strCol: String, maxDist: Int, maxBucket: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (got $maxDist): the variant count is " +
        "O(L^d) per row — beyond d=2 use a sketch-based variant")
    val entriesUdf = udf((str: String) =>
      Hashing.deletionEntries(str, maxDist))
    val keyed = df
      .where(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s0"),
        length(col(strCol)).as("len"),
        explode(entriesUdf(col(strCol))).as("e"))
      .select(col("id"), col("s0"), col("len"), col("e._1").as("vk"),
        col("e._2").as("cnt"), col("e._3").as("p1"))
    val live =
      if (maxBucket <= 0) keyed
      else keyed.join(
        keyed.groupBy("vk").agg(count(lit(1)).as("bn"))
          .where(col("bn") <= maxBucket).select("vk"), Seq("vk"))
    // d=1 only: same-count entries must share the deletion index
    // exactly (provably exact — see scaladoc). d=2 has no sound index
    // bound (shift-shaped pairs); levenshtein verification decides.
    val cntIdxFilter =
      if (maxDist == 1) col("cnt1") =!= col("cnt2") || col("p1a") === col("p1b")
      else lit(true)
    live
      .select(col("id").as("id1"), col("s0").as("s1"), col("len").as("len1"),
        col("vk"), col("cnt").as("cnt1"), col("p1").as("p1a"))
      .join(live.select(col("id").as("id2"), col("s0").as("s2"),
          col("len").as("len2"), col("vk"), col("cnt").as("cnt2"),
          col("p1").as("p1b"))
          .hint("shuffle_hash"),
        Seq("vk"))
      .where(col("id1") < col("id2") &&
        abs(col("len1") - col("len2")) <= lit(maxDist) &&
        cntIdxFilter)
  }
}

package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** ANN quality: the approximate (IVF/LSH-cell) path is only useful if
  * its recall against the exact brute-force top-k is quantified — this
  * pins a floor so a regression in cell assignment or probe logic
  * fails the suite rather than silently degrading search quality. */
class SimilaritySpec extends SparkTestBase {

  private def queryVec(dim: Int = 64): Seq[Float] = {
    // a real stored vector's direction: use row vec_id=1 so the probe
    // has genuine neighbors in the corpus
    val e = Tables.embeddings(spark, sf)
    e.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0)
  }

  test("ivf recall@10 vs brute force stays above the pinned floor") {
    val e = Tables.embeddings(spark, sf)
    val q = queryVec()
    val exact = Similarity.bruteForceTopK(e, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val cells = Similarity.withCell(e, "embedding", bits = 8)
    val approx = Similarity.ivfTopK(cells, "embedding", "vec_id", q,
      k = 10, bits = 8, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 $recall below floor; exact=$exact approx=$approx")
    // widening the probe radius must never lose results
    val wider = Similarity.ivfTopK(cells, "embedding", "vec_id", q,
      k = 10, bits = 8, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    val widerRecall = (exact intersect wider).size.toDouble / exact.size
    assert(widerRecall >= recall, "recall must be monotone in nprobe")
    // nprobe = bits probes every cell -> exact equality with brute force
    assert(widerRecall === 1.0, s"full-radius probe must be exact, got $wider vs $exact")
  }

  test("LSH kNN graph recalls the exact graph's neighbors above the floor") {
    val e = Tables.embeddings(spark, sf)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = edges(Similarity.selfTopK(e, "embedding", "vec_id", 3))
    val approx = edges(Similarity.selfTopKLsh(e, "embedding", "vec_id", 3,
      bits = 3, tables = 6))
    val recalls = exact.map { case (id, nbrs) =>
      (approx.getOrElse(id, Set.empty) intersect nbrs).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@3 = $mean%.3f over ${recalls.size} vectors")
    assert(mean >= 0.6, f"kNN-graph recall $mean%.3f below floor")
    // approx edges must be a subset of legal neighbors (no self, k-bounded)
    approx.foreach { case (id, nbrs) =>
      assert(!nbrs.contains(id) && nbrs.size <= 3)
    }
  }

  test("hot-cell cap: linear candidates on a dup cluster, exact below " +
      "the threshold, cluster rows keep >= k neighbors") {
    import spark.implicits._
    val dim = 8
    // 300 near-identical vectors (a dup cluster: co-cells in EVERY
    // table at any bit count) + 40 diverse background vectors
    val rnd = new scala.util.Random(7)
    val cluster = (0 until 300).map { i =>
      val base = Array.fill(dim)(1.0f)
      base(i % dim) += 0.001f * (i / dim + 1); (i.toLong, base.toSeq)
    }
    val bg = (0 until 40).map { i =>
      (1000L + i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)) }
    val e = (cluster ++ bg).toDF("vec_id", "embedding")
    val capped = Similarity.selfTopKLsh(e, "embedding", "vec_id", k = 5,
      bits = 4, tables = 3, dim = dim, maxCell = 60, hotWindow = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    // every cluster row must retain at least k neighbors (the sliding
    // window keeps the cluster connected instead of dropping it)
    val perId = capped.groupBy(_._1).view.mapValues(_.size).toMap
    cluster.foreach { case (id, _) =>
      assert(perId.getOrElse(id, 0) >= 5, s"cluster row $id starved") }
    // candidate volume is bounded: undirected edges <= n_hot*hotWindow
    // per table + cold-cell pairs; with the whole cluster hot this is
    // FAR below the 300*299/2 all-pairs blow-up per table
    assert(capped.size <= (cluster.size + bg.size) * 2 * 5)
    // maxCell=0 and a huge maxCell agree (cap above every cell size
    // leaves the exact path everywhere)
    val exact = Similarity.selfTopKLsh(e, "embedding", "vec_id", k = 5,
      bits = 4, tables = 3, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hiCap = Similarity.selfTopKLsh(e, "embedding", "vec_id", k = 5,
      bits = 4, tables = 3, dim = dim, maxCell = 100000, hotWindow = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hiCap === exact, "non-binding cap must not change the graph")
  }

  test("degenerate-exact embedding near-dup equals the brute-force pair set") {
    // bits=0 (single bucket) + slackBits=64 (hamming window covers all
    // 64 bits, incl. the full-complement pair HashingSpec constructs)
    // must turn the LSH pipeline into exact all-pairs cosine
    val slice = Tables.embeddings(spark, sf).where(col("vec_id") < 150)
    val exact = {
      val l = slice.select(col("vec_id").as("id1"), col("embedding").as("v1"))
      val r = slice.select(col("vec_id").as("id2"), col("embedding").as("v2"))
      l.crossJoin(r).where(col("id1") < col("id2"))
        .where(graft.functions.VectorFunctions.cosine(col("v1"), col("v2")) >= 0.35)
        .select("id1", "id2")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    }
    val viaLsh = graft.operators.Dedup.embeddingNearDups(
      slice, "embedding", "vec_id",
      threshold = 0.35, bits = 0, dim = 64, slackBits = 64)
      .select("id1", "id2")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(viaLsh === exact,
      s"missing=${exact -- viaLsh} extra=${viaLsh -- exact}")
  }

  test("ivf probe scans only a fraction of the corpus") {
    val e = Tables.embeddings(spark, sf)
    val cells = Similarity.withCell(e, "embedding", bits = 8)
    val q = queryVec()
    val planes = graft.functions.Hashing.hyperplanes(8, 64)
    val qCell = graft.functions.Hashing.lshCell(q, planes)
    val scanned = cells.where(
      call_function("bit_count", col("cell").bitwiseXOR(lit(qCell))) <= 2).count()
    val total = e.count()
    // hamming ≤ 2 of 8 bits covers (1+8+28)/256 ≈ 14.5% of cells
    assert(scanned.toDouble / total < 0.35,
      s"probe scanned $scanned of $total rows — cell pruning not working")
  }

  test("lshBitsFor holds expected cell density in [32, 64) with clamps " +
      "and matches the oracle's integer bit-length formula") {
    import Similarity.lshBitsFor
    // the constant-density invariant that makes the LSH kNN graph
    // linear in n: candidate pairs per table ≈ n·density/2
    for (n <- Seq(512L, 1000L, 5000L, 65536L, 1000000L, 123456789L)) {
      val b = lshBitsFor(n)
      val density = n.toDouble / (1L << b)
      assert(density >= 32.0 && density < 64.0,
        s"n=$n bits=$b density=$density outside [32, 64)")
    }
    // clamps: tiny corpora floor at the historical bits=3; the cap
    // keeps the cell id inside the packed (table<<32 | cell) key
    assert(lshBitsFor(1L) === 3 && lshBitsFor(500L) === 3)
    assert(lshBitsFor(Long.MaxValue) === 24)
    // monotone non-decreasing (a growing corpus never loses bits)
    val seq = (1 to 40).map(i => lshBitsFor(1L << (i / 2)))
    assert(seq === seq.sorted)
    // exact agreement with the DuckDB oracle's length(bin(n)) - 6 form
    def oracleBits(n: Long): Int =
      math.max(3, math.min(24, java.lang.Long.toBinaryString(n).length - 6))
    for (n <- Seq(1L, 2L, 500L, 511L, 512L, 513L, 2000L, 20000L, 1L << 40))
      assert(lshBitsFor(n) === oracleBits(n), s"divergence at n=$n")
  }

  test("int8 quantization: executor bytes equal the host twin, recall@10 " +
      "vs exact cosine holds, zero vector quantizes to zeros") {
    import org.apache.spark.sql.graftnative.FloatVecQuantizeI8
    val e = Tables.embeddings(spark, sf)
    // executor-quantized corpus vs the host-side kernel on collected rows:
    // a probe quantized on the driver MUST match the store's bytes or the
    // integer dot silently scores against a different lattice
    val rows = Similarity.withQuantized(e, "embedding")
      .select("vec_id", "embedding", "qvec").limit(50).collect()
    for (r <- rows) {
      val host = FloatVecQuantizeI8.quantize(r.getSeq[Float](1))
      assert(r.getSeq[Byte](2) === host.toSeq, s"vec ${r.getLong(0)}")
    }
    // range: unit-normalized coordinates scale into [-127, 127]
    assert(rows.flatMap(_.getSeq[Byte](2)).forall(b => b >= -127 && b <= 127))
    // recall@10 of the integer-dot ranking vs exact cosine
    val q = queryVec()
    val corpus = e.where(col("vec_id") =!= 1)
    val exact = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = Similarity.quantizedTopK(corpus, "embedding", "vec_id", q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exact.intersect(quant).size >= 8,
      s"int8 recall ${exact.intersect(quant).size}/10")
    // zero vector: all-zero bytes, not NaN propagation
    assert(FloatVecQuantizeI8.quantize(Seq(0f, 0f, 0f)).toSeq === Seq[Byte](0, 0, 0))
  }

  test("random projection: column path and driver-side projectOne are " +
      "bit-identical; JL preserves pairwise distances approximately") {
    val e = Tables.embeddings(spark, sf).where(col("vec_id") < 50)
    val proj = Similarity.randomProject(e, "embedding", dim = 64, outDim = 32)
    val rows = proj.select("vec_id", "embedding", "proj")
      .collect().sortBy(_.getLong(0))
    rows.foreach { r =>
      val want = Similarity.projectOne(r.getSeq[Float](1), 64, 32)
      assert(r.getSeq[Float](2) === want.toSeq,
        s"vec ${r.getLong(0)}: column projection != driver fold")
    }
    // JL sanity on sign matrices: E[||Px||^2] = dim/outDim-scaled; check
    // relative pairwise L2 distortion stays bounded on real vectors
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
    val scale = math.sqrt(32.0) // sign-plane dots grow as sqrt(dim-ish)
    val pairs = for (i <- rows.indices; j <- i + 1 until rows.length if j - i < 5)
      yield (l2(rows(i).getSeq[Float](1), rows(j).getSeq[Float](1)),
        l2(rows(i).getSeq[Float](2), rows(j).getSeq[Float](2)) / scale)
    val ratios = pairs.collect { case (d0, dp) if d0 > 0 => dp / d0 }
    assert(ratios.nonEmpty)
    assert(ratios.min > 0.4 && ratios.max < 2.5,
      s"JL distortion out of band: [${ratios.min}, ${ratios.max}]")
  }
}

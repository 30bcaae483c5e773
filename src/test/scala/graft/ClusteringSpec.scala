package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

/** Lloyd's k-means over int8-quantized vectors: separation, determinism
  * (the property the value gate relies on), empty-cluster retention, and
  * negative-coordinate floor-division in the centroid update. */
class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("id", "vec")

  test("two separated groups converge to two clusters") {
    // even ids hug +x, odd ids hug +y — interleaved so the seed pair
    // (the two smallest ids) straddles the groups; quantization
    // preserves direction
    val rows = (0L until 20L).map { i =>
      if (i % 2 == 0) i -> Seq(1f, 0.01f * i, 0f, 0f)
      else i -> Seq(0f, 0.01f * i, 1f, 0f)
    }
    val out = Clustering.kmeansI8(df(rows), "vec", "id", k = 2, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = (0L until 20L by 2).map(out).toSet
    val b = (1L until 20L by 2).map(out).toSet
    assert(a.size === 1 && b.size === 1 && a != b,
      s"groups must land in distinct single clusters: $out")
  }

  test("assignments are deterministic across runs and partitionings") {
    val e = Tables.embeddings(spark, sf)
    val r1 = Clustering.kmeansI8(e, "embedding", "vec_id", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val r2 = Clustering.kmeansI8(e.repartition(7), "embedding", "vec_id",
        k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(r1.sameElements(r2), "repartitioning must not move assignments")
  }

  test("an empty cluster keeps its centroid instead of vanishing") {
    // 3 identical points, k=2: every point joins the seed-0 cluster; the
    // seed-1 centroid survives the update round untouched
    val rows = Seq(0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f))
    val out = Clustering.kmeansI8(df(rows), "vec", "id", k = 2, iters = 3)
      .collect()
    assert(out.length === 3)
    assert(out.forall(_.getInt(1) === 0), "all points belong to cluster 0")
    assert(out.forall(_.getLong(2) === 0L), "distance to own centroid is 0")
  }

  test("kmeans IVF: full probe equals brute force; partial probe recalls") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val q = e.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0)
    val corpus = e.where(col("vec_id") =!= 1)
    val exact = Similarity.bruteForceTopK(corpus, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    // probing every cell degenerates to the exact scan
    val full = Similarity.ivfKmeansTopK(corpus, "embedding", "vec_id", q,
        k = 10, cells = 4, nprobe = 4, iters = 2)
      .collect().map(_.getLong(0)).toSet
    assert(full === exact, "nprobe=cells must be exact")
  }

  test("kmeans IVF concentrates a STRUCTURED corpus: 1-of-3 probe, full recall") {
    import graft.operators.Similarity
    // 3 well-separated direction blobs; within-blob cosine ~1, cross ~0.
    // On this shape the learned cells must align with the blobs and a
    // single-cell probe (1/3 of the data) must recover the entire exact
    // top-10 — the property a REAL embedding corpus (which clusters)
    // buys from learned cells, and the contrast to the near-uniform
    // testdata corpus where recall ≈ probed fraction for any partitioner.
    val rows = (0L until 60L).map { i =>
      val blob = (i % 3).toInt
      val v = Array.fill(6)(0.001f * (i % 7))
      v(blob) = 1f
      i -> v.toSeq
    }
    val corpus = df(rows)
    val q = rows.find(_._1 == 0L).get._2 // a blob-0 member's direction
    val exact = Similarity.bruteForceTopK(corpus, "vec", "id",
        q.map(x => x), 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfKmeansTopK(corpus, "vec", "id", q, k = 10,
        cells = 3, nprobe = 1, iters = 3)
      .collect().map(_.getLong(0)).toSet
    assert(ivf === exact,
      s"1-of-3 probe must be exact on blob data: $ivf vs $exact")
  }

  test("spherical centroids stay unit-norm after every update round") {
    import graft.operators.Clustering
    val e = Tables.embeddings(spark, sf)
    for (iters <- Seq(1, 3)) {
      val cents = Clustering.trainSphericalI8(e, "embedding", "vec_id",
        k = 4, iters = iters)
      cents.foreach { c =>
        val norm = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
        // re-quantized direction: norm ~127 within per-coordinate
        // rounding slack — a shrunken (L2-mean) centroid would read far
        // lower (the defect spherical mode exists to avoid)
        assert(norm > 120 && norm < 134, s"centroid norm $norm")
      }
    }
  }

  test("trainI8 + assignI8 compose to kmeansI8's assignments") {
    import graft.operators.Clustering
    val e = Tables.embeddings(spark, sf)
    val direct = Clustering.kmeansI8(e, "embedding", "vec_id", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val c = Clustering.trainI8(e, "embedding", "vec_id", k = 4, iters = 2)
    val composed = Clustering.assignI8(e, "embedding", c)
      .select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(direct === composed)
  }

  test("negative coordinates floor-divide like the oracle") {
    // mean of quantized -x-ish vectors is negative; floorDiv(-a, n) must
    // round toward -inf exactly like the oracle's floor(sum/cnt)
    val rows = Seq(0L -> Seq(-1f, 0.2f), 1L -> Seq(-1f, 0.3f),
      2L -> Seq(-1f, 0.4f), 3L -> Seq(1f, 1f))
    val out = Clustering.kmeansI8(df(rows), "vec", "id", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(out(0L), out(1L), out(2L)).size === 1,
      "the -x group stays together")
    assert(out(3L) != out(0L), "+x/+y point separates")
  }
}

package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Lloyd's k-means over int8-quantized embeddings — the corpus-bucketing
  * primitive behind SemDeDup-style pipelines (cluster first, compare
  * within clusters) and IVF index training.
  *
  * Why the QUANTIZED domain: distances become exact integer arithmetic
  * (|v|² − 2·v·c + |c|², three native codegen int dots), so assignments
  * are bit-deterministic across engines, partitionings, and retries —
  * float k-means is not (reduction order moves near-tie assignments),
  * which is why this gate can be value-oracled while MLlib's cannot.
  * Centroid updates use exact integer floor-division, so centroids stay
  * int8 and the next round's scan kernel stays integer.
  *
  * Scale shape (the standard one): centroids are k×dim bytes — driver
  * state, broadcast into every assignment scan as literals; the only
  * shuffle per round is the `groupBy(cluster, pos)` partial-agg of
  * k·dim running sums (map-side combine collapses rows to k·dim per
  * partition). The corpus itself never shuffles and is scanned once per
  * round. At 100 TB: rounds × one columnar scan, zero data movement.
  */
object Clustering {

  /** Final per-vector assignment after `iters` Lloyd rounds from a
    * deterministic seed (the quantized vectors of the k smallest ids,
    * labeled 0..k-1 in id order).
    *
    * @return (idCol, cluster, dist_sq) — dist_sq is the exact integer
    *         squared L2 distance to the winning centroid.
    */
  def kmeansI8(embs: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    val q = Similarity.withQuantized(embs, vecCol, "qvec")
      .select(col(idCol).as("id"), col("qvec"))
    q.persist()
    try {
      val centroids = trainLoop(q, iters, seed(q, k))
      assign(q, centroids).select(col("id").as(idCol), col("cluster"),
        col("dist_sq"))
    } finally q.unpersist(blocking = false)
  }

  /** Seeding strategies — both deterministic (the determinism contract
    * extends to initialization): `FirstK` is the trivially
    * oracle-replayable seed the value gate uses; `Farthest` is
    * greedy farthest-point (k-center) seeding — each next seed
    * maximizes its integer distance to the nearest chosen one (ties to
    * the smaller id), which spreads seeds across the corpus's modes and
    * avoids the all-seeds-in-one-blob local optimum FirstK falls into
    * when low ids cluster. Costs k−1 extra corpus scans at train time. */
  sealed trait Seeding
  case object SeedFirstK extends Seeding
  case object SeedFarthest extends Seeding

  /** Centroids only — for callers that apply the model elsewhere (IVF
    * index training: [[Similarity.ivfKmeansTopK]]). */
  def trainI8(embs: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, seeding: Seeding = SeedFirstK): Array[Array[Byte]] = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    val q = Similarity.withQuantized(embs, vecCol, "qvec")
      .select(col(idCol).as("id"), col("qvec"))
    q.persist()
    try trainLoop(q, iters, seedOf(q, k, seeding))
    finally q.unpersist(blocking = false)
  }

  /** Nearest-centroid assignment keeping every input column: adds
    * `cluster` (+ `dist_sq`) to `embs`. The IVF partitioning step. */
  def assignI8(embs: DataFrame, vecCol: String,
      centroids: Array[Array[Byte]]): DataFrame = {
    val withQ = Similarity.withQuantized(embs, vecCol, "qvec")
    val nsq = VectorFunctions.dotI8(col("qvec"), col("qvec"))
    withQ.withColumn("best", array_min(array(candStructs(nsq, centroids): _*)))
      .withColumn("cluster", col("best.cid"))
      .withColumn("dist_sq", col("best.dist"))
      .drop("best", "qvec")
  }

  /** Spherical k-means centroids — the cosine-space variant an IVF
    * coarse quantizer wants: assignment maximizes the integer dot
    * against RE-NORMALIZED centroids (every centroid re-quantized to
    * norm ≈127 each round), so no |centroid|² term biases assignment
    * toward shrunken means the way plain L2 does when a cluster's
    * members spread (the mean of spread unit vectors is short). The
    * update is the quantized DIRECTION of the exact integer coordinate
    * sums — no floor-division, one fixed float op sequence per round. */
  def trainSphericalI8(embs: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, seeding: Seeding = SeedFarthest): Array[Array[Byte]] = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    val q = Similarity.withQuantized(embs, vecCol, "qvec")
      .select(col(idCol).as("id"), col("qvec"))
    q.persist()
    try {
      var centroids = seedOf(q, k, seeding)
      var it = 0
      while (it < iters) {
        val sums = assignSpherical(q, centroids)
          .select(col("cluster"), posexplode(col("qvec")).as(Seq("pos", "v")))
          .groupBy("cluster", "pos")
          .agg(sum(col("v").cast(LongType)).as("s"))
          .collect()
          .groupBy(_.getInt(0))
        centroids = centroids.zipWithIndex.map { case (old, cid) =>
          sums.get(cid) match {
            case None => old
            case Some(rows) =>
              val s = new Array[Long](old.length)
              rows.foreach(r => s(r.getInt(1)) = r.getLong(2))
              quantizeDirection(s, old)
          }
        }
        it += 1
      }
      centroids
    } finally q.unpersist(blocking = false)
  }

  /** Max-dot assignment keeping every input column: adds `cluster` (and
    * the winning integer dot as `score_q`). */
  def assignSphericalI8(embs: DataFrame, vecCol: String,
      centroids: Array[Array[Byte]]): DataFrame = {
    val withQ = Similarity.withQuantized(embs, vecCol, "qvec")
    withQ.withColumn("best",
        array_min(array(dotStructs(centroids): _*)))
      .withColumn("cluster", col("best.cid"))
      .withColumn("score_q", -col("best.nd"))
      .drop("best", "qvec")
  }

  private def assignSpherical(q: DataFrame,
      centroids: Array[Array[Byte]]): DataFrame =
    q.withColumn("best", array_min(array(dotStructs(centroids): _*)))
      .select(col("id"), col("qvec"), col("best.cid").as("cluster"))

  // argmax dot via array_min over (-dot, cid): ties to the smaller cid
  private def dotStructs(centroids: Array[Array[Byte]]): Seq[Column] =
    centroids.toIndexedSeq.zipWithIndex.map { case (c, cid) =>
      struct((-VectorFunctions.dotI8(col("qvec"), typedLit(c.toSeq)))
        .as("nd"), lit(cid).as("cid"))
    }

  /** Quantize the direction of exact integer sums to int8 (the same op
    * sequence as the vector quantizer, over the sums); an all-zero sum
    * keeps the previous centroid. */
  private def quantizeDirection(s: Array[Long], old: Array[Byte]): Array[Byte] = {
    var ss = 0.0
    var i = 0
    while (i < s.length) { val v = s(i).toDouble; ss += v * v; i += 1 }
    val norm = math.sqrt(ss)
    if (norm <= 0.0) return old
    val out = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      out(i) = math.floor(s(i).toDouble / norm * 127.0 + 0.5).toByte
      i += 1
    }
    out
  }

  private def seedOf(q: DataFrame, k: Int, s: Seeding): Array[Array[Byte]] =
    s match {
      case SeedFirstK   => seed(q, k)
      case SeedFarthest => seedFarthest(q, k)
    }

  private def seed(q: DataFrame, k: Int): Array[Array[Byte]] =
    q.orderBy("id").limit(k).collect()
      .map(_.getAs[scala.collection.Seq[Byte]]("qvec").toArray)

  private def seedFarthest(q: DataFrame, k: Int): Array[Array[Byte]] = {
    val first = q.orderBy("id").limit(1).collect()
    require(first.nonEmpty, "k-means seeding needs a non-empty corpus")
    val chosen = scala.collection.mutable.ArrayBuffer(
      first(0).getAs[scala.collection.Seq[Byte]]("qvec").toArray)
    val nsq = VectorFunctions.dotI8(col("qvec"), col("qvec"))
    var exhausted = false
    while (chosen.size < k && !exhausted) {
      val dists: Seq[Column] = chosen.toIndexedSeq.map { c =>
        val cl = typedLit(c.toSeq)
        val cn = c.map(v => v.toLong * v.toLong).sum
        (nsq - lit(2L) * VectorFunctions.dotI8(col("qvec"), cl) + lit(cn))
          .cast(LongType)
      }
      val next = q
        .select(col("id"), col("qvec"), array_min(array(dists: _*)).as("d"))
        .orderBy(col("d").desc, col("id").asc).limit(1).collect()(0)
      // every remaining point coincides with a chosen centroid: adding
      // duplicates would differ from FirstK's fewer-than-k behavior on
      // tiny corpora — stop, matching the min(k, distinct-points) contract
      if (next.getLong(2) == 0L) exhausted = true
      else chosen += next.getAs[scala.collection.Seq[Byte]]("qvec").toArray
    }
    chosen.toArray
  }

  private def trainLoop(q: DataFrame, iters: Int,
      init: Array[Array[Byte]]): Array[Array[Byte]] = {
    var centroids = init
    var it = 0
    while (it < iters) {
      // per-(cluster, dimension) running sums: k·dim rows to the driver
      val sums = assign(q, centroids)
        .select(col("cluster"), posexplode(col("qvec")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum(col("v").cast(LongType)).as("s"), count(lit(1)).as("cnt"))
        .collect()
        .groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, cid) =>
        sums.get(cid) match {
          case None => old // empty cluster keeps its centroid
          case Some(rows) =>
            val next = old.clone()
            rows.foreach { r =>
              next(r.getInt(1)) =
                math.floorDiv(r.getLong(2), r.getLong(3)).toByte
            }
            next
        }
      }
      it += 1
    }
    centroids
  }

  /** Nearest-centroid assignment: integer distances to each broadcast
    * centroid literal, argmin via `array_min` over (dist, cid) structs —
    * ties break to the smaller cluster id by struct ordering. */
  private def assign(q: DataFrame, centroids: Array[Array[Byte]]): DataFrame = {
    val nsq = VectorFunctions.dotI8(col("qvec"), col("qvec"))
    q.withColumn("best", array_min(array(candStructs(nsq, centroids): _*)))
      .select(col("id"), col("qvec"),
        col("best.cid").as("cluster"), col("best.dist").as("dist_sq"))
  }

  private def candStructs(nsq: Column,
      centroids: Array[Array[Byte]]): Seq[Column] =
    centroids.toIndexedSeq.zipWithIndex.map { case (c, cid) =>
      val cl = typedLit(c.toSeq)
      val cNormSq = c.map(v => v.toLong * v.toLong).sum
      struct((nsq - lit(2L) * VectorFunctions.dotI8(col("qvec"), cl)
        + lit(cNormSq)).as("dist"), lit(cid).as("cid"))
    }

}

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
      var centroids: Array[Array[Byte]] =
        q.orderBy("id").limit(k).collect()
          .map(_.getAs[scala.collection.Seq[Byte]]("qvec").toArray)
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
      assign(q, centroids).select(col("id").as(idCol), col("cluster"),
        col("dist_sq"))
    } finally q.unpersist(blocking = false)
  }

  /** Nearest-centroid assignment: integer distances to each broadcast
    * centroid literal, argmin via `array_min` over (dist, cid) structs —
    * ties break to the smaller cluster id by struct ordering. */
  private def assign(q: DataFrame, centroids: Array[Array[Byte]]): DataFrame = {
    val nsq = VectorFunctions.dotI8(col("qvec"), col("qvec"))
    val cands: Seq[Column] = centroids.toIndexedSeq.zipWithIndex.map {
      case (c, cid) =>
        val cl = typedLit(c.toSeq)
        val cNormSq = c.map(v => v.toLong * v.toLong).sum
        struct((nsq - lit(2L) * VectorFunctions.dotI8(col("qvec"), cl)
          + lit(cNormSq)).as("dist"), lit(cid).as("cid"))
    }
    q.withColumn("best", array_min(array(cands: _*)))
      .select(col("id"), col("qvec"),
        col("best.cid").as("cluster"), col("best.dist").as("dist_sq"))
  }
}

package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (builder brief). Two paths:
  *
  *  - `bruteForceTopK`: exact cosine top-k — one codegen'd map over the
  *    table + `TakeOrderedAndProject` (no full sort, no wide shuffle).
  *    The baseline and the verifier for the approximate path.
  *  - `ivfTopK`: IVF-style two-phase search — k-means-free variant using
  *    deterministic hyperplane LSH cells: probe only the query's cell (and
  *    neighbors at `nprobe` hamming distance). At 100 TB the cell column
  *    is a partition/bucketing key, so a probe touches a small slice of
  *    the data.
  */
object Similarity {

  /** Exact top-k by cosine against a literal query vector. */
  def bruteForceTopK(embs: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    embs.select(col(idCol),
        VectorFunctions.cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Assign each row its LSH cell (precompute once, reuse across queries —
    * in a real pipeline this is written as a bucketed/partitioned column). */
  def withCell(embs: DataFrame, vecCol: String, bits: Int, dim: Int = 64): DataFrame = {
    val planes = graft.functions.Hashing.hyperplanes(bits, dim)
    val cellUdf = udf((v: Seq[Float]) => graft.functions.Hashing.lshCell(v, planes))
    embs.withColumn("cell", cellUdf(col(vecCol)))
  }

  /** Approximate top-k: search only cells within `nprobe` hamming distance
    * of the query's cell. Partition-prunes to a fraction ~(choose(bits,
    * ≤nprobe))/2^bits of the data. */
  def ivfTopK(embsWithCell: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, bits: Int, nprobe: Int = 1, dim: Int = 64): DataFrame = {
    val planes = graft.functions.Hashing.hyperplanes(bits, dim)
    val queryCell = graft.functions.Hashing.lshCell(query, planes)
    val q = typedLit(query)
    embsWithCell
      .where(call_function("bit_count",
        col("cell").bitwiseXOR(lit(queryCell))) <= nprobe)
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs top-k per probe row against a (small, broadcastable) probe
    * set — broadcast-join + window rank; the bulk side never shuffles. */
  def batchTopK(embs: DataFrame, vecCol: String, idCol: String,
      probes: DataFrame, probeVecCol: String, probeIdCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = embs.crossJoin(broadcast(
        probes.select(col(probeIdCol).as("probe_id"), col(probeVecCol).as("probe_vec"))))
      .select(col("probe_id"), col(idCol),
        VectorFunctions.cosine(col(vecCol), col("probe_vec")).as("score"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    joined.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }
}

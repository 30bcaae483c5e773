package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector math over `Array[Float]` embedding columns, composed from
  * codegen'd higher-order functions (`zip_with` / `aggregate`) — no UDFs,
  * so similarity scans stay inside whole-stage codegen at 100 TB.
  *
  * Each element is promoted to double before multiply/accumulate and the
  * fold runs in element order, keeping results bit-deterministic across
  * engines and runs.
  */
object VectorFunctions {

  private def sumArr(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))

  def normSq(a: Column): Column =
    sumArr(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)))

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def l2Dist(a: Column, b: Column): Column =
    sqrt(sumArr(zip_with(a, b, (x, y) => {
      val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
    })))

  /** Sign bit of the projection onto a deterministic pseudo-random
    * hyperplane (keyed by `plane`). Hyperplane component for dim i =
    * hash(plane, i) mapped to ±1 — no stored model, reproducible on any
    * cluster. Used for LSH bucketing of cosine similarity. */
  def hyperplaneSign(vec: Column, plane: Int): Column = {
    val proj = sumArr(zip_with(vec, sequence(lit(0), size(vec) - 1),
      (x, i) => x.cast(DoubleType) *
        when(pmod(xxhash64(lit(plane), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))))
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** k-bit LSH bucket id for cosine similarity (random-hyperplane family). */
  def lshBucket(vec: Column, bits: Int): Column =
    (0 until bits).map(p => hyperplaneSign(vec, p) * lit(1 << p))
      .reduce(_ + _)
}

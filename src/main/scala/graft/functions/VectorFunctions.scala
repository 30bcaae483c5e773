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

  /** Sign bit of the projection onto a fixed ±1 hyperplane (host-side
    * literal — cheaper than hash-derived per-element planes). Used for
    * LSH bucketing of cosine similarity; see Hashing.hyperplanes for the
    * compiled variant. */
  def hyperplaneSign(vec: Column, plane: Seq[Double]): Column = {
    val proj = sumArr(zip_with(vec, typedLit(plane),
      (x, p) => x.cast(DoubleType) * p))
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector math over `Array[Float]` embedding columns, backed by the
  * native codegen'd expressions in [[VectorExpressions]] (FloatVecDot /
  * FloatVecL2Sq): a primitive `for` loop inside whole-stage codegen, no
  * boxed per-element lambdas, no UDFs — the ANN scan hot path at 100 TB.
  *
  * Each element is promoted to double before multiply/accumulate and the
  * fold runs in element order, keeping results bit-deterministic across
  * engines and runs (same fold as Hashing.cosine and the DuckDB oracles).
  */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def dot(a: Column, b: Column): Column =
    toCol(org.apache.spark.sql.graftnative.FloatVecDot(toExpr(a), toExpr(b)))

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Fused one-pass cosine (reads each vector once; bit-identical to
    * `dot(a,b) / (norm(a) * norm(b))`). */
  def cosine(a: Column, b: Column): Column =
    toCol(org.apache.spark.sql.graftnative.FloatVecCosine(toExpr(a), toExpr(b)))

  def l2Dist(a: Column, b: Column): Column =
    sqrt(toCol(org.apache.spark.sql.graftnative.FloatVecL2Sq(toExpr(a), toExpr(b))))

  /** Native codegen 64-bit hyperplane sign signature — bit-identical to
    * `Hashing.lshSig64(vec, planes)` (same i-ascending accumulation);
    * the ≤32-plane prefix is `Hashing.lshCell`. Replaces the boxed UDF
    * at the head of the embedding LSH pipelines. */
  def lshSig(a: Column, planes: Array[Array[Double]]): Column =
    toCol(org.apache.spark.sql.graftnative.FloatVecLshSig(toExpr(a), planes))

  /** Int8 scalar quantization (unit-normalize then scale to ±127) —
    * 4× smaller vectors for the ANN scan/shuffle path; see
    * [[org.apache.spark.sql.graftnative.FloatVecQuantizeI8]]. */
  def quantizeI8(a: Column): Column =
    toCol(org.apache.spark.sql.graftnative.FloatVecQuantizeI8(toExpr(a)))

  /** Exact integer dot product over two int8 vectors. */
  def dotI8(a: Column, b: Column): Column =
    toCol(org.apache.spark.sql.graftnative.I8VecDot(toExpr(a), toExpr(b)))

  /** Sign bit of the projection onto a fixed ±1 hyperplane (host-side
    * literal — cheaper than hash-derived per-element planes). Used for
    * LSH bucketing of cosine similarity; see Hashing.hyperplanes for the
    * compiled variant. */
  def hyperplaneSign(vec: Column, plane: Seq[Double]): Column = {
    val proj = dot(vec, typedLit(plane.map(_.toFloat)))
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }
}

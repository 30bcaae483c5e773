package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dense-vector hot loop.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) evaluate their
  * lambda per element through the interpreted path, so a 64-dim dot
  * product costs ~128 boxed lambda invocations per row. These expressions
  * generate a tight primitive `for` loop inside whole-stage codegen
  * instead (the brief's preference order: native `Expression` with
  * `doGenCode` over any UDF) — the ANN scans (Similarity.bruteForceTopK /
  * batchTopK / ivfTopK) sit directly on top of them.
  *
  * Accumulation is a sequential left fold over elements promoted to
  * double — bit-identical to the previous HOF formulation and to
  * Hashing.cosine, so DuckDB oracles keep hash-matching.
  *
  * Null elements inside a vector are not expected (embeddings are dense);
  * a null array yields null (nullSafeEval / nullSafeCodeGen).
  */
abstract class FloatVecFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  /** Per-element multiply-accumulate term in generated-Java form. */
  protected def termJava(a: String, b: String, i: String): String
  protected def termEval(x: Float, y: Float): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += termEval(x.getFloat(i), y.getFloat(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${termJava(a, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ over two float vectors. */
case class FloatVecDot(left: Expression, right: Expression) extends FloatVecFold {
  override protected def termJava(a: String, b: String, i: String): String =
    s"(double)$a.getFloat($i) * (double)$b.getFloat($i)"
  override protected def termEval(x: Float, y: Float): Double =
    x.toDouble * y.toDouble
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "float_vec_dot"
}

/** Σ (aᵢ−bᵢ)² — squared L2 distance. */
case class FloatVecL2Sq(left: Expression, right: Expression) extends FloatVecFold {
  override protected def termJava(a: String, b: String, i: String): String =
    s"(((double)$a.getFloat($i) - (double)$b.getFloat($i)) * " +
      s"((double)$a.getFloat($i) - (double)$b.getFloat($i)))"
  override protected def termEval(x: Float, y: Float): Double = {
    val d = x.toDouble - y.toDouble; d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecL2Sq =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "float_vec_l2sq"
}

/** Fused cosine: dot, ‖a‖², ‖b‖² accumulated in ONE pass, combined as
  * `dot / (sqrt(ssa) · sqrt(ssb))` — exactly the composition
  * `vec_dot(a,b) / (sqrt(vec_dot(a,a)) * sqrt(vec_dot(b,b)))`, so
  * results stay bit-identical to the unfused form and the DuckDB
  * oracles, while the ANN scan reads each vector once instead of three
  * times. Accumulation bounds match the composition too: the norms run
  * over each array's own full length, the dot over the shared prefix
  * (all equal for fixed-dim embeddings). Zero-norm inputs yield NaN,
  * same as the composition — filter upstream where that matters. */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val la = x.numElements(); val lb = y.numElements()
    val n = math.max(la, lb); val m = math.min(la, lb)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (i < la) { val v = x.getFloat(i).toDouble; na += v * v }
      if (i < lb) { val v = y.getFloat(i).toDouble; nb += v * v }
      if (i < m) dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val la = ctx.freshName("la"); val lb = ctx.freshName("lb")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa"); val xb = ctx.freshName("xb")
      s"""
         |int $la = $a.numElements(); int $lb = $b.numElements();
         |int $n = java.lang.Math.max($la, $lb);
         |int $m = java.lang.Math.min($la, $lb);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i < $la) { double $xa = (double)$a.getFloat($i); $na += $xa * $xa; }
         |  if ($i < $lb) { double $xb = (double)$b.getFloat($i); $nb += $xb * $xb; }
         |  if ($i < $m) {
         |    $dot += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |  }
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecCosine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "float_vec_cosine"
}

/** 64-bit hyperplane sign signature — the LSH sketch at the head of the
  * embedding dedup / kNN-graph / IVF pipelines (Dedup.embeddingNearDups,
  * Similarity.withCell/selfTopKLsh), previously a boxed Scala UDF per
  * row. Bit p of the result is set iff Σᵢ vecᵢ·planes[p][i] ≥ 0, with
  * the SAME i-ascending double accumulation as Hashing.lshSig64 — so
  * signatures (and therefore every bucket, hamming prefilter, and the
  * inline-plane DuckDB oracle replays) stay bit-identical. The plane
  * matrix is a constant reference object, not a child expression: it is
  * data-independent (seeded, Hashing.hyperplanes) and regenerating it
  * per-executor through codegen references costs nothing per row.
  * At most the first 64 planes contribute (long width), matching
  * Hashing.lshSig64's clamp; lshCell semantics are the ≤32-plane prefix
  * of the same value. */
case class FloatVecLshSig(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    val np = math.min(planes.length, 64)
    while (p < np) {
      var dot = 0.0
      val plane = planes(p)
      var i = 0
      val n = math.min(x.numElements(), plane.length)
      while (i < n) { dot += x.getFloat(i) * plane(i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val np = ctx.freshName("np"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val plane = ctx.freshName("plane")
      val sig = ctx.freshName("sig")
      s"""
         |long $sig = 0L;
         |int $np = java.lang.Math.min($planesRef.length, 64);
         |for (int $p = 0; $p < $np; $p++) {
         |  double $dot = 0.0;
         |  double[] $plane = $planesRef[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $plane.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double)$a.getFloat($i) * $plane[$i];
         |  }
         |  if ($dot >= 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FloatVecLshSig =
    copy(child = newChild)
  override def prettyName: String = "float_vec_lsh_sig"
}

/** Int8 scalar quantization of a float vector: unit-normalize, then map
  * each coordinate to `floor(x/‖v‖ · 127 + 0.5)` ∈ [−127, 127] stored as
  * a byte — the 100 TB ANN memory/shuffle path (a 64-dim embedding drops
  * 256 B → 64 B, and the scan dot product becomes integer arithmetic).
  * Normalizing BEFORE quantization makes the integer dot product of two
  * quantized vectors a monotone cosine estimate (all norms ≈ 127), so
  * ranking needs no float division at scan time. The arithmetic is a
  * fixed IEEE op sequence (sequential-fold norm, then per-coordinate
  * divide/scale/floor), so a DuckDB oracle replaying the same ops gets
  * bit-identical bytes. A zero vector quantizes to all zeros (its cosine
  * is undefined; scoring treats it as orthogonal-to-everything). */
case class FloatVecQuantizeI8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    FloatVecQuantizeI8.kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  org.apache.spark.sql.graftnative.FloatVecQuantizeI8$$.MODULE$$.kernel($a);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): FloatVecQuantizeI8 =
    copy(child = newChild)
  override def prettyName: String = "float_vec_quantize_i8"
}

object FloatVecQuantizeI8 {
  /** Shared kernel for the interpreted and generated paths. */
  def kernel(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; ss += v * v; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Byte](n)
    if (norm > 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(x.getFloat(i).toDouble / norm * 127.0 + 0.5).toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Host-side twin for query vectors — the same op sequence, so a
    * driver-quantized probe matches the executor-quantized corpus. */
  def quantize(v: Seq[Float]): Array[Byte] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { val x = v(i).toDouble; ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Byte](v.length)
    if (norm > 0.0) {
      i = 0
      while (i < v.length) {
        out(i) = math.floor(v(i).toDouble / norm * 127.0 + 0.5).toByte
        i += 1
      }
    }
    out
  }
}

/** Σ aᵢ·bᵢ over two int8 vectors — exact integer arithmetic (order-free,
  * no float summation to keep deterministic), the scan kernel on top of
  * [[FloatVecQuantizeI8]] columns. */
case class I8VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long)$a.getByte($i) * (long)$b.getByte($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): I8VecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "i8_vec_dot"
}

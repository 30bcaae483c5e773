package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a string — the sketch head of the simhash dedup
  * pipeline (Dedup.simhashPairs), previously a boxed Scala UDF per row
  * over the whole corpus. Delegates to the SAME compiled kernel
  * (graft.functions.Hashing.simhash — FNV-1a/splitmix token hashes,
  * 64 weighted bit counters) from both the interpreted and generated
  * paths, so signatures are bit-identical to the UDF and the
  * q_dedup_simhash value gate is unaffected. Codegen emits a direct
  * static-module call: no encoder round trip, no lambda boxing, and the
  * enclosing whole-stage-codegen span stays unbroken.
  *
  * NULL text sketches to 0L (the prior UDF's contract) rather than
  * propagating null — a null doc must land in a bucket, not silently
  * vanish from the candidate walk. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else graft.functions.Hashing.simhash(v.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.Hashing$$.MODULE$$.simhash(${c.value}.toString());
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Count of characters in `[A-Za-z ]` — the codegen form of
  * `length(regexp_replace(text, "[^A-Za-z ]", ""))`, the quality pass's
  * alpha-ratio numerator. The matching characters are single-byte in
  * UTF-8 and multibyte sequences can never match the class, so a raw
  * byte scan over the UTF8String equals the regex form's code-point
  * count exactly — no pattern automaton, no replaced-string allocation
  * per row. NULL counts as 0 (a null doc has zero alpha chars). */
case class AsciiAlphaSpaceCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else AsciiAlphaSpaceCount.count(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          org.apache.spark.sql.graftnative.AsciiAlphaSpaceCount$$.MODULE$$.count(${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): AsciiAlphaSpaceCount =
    copy(child = newChild)
  override def prettyName: String = "ascii_alpha_space_count"
}

object AsciiAlphaSpaceCount {
  /** Shared kernel for the interpreted and generated paths. */
  def count(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    var i = 0
    var n = 0L
    val nb = s.numBytes
    while (i < nb) {
      val b = s.getByte(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || b == ' ') n += 1
      i += 1
    }
    n
  }
}

/** MinHash-LSH band keys of a string — the sketch head of the minhash
  * dedup family (Dedup.minhashBands and the incremental store path),
  * previously a boxed Scala UDF over the whole corpus: the UDF wrapper
  * paid a CatalystTypeConverter round trip per row on BOTH sides
  * (UTF8String → String in, Array[Long] → boxed GenericArrayData out).
  * Delegates to the SAME compiled kernel (graft.functions.Hashing
  * .minhash + .bandKeys — single shingle pass, k minima by per-hash
  * reseeding) from the interpreted and generated paths, so band digests
  * are bit-identical to the UDF and the five q_dedup_minhash* /
  * q_dedup_incremental value gates are unaffected; the output is written
  * as an UnsafeArrayData (primitive longs, no boxing) and the enclosing
  * whole-stage-codegen span stays unbroken.
  *
  * NULL text yields an EMPTY array (the prior UDF's contract): a null
  * doc has no shingles, lands in no bucket, and never pairs. */
case class MinHashBandKeys(child: Expression, shingleSize: Int,
    bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    MinHashBandKeys.keys(if (v == null) null else v.toString,
      shingleSize, bands, rowsPerBand)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          org.apache.spark.sql.graftnative.MinHashBandKeys$$.MODULE$$.keys(
            ${c.isNull} ? null : ${c.value}.toString(),
            $shingleSize, $bands, $rowsPerBand);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
  override def prettyName: String = "minhash_band_keys"
}

object MinHashBandKeys {
  private val empty =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.empty[Long])

  /** Shared kernel for the interpreted and generated paths. */
  def keys(t: String, shingleSize: Int, bands: Int,
      rowsPerBand: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    if (t == null) empty
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(graft.functions.Hashing.bandKeys(
        graft.functions.Hashing.minhash(t, shingleSize, bands * rowsPerBand),
        bands, rowsPerBand))
}

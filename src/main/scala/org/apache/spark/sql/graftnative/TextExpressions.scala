package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}

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

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

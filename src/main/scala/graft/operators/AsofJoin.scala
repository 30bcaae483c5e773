package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right row
  * with `right.ts <= left.ts` (backward, default) or the earliest right
  * row with `right.ts >= left.ts` (forward) within the same key. No
  * reference analog
  * (SURVEY §2.3: the reference has no join executor); declared for the
  * engine as the standard time-series primitive.
  *
  * Implementation is the scalable union-marker form, not a per-key
  * collect: tag both sides, union, one window sorted by (ts, side) per
  * key, and carry the last right-side values forward with
  * `last(..., ignoreNulls)`. Cost = ONE shuffle on the key + one sort —
  * the same exchange a plain equi-join would pay; carried state per key
  * is a single row of values, so it holds at any per-key history length.
  * Right rows at ts equal to a left row's are eligible (side sorts
  * right(0) before left(1)); equal-ts right rows resolve to the largest
  * `tieBreak` value (deterministic).
  */
object AsofJoin {

  /** @param valueCols right-side columns carried onto each left row as
    *                  `asof_<name>`; all left columns pass through.
    * @param tieBreak  right-side column (castable to long) ordering
    *                  equal-ts right rows. */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String], tieBreak: String,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"unknown asof direction: $direction")
    val leftCols = left.columns.toSeq
    val carried = valueCols.map(c => s"asof_$c")
    def nullAs(name: String, schema: org.apache.spark.sql.types.StructType): Column =
      lit(null).cast(schema(name).dataType).as(name)

    val lSide = left.select(
      leftCols.map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast("long").as("__tie")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)
    val rSide = right.select(
      leftCols.map { c =>
        if (c == keyCol || c == tsCol) col(c).as(c) else nullAs(c, left.schema)
      } ++
        Seq(lit(0).as("__side"), col(tieBreak).cast("long").as("__tie")) ++
        valueCols.map(c => col(c).as(s"asof_$c")): _*)

    // forward = the same scan run in descending ts: "last right seen"
    // then means the nearest right at-or-after the left row
    val tsOrder = if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrder, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarried = carried.foldLeft(lSide.unionByName(rSide)) { (d, c) =>
      d.withColumn(c, last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    withCarried.where(col("__side") === 1)
      .select((leftCols ++ carried).map(col): _*)
  }
}

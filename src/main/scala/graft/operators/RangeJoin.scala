package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range (interval) join without a cross product.
  *
  * Joining facts to `[lo, hi)` interval rows with a bare inequality
  * condition gives BroadcastNestedLoopJoin — every fact row evaluated
  * against every interval, O(rows × intervals), which at 100 TB is the
  * difference between a map stage and an unrunnable plan. Instead both
  * sides are mapped onto coarse buckets of width `bucket`: facts compute
  * theirs arithmetically, intervals explode into the buckets they span,
  * and the join becomes a plain equi-join on the bucket key (broadcast-
  * or shuffle-hash, AQE's choice) with the exact range predicate as a
  * residual filter. Cost: O(rows + intervals × span/bucket).
  *
  * The same trick is the standard time-interval-join shape (bucket =
  * coarse time bin); the reference's own chunk-range machinery
  * (mydumper_integer_chunks.c:945-1018) is the degenerate case where
  * intervals are disjoint and aligned.
  */
object RangeJoin {

  /** Equi-join `facts.valueCol` into `bands` rows satisfying
    * `lo <= value < hi`. Interval columns may be any numeric type;
    * `bucket` should be chosen so a typical interval spans O(1–10)
    * buckets. */
  def bandJoin(facts: DataFrame, valueCol: String,
      bands: DataFrame, loCol: String, hiCol: String,
      bucket: Double): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val fb = facts.withColumn("__bucket",
      floor(col(valueCol) / lit(bucket)).cast(LongType))
    val bb = bands.withColumn("__bucket", explode(sequence(
      floor(col(loCol) / lit(bucket)).cast(LongType),
      // hi is exclusive: an interval ending exactly on a bucket boundary
      // must not claim the next bucket
      floor((col(hiCol) - lit(bucket * 1e-9)) / lit(bucket)).cast(LongType))))
    fb.join(bb, Seq("__bucket"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}

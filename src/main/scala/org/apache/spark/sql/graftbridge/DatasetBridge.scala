package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bridge into `private[sql]` Dataset constructors (same contract as
  * [[ColumnBridge]]: access-modifier hop only, no logic).
  *
  * `fromInternalRows` rebuilds a DataFrame over an ALREADY-INTERNAL row
  * RDD (e.g. a localCheckpoint's materialized blocks read via
  * `queryExecution.toRdd`) without the public-API double conversion
  * that `createDataFrame(df.rdd, schema)` pays — `.rdd` deserializes
  * every InternalRow to an external Row and the re-wrap serializes it
  * straight back, one full copy of the frame per round in the
  * iterative operators (clusters / pageRank / LPA), pure overhead.
  * The rebuilt frame drops the origin plan's estimated stats exactly
  * like the public re-wrap did (fresh LogicalRDD, default stats) —
  * that stats CUT is load-bearing: compounding per-round join
  * estimates overflow BigInteger after ~25 rounds (see
  * [[graft.operators.Dedup.clustersScoped]]).
  */
object DatasetBridge {
  def fromInternalRows(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema)

  /** [[fromInternalRows]] with a DECLARED hash partitioning: the frame
    * advertises `HashPartitioning(hashCols, numPartitions)` to the
    * planner, so joins/aggregations keyed on `hashCols` (or a superset)
    * consume it WITHOUT an Exchange — the mechanism that lets an
    * iterative operator shuffle its loop-invariant edge table ONCE and
    * join against it every round exchange-free (guide §2.4; a plain
    * localCheckpoint loses outputPartitioning, verified empirically on
    * 4.1: the re-read side re-exchanges every round).
    *
    * CALLER CONTRACT (correctness, not performance): `rows` must
    * ACTUALLY be laid out as `HashPartitioning(hashCols,
    * numPartitions)` evaluates — i.e. produced by a
    * `repartition(numPartitions, hashCols...)` whose physical exchange
    * ran with exactly that expression, with no repartitioning,
    * coalescing or reordering in between (explicit-N repartition is
    * exempt from AQE coalescing, which is what makes this safe to
    * declare). Declaring a layout the RDD does not have silently
    * mis-joins. */
  def fromInternalRowsPartitioned(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType, hashCols: Seq[String], numPartitions: Int): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    val exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
      hashCols.map(n => attrs.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in $schema")))
    val part = org.apache.spark.sql.catalyst.plans.physical
      .HashPartitioning(exprs, numPartitions)
    val plan = org.apache.spark.sql.execution.LogicalRDD(
      attrs, rows, part, Nil, false, None)(cs, None, None)
    org.apache.spark.sql.classic.Dataset.ofRows(cs, plan)
  }
}

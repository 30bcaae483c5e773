package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free repeated joins.
  *
  * A large-large equi-join shuffles both sides on the key every time it
  * runs. When the same join recurs (the dump→load checksum-verify join,
  * fact-to-fact correlation, incremental dedup against a reference
  * corpus), writing both sides bucketed by the join key amortizes that
  * shuffle into the write: Spark's scan reports the bucket distribution,
  * Catalyst sees both sides hash-partitioned identically, and the join
  * plans with zero Exchange operators. At 100 TB the avoided shuffle is
  * the dominant cost of the join (BucketingSpec asserts the
  * Exchange-free plan).
  *
  * The reference's analog is one-shot (chunk files are consumed once);
  * bucketing is the engine's lake-native upgrade for recurring pipelines.
  */
object Bucketing {

  /** Write `df` as a bucketed table (external, at `path`). Bucket count
    * should match across tables that will be joined (and divide evenly
    * into cluster parallelism). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int, sortByKey: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
    (if (sortByKey) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans without
    * any Exchange when bucket counts match. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under the scale-factor dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** events.ts arrives in whatever physical shape the generator last
    * wrote — normalize every shape to TimestampType (UTC-adjusted µs),
    * the one event-time type the whole engine (casts, watermarks)
    * assumes:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; sessions
    *    set spark.sql.legacy.parquet.nanosAsLong, so it lands as
    *    LongType nanos → convert to µs.
    *  - TIMESTAMP(isAdjustedToUTC=false): infers to TIMESTAMP_NTZ, which
    *    `withWatermark` rejects and bigint casts refuse → cast to
    *    TimestampType (value-stable: the session TZ is pinned UTC, so
    *    wall-clock micros and instant micros coincide). */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Natural primary keys of the testdata tables (TPC-H's published
    * keys; id columns for the synthetic extras). The file-source analog
    * of [[graft.extract.Discovery]]'s JDBC key probe — feeds
    * `Dump.Config.primaryKeys` so emitted DDL declares the REAL key,
    * never the accidental first column. `events` has no key (append-only
    * stream) and is deliberately absent. */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey"),
    "nation"     -> Seq("n_nationkey"),
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey"),
    "lineitem"   -> Seq("l_orderkey", "l_linenumber"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
}

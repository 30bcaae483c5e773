package graft

import graft.functions.Checksum
import org.apache.spark.sql.functions._

class ChecksumSpec extends SparkTestBase {
  import spark.implicits._

  test("crc32 ground truth (IEEE polynomial)") {
    // java.util.zip.CRC32("hello") = 907060870
    val got = Seq("hello").toDF("s")
      .select(crc32(col("s").cast("binary"))).head().getLong(0)
    assert(got === 907060870L)
  }

  test("checksum is partitioning- and order-invariant (XOR aggregate)") {
    val li = Tables.lineitem(spark, sf)
    def cs(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(Checksum.tableChecksum(df)).head().getLong(0)
    assert(cs(li.repartition(7)) === cs(li.coalesce(1)))
    assert(cs(li.orderBy(desc("l_orderkey"))) === cs(li))
  }

  test("checksum detects single-value drift") {
    val li = Tables.lineitem(spark, sf)
    val tampered = li.withColumn("l_quantity",
      when(col("l_orderkey") === lit(1), col("l_quantity") + 1)
        .otherwise(col("l_quantity")))
    def cs(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(Checksum.tableChecksum(df, li.columns.toSeq)).head().getLong(0)
    assert(cs(li) !== cs(tampered))
  }

  test("NULL and 'NULL' string do not collide") {
    val a = Seq((1L, Option("NULL"))).toDF("id", "v")
    val b = Seq((1L, Option.empty[String])).toDF("id", "v")
    def cs(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(Checksum.tableChecksum(df)).head().getLong(0)
    // NULL renders as a 0x00 marker, distinct from the string "NULL"
    assert(cs(a) !== cs(b))
    assert(cs(a) === cs(a))
  }

  test("structure checksum renders lowercase hex (A5 shape)") {
    val cat = Seq(("t1", "c1", "int"), ("t1", "c2", "varchar")).toDF("t", "c", "ty")
    val hex = cat.agg(Checksum.structureChecksum(cat, Seq("t", "c", "ty"))).head().getString(0)
    assert(hex.matches("[0-9a-f]+"))
  }
}

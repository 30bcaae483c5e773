package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed co-located join: both sides pre-partitioned on the join key →
  * the join plan contains no Exchange at all (the 100 TB recurring-join
  * path, SCALE.md). */
class BucketingSpec extends SparkTestBase {

  test("same-bucketed tables join without any exchange") {
    val dir = Files.createTempDirectory("graft_bucketed_").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "graft_li_b", s"$dir/li", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "graft_o_b", s"$dir/o", "l_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the large-large (sort-merge) path — at real scale neither
      // side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "graft_li_b", "graft_o_b", "l_orderkey")
      val expected = li.join(o, "l_orderkey").count()
      assert(joined.count() === expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_b")
      spark.sql("DROP TABLE IF EXISTS graft_o_b")
    }
  }
}

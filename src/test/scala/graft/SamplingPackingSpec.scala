package graft

import graft.operators.{Packing, Sampling}
import org.apache.spark.sql.functions._

/** Corpus sampling + sequence packing (training-data pipeline ops). */
class SamplingPackingSpec extends SparkTestBase {

  test("stratified sample hits per-stratum fractions") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val fractions = Map("web" -> 0.5, "code" -> 1.0, "wiki" -> 0.1)
    val sources = docs.select("source").distinct().collect().map(_.getString(0))
    val full = sources.map(s => s -> fractions.getOrElse(s, 0.3)).toMap
    val sampled = Sampling.stratified(docs, "source", full)
    val before = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (s, f) =>
      val n = before(s).toDouble
      val got = after.getOrElse(s, 0L).toDouble
      assert(math.abs(got / n - f) <= 0.15 + 3.0 / math.sqrt(n),
        s"stratum $s: kept ${got / n}, wanted $f")
    }
  }

  test("key-hash sample is deterministic and join-consistent across tables") {
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val so = Sampling.byKeyHash(o, "o_orderkey", 0.2)
    val sli = Sampling.byKeyHash(
      li.withColumn("o_orderkey", col("l_orderkey")), "o_orderkey", 0.2)
    // same keys survive on both tables → the join loses nothing
    val sampledJoin = sli.join(so, "o_orderkey").count()
    val fullJoinOnSampledOrders = li.join(so,
      li("l_orderkey") === so("o_orderkey")).count()
    assert(sampledJoin === fullJoinOnSampledOrders)
    // deterministic: re-run identical
    assert(so.count() === Sampling.byKeyHash(o, "o_orderkey", 0.2).count())
  }

  test("packing respects the token budget and reports utilization") {
    val docs = Tables.documents(spark, sf)
    val budget = 256
    val packed = Packing.packByTokenBudget(docs, "text", budget)
    assert(packed.count() === docs.count()) // every doc assigned
    val over = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("tokens"), count(lit(1)).as("docs"))
      .where(col("tokens") > budget && col("docs") > 1) // oversized singletons allowed
      .count()
    assert(over === 0, "a multi-doc bin exceeds the token budget")
    val stats = Packing.packingStats(packed, budget).head()
    assert(stats.getAs[Long]("docs") === docs.count())
    assert(stats.getAs[Double]("utilization") > 0.5,
      s"packing wastes most of the budget: $stats")
  }
}

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

  test("md5-stratified sample is deterministic and hits per-stratum fractions") {
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
    val fractions = Map("F" -> 0.25, "O" -> 0.5, "P" -> 1.0)
    val sampled = Sampling.stratifiedByMd5(o, "o_orderstatus", "o_orderkey", fractions)
    val before = o.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = sampled.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (st, f) =>
      val n = before(st).toDouble
      val got = after.getOrElse(st, 0L).toDouble
      assert(math.abs(got / n - f) <= 3.0 / math.sqrt(n) + 0.02,
        s"stratum $st: kept ${got / n}, wanted $f")
    }
    // fraction 1.0 keeps EVERY row ("g" threshold, not the broken "10000")
    assert(after("P") === before("P"))
    // deterministic: identical row set on re-run
    val again = Sampling.stratifiedByMd5(o, "o_orderstatus", "o_orderkey", fractions)
    assert(sampled.exceptAll(again).count() === 0)
    // strata absent from the map keep fraction 0 (dropped entirely)
    val partial = Sampling.stratifiedByMd5(o, "o_orderstatus", "o_orderkey",
      Map("F" -> 1.0))
    assert(partial.where(col("o_orderstatus") =!= "F").count() === 0)
    assert(partial.count() === before("F"))
    // a fraction JUST below 1.0 must keep ~all rows — rounding it to
    // 65536 would format as the 5-char "10000" which sorts below most
    // 4-hex md5 prefixes and silently kept only ~6% (review finding)
    val nearOne = Sampling.stratifiedByMd5(o, "o_orderstatus", "o_orderkey",
      Map("F" -> 0.999999))
    assert(nearOne.count() >= (before("F") * 0.99).toLong,
      s"near-1.0 fraction collapsed: kept ${nearOne.count()} of ${before("F")}")
  }

  test("topKPerGroup returns exactly min(k, group size) rows per group, deterministically") {
    val o = Tables.orders(spark, sf)
    val k = 40
    val sampled = Sampling.topKPerGroup(o, "o_orderstatus", "o_orderkey", k)
    val sizes = o.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sampled.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (st, n) =>
      assert(got(st) === math.min(k.toLong, n), s"stratum $st")
    }
    // deterministic: identical rows on re-run
    val again = Sampling.topKPerGroup(o, "o_orderstatus", "o_orderkey", k)
    assert(sampled.exceptAll(again).count() === 0)
  }

  test("shuffledShards: every row sharded in range, order stable, buckets balanced") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val s = Sampling.shuffledShards(docs, "doc_id", 10)
    val perShard = s.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perShard.keys.forall(k => k >= 0 && k < 10))
    assert(perShard.values.sum === total, "shards partition the corpus")
    // md5 buckets are uniform: no shard holds > 3x its fair share
    assert(perShard.values.max <= 3 * total / 10 + 1, s"skew: $perShard")
    // the order key is deterministic: repartitioning changes nothing
    val a = s.select("doc_id", "ord", "shard").collect().map(_.toSeq).sortBy(_.toString)
    val b = Sampling.shuffledShards(docs.repartition(7), "doc_id", 10)
      .select("doc_id", "ord", "shard").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
    // ord is collision-free on ids (it IS the reading order)
    assert(s.select("ord").distinct().count() === total)
  }

  test("shuffledShards write path: range-partitioned shards land in reading order") {
    import graft.operators.Sampling
    // the documented 100 TB write shape: range exchange + in-partition
    // sort, both led by the PARTITION column — sorting by ord alone is
    // scrambled by the dynamic-partition writer's own unstable re-sort
    // on shard (measured: files came back order-shuffled)
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Sampling.shuffledShards(Tables.documents(spark, sf), "doc_id", 4)
      .repartitionByRange(4, col("shard"), col("ord"))
      .sortWithinPartitions("shard", "ord")
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    // read ONE shard back file-by-file: rows inside each file must be
    // ord-sorted (input_file_name groups rows by physical file)
    val back = spark.read.parquet(out)
      .withColumn("file", input_file_name())
      .select("file", "ord").collect()
      .groupBy(_.getString(0)).values
    back.foreach { rows =>
      val ords = rows.map(_.getString(1)).toSeq
      assert(ords == ords.sorted, "a shard file is out of reading order")
    }
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

  test("bin-count lower bound stays valid with oversized docs") {
    // one doc longer than the budget: it gets its own (over-budget) bin,
    // so the bound must be over CAPPED bin tokens — the uncapped
    // ceil(total/B) would exceed the real bin count (round-4 advice)
    import spark.implicits._
    val budget = 8
    val docs = Seq(
      (1L, Seq.fill(30)("w").mkString(" ")), // 30 tokens >> budget
      (2L, "a b c"), (3L, "d e"), (4L, "f g h")).toDF("doc_id", "text")
    val packed = Packing.packByTokenBudget(docs, "text", budget)
    val bins = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("bin_tokens"), count(lit(1)).as("bin_docs"))
    val nBins = bins.count()
    val capped = bins.agg(sum(least(col("bin_tokens"), lit(budget.toLong))))
      .head().getLong(0)
    val uncapped = bins.agg(sum("bin_tokens")).head().getLong(0)
    assert(nBins >= math.ceil(capped / budget.toDouble).toLong,
      "capped information-theoretic bound violated")
    assert(math.ceil(uncapped / budget.toDouble).toLong > nBins,
      "test premise: the uncapped bound must overshoot here")
    // oversized bin is a singleton; every multi-doc bin respects budget
    assert(bins.where(col("bin_tokens") > budget && col("bin_docs") > 1).count() === 0)
  }
}

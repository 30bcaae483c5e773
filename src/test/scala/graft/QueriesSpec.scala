package graft

/** Smoke over the whole catalog at sf0.001: every declared operator runs
  * and returns rows; the value-level oracle runs driver-side (DuckDB,
  * tools/local_verify.py). */
class QueriesSpec extends SparkTestBase {

  Queries.all.foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracle map only references registered queries") {
    val unknown = Queries.oracles.keySet -- Queries.all.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_approx_distinct stays within 5% of the exact count") {
    // the 5% bound is now computed in-query (oracle-visible boolean);
    // the spec asserts it held on every group
    val rows = Queries.qApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Boolean]("approx_ok"),
        s"sketch error above 5% for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("q_approx_quantile stays within 1% of the exact percentiles") {
    // the 1% bound is now computed in-query (oracle-visible boolean);
    // the spec asserts it held for every group and the exact values
    // agree with the standalone exact-percentile query
    val rows = Queries.qApproxQuantile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("approx_ok"),
      s"sketch error above 1% for ${r.getString(0)}"))
    val exact = Queries.qPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    rows.foreach { r =>
      assert(exact(r.getString(0)) ===
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
    }
  }

  test("simhashPairs returns EXACTLY the hamming-threshold pair set (pigeonhole completeness)") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val got = operators.Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 6)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: brute-force hamming over every signature pair — the
    // segmented bucketing must lose nothing (pigeonhole: ≤6 flipped bits
    // cannot touch all 7 disjoint segments) and add nothing (the hamming
    // verify filters bucket coincidences)
    val sigs = docs.select(col("doc_id"),
        operators.Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (i1, s1) <- sigs; (i2, s2) <- sigs
      if i1 < i2 && java.lang.Long.bitCount(s1 ^ s2) <= 6
    } yield (i1, i2)).toSet
    assert(want.nonEmpty, "testdata has no near-dup signatures — spec is vacuous")
    assert(got === want)
  }

  test("q_scd2 history invariants: one open interval per key, closed intervals ordered") {
    import org.apache.spark.sql.functions._
    val h = Queries.qScd2(spark, sf).cache()
    try {
      val badCurrent = h.groupBy("o_orderkey")
        .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
        .where(col("n_open") =!= 1).count()
      assert(badCurrent === 0, "every key must have exactly one open interval")
      val badOrder = h.where(!col("is_current") &&
        col("valid_to") <= col("valid_from")).count()
      assert(badOrder === 0, "closed intervals must satisfy valid_from < valid_to")
    } finally h.unpersist()
  }

  test("dedup clusters: min-label propagation finds transitive components") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // components: {1,2,3,9} chained (1-2, 2-3, 3-9), {5,6}, {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L), (8L, 7L))
      .toDF("id1", "id2")
    val got = operators.Dedup.clusters(pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Array(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L,
      6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 1L))
  }

  test("range band-join matches the nested-loop formulation and avoids BNLJ") {
    import org.apache.spark.sql.functions._
    val p = Tables.part(spark, sf)
    // overlapping width-25 intervals over bucket=10 → each interval spans
    // 3-4 buckets, exercising the explode path; facts can match several
    // intervals, exercising the multi-match join
    val bands = spark.range(0, 8).select(
      col("id").as("band"),
      (lit(895.0) + col("id") * 13.0).as("lo"),
      (lit(920.0) + col("id") * 13.0).as("hi"))
    val banded = operators.RangeJoin.bandJoin(p, "p_retailprice",
      bands, "lo", "hi", bucket = 10.0)
    val naive = p.join(bands,
      col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
    assert(banded.count() === naive.count())
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"band join fell back to nested loop:\n$plan")
  }
}

package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: bit-interleave correctness, the rectangle-pruning
  * property the layout exists for, and the SQL replay used by the
  * q_zorder oracle. */
class LayoutSpec extends SparkTestBase {

  test("zorder2 matches a reference interleave on scalar values") {
    import spark.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (63L, 63L),
      (12345L, 54321L), (65535L, 65535L), (40000L, 7L))
    val df = cases.toDF("a", "b")
      .withColumn("z", Layout.zorder2(col("a"), col("b"), 16))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("z") ===
        ref(r.getAs[Long]("a"), r.getAs[Long]("b"), 16),
        s"mismatch at (${r.get(0)}, ${r.get(1)})")
    }
  }

  test("z-range predicate selects exactly the coordinate rectangle") {
    // z < 2^(2k) ⟺ a < 2^k AND b < 2^k — the data-skipping property
    val li = Tables.lineitem(spark, sf)
    val z = Layout.zorder2(col("l_partkey"), col("l_suppkey"), 16)
    val viaZ = li.where(z < 4096L).count()
    val viaRect = li.where(col("l_partkey") < 64 && col("l_suppkey") < 64).count()
    assert(viaZ === viaRect)
    assert(viaZ > 0, "test premise: the rectangle must be non-empty")
  }

  test("zorder2Sql replays the column expression exactly") {
    // run the generated SQL through Spark itself: identical arithmetic
    // semantics to the DuckDB oracle (pure >>, &, *, +)
    val li = Tables.lineitem(spark, sf)
    li.createOrReplaceTempView("li_zorder_test")
    val viaSql = spark.sql(
      s"SELECT l_orderkey, l_linenumber, " +
        s"${Layout.zorder2Sql("l_partkey", "l_suppkey", 16)} AS z " +
        "FROM li_zorder_test")
    val viaCol = li.select(col("l_orderkey"), col("l_linenumber"),
      Layout.zorder2(col("l_partkey"), col("l_suppkey"), 16).as("z"))
    assert(viaSql.exceptAll(viaCol).count() === 0)
    assert(viaCol.exceptAll(viaSql).count() === 0)
  }

  test("zorder2SqlCte (the oracle's stepwise form) replays the column expression") {
    val li = Tables.lineitem(spark, sf)
    li.createOrReplaceTempView("li_zorder_cte_test")
    val inner = Layout.zorder2SqlCte("li_zorder_cte_test", "l_partkey",
      "l_suppkey", 31, Seq("l_orderkey", "l_linenumber"))
    val viaSql = spark.sql(s"SELECT l_orderkey, l_linenumber, z FROM ($inner)")
    val viaCol = li.select(col("l_orderkey"), col("l_linenumber"),
      Layout.zorder2(col("l_partkey"), col("l_suppkey"), 31).as("z"))
    assert(viaSql.exceptAll(viaCol).count() === 0)
    assert(viaCol.exceptAll(viaSql).count() === 0)
  }

  test("zorderN generalizes zorder2 and keeps the hypercube property") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    // n=2 degenerates to zorder2 exactly
    val two = li.select(
      Layout.zorder2(col("l_partkey"), col("l_suppkey"), 16).as("z2"),
      Layout.zorderN(Seq(col("l_partkey"), col("l_suppkey")), 16).as("zn"))
    assert(two.where(col("z2") =!= col("zn")).count() === 0)
    // 3-D: z < 2^(3k) ⟺ all three coordinates < 2^k
    val df = Seq((1L, 2L, 3L), (7L, 7L, 7L), (8L, 0L, 0L), (0L, 8L, 0L),
      (0L, 0L, 8L), (5L, 6L, 7L), (100L, 1L, 1L)).toDF("a", "b", "c")
      .withColumn("z", Layout.zorderN(Seq(col("a"), col("b"), col("c")), 20))
    val inCube = df.where(col("a") < 8 && col("b") < 8 && col("c") < 8)
      .select("z").collect().map(_.getLong(0)).toSet
    val byZ = df.where(col("z") < (1L << 9)).select("z").collect()
      .map(_.getLong(0)).toSet
    assert(inCube === byZ)
    // guardrails: Long overflow and degenerate arity are rejected
    intercept[IllegalArgumentException] {
      Layout.zorderN(Seq(col("a"), col("b"), col("c")), 21)
    }
    intercept[IllegalArgumentException] { Layout.zorderN(Seq(col("a")), 16) }
  }

  test("z-clustered parquet skips row groups on the SECOND dimension") {
    // the reason the operator exists: a rectangle predicate over a
    // z-clustered layout reads only the files/row-groups whose min/max
    // envelopes intersect the rectangle — on a random layout every file
    // spans the full key range and nothing skips. Measured via the scan
    // node's numOutputRows (rows surviving parquet row-group pruning,
    // before the residual filter).
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.clusterByZ(li, "l_partkey", "l_suppkey", numPartitions = Some(16))
      .write.mode("overwrite").parquet(s"$base/clustered")
    li.repartition(16).write.mode("overwrite").parquet(s"$base/random")
    def rowsScanned(path: String): Long = {
      val df = spark.read.parquet(path)
        .where(col("l_partkey") < 64 && col("l_suppkey") < 64)
      // collect() executes THIS QueryExecution — a sink write would
      // spawn its own and leave these metrics at zero
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val clustered = rowsScanned(s"$base/clustered")
    val random = rowsScanned(s"$base/random")
    val hits = li.where(col("l_partkey") < 64 && col("l_suppkey") < 64).count()
    info(s"rows scanned: clustered=$clustered random=$random (true hits=$hits)")
    assert(clustered < random / 4,
      s"z-layout should prune most row groups: clustered=$clustered random=$random")
  }

  test("clusterByZ preserves rows and bounds per-partition z-ranges") {
    val li = Tables.lineitem(spark, sf)
    val clustered = Layout.clusterByZ(li, "l_partkey", "l_suppkey",
      numPartitions = Some(8))
    assert(clustered.count() === li.count())
    // each output partition's z-envelope must be disjoint-ish: the sum
    // of per-partition z-spans ≈ the global span (no partition covers
    // everything), which is what makes file-level min/max stats prune
    val z = Layout.zorder2(col("l_partkey"), col("l_suppkey"), 16)
    val spans = clustered.withColumn("z", z)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .collect()
    assert(spans.length > 1)
    val globalSpan = spans.map(_.getAs[Long]("hi")).max -
      spans.map(_.getAs[Long]("lo")).min
    val sumSpans = spans.map(r => r.getAs[Long]("hi") - r.getAs[Long]("lo")).sum
    assert(sumSpans <= globalSpan * 1.2,
      s"partitions overlap badly: sum of spans $sumSpans vs global $globalSpan")
  }
}

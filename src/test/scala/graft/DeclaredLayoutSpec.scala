package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Focused pins for the round-15 declared-layout checkpoint
  * ([[graft.operators.Dedup.partitionedCheckpointCut]]): the iterative
  * operators (clusters / pageRank / LPA) materialize their
  * loop-invariant edge tables ONCE, laid out on the loop join key with
  * a size-derived width, and DECLARE that layout to the planner so
  * per-round joins/aggregations consume the frame with no Exchange
  * (guide §2.4 — iters×edge-shuffle → 1×).
  *
  * Three load-bearing properties pinned here:
  *  1. value identity — the declared frame holds exactly the input's
  *     rows (a wrong declaration silently mis-joins, so identity plus
  *     the join-result pin below is the correctness gate);
  *  2. exchange-free consumption — aggregates and joins keyed on the
  *     declared column plan ZERO exchanges on the declared side;
  *  3. size-derived width — tiny input lays out into one partition
  *     (a local[32]-sized CONSTANT width ran 32 near-empty tasks per
  *     loop stage: measured 70-100× task-time inflation at sf0.1,
  *     while any local-sized constant would under-partition a real
  *     corpus; the width must come from the materialized bytes).
  */
class DeclaredLayoutSpec extends SparkTestBase {

  test("declared-layout frame is value-identical and exchange-free on " +
      "the declared key") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 3L), (7L, 8L), (2L, 1L))
      .toDF("src", "dst")
    val (edges, release) = Dedup.partitionedCheckpointCut(pairs, Seq("src"))
    try {
      // 1. value identity
      assert(edges.orderBy("src", "dst").collect().toSeq ==
        pairs.orderBy("src", "dst").collect().toSeq)
      // 2a. aggregate keyed on the declared column: zero exchanges
      val agg = edges.groupBy("src").agg(count(lit(1)).as("n"))
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!aggPlan.contains("Exchange"),
        "aggregate on declared key re-exchanged:\n" + aggPlan.take(2000))
      // 2b. join keyed on the declared column: exactly ONE exchange —
      // the probe side's; the declared side streams from its blocks
      val probe = Seq((1L, 10L), (2L, 20L)).toDF("src", "v")
        .hint("shuffle_hash")
      val j = edges.join(probe, Seq("src"))
      j.collect()
      val jPlan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(jPlan).size
      assert(exchanges == 1,
        s"expected exactly the probe side's exchange, got $exchanges:\n" +
          jPlan.take(3000))
      // correctness THROUGH the declared layout (a mis-declared layout
      // drops or misroutes matches)
      assert(j.select("src", "dst", "v").orderBy("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq((1L, 2L, 10L), (2L, 1L, 20L), (2L, 3L, 20L)))
    } finally release()
  }

  test("multi-partition declared layout: physical placement matches the " +
      "declared HashPartitioning (value identity + join THROUGH it)") {
    import spark.implicits._
    // force width > 1 by shrinking the advisory partition size: the
    // sf-scale correctness gates all lay out into width=1, where the
    // declaration is vacuous (everything pmod 1 routes to partition 0);
    // the dangerous path — row placement must equal murmur3-pmod
    // evaluation or joins silently misroute — only exercises at
    // width > 1 (ADVICE r15)
    val conf = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val old = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "256b")
      val pairs = (1L to 5000L).map(i => (i % 97, i)).toDF("src", "dst")
      val (edges, release) = Dedup.partitionedCheckpointCut(pairs, Seq("src"))
      try {
        assert(edges.rdd.getNumPartitions > 1,
          s"advisory=256b must force width > 1, got " +
            s"${edges.rdd.getNumPartitions}")
        // value identity through the multi-partition layout
        assert(edges.count() == 5000L)
        val aggGot = edges.groupBy("src").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val aggWant = pairs.groupBy("src").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(aggGot == aggWant, "aggregate over the declared layout " +
          "diverged — physical placement disagrees with the declaration")
        // join THROUGH the declared layout: every key must meet its
        // probe row (a mis-declared layout drops matches silently)
        val probe = (0L until 97L).map(k => (k, k * 10)).toDF("src", "v")
          .hint("shuffle_hash")
        val j = edges.join(probe, Seq("src"))
        assert(j.count() == 5000L,
          "join through the multi-partition declared layout lost rows")
      } finally release()
    } finally spark.conf.set(conf, old)
  }

  test("size-derived width: tiny input lays out into a single partition") {
    import spark.implicits._
    val pairs = (1L to 100L).map(i => (i, i + 1)).toDF("src", "dst")
    val (edges, release) = Dedup.partitionedCheckpointCut(pairs, Seq("src"))
    try assert(edges.rdd.getNumPartitions == 1,
      s"got ${edges.rdd.getNumPartitions} partitions for a 100-row frame")
    finally release()
  }
}

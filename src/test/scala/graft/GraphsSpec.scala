package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

/** Integer PageRank: exactness against a driver-side replica of the
  * fixed-point arithmetic, edge hygiene, dangling semantics, and the
  * checkpoint lifecycle. */
class GraphsSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side replica of the operator's exact integer contract. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L, num: Long = 85, den: Long = 100): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val teleport = scale / den * (den - num) + scale % den * (den - num) / den
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => rank(u) / outdeg(u) }.sum).toMap
      rank = nodes.map(n => n -> (teleport + num * in.getOrElse(n, 0L) / den)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the integer reference on a cyclic graph with a hub") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1),          // cycle
      (4, 1), (5, 1), (6, 1),          // hub fan-in
      (1, 4),                          // partial back-edge
      (7, 8))                          // isolated pair; 8 is dangling
    for (iters <- Seq(1, 3, 6))
      assert(run(edges, iters) === reference(edges, iters), s"iters=$iters")
  }

  test("self-loops and duplicate edges are dropped before ranking") {
    val dirty = Seq[(Long, Long)]((1, 2), (1, 2), (2, 2), (2, 1), (3, 3), (3, 1))
    assert(run(dirty, 4) === reference(dirty, 4))
  }

  test("dangling node keeps exactly the teleport term") {
    val got = run(Seq((1L, 2L)), 5)
    // node 2 has no out-edges; node 1 receives nothing after round 1
    val teleport = 1000000000000L / 100 * 15
    assert(got(1L) === teleport)
    assert(got(2L) > teleport)
  }

  test("rank order is stable under input permutation/partitioning") {
    val edges = (0L until 400L).map(i => (i % 37, (i * 31) % 41))
    val a = run(edges, 6)
    val b = Graphs.pageRank(
      scala.util.Random.shuffle(edges).toDF("src", "dst").repartition(13),
      "src", "dst", 6).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("no checkpoint blocks survive the call") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 4)
    assert(out.size === 3)
    val after = sc.getPersistentRDDs.keySet -- before
    // the final rank table's blocks are the only permissible survivors
    assert(after.size <= 1, s"leaked checkpoints: $after")
  }

  test("scoped variants release the final table too (batch-cadence contract)") {
    import spark.implicits._
    val sc = spark.sparkContext
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val before = sc.getPersistentRDDs.keySet
    val pr = Graphs.pageRankScoped(edges, "src", "dst", iters = 3)
    val prw = Graphs.pageRankWeightedScoped(edges, "src", "dst", iters = 3)
    val lp = Graphs.labelPropagationScoped(edges, "src", "dst", iters = 2)
    // results must be readable before release and match the overloads
    assert(pr.df.count() === 4 && prw.df.count() === 4 && lp.df.count() === 4)
    pr.release(); prw.release(); lp.release()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"scoped graph ops leaked storage: $leaked")
  }

  /** Driver replica of the weighted contract: multi-edges sum to w,
    * contribution = exact floor(rank·w / W) via BigInt. */
  private def referenceWeighted(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L, num: Long = 85, den: Long = 100): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nodes = (e.keys.map(_._1) ++ e.keys.map(_._2)).toSeq.distinct
    val wsum = e.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val teleport = scale / den * (den - num) + scale % den * (den - num) / den
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = e.toSeq.groupBy(_._1._2).view.mapValues(_.map { case ((u, _), w) =>
        (BigInt(rank(u)) * w / wsum(u)).toLong
      }.sum).toMap
      rank = nodes.map(n => n -> (teleport + num * in.getOrElse(n, 0L) / den)).toMap
    }
    rank
  }

  test("weighted ranks match the BigInt reference; multi-edges weigh in") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 2), (1, 2), (1, 3),      // 1 favors 2 at 3:1
      (2, 1), (3, 1), (3, 1), (2, 3), (4, 1))
    val got = Graphs.pageRankWeighted(edges.toDF("src", "dst"), "src", "dst", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceWeighted(edges, 5))
    // and the weighting actually matters: node 2 outranks node 3
    assert(got(2L) > got(3L))
  }

  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val es = und.toSet
    val nodes = (und.map(_._1) ++ und.map(_._2)).distinct.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- i + 1 until nodes.length
      k <- j + 1 until nodes.length
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if es((a, b)) && es((a, c)) && es((b, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle counts match brute force on a clique+path+star mix") {
    val clique = for (i <- 1L to 5L; j <- i + 1 to 5L) yield (i, j)
    val path = Seq[(Long, Long)]((5, 6), (6, 7), (7, 8))
    val star = (20L to 30L).map(i => (100L, i))
    val extra = Seq[(Long, Long)]((20, 21), (2, 1), (3, 3)) // dup reversed + self
    val edges = clique ++ path ++ star ++ extra
    assert(runTriangles(edges) === refTriangles(edges))
  }

  test("triangle counts match brute force on a random graph (seeded)") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    assert(runTriangles(edges) === refTriangles(edges))
  }

  test("triangle-free graph returns no rows") {
    val bipartite = for (i <- 1L to 5L; j <- 10L to 15L) yield (i, j)
    assert(runTriangles(bipartite) === Map.empty)
  }

  /** Driver replica of the deterministic synchronous LPA contract. */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var label = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters)
      label = adj.map { case (n, ns) =>
        val votes = ns.map(label).groupBy(identity).view.mapValues(_.size)
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    label
  }

  private def runLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("label propagation matches the reference; two cliques stay apart") {
    val cliqueA = for (i <- 1L to 5L; j <- i + 1 to 5L) yield (i, j)
    val cliqueB = for (i <- 11L to 15L; j <- i + 1 to 15L) yield (i, j)
    val bridge = Seq((5L, 11L))
    val edges = cliqueA ++ cliqueB ++ bridge
    for (iters <- Seq(1, 2, 4)) {
      val got = runLpa(edges, iters)
      assert(got === refLpa(edges, iters), s"iters=$iters")
    }
    val communities = runLpa(edges, 4)
    assert(communities(2L) === communities(4L))
    assert(communities(12L) === communities(14L))
    assert(communities(2L) !== communities(12L),
      "bridged cliques must keep distinct communities")
  }

  test("label propagation is partitioning-invariant (seeded random graph)") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(p => p._1 != p._2)
    val a = runLpa(edges, 3)
    val b = Graphs.labelPropagation(
      scala.util.Random.shuffle(edges).toDF("src", "dst").repartition(17),
      "src", "dst", 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b && a === refLpa(edges, 3))
  }

  test("handoff edges: per (type, day) stream, next user, no self-loops") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 10L, "click"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 11L, "click"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 11L, "click"), // self-handoff: dropped
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:03:00"), 12L, "click"),
      (5L, java.sql.Timestamp.valueOf("2024-01-02 09:00:00"), 13L, "click"), // next day: new stream
      (6L, java.sql.Timestamp.valueOf("2024-01-01 10:00:30"), 14L, "view")   // other type
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Graphs.eventHandoffEdges(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 11L), (11L, 12L)))
  }
}

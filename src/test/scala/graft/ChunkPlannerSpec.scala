package graft

import graft.core.ChunkSpec
import graft.operators.ChunkPlanner
import graft.operators.ChunkPlanner._
import org.apache.spark.sql.functions._

class ChunkPlannerSpec extends SparkTestBase {

  test("integer chunk predicates match the reference WHERE shape") {
    val chunks = integerChunks("id", 0, 99, 40)
    assert(chunks.map(_.where) === Seq(
      "((`id` >= 0 AND `id` <= 39) OR `id` IS NULL)",
      "(`id` >= 40 AND `id` <= 79)",
      "(`id` >= 80 AND `id` <= 99)"))
  }

  test("decimal chunks partition the full u64 range exactly (no overflow)") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.DecimalType
    // keys straddling Long.MaxValue — the reference's unsigned path
    val top = BigInt("18446744073709551615") // 2^64 - 1
    val lo = top - 999
    val chunks = decimalChunks("k", lo, top, BigInt(400))
    assert(chunks.size === 3)
    assert(chunks.head.where.contains("IS NULL"))
    assert(chunks.last.where.contains(top.toString))
    // chunk filters partition an actual DECIMAL(20,0) column
    val df = spark.range(0, 1000).select(
      (lit(new java.math.BigDecimal(lo.bigInteger)) + col("id"))
        .cast(DecimalType(20, 0)).as("k"))
    val counts = chunks.map(c => df.filter(c.filter).count())
    assert(counts.sum === 1000)
    assert(counts === Seq(400L, 400L, 200L))
  }

  test("chunked scans partition the table exactly (no loss, no overlap)") {
    val o = Tables.orders(spark, sf)
    val chunks = planInteger(o, "o_orderkey", 8)
    val total = chunks.map(c => o.filter(c.filter).count()).sum
    assert(total === o.count())
    // pairwise disjoint: summed count equals distinct union count
    val unioned = applyChunks(o, chunks)
    assert(unioned.count() === o.count())
  }

  test("multi-column descent chunks a (tenant_id, seq) key exactly") {
    // 3 tenants × 100k seqs: the leading column's gap (2) can't split,
    // the nested plan must — reference mydumper_integer_chunks.c:354-396
    val df = spark.range(0, 300000).select(
      (col("id") % 3 + 1).as("tenant_id"),
      expr("id div 3").as("seq"))
    val parts = (1L to 3L).map(t => (t, 0L, 99999L, 25000L))
    val chunks = multiIntChunks("tenant_id", "seq", parts, includeNull = false)
    assert(chunks.length === 12, "3 tenants x 4 nested ranges")
    assert(chunks.head.where ===
      "(`tenant_id` = 1 AND (`seq` >= 0 AND `seq` <= 24999))")
    // partition exactly: no loss, no overlap
    val counts = chunks.map(c => df.filter(c.filter).count())
    assert(counts.sum === 300000L)
    assert(applyChunks(df, chunks).count() === 300000L)
    assert(counts.forall(_ === 25000L), counts.toString)
    // NULL catch-all rides the first chunk when keys are nullable
    val withNulls = multiIntChunks("tenant_id", "seq", parts)
    assert(withNulls.head.where.endsWith(
      "OR `tenant_id` IS NULL OR `seq` IS NULL)"))
    val dfN = df.unionAll(spark.range(1).select(
      lit(null).cast("long").as("tenant_id"), lit(7L).as("seq")))
    assert(withNulls.map(c => dfN.filter(c.filter).count()).sum === 300001L)
  }

  test("string chunks from bounds: half-open, null-inclusive first") {
    val cs = stringChunksFromBounds("c_name", Seq("h", "p"))
    assert(cs.map(_.where) === Seq(
      "((`c_name` < 'h') OR `c_name` IS NULL)",
      "(`c_name` >= 'h' AND `c_name` < 'p')",
      "(`c_name` >= 'p')"))
    val c = Tables.customer(spark, sf)
    val total = cs.map(x => c.filter(x.filter).count()).sum
    assert(total === c.count())
  }

  test("quantile string chunking covers the table") {
    val c = Tables.customer(spark, sf)
    val cs = stringChunks(c, "c_name", 4)
    val total = cs.map(x => c.filter(x.filter).count()).sum
    assert(total === c.count())
    assert(cs.length >= 2, "expected multiple chunks from quantiles")
  }

  test("strategy chooser follows the reference decision tree") {
    assert(choose(500, Some("bigint"), Nil) === Strategy.Whole)      // small table
    assert(choose(1e6.toLong, Some("bigint"), Nil) === Strategy.IntRange)
    assert(choose(1e6.toLong, Some("varchar"), Nil) === Strategy.StringRange)
    assert(choose(1e6.toLong, Some("bigint"), Seq("p0")) === Strategy.ByPartition)
    assert(choose(1e6.toLong, None, Nil) === Strategy.Whole)
  }

  test("ChunkSpec -> jdbc predicates contract") {
    val preds = toPredicates(ChunkSpec.IntRange("k", 0, 9, 5, includeNullChunk = false))
    assert(preds === Array("(`k` >= 0 AND `k` <= 4)", "(`k` >= 5 AND `k` <= 9)"))
    assert(toPredicates(ChunkSpec.WholeTable).isEmpty)
  }

  test("ntile boundaries cover all rows with balanced counts") {
    val o = Tables.orders(spark, sf)
    val b = ChunkPlanner.ntileBounds(o, "o_orderkey", 4).collect()
    assert(b.map(_.getAs[Long]("cnt")).sum === o.count())
    val counts = b.map(_.getAs[Long]("cnt"))
    assert(counts.max - counts.min <= 1) // ntile balance property
  }

  test("retarget follows the reference formula, doubles on empty, clamps (C3)") {
    import ChunkPlanner.retarget
    // rows × target / elapsed: 50k rows in 0.5s at target 2s → 200k step
    assert(retarget(10000L, 50000L, 0.5) === 200000L)
    // too-slow chunk shrinks: 100k rows took 8s → 25k
    assert(retarget(100000L, 100000L, 8.0) === 25000L)
    // zero rows (sparse range) doubles
    assert(retarget(4000L, 0L, 1.0) === 8000L)
    // sub-resolution elapsed doubles too
    assert(retarget(4000L, 4000L, 0.0) === 8000L)
    // clamps: floor at minStep, ceiling at maxStep when set, 0 = uncapped
    assert(retarget(10000L, 10L, 10.0) === 1000L)
    assert(retarget(10000L, 1000000L, 0.001, maxStep = 500000L) === 500000L)
    assert(retarget(10000L, 1000000L, 0.001) === 2000000000L)
    // doubling can't overflow
    assert(retarget(Long.MaxValue / 2 + 7, 0L, 1.0) > 0)
  }

  test("retarget converges to the target chunk time under a stable cost model (C3)") {
    import ChunkPlanner.converge
    // linear cost: rowsPerSec rows per second → fixpoint at
    // target × rowsPerSec rows, whatever the starting step
    for (rowsPerSec <- Seq(1000.0, 80000.0, 2.5e6);
         start <- Seq(2000L, 100000L, 10000000L)) {
      val step = converge(start, s => s / rowsPerSec)
      val ideal = 2.0 * rowsPerSec
      assert(math.abs(step - ideal) / ideal <= 0.15,
        s"start=$start rps=$rowsPerSec converged to $step, ideal $ideal")
    }
    // clamps hold under convergence: a pathologically slow source pins
    // to minStep; a fast one caps at maxStep
    assert(converge(5000L, _ => 1e9) === 1000L)
    assert(converge(50000L, s => s / 1e9, maxStep = 300000L) === 300000L)
  }
}

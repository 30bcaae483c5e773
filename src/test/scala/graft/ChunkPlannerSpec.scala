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
}

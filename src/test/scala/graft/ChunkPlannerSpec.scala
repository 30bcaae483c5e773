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

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parity pin for the round-16 single-pass [[Similarity.cellPairs]]
  * (hot/cold candidates from ONE window pass over the shared
  * (cellkey, id) exchange — guide §2.4): the candidate PAIR SET must be
  * identical to the round-14/15 two-branch form (cold = all-pairs
  * self-join, hot = id-ordered lead window), which is inlined here as
  * the reference. Both consumers (`selfTopKLsh`, `NearDupStore.pairs`)
  * apply `.distinct()` on the output, so the pinned unit is the SET —
  * asserted over a construction that exercises every regime at once:
  * cold cells (below maxCell), a hot cell (above it), a singleton cell,
  * and a cell straddling the window length. */
class CellPairsParitySpec extends graft.SparkTestBase {

  /** The pre-round-16 two-branch hot/cold form, verbatim. */
  private def referencePairs(celled: DataFrame, idCol: String,
      maxCell: Int, hotWindow: Int): DataFrame = {
    val wOrd = Window.partitionBy(col("cellkey")).orderBy(col(idCol))
    val wAll = Window.partitionBy(col("cellkey"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val marked = celled.withColumn("cn", count(lit(1)).over(wAll))
    val cold = marked.where(col("cn") <= maxCell)
    val coldPairs = cold.select(col("cellkey"), col(idCol).as("id1"))
      .join(cold.select(col("cellkey"), col(idCol).as("id2"))
        .hint("merge"), Seq("cellkey"))
      .where(col("id1") < col("id2")).select("id1", "id2")
    val hotPairs = marked.where(col("cn") > maxCell)
      .withColumn("nbrs", array((1 to hotWindow).map(i =>
        lead(col(idCol), i).over(wOrd)): _*))
      .select(col(idCol).as("id1"), explode(col("nbrs")).as("id2"))
      .where(col("id2").isNotNull)
    coldPairs.unionAll(hotPairs)
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id1", "id2").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("single-pass capped cellPairs emits exactly the two-branch " +
      "form's candidate set (cold all-pairs + hot sliding window)") {
    import spark.implicits._
    val maxCell = 6
    val hotWindow = 3
    // cells: 1 = singleton; 2 = two members; 3 = exactly maxCell
    // members (cold boundary); 4 = maxCell+1 (hot boundary, window
    // shorter than cell); 5 = far above maxCell; ids shared across
    // cells so multi-cell co-candidates exercise the distinct
    val rows =
      Seq(1L -> 100L) ++
      Seq(2L -> 10L, 2L -> 20L) ++
      (1L to 6L).map(i => 3L -> (200L + i)) ++
      (1L to 7L).map(i => 4L -> (300L + i)) ++
      ((1L to 20L).map(i => 5L -> (400L + i)) :+ (5L -> 10L) :+ (5L -> 20L))
    val celled = rows.toDF("cellkey", "id")
    val got = pairSet(Similarity.cellPairs(celled, "id", maxCell, hotWindow))
    val want = pairSet(referencePairs(celled, "id", maxCell, hotWindow))
    assert(got == want,
      s"missing=${(want -- got).toSeq.sorted.take(20)} " +
        s"extra=${(got -- want).toSeq.sorted.take(20)}")
    // sanity on the construction itself: the hot cell contributed
    // window pairs only (e.g. 400+1 with 400+5 must NOT be a candidate)
    assert(!got.contains((401L, 405L)))
    assert(got.contains((401L, 404L)))
    // and a cold cell is exhaustive
    assert(got.contains((201L, 206L)))
  }

  test("uncapped (maxCell <= 0) form is untouched: exact all-pairs") {
    import spark.implicits._
    val celled = Seq(1L -> 1L, 1L -> 2L, 1L -> 3L).toDF("cellkey", "id")
    val got = pairSet(Similarity.cellPairs(celled, "id", 0, 8))
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}

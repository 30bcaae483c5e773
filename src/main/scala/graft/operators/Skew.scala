package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: two-phase salted aggregation. A handful of heavy
  * group keys (a 3-value returnflag over 10⁹ rows, a boilerplate dedup
  * bucket) turns one reducer into the stage's critical path; salting
  * splits each key across `salts` reducers for the partial phase, then a
  * tiny final aggregate (≤ keys × salts rows) merges. Valid for any
  * decomposable aggregate; results are identical to the unsalted plan —
  * the oracle checks that, not just shape. AQE's skew handling covers
  * sort-merge joins; aggregation skew still needs this explicit form.
  */
object Skew {

  /** groupBy(keys) with salted partials. `aggs` maps output name →
    * (partial agg of input column, final merge of partial column). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      aggs: Seq[(String, Column => Column, Column => Column)],
      inputs: Seq[(String, Column)]): DataFrame = {
    // deterministic salt: hash of the whole row's first input, spread
    // uniformly; any cheap per-row value works — it only load-balances
    val salted = inputs.foldLeft(
        df.withColumn("__salt", pmod(xxhash64(inputs.map(_._2): _*), lit(salts)))) {
      case (d, (n, c)) => d.withColumn(s"__in_$n", c)
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2(col(s"__in_${aggs.head._1}")).as(s"__p_${aggs.head._1}"),
        aggs.tail.map(a => a._2(col(s"__in_${a._1}")).as(s"__p_${a._1}")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map(a => a._3(col(s"__p_${a._1}")).as(a._1)): _*)
  }

  /** Salted equi-join for a skewed fact key joining a small-ish dim:
    * the fact side gets a deterministic salt in [0, salts); the dim side
    * is replicated once per salt value (explode of a `sequence` — dim
    * grows ×salts, fact doesn't move twice). The join key becomes
    * (key, salt), so one hot key's rows spread over `salts` reducers
    * instead of one. Results are identical to the plain join — the
    * oracle checks exactly that. Use when AQE's skew-split can't help
    * (e.g. the hot key exceeds a single partition even after splits, or
    * the join is a broadcast candidate the dim is too big for). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltSource: Column): DataFrame = {
    require(salts > 0)
    val f = fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}

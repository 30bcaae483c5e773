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
}

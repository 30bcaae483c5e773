package graft

import org.apache.spark.sql.functions._

/** The two-stage (projected entropy pool) q_mask_hash must stay
  * value-identical to the inlined MaskFn composition — the projection is
  * a codegen-size optimization (measured ~9x cheaper first-use JIT), not
  * a semantic change, and the shared DuckDB oracle depends on that. */
class MaskPoolSpec extends SparkTestBase {
  test("pooled q_mask_hash matches the inlined MaskFn columns exactly") {
    import functions.Masquerade._
    val c = Tables.customer(spark, "/root/testdata/sf0.01")
    val inlined = c.select(col("c_custkey"),
      RandomIntDet(col("c_name")).as("mask_int"),
      RandomStringDet(col("c_name")).as("mask_str"),
      RandomUuidDet(col("c_name")).as("mask_uuid"))
    val pooled = Queries.all("q_mask_hash")(spark, "/root/testdata/sf0.01")
    assert(inlined.exceptAll(pooled).count() === 0)
    assert(pooled.exceptAll(inlined).count() === 0)
  }
}

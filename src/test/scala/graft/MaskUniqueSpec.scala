package graft

import graft.functions.Masquerade
import org.apache.spark.sql.functions._

/** Collision accounting for the deterministic masquerade replacements
  * of the reference's `random_int` / `random_string` UNIQUE semantics
  * (mydumper_masquerade.c:95-178: a process-global memo table plus
  * retry guarantees global uniqueness within one run — mutable state a
  * distributed engine cannot share cheaply).
  *
  * The salted-hash replacement is a random function, not a permutation,
  * so on an n-value column it collides at the birthday rate for the
  * output space the masked SHAPE allows:
  *
  *   E[collisions] ≈ C(n,2) · p^L
  *
  * where L is the (preserved) value length and p the per-character
  * match probability of the translate alphabet — `random_int` maps hex
  * onto digits NON-injectively (a-f fold onto 0-5: p = 6·(2/16)² +
  * 4·(1/16)² = 0.109375); `random_string`'s map is a 16→16 bijection
  * (p = 1/16 = 0.0625). This spec measures the observed collision count
  * on a 10⁶-value column and pins it to the analytic expectation —
  * proving the hash behaves like a uniform random function (no
  * systematic clustering) — and demonstrates the documented escape
  * hatch: any LENGTH-PRESERVING masking of short numeric keys must
  * collide (10⁶ 8-digit keys collide ~5000× even under a perfect
  * uniform digit hash), so callers needing reference-UNIQUE semantics
  * use RandomUuidDet (128-bit space, zero expected collisions below
  * ~2^64 rows) or widen the Format template. See COVERAGE.md §2.6.
  */
class MaskUniqueSpec extends SparkTestBase {

  private val N = 1_000_000L
  private def keys =
    spark.range(N).select(format_string("%08d", col("id")).as("k"))

  private def collisions(masked: org.apache.spark.sql.Column): Long = {
    val df = keys.select(masked.as("m"))
    N - df.agg(countDistinct(col("m"))).head().getLong(0)
  }

  private def expected(p: Double, len: Int): Double =
    (N.toDouble * (N - 1) / 2.0) * math.pow(p, len)

  test("random_int collision rate matches the birthday bound (8-digit keys)") {
    val obs = collisions(Masquerade.RandomIntDet(col("k")))
    val exp = expected(0.109375, 8)
    info(f"random_int: observed=$obs expected=$exp%.0f")
    assert(obs > exp / 3 && obs < exp * 3,
      s"random_int collisions $obs far from birthday expectation $exp — " +
        "the hash is not behaving as a uniform random function")
  }

  test("random_string collision rate matches the bound (injective alphabet)") {
    val obs = collisions(Masquerade.RandomStringDet(col("k")))
    val exp = expected(1.0 / 16, 8)
    info(f"random_string: observed=$obs expected=$exp%.0f")
    assert(obs > exp / 4 && obs < exp * 4,
      s"random_string collisions $obs far from birthday expectation $exp")
  }

  test("random_uuid is collision-free at any realistic scale") {
    // 128-bit output space: expected collisions C(10^6,2)/2^128 ~ 10^-27
    assert(collisions(Masquerade.RandomUuidDet(col("k"))) === 0L)
  }
}

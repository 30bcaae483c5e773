package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** FastSS deletion-neighborhood edit-distance join (Bocek et al. 2007):
  * exactness against a driver-side DP reference, both thresholds, the
  * degenerate-length edges, and the stop-bucket cap. */
class EditDistanceSpec extends SparkTestBase {
  import spark.implicits._

  /** Plain Wagner–Fischer — the independent reference. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def allPairs(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows if i1 < i2
      dist = lev(s1, s2) if dist <= d
    } yield (i1, i2, dist.toLong)).toSet

  private def got(rows: Seq[(Long, String)], d: Int, cap: Int = 0): Set[(Long, Long, Long)] =
    Dedup.editDistancePairs(rows.toDF("id", "s"), "id", "s", d, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private val words = Seq(
    0L -> "kitten", 1L -> "sitten", 2L -> "sittin", 3L -> "sitting",
    4L -> "mitten", 5L -> "kitten", // exact dup => dist-0 pair
    6L -> "kitte",  7L -> "kittten", 8L -> "catten",
    9L -> "",       10L -> "a",      11L -> "b", 12L -> "ab")

  test("d=1 pairs match the DP reference exactly (sub/ins/del/dup/empty)") {
    assert(got(words, 1) === allPairs(words, 1))
  }

  test("d=2 pairs match the DP reference exactly") {
    assert(got(words, 2) === allPairs(words, 2))
  }

  test("randomized corpus: d=2 exact vs reference (seeded)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde" // tiny alphabet => dense near-pairs
    val rows = (0L until 120L).map { i =>
      i -> (0 until (3 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    assert(got(rows, 2) === allPairs(rows, 2))
  }

  test("padded-digit keys: the gate's shape finds every distance-1 pair") {
    val rows = (0L until 200L).map(i => i -> f"Customer#$i%09d")
    assert(got(rows, 1) === allPairs(rows, 1))
  }

  test("shift-shaped d=2 pairs survive (regression: index-compat over-prune)") {
    // "9012345" vs "0123458": lev 2 (delete leading char + append
    // trailing), every shared deletion variant has index offset 6 — a
    // per-coordinate ±2 index filter silently dropped this shape.
    val rows = Seq(0L -> "9012345", 1L -> "0123458",
      2L -> "abcdefg", 3L -> "bcdefgh") // second shift pair, letters
    assert(got(rows, 2) === allPairs(rows, 2))
    assert(got(rows, 2).contains((0L, 1L, 2L)), "the shift pair itself")
    assert(got(rows, 2).contains((2L, 3L, 2L)), "letter shift pair")
  }

  test("null strings are excluded explicitly; empty strings still pair") {
    val df = spark.createDataFrame(Seq(
      (0L, "ab"), (1L, null.asInstanceOf[String]), (2L, "a"), (3L, "")))
      .toDF("id", "s")
    val out = Dedup.editDistancePairs(df, "id", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // nulls never pair (even with ""); ("a","ab"), ("a",""), and no null legs
    assert(out === Set((0L, 2L, 1L), (2L, 3L, 1L)))
  }

  test("verify-once-per-pair: raw candidates carry multi-variant " +
      "multiplicity, distinct pairs are what levenshtein sees, output exact") {
    // padded digits: a true <=2 pair shares many deletion variants, so
    // the raw join emits it once per shared variant — the dedup before
    // the banded-DP verify is the d=2 cost fix
    val rows = (0L until 300L).map(i => i -> f"K#$i%06d")
    val cand = Dedup.editCandidates(rows.toDF("id", "s"), "id", "s", 2, 0)
    val raw = cand.count()
    val distinct = cand.select("id1", "id2").distinct().count()
    assert(raw > 3 * distinct,
      s"expected >=3x multiplicity on this key space: raw=$raw distinct=$distinct")
    assert(got(rows, 2) === allPairs(rows, 2), "output exact after the dedup")
  }

  test("maxBucket cap drops hot-variant keys but keeps exact elsewhere") {
    // 50 identical strings make every variant bucket hot; two unrelated
    // near-pairs survive a cap that excludes the hot buckets.
    val hot = (0L until 50L).map(i => i -> "aaaa")
    val cold = Seq(100L -> "zyxwv", 101L -> "zyxw", 200L -> "qqrst", 201L -> "qqrsu")
    val out = got(hot ++ cold, 1, cap = 10)
    assert(out === allPairs(cold, 1), "cold pairs survive, hot bucket dropped")
  }
}

package graft

import graft.operators.ChunkPlanner
import graft.sources.{SqlInsertReader, SqlInsertWriter}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5's upgrade over the reference's
  * example-only tests): escaping round-trips arbitrary hostile strings,
  * chunk plans partition arbitrary ranges exactly, sketches are
  * deterministic and length-stable. Pure JVM properties — no Spark
  * session, so thousands of cases run in milliseconds. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("SQL escaping round-trips every string (control chars, quotes, unicode)") {
    check(Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableChar,
      Gen.oneOf(' ', '\n', '\r', '\\', '\'', '"', '\u0000', '\u001a'),
      Gen.choose('\u00a1', '\ud7ff'))).map(_.mkString)) { s =>
      val sb = new java.lang.StringBuilder()
      SqlInsertWriter.escapeInto(sb, s)
      SqlInsertReader.unescape(sb.toString) == s
    })
  }

  test("integer chunks partition [min,max] exactly: cover all, overlap none") {
    val gen = for {
      min <- Gen.choose(-1000000L, 1000000L)
      span <- Gen.choose(0L, 100000L)
      step <- Gen.choose(1L, 10000L)
    } yield (min, min + span, step)
    check(Prop.forAll(gen) { case (min, max, step) =>
      val chunks = ChunkPlanner.integerChunks("k", min, max, step, includeNull = false)
      // parse each WHERE's bounds back out and verify the partition
      val bounds = chunks.map { c =>
        val m = "`k` >= (-?\\d+) AND `k` <= (-?\\d+)".r.findFirstMatchIn(c.where).get
        (m.group(1).toLong, m.group(2).toLong)
      }
      val coverFirst = bounds.head._1 == min
      val coverLast = bounds.last._2 == max
      val contiguous = bounds.sliding(2).forall {
        case Seq((_, hi), (lo2, _)) => lo2 == hi + 1
        case _ => true
      }
      val ordered = bounds.forall { case (lo, hi) => lo <= hi }
      coverFirst && coverLast && contiguous && ordered
    })
  }

  test("decimal chunks partition arbitrary u64-range spans exactly") {
    val top = BigInt("18446744073709551615")
    val gen = for {
      off <- Gen.choose(0L, 1000000L)
      span <- Gen.choose(0L, 100000L)
      step <- Gen.choose(1L, 10000L)
    } yield (top - off - span, top - off, BigInt(step))
    check(Prop.forAll(gen) { case (min, max, step) =>
      val chunks = ChunkPlanner.decimalChunks("k", min, max, step, includeNull = false)
      val bounds = chunks.map { c =>
        val m = "`k` >= (\\d+) AND `k` <= (\\d+)".r.findFirstMatchIn(c.where).get
        (BigInt(m.group(1)), BigInt(m.group(2)))
      }
      bounds.head._1 == min && bounds.last._2 == max &&
        bounds.sliding(2).forall {
          case Seq((_, hi), (lo2, _)) => lo2 == hi + 1
          case _ => true
        }
    })
  }

  test("minhash signatures are deterministic, fixed-length, order-sensitive") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.choose(1, 4)) { (text, n) =>
      val a = graft.functions.Hashing.minhash(text, n, 16)
      val b = graft.functions.Hashing.minhash(text, n, 16)
      a.sameElements(b) && a.length == 16
    })
  }

  test("jaccard is symmetric and bounded [0,1]") {
    check(Prop.forAll(Gen.alphaStr, Gen.alphaStr) { (a, b) =>
      val j1 = graft.functions.Hashing.jaccard(a, b, 2)
      val j2 = graft.functions.Hashing.jaccard(b, a, 2)
      j1 == j2 && j1 >= 0.0 && j1 <= 1.0
    })
  }
}

package graft

import graft.functions.Hashing
import org.scalatest.funsuite.AnyFunSuite

class HashingSpec extends AnyFunSuite {

  test("hash64 is stable and seed-sensitive") {
    assert(Hashing.hash64("abc") === Hashing.hash64("abc"))
    assert(Hashing.hash64("abc") !== Hashing.hash64("abd"))
    assert(Hashing.hash64("abc", 1) !== Hashing.hash64("abc", 2))
  }

  test("minhash similarity tracks jaccard (property)") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val near = a.replace("today", "tomorrow") // one token differs
    val far = "completely different content with no shared shingles whatsoever here now"
    def sim(x: String, y: String): Double = {
      val (sx, sy) = (Hashing.minhash(x, 3, 128), Hashing.minhash(y, 3, 128))
      sx.zip(sy).count { case (p, q) => p == q }.toDouble / sx.length
    }
    assert(sim(a, a) === 1.0)
    assert(sim(a, near) > 0.5, s"near-dup minhash sim too low: ${sim(a, near)}")
    assert(sim(a, far) < 0.2, s"unrelated minhash sim too high: ${sim(a, far)}")
    // tracks true jaccard within LSH tolerance
    assert(math.abs(sim(a, near) - Hashing.jaccard(a, near, 3)) < 0.15)
  }

  test("simhash hamming distance separates near from far") {
    val a = "spark query engine with window functions and hash aggregation support"
    val near = a.replace("support", "enabled")
    val far = "unrelated poem about mountains rivers clouds and quiet evening light"
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    assert(ham(Hashing.simhash(a), Hashing.simhash(a)) === 0)
    assert(ham(Hashing.simhash(a), Hashing.simhash(near)) <
      ham(Hashing.simhash(a), Hashing.simhash(far)))
  }

  test("band keys collide iff the band's signature rows agree") {
    val sig1 = Array.tabulate(32)(_.toLong)
    val sig2 = sig1.clone(); sig2(31) = 999L // differs only in last band
    val b1 = Hashing.bandKeys(sig1, 8, 4)
    val b2 = Hashing.bandKeys(sig2, 8, 4)
    assert(b1.init.sameElements(b2.init))
    assert(b1.last !== b2.last)
  }

  test("lsh signature: identical vectors share cell, hamming grows with angle") {
    val planes = Hashing.hyperplanes(64, 8)
    val v = Seq(1f, 2f, 3f, 4f, -1f, -2f, 0.5f, 1f)
    val same = Hashing.lshSig64(v, planes)
    assert(same === Hashing.lshSig64(v.map(x => x * 2f), planes)) // scale-invariant
    val opposite = Hashing.lshSig64(v.map(-_), planes)
    assert(java.lang.Long.bitCount(same ^ opposite) === 64)
  }

  test("cosine fold basics") {
    assert(math.abs(Hashing.cosine(Seq(1f, 0f), Seq(1f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(Hashing.cosine(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
  }

}

/** The native codegen LSH signature must equal the host-side fold
  * bit-for-bit on real embeddings — buckets, hamming prefilters, and
  * the inline-plane DuckDB oracles all assume it. */
class LshSigExprSpec extends SparkTestBase {
  test("FloatVecLshSig ≡ Hashing.lshSig64 on the embeddings table") {
    import org.apache.spark.sql.functions._
    val planes = functions.Hashing.hyperplanes(64, 64)
    val udfSig = udf((v: Seq[Float]) => functions.Hashing.lshSig64(v, planes))
    val df = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        functions.VectorFunctions.lshSig(col("embedding"), planes).as("native"),
        udfSig(col("embedding")).as("host"))
    assert(df.where(col("native") =!= col("host")).count() === 0)
    assert(df.count() > 0)
    // 2-plane prefix ≡ lshCell (the withCell path)
    val planes2 = functions.Hashing.hyperplanes(2, 64)
    val udfCell = udf((v: Seq[Float]) => functions.Hashing.lshCell(v, planes2))
    val df2 = Tables.embeddings(spark, sf)
      .select(functions.VectorFunctions.lshSig(col("embedding"), planes2)
        .cast("int").as("native"),
        udfCell(col("embedding")).as("host"))
    assert(df2.where(col("native") =!= col("host")).count() === 0)
  }
}

/** The native SimHash64 expression must equal the kernel (and the former
  * UDF's null contract) on real documents — segment buckets and the
  * simhash value gate depend on exact signatures. */
class SimHashExprSpec extends SparkTestBase {
  test("SimHash64 ≡ Hashing.simhash on documents; null sketches to 0") {
    import org.apache.spark.sql.functions._
    val udfSh = udf((t: String) => if (t == null) 0L else functions.Hashing.simhash(t))
    val df = Tables.documents(spark, sf).select(col("doc_id"),
      operators.Dedup.simhash(col("text")).as("native"),
      udfSh(col("text")).as("host"))
    assert(df.where(col("native") =!= col("host")).count() === 0)
    assert(df.count() > 0)
    import spark.implicits._
    val withNull = Seq((1L, "hello world"), (2L, null))
      .toDF("id", "t")
      .select(operators.Dedup.simhash(col("t")).as("s")).collect()
    assert(withNull(1).getLong(0) === 0L, "null must sketch to 0L")
  }
}

/** The native MinHashBandKeys expression must equal the compiled kernel
  * (and the former UDF's null → empty-array contract) on real
  * documents — every minhash bucket key and therefore the whole
  * candidate walk depends on exact band digests. */
class MinHashBandKeysExprSpec extends SparkTestBase {
  test("MinHashBandKeys ≡ Hashing band keys on documents; null is empty") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def native(c: org.apache.spark.sql.Column) = ColumnBridge.column(
      org.apache.spark.sql.graftnative.MinHashBandKeys(
        ColumnBridge.expression(c), 3, 8, 4))
    val udfBands = udf { (t: String) =>
      if (t == null) Array.empty[Long]
      else functions.Hashing.bandKeys(functions.Hashing.minhash(t, 3, 32), 8, 4)
    }
    val df = Tables.documents(spark, sf).select(col("doc_id"),
      native(col("text")).as("native"), udfBands(col("text")).as("host"))
    assert(df.where(not(col("native") <=> col("host"))).count() === 0)
    assert(df.count() > 0)
    import spark.implicits._
    val withNull = Seq((1L, "hello world"), (2L, null)).toDF("id", "t")
      .select(native(col("t")).as("b")).collect()
    assert(withNull(1).getSeq[Long](0).isEmpty, "null must yield no buckets")
  }
}

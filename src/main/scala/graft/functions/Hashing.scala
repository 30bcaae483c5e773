package graft.functions

/** Deterministic 64-bit hashing + row-local sketch kernels (MinHash,
  * SimHash, LSH buckets) in plain Scala.
  *
  * Why not pure Column expressions: Spark's higher-order functions
  * (`transform`/`aggregate`/`zip_with`) are interpreted (no codegen), and
  * a k-hash MinHash written as k separate HOF trees re-evaluates the
  * shingle build k times per row. A compiled per-row kernel behind a UDF
  * is two orders of magnitude cheaper and still embarrassingly parallel —
  * these run as a map, no shuffle, no state. Hashes are seeded and
  * deterministic so retries/re-runs agree (same requirement the engine's
  * masquerade functions satisfy, SURVEY §2.11).
  *
  * hash64 = FNV-1a 64 over UTF-8 bytes + splitmix64 finalizer (both
  * public-domain constructions).
  */
object Hashing {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime  = 0x100000001b3L

  /** splitmix64 finalizer — avalanche mixing. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Seeded 64-bit string hash (FNV-1a core, splitmix finalize). */
  def hash64(s: String, seed: Long = 0L): Long = {
    var h = FnvOffset ^ mix64(seed)
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * FnvPrime; i += 1 }
    mix64(h)
  }

  /** FastSS deletion-neighborhood entries for the edit-distance join:
    * (variantHash, deletionCount, p1, p2) for every ≤maxDist-deletion
    * variant of `s` (positions 1-based; -1 = unused). Compiled kernel
    * for the same reason as [[minhash]]: the Column-HOF form is
    * interpreted per element and dominated the operator's wall time
    * (~25 µs/row for 19 substring+hash evals vs ~1 µs compiled). */
  def deletionEntries(s: String, maxDist: Int): Array[(Long, Int, Int, Int)] = {
    if (s == null) return Array.empty // caller filters nulls; belt-and-braces
    val L = s.length
    val n1 = if (maxDist >= 1) L else 0
    val n2 = if (maxDist >= 2) L * (L - 1) / 2 else 0
    val out = new Array[(Long, Int, Int, Int)](1 + n1 + n2)
    out(0) = (hash64(s), 0, -1, -1)
    var k = 1
    var i = 0
    while (i < n1) {
      out(k) = (hash64(s.substring(0, i) + s.substring(i + 1)), 1, i + 1, -1)
      k += 1; i += 1
    }
    if (maxDist >= 2) {
      i = 0
      while (i < L - 1) {
        var j = i + 1
        while (j < L) {
          out(k) = (hash64(s.substring(0, i) + s.substring(i + 1, j) +
            s.substring(j + 1)), 2, i + 1, j + 1)
          k += 1; j += 1
        }
        i += 1
      }
    }
    out
  }

  /** Whitespace tokens, lowercased. */
  def tokens(text: String): Array[String] = {
    val t = text.trim.toLowerCase
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Word n-gram shingles (matches TextFunctions.shingles semantics:
    * short texts yield the single joined token string). */
  def shingles(text: String, n: Int): Array[String] = {
    val w = tokens(text)
    if (w.length < n) Array(w.mkString(" "))
    else Array.tabulate(w.length - n + 1)(i => w.slice(i, i + n).mkString(" "))
  }

  /** MinHash signature: single pass over shingles, k minima via
    * per-hash reseeding of one base hash (h_k = mix64(base + k·GOLDEN)). */
  def minhash(text: String, shingleSize: Int, numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val sh = shingles(text, shingleSize)
    var i = 0
    while (i < sh.length) {
      val base = hash64(sh(i))
      var k = 0
      while (k < numHashes) {
        val h = mix64(base + k * 0x9e3779b97f4a7c15L)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys from a MinHash signature: one 64-bit digest per band. */
  def bandKeys(sig: Array[Long], bands: Int, rowsPerBand: Int): Array[Long] = {
    Array.tabulate(bands) { b =>
      var h = FnvOffset ^ mix64(b.toLong)
      var r = 0
      while (r < rowsPerBand) { h = mix64(h ^ sig(b * rowsPerBand + r)); r += 1 }
      h
    }
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simhash(text: String): Long = {
    val counters = new Array[Int](64)
    val w = tokens(text)
    var i = 0
    while (i < w.length) {
      val h = hash64(w(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counters(b) >= 0) out |= (1L << b); b += 1 }
    out
  }

  /** Jaccard over distinct shingle sets. */
  def jaccard(a: String, b: String, shingleSize: Int): Double = {
    val sa = shingles(a, shingleSize).toSet
    val sb = shingles(b, shingleSize).toSet
    val inter = sa.intersect(sb).size
    val uni = sa.size + sb.size - inter
    if (uni == 0) 1.0 else inter.toDouble / uni
  }

  /** Deterministic ±1 hyperplanes for cosine LSH (seeded, no stored
    * model — any executor regenerates the same planes). */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(bits)(p => Array.tabulate(dim)(i =>
      if ((mix64(seed + p * 131071L + i) & 1L) == 0L) 1.0 else -1.0))

  /** 64-bit hyperplane sign signature of a vector — the long-form LSH
    * sketch. Hamming distance between signatures estimates the angle:
    * E[ham] = 64·acos(cos θ)/π, so a `bit_count(sig1^sig2)` threshold is
    * a cheap codegen'd prefilter before exact cosine verification. */
  def lshSig64(vec: Seq[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var p = 0
    val np = math.min(planes.length, 64)
    while (p < np) {
      var dot = 0.0
      val plane = planes(p)
      var i = 0
      val n = math.min(vec.length, plane.length)
      while (i < n) { dot += vec(i) * plane(i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** LSH cell of a vector under the given hyperplanes. */
  def lshCell(vec: Seq[Float], planes: Array[Array[Double]]): Int = {
    var cell = 0
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      val plane = planes(p)
      var i = 0
      val n = math.min(vec.length, plane.length)
      while (i < n) { dot += vec(i) * plane(i); i += 1 }
      if (dot >= 0) cell |= (1 << p)
      p += 1
    }
    cell
  }

  /** Sequential-fold cosine (same accumulation order as
    * VectorFunctions.cosine — bit-identical results). */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    i = 0
    while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    i = 0
    while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

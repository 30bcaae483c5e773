package graft.tmp

import graft.functions.Hashing

/** Scratch: search media-gate pattern constants (bit hash multiplier,
  * offset hash multiplier) such that for ALL 40 groups the 8 jitter
  * variants' co-cell graph is connected under the EXACT pipeline
  * arithmetic (float emb, sequential double fold, >= 0 sign), with a
  * sign margin and cosine separation. Deleted before round end. */
object MediaTune {
  def main(args: Array[String]): Unit = {
    val tables = (0 until 8).map(t => Hashing.hyperplanes(24, 36, 42L + t))

    def lumas(c1: Long, c2: Long, g: Int, r: Int): Array[Int] =
      Array.tabulate(36) { b =>
        val bit = (Hashing.mix64(g.toLong * c1 + b) & 1L) == 1L
        val off = ((Hashing.mix64(g.toLong * c2 + b) & 0x7fffffffL) % 7).toInt - 3
        (if (bit) 192 else 64) + off + (math.abs((r + 3 * b) % 8 - 4) - 2)
      }

    def emb(c1: Long, c2: Long, g: Int, r: Int): Array[Float] = {
      val l = lumas(c1, c2, g, r).map(_.toDouble)
      val mean = l.sum / 36
      val c = l.map(_ - mean)
      val inv = 1.0 / math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x * inv).toFloat)
    }

    def check(c1: Long, c2: Long): Option[(Double, Double, Double)] = {
      val embs = Array.tabulate(40, 8)((g, r) => emb(c1, c2, g, r))
      var minMargin = Double.MaxValue
      // connectivity per group
      for (g <- 0 until 40) {
        def sig(t: Int, r: Int): Long = {
          var s = 0L
          var p = 0
          while (p < 24) {
            var dot = 0.0
            val pl = tables(t)(p)
            var i = 0
            while (i < 36) { dot += embs(g)(r)(i).toDouble * pl(i); i += 1 }
            minMargin = math.min(minMargin, math.abs(dot))
            if (dot >= 0) s |= (1L << p)
            p += 1
          }
          s
        }
        val sigs = Array.tabulate(8, 8)((t, r) => sig(t, r))
        val parent = Array.tabulate(8)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        for (t <- 0 until 8; r1 <- 0 until 8; r2 <- r1 + 1 until 8)
          if (sigs(t)(r1) == sigs(t)(r2)) parent(find(r1)) = find(r2)
        if ((0 until 8).map(find).distinct.size != 1) return None
      }
      def cos(a: Array[Float], b: Array[Float]): Double =
        a.indices.map(i => a(i).toDouble * b(i)).sum
      val inMin = (for (g <- 0 until 40; r1 <- 0 until 8; r2 <- r1 + 1 until 8)
        yield cos(embs(g)(r1), embs(g)(r2))).min
      val crossMax = (for {
        g1 <- 0 until 40; g2 <- g1 + 1 until 40
        r1 <- 0 until 8 by 3; r2 <- 0 until 8 by 3
      } yield cos(embs(g1)(r1), embs(g2)(r2))).max
      if (inMin > 0.99 && crossMax < 0.85) Some((minMargin, inMin, crossMax))
      else None
    }

    val cands = for {
      c1 <- Seq(131L, 257L, 313L, 389L, 449L, 521L, 607L, 691L, 787L, 881L)
      c2 <- Seq(977L, 1031L, 1201L, 1381L, 1523L, 1667L, 1801L, 1973L)
    } yield (c1, c2)
    cands.foreach { case (c1, c2) =>
      check(c1, c2) match {
        case Some((m, i, x)) =>
          println(f"OK c1=$c1 c2=$c2 minMargin=$m%.6f inMin=$i%.4f crossMax=$x%.4f")
        case None => ()
      }
    }
    println("search done")
  }
}

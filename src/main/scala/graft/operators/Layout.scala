package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout: Z-order (Morton) clustering for
  * multi-dimensional data skipping.
  *
  * The reference's locality story is one-dimensional — chunk files are
  * ranges of the primary key (`mydumper_integer_chunks.c`), so only
  * pk-range predicates prune files. At 100 TB a lake layout can do
  * better: sorting by the bit-interleave of two (or more) key columns
  * gives every output file a tight min/max envelope in BOTH dimensions,
  * so parquet row-group stats prune range predicates on either column.
  * This is the standard Z-order technique (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`), built here from pure codegen'd bit arithmetic — no UDF,
  * no shuffle beyond the final range partition.
  *
  * The bit spread is the classic 5-step "magic number" dilation
  * (`x = (x | x<<k) & mask`, k = 16,8,4,2,1) rather than a per-bit
  * sum: the per-bit form expands to 2·bits codegen terms (62 at the
  * default width) with zero shared subtrees — a measured JIT cliff —
  * while the magic-number form is 5 steps per column whose repeated
  * subtrees whole-stage codegen's subexpression elimination computes
  * once. The z-value is plain integer arithmetic (`<<`, `|`, `&`), so
  * any SQL engine replays it exactly — [[zorder2Sql]] emits the DuckDB
  * form the correctness gate uses.
  */
object Layout {

  /** (shift, mask) ladder that dilates the low 32 bits of a long to even
    * bit positions: after the fold, bit i of the input sits at bit 2i. */
  private val spreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Dilate `c`'s low `bits` bits to even positions (bit i → bit 2i). */
  private def spread(c: Column, bits: Int): Column =
    spreadSteps.foldLeft(c.cast("long").bitwiseAND(lit((1L << bits) - 1))) {
      case (x, (sh, m)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }

  /** Morton interleave of two non-negative integer columns, `bits` low
    * bits each → a `2*bits`-bit z-value. Bit i of `a` lands at z-bit 2i,
    * bit i of `b` at 2i+1. Inputs must fit in `bits` bits — values past
    * that silently WRAP (only the low bits interleave), collapsing
    * distant keys onto nearby z-values and destroying the min/max
    * envelopes the layout exists for — so the default is the 2-column
    * maximum (31: any key < 2^31) and narrower widths are an explicit
    * opt-in for pre-bounded inputs. */
  def zorder2(a: Column, b: Column, bits: Int = 31): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    spread(a, bits).bitwiseOR(shiftleft(spread(b, bits), 1))
  }

  /** Per-byte spread table for stride `n`: entry v holds byte v with bit
    * i moved to bit i*n — one `element_at` lookup dilates 8 input bits,
    * so a column needs ceil(bits/8) lookups instead of `bits` terms. */
  private def spreadTable(n: Int): Seq[Long] =
    (0 until 256).map { v =>
      (0 until 8).map(i => ((v.toLong >> i) & 1L) << (i * n)).sum
    }

  /** N-column Morton interleave: bit i of column j lands at z-bit
    * i*n + j. With `bits` bits per column, n*bits must stay ≤ 62 to
    * keep the z-value a positive Long (3 cols × 20 bits, 4 × 15, …).
    * Built from a 256-entry per-byte lookup table (a constant literal,
    * O(1) `element_at` inside codegen) — ceil(bits/8) lookups per
    * column. [[zorder2]] is the n=2 special case on the even faster
    * magic-number ladder, kept for the tighter scaladoc and the gate. */
  def zorderN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "zorderN needs at least two columns")
    require(bits >= 1 && n * bits <= 62, s"n*bits must be <= 62, got ${n * bits}")
    val table = typedlit(spreadTable(n))
    val nBytes = (bits + 7) / 8
    cols.zipWithIndex.map { case (c, j) =>
      val x = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
      val dilated = (0 until nBytes).map { byteIdx =>
        val byteVal = shiftrightunsigned(x, 8 * byteIdx).bitwiseAND(lit(255L))
        shiftleft(element_at(table, (byteVal + lit(1L)).cast("int")),
          byteIdx * 8 * n)
      }.reduce(_ bitwiseOR _)
      shiftleft(dilated, j)
    }.reduce(_ bitwiseOR _)
  }

  /** The same arithmetic as [[zorder2]] as portable SQL text (only `<<`,
    * `|`, `&` on BIGINT — Spark and DuckDB share the operators) — the
    * oracle-side replay. The text nests the 5-step ladder, so each step
    * appears twice in the step above; engines with common-subexpression
    * elimination evaluate each once, and even without it the tree is a
    * constant ~64 primitive ops. Prefer [[zorder2SqlCte]] when the
    * z-value is used more than once in a query. */
  def zorder2Sql(a: String, b: String, bits: Int = 31): String = {
    require(bits >= 1 && bits <= 31)
    def spreadSql(col: String): String =
      spreadSteps.foldLeft(s"(CAST($col AS BIGINT) & ${(1L << bits) - 1})") {
        case (x, (sh, m)) => s"(($x | ($x << $sh)) & $m)"
      }
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
  }

  /** Linear-size replay of [[zorder2]]: a chain of derived tables that
    * computes the dilation stepwise (each ladder step written once), for
    * embedding as `FROM (...) t` with the z-value exposed as `z`.
    * `innerSelect` lists the pass-through columns. */
  def zorder2SqlCte(table: String, a: String, b: String, bits: Int,
      passCols: Seq[String]): String = {
    val pc = passCols.mkString(", ")
    val base = s"SELECT $pc, (CAST($a AS BIGINT) & ${(1L << bits) - 1}) AS xa," +
      s" (CAST($b AS BIGINT) & ${(1L << bits) - 1}) AS xb FROM $table"
    val laddered = spreadSteps.foldLeft(base) { case (inner, (sh, m)) =>
      s"SELECT $pc, ((xa | (xa << $sh)) & $m) AS xa," +
        s" ((xb | (xb << $sh)) & $m) AS xb FROM ($inner)"
    }
    s"SELECT $pc, (xa | (xb << 1)) AS z FROM ($laddered)"
  }

  /** Cluster a frame for writing: range-partition on the z-value, sort
    * within partitions — each output file then covers a contiguous
    * z-range, i.e. a small rectangle in (a, b) space. One shuffle
    * (range exchange with a sampled boundary pass), scan-speed sort. */
  def clusterByZ(df: DataFrame, a: String, b: String, bits: Int = 31,
      numPartitions: Option[Int] = None): DataFrame = {
    val withZ = df.withColumn("__z", zorder2(col(a), col(b), bits))
    val ranged = numPartitions match {
      case Some(n) => withZ.repartitionByRange(n, col("__z"))
      case None    => withZ.repartitionByRange(col("__z"))
    }
    ranged.sortWithinPartitions("__z").drop("__z")
  }
}

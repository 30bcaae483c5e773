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
  * The z-value is plain integer arithmetic (`>>`, `&`, `*`, `+`), so any
  * SQL engine replays it exactly — [[zorder2Sql]] emits the DuckDB form
  * the correctness gate uses.
  */
object Layout {

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
    (0 until bits).map { i =>
      shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** N-column Morton interleave: bit i of column j lands at z-bit
    * i*n + j. With `bits` bits per column, n*bits must stay ≤ 62 to
    * keep the z-value a positive Long (3 cols × 20 bits, 4 × 15, …).
    * [[zorder2]] is the n=2 special case, kept for the tighter scaladoc
    * and the gate. */
  def zorderN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "zorderN needs at least two columns")
    require(bits >= 1 && n * bits <= 62, s"n*bits must be <= 62, got ${n * bits}")
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
    ).reduce(_ + _)
  }

  /** The same arithmetic as [[zorder2]] as portable SQL text (only `>>`,
    * `&`, `*`, `+`) — the oracle-side replay. */
  def zorder2Sql(a: String, b: String, bits: Int = 31): String = {
    require(bits >= 1 && bits <= 31)
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} + (($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")
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

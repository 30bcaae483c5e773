package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data / structure checksums (SURVEY §2.4 A4/A5).
  *
  * The reference's oracle is MySQL's `CHECKSUM TABLE` (CRC32-XOR over
  * concatenated row text, /root/reference/src/checksum.c:98-153) — the
  * load-side verification aborts on any per-table mismatch. Re-expressed
  * here as a pure Catalyst combination `bit_xor(crc32(concat_ws(...)))`:
  * both `crc32` and the `bit_xor` aggregate are codegen'd built-ins, so the
  * checksum runs as a single whole-stage-codegen pass with a map-side
  * partial aggregate — one shuffled row per partition at any scale.
  */
object Checksum {

  /** Canonical row text: columns cast to string, NULL → a 0x00 marker (a
    * real string value of "NULL" must not collide with SQL NULL; the
    * reference's serializer distinguishes them the same way —
    * mydumper_write.c:677-678 emits unquoted NULL vs quoted text), joined
    * with 0x1f separators so column boundaries can't collide.
    *
    * Compatibility: the 0x1f separator (added when the boundary-collision
    * gap was closed) changes every digest relative to pre-separator
    * builds — this is checksum algorithm v2. Dumps written by earlier
    * builds carry v1 digests and will not verify under v2; if mixed
    * archives must coexist, record the algorithm version in the dump
    * manifest alongside the digest. */
  def rowText(cols: Seq[Column]): Column =
    concat_ws("\u001f", cols.map(c => coalesce(c.cast(StringType), lit("\u0000"))): _*)

  /** CRC32-XOR digest of the given columns — the engine's `CHECKSUM TABLE`. */
  def tableChecksum(df: DataFrame, cols: Seq[String] = Nil): Column = {
    val use = if (cols.nonEmpty) cols else df.columns.toSeq
    bitXorAgg(crc32(rowText(use.map(df.col)).cast(BinaryType)))
  }

  /** bit_xor aggregate over longs (Spark SQL `bit_xor` exposed to the
    * Column API). */
  def bitXorAgg(c: Column): Column = expr_agg("bit_xor", c)

  private def expr_agg(name: String, c: Column): Column =
    call_function(name, c)

  /** Structure checksum (A5): CRC-XOR over catalog rows rendered as
    * space-joined text — reference checksum.c:105-153 shape
    * `LOWER(CONV(BIT_XOR(CAST(CRC32(col) AS UNSIGNED)),10,16))`. */
  def structureChecksum(df: DataFrame, cols: Seq[String]): Column =
    lower(conv(tableChecksum(df, cols).cast(StringType), 10, 16))

  /** One-row DataFrame `(table, checksum)` for manifest recording. */
  def checksumRow(df: DataFrame, table: String): DataFrame =
    df.agg(tableChecksum(df).as("checksum"))
      .select(lit(table).as("table"), col("checksum"))

  /** Engine-portable digest: XOR of 60-bit md5-prefix values over
    * 0x1f-separated row text (NULL → 0x00 marker). Same one-pass
    * map-side-partial plan as [[tableChecksum]], but any engine with
    * md5 replays it bit-for-bit — DuckDB gates it as q_checksum_md5,
    * which CRC32 can't offer there. Use on integer/string columns;
    * float/timestamp → string rendering differs across engines. */
  def portableRowText(cols: Seq[Column]): Column =
    concat_ws("\u001f",
      cols.map(c => coalesce(c.cast(StringType), lit("\u0000"))): _*)

  def portableChecksum(df: DataFrame, cols: Seq[String]): Column =
    bitXorAgg(
      conv(substring(md5(portableRowText(cols.map(df.col)).cast(BinaryType)),
        1, 15), 16, 10).cast(LongType))

  def portableChecksumRow(df: DataFrame, table: String,
      cols: Seq[String]): DataFrame =
    df.agg(portableChecksum(df, cols).as("checksum"))
      .select(lit(table).as("table"), col("checksum"))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column anonymization ("masquerade") functions — SURVEY §2.6 F1-F10,
  * re-expressed as deterministic, codegen-friendly Column transformers.
  *
  * The reference applies per-column functions between fetch and
  * serialization (/root/reference/src/mydumper/mydumper_write.c:709-771;
  * function registry mydumper_masquerade.c:627-659). Its `random_*`
  * functions use a process-local RNG with optional memoization
  * (`WITH_MEM`) so equal inputs map to equal outputs within a run. At
  * 100 TB that global mutable state is a non-starter; we replace it with
  * keyed hashing (md5) — equal inputs always map to equal outputs, no
  * state, no shuffle, fully whole-stage-codegen. Documented semantic
  * difference: output is pseudo-random *per value*, not per run.
  */
object Masquerade {

  sealed trait MaskFn { def apply(c: Column): Column }

  /** F1 — pass-through (mydumper_masquerade.c:87-93). */
  case object Identity extends MaskFn { def apply(c: Column): Column = c }

  /** F8 — replace with constant (mydumper_masquerade.c:320-325). */
  final case class Constant(value: String) extends MaskFn {
    def apply(c: Column): Column = when(c.isNull, lit(null: String)).otherwise(lit(value))
  }

  /** F9 — force NULL (mydumper_masquerade.c:327-335). */
  case object Null extends MaskFn {
    def apply(c: Column): Column = lit(null: String).cast(StringType)
  }

  /** F7 — 'prefix' [ 'suffix' ] wrap (mydumper_masquerade.c:311-318). */
  final case class Affix(prefix: String, suffix: String = "") extends MaskFn {
    def apply(c: Column): Column = concat(lit(prefix), c.cast(StringType), lit(suffix))
  }

  /** F6 — regex global substitution (mydumper_masquerade.c:284-309). */
  final case class Regex(pattern: String, replacement: String) extends MaskFn {
    def apply(c: Column): Column = regexp_replace(c.cast(StringType), pattern, replacement)
  }

  /** 128 hex chars derived from the value (4 chained md5 blocks) — the
    * deterministic entropy pool random_int/random_string draw from.
    * `private[graft]` so pipelines can compute it ONCE into a projection
    * when several mask columns share it: inlining it per output column
    * builds a codegen unit that measured ~7 s of first-use JIT. */
  private[graft] def hexPool(c: Column): Column = {
    val h = md5(c.cast(StringType).cast(BinaryType))
    concat(h, md5(concat(h, lit("#2")).cast(BinaryType)),
      md5(concat(h, lit("#3")).cast(BinaryType)), md5(concat(h, lit("#4")).cast(BinaryType)))
  }

  /** F2 — digits, length preserved (capped 128; reference caps at
    * MAX_LENGTH, mydumper_masquerade.c:95-161). hex→digit via translate. */
  case object RandomIntDet extends MaskFn {
    def apply(c: Column): Column = {
      val digits = translate(hexPool(c), "abcdef", "012345")
      substring(digits, 1, 128).substr(lit(1), least(length(c.cast(StringType)), lit(128)))
    }
  }

  /** F3 — lowercase letters, length preserved
    * (mydumper_masquerade.c:163-178). hex [0-9a-f] → letters [g-p|a-f]. */
  case object RandomStringDet extends MaskFn {
    def apply(c: Column): Column = {
      val letters = translate(hexPool(c), "0123456789", "ghijklmnop")
      letters.substr(lit(1), least(length(c.cast(StringType)), lit(128)))
    }
  }

  /** F4 — UUID shape 8-4-4-4-12 from the value's digest
    * (mydumper_masquerade.c:180-205). */
  case object RandomUuidDet extends MaskFn {
    def apply(c: Column): Column = {
      val h = md5(c.cast(StringType).cast(BinaryType))
      // concat (not concat_ws): NULL input must propagate to NULL output
      concat(
        substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
        substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"),
        substring(h, 21, 12))
    }
  }

  /** F5 — template engine: literal text + `<string n>` / `<number n>` /
    * `<file path>` placeholders filled deterministically from the value
    * (mydumper_masquerade.c:207-282; file dictionaries loaded/grouped at
    * :200-225 `load_file_content`, drawn at :237-243). */
  final case class Format(parts: Seq[FormatPart]) extends MaskFn {
    def apply(c: Column): Column = {
      val cols = parts.map {
        case FormatPart.Lit(s)     => lit(s)
        case FormatPart.Str(n)     => substring(translate(hexPool(c), "0123456789", "ghijklmnop"), 1, n)
        case FormatPart.Num(n)     => substring(translate(hexPool(c), "abcdef", "012345"), 1, n)
        case FormatPart.FileDict(lines) =>
          // deterministic pick: two md5 bytes → uniform-ish index. The
          // reference draws from a process RNG (g_random_int_range);
          // keyed hashing keeps the run replayable and shuffle-free —
          // the same per-value determinism swap as random_int/string.
          val h = md5(c.cast(StringType).cast(BinaryType))
          val idx = pmod(
            ascii(substring(h, 1, 1)) * lit(256) + ascii(substring(h, 2, 1)),
            lit(lines.size)) + lit(1)
          element_at(typedLit(lines), idx.cast(IntegerType))
      }
      when(c.isNull, lit(null: String)).otherwise(concat(cols: _*))
    }
  }
  sealed trait FormatPart
  object FormatPart {
    final case class Lit(s: String) extends FormatPart
    final case class Str(n: Int) extends FormatPart
    final case class Num(n: Int) extends FormatPart
    /** Dictionary lookup part. The line list is embedded as an array
      * literal — the right call for the reference's use case (name /
      * word lists, ≤ ~100k entries, one copy per plan shipped with the
      * broadcast of the task binary); a dictionary too large for a
      * literal belongs in a broadcast equi-join upstream instead. */
    final case class FileDict(lines: IndexedSeq[String]) extends FormatPart {
      require(lines.nonEmpty, "empty masquerade dictionary")
    }
    /** Load a `<file path>` dictionary: one entry per non-empty line,
      * optionally restricted to lines whose length falls in
      * [minLen, maxLen] — the reference's per-length grouping + random
      * length-range draw (mydumper_masquerade.c:200-225,237-243)
      * collapsed into a load-time filter. */
    def File(path: String, minLen: Int = 1, maxLen: Int = Int.MaxValue): FileDict = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try FileDict(src.getLines().map(_.stripLineEnd).filter(_.nonEmpty)
        .filter(l => l.length >= minLen && l.length <= maxLen).toVector)
      finally src.close()
    }
  }

  /** F10 — chain application f3(f2(f1(col))) with NULL propagation
    * (mydumper_write.c:710-764). */
  def chain(fns: Seq[MaskFn])(c: Column): Column =
    fns.foldLeft(c)((acc, f) => f(acc))

  /** Registry keyed like the reference's per-table conf
    * (`db`.`table`.`column` → fn chain, common.c:213-225). */
  final case class Registry(rules: Map[String, Seq[MaskFn]]) {
    def forColumn(db: String, table: String, column: String): Option[Seq[MaskFn]] =
      rules.get(s"$db.$table.$column")
    /** Apply all matching rules to a DataFrame's columns. */
    def apply(df: org.apache.spark.sql.DataFrame, db: String, table: String): org.apache.spark.sql.DataFrame =
      df.columns.foldLeft(df) { (acc, name) =>
        forColumn(db, table, name) match {
          case Some(fns) => acc.withColumn(name, chain(fns)(col(name)))
          case None      => acc
        }
      }
  }

  /** Parse a `random_format` template into a [[Format]]: literal text
    * with `<string n>` / `<number n>` / `<file path>` placeholders
    * (mydumper_masquerade.c:207-282 grammar). */
  def parseFormat(template: String): Format = {
    val tag = "<([a-z]+) ([^>]+)>".r
    val parts = scala.collection.mutable.ArrayBuffer.empty[FormatPart]
    var last = 0
    for (m <- tag.findAllMatchIn(template)) {
      if (m.start > last) parts += FormatPart.Lit(template.substring(last, m.start))
      (m.group(1), m.group(2).trim) match {
        case ("string", n) => parts += FormatPart.Str(n.toInt)
        case ("number", n) => parts += FormatPart.Num(n.toInt)
        case ("file", p)   => parts += FormatPart.File(p)
        case (kw, _) => throw new IllegalArgumentException(s"unknown format part <$kw>")
      }
      last = m.end
    }
    if (last < template.length) parts += FormatPart.Lit(template.substring(last))
    Format(parts.toSeq)
  }

  /** Parse a reference-style directive string into a MaskFn (subset of
    * mydumper_masquerade.c parse_apply_masquerade grammar). */
  def parse(directive: String): MaskFn = {
    val d = directive.trim
    val sp = d.indexOf(' ')
    val (kw, rest) = if (sp < 0) (d, "") else (d.take(sp), d.drop(sp + 1).trim)
    kw.toLowerCase match {
      // random_format BEFORE the other random_* (the reference probes
      // it first, get_function_pointer_for, mydumper_masquerade.c:628)
      case "random_format" => parseFormat(rest)
      case "identity"      => Identity
      case "null"          => Null
      case "constant"      => Constant(stripQuotes(rest))
      case "random_int"    => RandomIntDet
      case "random_string" => RandomStringDet
      case "random_uuid"   => RandomUuidDet
      case "regex" =>
        val parts = splitQuoted(rest)
        Regex(parts.headOption.getOrElse(""), parts.lift(1).getOrElse(""))
      case "apply" =>
        val parts = splitQuoted(rest)
        Affix(parts.headOption.getOrElse(""), parts.lift(1).getOrElse(""))
      // empty → identity; unknown → identity with a message, the
      // reference's forgiving fallback (mydumper_masquerade.c:653-658)
      case "" => Identity
      case other =>
        System.err.println(s"[graft] Function not found: Using default ($other)")
        Identity
    }
  }

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'') t.substring(1, t.length - 1) else t
  }

  /** Split `'a' 'b' 'c'` into Seq(a, b, c). */
  private def splitQuoted(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (s(i) == '\'') {
        val j = s.indexOf('\'', i + 1)
        if (j < 0) { out += s.substring(i + 1); i = s.length }
        else { out += s.substring(i + 1, j); i = j + 1 }
      } else i += 1
    }
    out.toSeq
  }
}

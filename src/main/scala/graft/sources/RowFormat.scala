package graft.sources

/** Row/line/statement delimiter knobs shared by every text output format
  * (SURVEY §2.1 S5/S6): the `--fields-terminated-by` family, resolved
  * per output format exactly like the reference's `initialize_write`
  * (mydumper_write.c:241-366).
  *
  * Two representations travel together, like the reference's paired
  * `x` / `x_ld` globals (mydumper_write.c:59-70): the *resolved* strings
  * (C-escapes decoded) format data rows; the *ld* strings (the user's
  * own spelling, `\t` as two characters) are what the generated
  * `LOAD DATA` statement prints in its `TERMINATED BY '…'` clauses
  * (initialize_load_data_statement_suffix, mydumper_write.c:515-548).
  */
object RowFormat {

  /** Output-format branch of the `initialize_write` switch. SQL covers
    * both SQL_INSERT and CLICKHOUSE (one shared case, :253-281). */
  sealed trait Kind
  case object SqlKind extends Kind
  case object LoadDataKind extends Kind
  case object CsvKind extends Kind

  /** Raw CLI values; `None` = flag absent (the reference's NULL). */
  final case class Knobs(
      fieldsTerminatedBy: Option[String] = None,
      fieldsEnclosedBy: Option[String] = None,
      fieldsEscapedBy: Option[String] = None,
      linesStartingBy: Option[String] = None,
      linesTerminatedBy: Option[String] = None,
      statementTerminatedBy: Option[String] = None)

  /** Resolved per-format delimiters.
    *
    * `fieldsEnclosedBy`/`fieldsEscapedBy` are single characters or empty
    * (enforced like mydumper_write.c:245-248). The `…Ld` fields keep the
    * user's raw spelling for `LOAD DATA` clause rendering; they are
    * always present (the reference back-fills the defaults' spelling,
    * e.g. `"\\t"` for a tab, :296-301) — which is why the generated
    * statement says `ENCLOSED BY ''` / `STARTING BY ''` at LOAD_DATA
    * defaults rather than omitting the clauses (the `_ld` pointers are
    * non-NULL empty strings, :283-285,314-317). */
  final case class Resolved(
      kind: Kind,
      fieldsTerminatedBy: String,
      fieldsEnclosedBy: String,
      fieldsEscapedBy: String,
      linesStartingBy: String,
      linesTerminatedBy: String,
      statementTerminatedBy: String,
      rowDelimiter: String,
      fieldsTerminatedByLd: String,
      fieldsEnclosedByLd: Option[String],
      linesStartingByLd: Option[String],
      linesTerminatedByLd: String) {
    /** Enclosure char, or None when enclosure is off. */
    def enclosureChar: Option[Char] = fieldsEnclosedBy.headOption
    /** Escape char for LOAD_DATA/CSV column escaping — the reference
      * stores the normalized `"\\\\"` but only ever dereferences the
      * first char (write.c:667-668). */
    def escapeChar: Char = if (fieldsEscapedBy.isEmpty) '\\' else fieldsEscapedBy.head
  }

  /** C-escape decoding of a CLI delimiter value — exact port of
    * `replace_escaped_strings` (common.c:494-528): `\n` `\t` `\r` `\f`
    * decode; any other `\x` keeps the backslash and REPROCESSES `x`
    * (so `\\n` yields a backslash followed by a real newline — the
    * reference's in-place scan advances one char on the default branch). */
  def replaceEscapedStrings(c: String): String = {
    val sb = new java.lang.StringBuilder(c.length)
    var i = 0
    while (i < c.length) {
      if (c.charAt(i) == '\\' && i + 1 < c.length) {
        c.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case _   => sb.append('\\'); i += 1
        }
      } else { sb.append(c.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `initialize_write`'s per-format switch (mydumper_write.c:252-366).
    *
    * `ansiQuotes` feeds the SQL branch's enclosure default the way
    * `detect_quote_character` does (mydumper_start_dump.c:403-427):
    * backtick identifier mode encloses SQL string values with `"`,
    * ANSI_QUOTES mode (where `"` quotes identifiers) with `'`.
    */
  def resolve(kind: Kind, k: Knobs = Knobs(), ansiQuotes: Boolean = false): Resolved = {
    // single-char gates run on the RAW values, before any normalization
    // (mydumper_write.c:245-248)
    k.fieldsEnclosedBy.foreach(v => require(v.length <= 1,
      "--fields-enclosed-by must be a single character"))
    k.fieldsEscapedBy.foreach(v => require(v.length <= 1,
      "--fields-escaped-by must be a single character"))

    // the `\t` literal is special-cased ahead of the generic decode in
    // every branch (:260-261,298-301,340-343) — same result, kept for
    // spelling fidelity of the `_ld` back-fill
    def fieldsTerm(default: String, defaultLd: String): (String, String) =
      k.fieldsTerminatedBy match {
        case None        => (default, defaultLd)
        case Some("\\t") => ("\t", "\\t")
        case Some(v)     => (replaceEscapedStrings(v), v)
      }

    kind match {
      case SqlKind =>
        val (ft, ftLd) = fieldsTerm(",", ",")
        Resolved(
          kind = kind,
          fieldsTerminatedBy = ft,
          // detect_quote_character's value unless the flag overrides it
          // (:255-256)
          fieldsEnclosedBy = k.fieldsEnclosedBy.getOrElse(if (ansiQuotes) "'" else "\""),
          fieldsEscapedBy = "", // unused by the SQL branch
          linesStartingBy = k.linesStartingBy.map(replaceEscapedStrings).getOrElse("("),
          linesTerminatedBy = k.linesTerminatedBy.map(replaceEscapedStrings).getOrElse(")\n"),
          statementTerminatedBy =
            k.statementTerminatedBy.map(replaceEscapedStrings).getOrElse(";\n"),
          rowDelimiter = ",",
          fieldsTerminatedByLd = ftLd,
          fieldsEnclosedByLd = k.fieldsEnclosedBy,
          linesStartingByLd = k.linesStartingBy,
          linesTerminatedByLd = k.linesTerminatedBy.getOrElse(")\\n"))

      case LoadDataKind | CsvKind =>
        val (ftDef, ftDefLd) = if (kind == LoadDataKind) ("\t", "\\t") else (",", ",")
        val (ft, ftLd) = fieldsTerm(ftDef, ftDefLd)
        val encl = k.fieldsEnclosedBy.getOrElse(if (kind == CsvKind) "\"" else "")
        Resolved(
          kind = kind,
          fieldsTerminatedBy = ft,
          fieldsEnclosedBy = encl,
          // `\` normalizes to the stored two-char `\\` (:289-293) — the
          // statement prints it verbatim and row escaping only reads the
          // first char; we keep the printable form
          fieldsEscapedBy = k.fieldsEscapedBy.filter(_ != "\\").getOrElse("\\\\"),
          linesStartingBy = k.linesStartingBy.map(replaceEscapedStrings).getOrElse(""),
          linesTerminatedBy = k.linesTerminatedBy.map(replaceEscapedStrings).getOrElse("\n"),
          statementTerminatedBy =
            k.statementTerminatedBy.map(replaceEscapedStrings).getOrElse(""),
          rowDelimiter = "",
          fieldsTerminatedByLd = ftLd,
          // back-filled, never None: the statement always carries the
          // clause, `ENCLOSED BY ''` included (:283-285,325-329)
          fieldsEnclosedByLd = Some(k.fieldsEnclosedBy.getOrElse(encl)),
          linesStartingByLd = Some(k.linesStartingBy.getOrElse("")),
          linesTerminatedByLd = k.linesTerminatedBy.getOrElse("\\n"))
    }
  }

  /** SQL_INSERT defaults under backtick identifier quoting — the shape
    * of every stock dump: `VALUES(…)\n,(…)\n;\n` with `"`-enclosed
    * strings. */
  val SqlDefaults: Resolved = resolve(SqlKind)

  /** LOAD_DATA defaults: tab-separated, no enclosure, `\`-escaped. */
  val LoadDataDefaults: Resolved = resolve(LoadDataKind)

  /** CSV defaults: comma-separated, `"`-enclosed, `\`-escaped. */
  val CsvDefaults: Resolved = resolve(CsvKind)

  /** Insert `escapeChar` before each `needle` occurrence — the
    * reference's `m_escape_char_with_char` (mydumper_common.c:304-343),
    * applied to the field terminator after `mysql_real_escape_string`
    * (write.c:668) so a terminator inside data never splits a field,
    * enclosure or not. */
  def escapeCharWith(s: java.lang.StringBuilder, needle: Char, repl: Char): Unit = {
    var i = 0
    while (i < s.length()) {
      if (s.charAt(i) == needle) { s.insert(i, repl); i += 2 } else i += 1
    }
  }

  /** Substitute every `needle` with `repl` — `m_replace_char_with_char`
    * (mydumper_common.c:347-360), applied to the backslashes that
    * `mysql_real_escape_string` produced when a custom escape char is
    * configured (write.c:667). */
  def replaceCharWith(s: java.lang.StringBuilder, needle: Char, repl: Char): Unit = {
    var i = 0
    while (i < s.length()) {
      if (s.charAt(i) == needle) s.setCharAt(i, repl)
      i += 1
    }
  }

  /** UTF-8 byte length of a builder's content — the reference packs
    * statements against `statement_size` in BYTES (GString lengths,
    * write.c:955); char counts would drift on non-ASCII data. */
  def utf8Length(s: CharSequence): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) n += 1
      else if (c < 0x800) n += 2
      else if (Character.isHighSurrogate(c)) { n += 4; i += 1 }
      else n += 3
      i += 1
    }
    n
  }
}

package graft.sources

/** Non-table schema artifacts the reference dumps with exact byte
  * shapes: per-file SQL headers, the view-dependency placeholder pair,
  * charset save/restore blocks, and the DEFINER rewrite.
  *
  * Reference anatomy:
  *  - initialize_header_in_gstring (mydumper_common.c:406-423) — the
  *    header block every schema/data SQL file starts with;
  *  - write_view_definition_into_file (mydumper_jobs.c:472-620) — views
  *    dump as a PAIR: a `-schema.sql` placeholder TABLE so data-less
  *    restores satisfy view dependencies (columns typed `int` except
  *    the first, ENGINE=MEMORY, ENCRYPTION='N' on MySQL lineage), plus
  *    the `-schema-view.sql` with DROP TABLE/DROP VIEW, the charset
  *    block, and the definer-rewritten CREATE VIEW;
  *  - set_charset / restore_charset (mydumper_common.c:127-151);
  *  - update_definer (common.c:799-837) — the `--skip-definer` /
  *    `--replace-definer` surface (P7).
  */
object SchemaObjects {

  /** The SQL-file header (initialize_header_in_gstring,
    * mydumper_common.c:406-423): mysql-like gets SET NAMES +
    * FOREIGN_KEY_CHECKS (+ SQL_MODE unless compact, + TIME_ZONE unless
    * skipped); TiDB only the time zone; anything else a plain
    * FOREIGN_KEY_CHECKS. */
  def fileHeader(mysqlLike: Boolean = true, tidb: Boolean = false,
      charset: Option[String] = Some("binary"),
      sqlMode: Option[String] = None, compact: Boolean = false,
      skipTz: Boolean = false): String = {
    val sb = new StringBuilder
    if (mysqlLike) {
      charset.foreach(c => sb ++= s"/*!40101 SET NAMES $c*/;\n")
      sb ++= "/*!40014 SET FOREIGN_KEY_CHECKS=0*/;\n"
      sqlMode.filter(_ => !compact)
        .foreach(m => sb ++= s"/*!40101 SET SQL_MODE=$m*/;\n")
      if (!skipTz) sb ++= "/*!40103 SET TIME_ZONE='+00:00' */;\n"
    } else if (tidb) {
      if (!skipTz) sb ++= "/*!40103 SET TIME_ZONE='+00:00' */;\n"
    } else sb ++= "SET FOREIGN_KEY_CHECKS=0;\n"
    sb.result()
  }

  /** set_charset (mydumper_common.c:127-142). */
  def setCharset(characterSet: String, collation: String): String =
    s"""SET @PREV_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT;
       |SET @PREV_CHARACTER_SET_RESULTS=@@CHARACTER_SET_RESULTS;
       |SET @PREV_COLLATION_CONNECTION=@@COLLATION_CONNECTION;
       |SET character_set_client = $characterSet;
       |SET character_set_results = $characterSet;
       |SET collation_connection = $collation;
       |""".stripMargin

  /** restore_charset (mydumper_common.c:144-151). */
  val RestoreCharset: String =
    """SET character_set_client = @PREV_CHARACTER_SET_CLIENT;
      |SET character_set_results = @PREV_CHARACTER_SET_RESULTS;
      |SET collation_connection = @PREV_COLLATION_CONNECTION;
      |""".stripMargin

  /** DEFINER rewrite (update_definer, common.c:799-837): applies only
    * to statements starting with `CREATE`, and only when ` DEFINER=`
    * appears within the first 50 characters (reference window — a later
    * DEFINER is untouched). `skip` blanks the token with spaces exactly
    * like remove_definer; otherwise `replace` swaps the `DEFINER=user`
    * token once. */
  def updateDefiner(statement: String, replace: Option[String] = None,
      skip: Boolean = false): String = {
    if (!statement.startsWith("CREATE")) return statement
    val window = statement.substring(0, math.min(50, statement.length))
    val at = window.indexOf(" DEFINER=")
    if (at < 0) return statement
    val tokenStart = at + 1
    // no space after the token → the reference's `if (to)` guard leaves
    // the statement untouched (common.c:803,821)
    val tokenEnd = statement.indexOf(' ', tokenStart)
    if (tokenEnd < 0) return statement
    if (skip)
      statement.substring(0, tokenStart) +
        (" " * (tokenEnd - tokenStart)) + statement.substring(tokenEnd)
    else replace match {
      case Some(r) =>
        statement.substring(0, tokenStart) + r + statement.substring(tokenEnd)
      case None => statement
    }
  }

  /** The view-dependency placeholder table
    * (write_view_definition_into_file, mydumper_jobs.c:519-540): columns
    * keep the view's names but all types after the FIRST collapse to
    * `int` (the real types only matter under --views-as-tables, when the
    * view's data dumps as a table); ENGINE defaults to MEMORY
    * (mydumper_arguments.c:46) and MySQL lineage appends ENCRYPTION='N'.
    */
  def viewDependencyTable(view: String, columns: Seq[(String, String)],
      viewsAsTables: Boolean = false, engine: String = "MEMORY",
      encryption: Boolean = true, quote: String = "`"): String = {
    require(columns.nonEmpty, s"view $view has no columns")
    def q(s: String) = s"$quote${s.replace(quote, quote + quote)}$quote"
    val sb = new StringBuilder
    sb ++= s"CREATE TABLE IF NOT EXISTS ${q(view)}(\n"
    sb ++= s"${q(columns.head._1)} ${columns.head._2}"
    columns.tail.foreach { case (name, tpe) =>
      sb ++= s",\n${q(name)} ${if (viewsAsTables) tpe else "int"}"
    }
    sb ++= s"\n) ENGINE=$engine"
    if (encryption) sb ++= " ENCRYPTION='N'"
    sb ++= ";\n"
    sb.result()
  }

  /** The `-schema-triggers.sql` payload
    * (write_triggers_definition_into_file, mydumper_jobs.c:344-407):
    * header once, then per trigger a charset save block, DROP TRIGGER,
    * the definer-rewritten CREATE TRIGGER — with every `;\n` inside the
    * body rewritten to `; \n` so the restore-side statement splitter
    * never breaks inside a trigger body (the reference's g_strsplit/
    * g_strjoinv trick, :385-387) — a final `;`, and the charset
    * restore. `triggers` = (name, createDdl, characterSetClient,
    * collationConnection). */
  def createTriggersFile(
      triggers: Seq[(String, String, String, String)],
      replaceDefiner: Option[String] = None, skipDefiner: Boolean = false,
      header: String = fileHeader(), quote: String = "`"): String = {
    def q(s: String) = s"$quote${s.replace(quote, quote + quote)}$quote"
    val sb = new StringBuilder(header)
    triggers.foreach { case (name, ddl, cs, coll) =>
      sb ++= setCharset(cs, coll)
      sb ++= s"DROP TRIGGER IF EXISTS ${q(name)};\n"
      sb ++= updateDefiner(ddl, replaceDefiner, skipDefiner)
        .split(";\n", -1).mkString("; \n")
      sb ++= ";\n"
      sb ++= RestoreCharset
    }
    sb.result()
  }

  /** The `-schema-sequence.sql` payload
    * (write_sequence_definition_into_file, mydumper_jobs.c:623-693):
    * header, DROP TABLE + DROP VIEW (DROP TABLE works for sequences),
    * the definer-rewritten CREATE SEQUENCE, and the current position
    * restored via `DO SETVAL(seq, next_not_cached_value, 0)`. */
  def createSequenceFile(sequence: String, createDdl: String,
      nextValue: Option[Long] = None,
      replaceDefiner: Option[String] = None, skipDefiner: Boolean = false,
      header: String = fileHeader(), quote: String = "`"): String = {
    def q(s: String) = s"$quote${s.replace(quote, quote + quote)}$quote"
    header +
      s"DROP TABLE IF EXISTS ${q(sequence)};\n" +
      s"DROP VIEW IF EXISTS ${q(sequence)};\n" +
      updateDefiner(createDdl, replaceDefiner, skipDefiner) + ";\n" +
      nextValue.map(v => s"DO SETVAL(${q(sequence)}, $v, 0);\n").getOrElse("")
  }

  /** The `-schema-post.sql` payload (write_post_into_file +
    * write_routines/events_definition_into_file,
    * mydumper_jobs.c:700-830): header once, then per object — FUNCTION
    * and PROCEDURE first, then EVENT, the reference's emit order — a
    * charset save block, `DROP <kind> IF EXISTS`, the CREATE with
    * definer REMOVED under skipDefiner (routines/events support only
    * the skip form, :729-731,785-787 — no replace), the `;\n`→`; \n`
    * body guard, a final `;`, and the charset restore. `objects` =
    * (kind, name, createDdl, characterSet, collation). */
  def createPostFile(objects: Seq[(String, String, String, String, String)],
      skipDefiner: Boolean = false, header: String = fileHeader(),
      quote: String = "`"): String = {
    def q(s: String) = s"$quote${s.replace(quote, quote + quote)}$quote"
    val order = Map("FUNCTION" -> 0, "PROCEDURE" -> 1, "EVENT" -> 2)
    val sb = new StringBuilder(header)
    objects.sortBy(o => order.getOrElse(o._1.toUpperCase, 3)).foreach {
      case (kind, name, ddl, cs, coll) =>
        sb ++= setCharset(cs, coll)
        sb ++= s"DROP ${kind.toUpperCase} IF EXISTS ${q(name)};\n"
        sb ++= updateDefiner(ddl, replace = None, skip = skipDefiner)
          .split(";\n", -1).mkString("; \n")
        sb ++= ";\n"
        sb ++= RestoreCharset
    }
    sb.result()
  }

  /** The `-schema-view.sql` payload (mydumper_jobs.c:556-612): header,
    * DROP TABLE (the placeholder) + DROP VIEW, charset save block, the
    * definer-rewritten CREATE VIEW, charset restore. */
  def createViewFile(view: String, createViewDdl: String,
      characterSet: String = "utf8mb4", collation: String = "utf8mb4_0900_ai_ci",
      replaceDefiner: Option[String] = None, skipDefiner: Boolean = false,
      header: String = fileHeader(), quote: String = "`"): String = {
    def q(s: String) = s"$quote${s.replace(quote, quote + quote)}$quote"
    header +
      s"DROP TABLE IF EXISTS ${q(view)};\n" +
      s"DROP VIEW IF EXISTS ${q(view)};\n" +
      setCharset(characterSet, collation) +
      updateDefiner(createViewDdl, replaceDefiner, skipDefiner) + ";\n" +
      RestoreCharset
  }
}

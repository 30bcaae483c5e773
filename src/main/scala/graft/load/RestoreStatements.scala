package graft.load

/** Restore-side statement reader — the exact consumer contract of the
  * dump writers' byte shapes (restore_data_from_mydumper_file,
  * myloader_restore.c:825-870 + read_data, common.c:1124-1149):
  *
  *  - files are read LINE-wise and a statement is complete when the
  *    accumulated text ends with `;\n` (the reference probes the last 5
  *    bytes) — which is why the dump side rewrites `;\n` inside
  *    trigger/routine bodies to `; \n` (never a terminator);
  *  - CREATE statements get the DEFINER rewrite AT RESTORE TIME too
  *    (myloader_restore.c:860-865), so foreign dumps obey
  *    --skip-definer/--replace-definer on load;
  *  - SET statements on the --ignore-set list are dropped
  *    (should_ignore_set_statement, myloader_common.c:109-120);
  *  - the statement kind routes execution: INSERT → data connection
  *    pool, LOAD DATA → file rewrite path, everything else (headers,
  *    DDL) → direct execution on the session.
  */
object RestoreStatements {

  sealed trait Kind
  case object Insert extends Kind
  case object LoadData extends Kind
  case object Other extends Kind

  /** Statement-complete probe (myloader_restore.c:857): `;\n` within
    * the last 5 bytes of the accumulated buffer. */
  private def complete(sb: StringBuilder): Boolean = {
    val from = math.max(0, sb.length - 5)
    sb.indexOf(";\n", from) >= 0
  }

  /** Split file text into statements the way the restore loop does —
    * line accumulation, `;\n`-tail completion. A trailing fragment
    * without a terminator is yielded as-is (the reference executes the
    * remainder at EOF). */
  def split(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    text.linesIterator.foreach { line =>
      sb ++= line; sb += '\n'
      if (complete(sb)) { out += sb.result(); sb.clear() }
    }
    if (sb.nonEmpty) out += sb.result()
    out.result()
  }

  /** Kind probe, mirroring the reference's prefix window checks
    * (myloader_restore.c:866 `g_strrstr_len(data->str,6,"INSERT")`,
    * :878 `g_strrstr_len(data->str,10,"LOAD DATA ")`). */
  def kindOf(stmt: String): Kind = {
    val head6 = stmt.substring(0, math.min(6, stmt.length))
    if (head6.contains("INSERT")) Insert
    else {
      val head10 = stmt.substring(0, math.min(10, stmt.length))
      if (head10.contains("LOAD DATA ")) LoadData else Other
    }
  }

  /** Prepare one statement for execution: definer rewrite on CREATEs
    * (restore-time, myloader_restore.c:860-865), ignore-set drop
    * (None), trailing terminator/whitespace trim for JDBC (drivers
    * reject trailing `;`). */
  def prepare(stmt: String, replaceDefiner: Option[String] = None,
      skipDefiner: Boolean = false,
      ignoreSet: Seq[String] = Nil): Option[String] = {
    val rewritten =
      if (stmt.startsWith("CREATE"))
        graft.sources.SchemaObjects.updateDefiner(stmt, replaceDefiner, skipDefiner)
      else stmt
    if (graft.extract.SessionVariables.shouldIgnoreSetStatement(rewritten, ignoreSet)) None
    else Some(rewritten.reverse.dropWhile(c => c == '\n' || c == ' ' || c == ';').reverse)
      .filter(_.nonEmpty)
  }

  /** Run every statement of a schema file through `exec` in file order
    * (the reference's non-INSERT path executes directly on the session
    * connection). Returns the number executed. */
  def executeSchemaFile(text: String, exec: String => Unit,
      replaceDefiner: Option[String] = None, skipDefiner: Boolean = false,
      ignoreSet: Seq[String] = Nil): Int = {
    var n = 0
    split(text).foreach { s =>
      prepare(s, replaceDefiner, skipDefiner, ignoreSet).foreach { p =>
        exec(p); n += 1
      }
    }
    n
  }
}

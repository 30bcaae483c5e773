package graft.extract

import graft.core.TableMeta

/** Table-set filters (SURVEY §2.2 P6): regex on `db.table`, explicit
  * include list, skiplist, engine excludes, system-schema exclusion,
  * updated-since — metadata-level filtering applied before any scan.
  * (reference: src/regex.c:96-125, tables_skiplist.c:35-88,
  * common.c:648-678, mydumper_working_thread.c:1205-1210.)
  */
object TableFilter {

  final case class Spec(
      regex: Option[String] = None,            // --regex (PCRE on db.table)
      regexes: Seq[String] = Nil,              // repeated --regex, OR'd (regex.c:35 list append)
      tablesList: Seq[String] = Nil,           // --tables-list (db.table)
      skiplist: Set[String] = Set.empty,       // --omit-from-file
      ignoreEngines: Set[String] = Set.empty,  // --ignore-engines
      includeSystemSchemas: Boolean = false,
      updatedSince: Option[java.time.Instant] = None)

  private val SystemSchemas =
    Set("mysql", "sys", "information_schema", "performance_schema")

  /** `--ignore-engines MyISAM[,InnoDB...]` (reference specific_1/2;
    * mydumper_start_dump.c splits on "," case-insensitively): the flag's
    * comma list as the Spec's lowercase engine-exclude set. */
  def engineSetOf(flag: String): Set[String] =
    flag.split(",").iterator.map(_.trim.toLowerCase).filter(_.nonEmpty).toSet

  /** `--tables-list` entry match, reference semantics (common.c:648-670
    * is_table_in_list): case-insensitive; entries containing `%`/`_`
    * match SQL-LIKE style (common.c:618 matchText — `%` any run, `_` any
    * one char, `\_` a literal underscore), plain entries compare whole. */
  def tableListMatch(entry: String, qualified: String): Boolean = {
    val e = entry.toLowerCase
    val q = qualified.toLowerCase
    if (!e.contains('%') && !e.contains('_')) e == q
    else {
      val rx = new StringBuilder("(?s)")
      var i = 0
      while (i < e.length) {
        e(i) match {
          case '\\' if i + 1 < e.length && e(i + 1) == '_' =>
            rx ++= "_"; i += 1
          case '%' => rx ++= ".*"
          case '_' => rx ++= "."
          case c   => rx ++= java.util.regex.Pattern.quote(c.toString)
        }
        i += 1
      }
      q.matches(rx.result())
    }
  }

  /** Always-skipped even when system schemas are included — the
    * reference's discovery loop drops these unconditionally
    * (common.c:672-678 is_mysql_special_tables, case-insensitive;
    * applied at mydumper_working_thread.c:355,1233). */
  private val MysqlSpecialTables =
    Set("general_log", "slow_log", "innodb_index_stats", "innodb_table_stats")

  def accepts(spec: Spec, t: TableMeta,
      updateTime: Option[java.time.Instant] = None): Boolean = {
    val qualified = s"${t.database}.${t.table}"
    val isMysqlSpecial = t.database.equalsIgnoreCase("mysql") &&
      MysqlSpecialTables.contains(t.table.toLowerCase)
    !isMysqlSpecial && {
    // unanchored substring match like the reference's pcre2_match on
    // "db.table" (regex.c:96-111); several patterns OR like its re_list
    // walk (regex.c:114-125 — first match wins)
    val patterns = spec.regex.toSeq ++ spec.regexes
    (spec.includeSystemSchemas || !SystemSchemas.contains(t.database.toLowerCase)) &&
      (patterns.isEmpty || patterns.exists(r => r.r.findFirstIn(qualified).isDefined)) &&
      (spec.tablesList.isEmpty ||
        spec.tablesList.exists(tableListMatch(_, qualified))) &&
      // a skiplist line naming just the database skips the whole DB
      // (tables_skiplist.c:72-75 checks the bare database key first,
      // then db.table; both case-sensitive strcmp like its comparator)
      !spec.skiplist.contains(t.database) &&
      !spec.skiplist.contains(qualified) &&
      !spec.ignoreEngines.contains(t.engine.toLowerCase) &&
      spec.updatedSince.forall(since =>
        updateTime.forall(ut => !ut.isBefore(since)))
    }
  }

  def filter(spec: Spec, tables: Seq[TableMeta]): Seq[TableMeta] =
    tables.filter(accepts(spec, _))

  /** Name-only filter chain, the loader's eval_table
    * (myloader_common.c:519-529,562-576): tables-list, then skiplist,
    * then regex — no engine / system-schema / updated-since knowledge at
    * the filename level. Used by [[graft.Load.shouldQueueFilename]]. */
  def evalNameOnly(spec: Spec, db: String, table: String): Boolean = {
    val qualified = s"$db.$table"
    (spec.tablesList.isEmpty ||
      spec.tablesList.exists(tableListMatch(_, qualified))) &&
      !spec.skiplist.contains(db) &&
      !spec.skiplist.contains(qualified) && {
        val patterns = spec.regex.toSeq ++ spec.regexes
        patterns.isEmpty || patterns.exists(r => r.r.findFirstIn(qualified).isDefined)
      }
  }
}

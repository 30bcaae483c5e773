package graft.extract

import graft.core.DefaultsFile

/** The reference's session/global variable subsystem, rebuilt for JDBC
  * init-statement lists:
  *
  *  - base defaults per server flavor (common.c:63-69
  *    initialize_hash_of_session_variables: WAIT_TIMEOUT /
  *    NET_WRITE_TIMEOUT only on mysql-like servers);
  *  - the loader's extras (myloader.c:103-110: AUTOCOMMIT=0 when
  *    transactions batch more than one statement chunk, SQL_LOG_BIN=0
  *    unless binlogging the restore is requested);
  *  - defaults-file overrides resolved per product, walking the group
  *    chain `base` → `base_<product>` → `…_<major>` → `…_<secondary>` →
  *    `…_<revision>` with later groups winning (common.c:343-356
  *    load_hash_of_all_variables_perproduct_from_key_file), keys
  *    uppercased on insert (common.c:425-427 set_session_hash_insert);
  *  - rendering with the FOREIGN_KEY_CHECKS=0 auto-default
  *    (common.c:429-438 refresh_set_session_from_hash) and the
  *    version-comment value form — a value ending in a bang-comment
  *    open marker renders the whole SET wrapped inside that comment
  *    (common.c:407-423 refresh_set_from_hash);
  *  - GLOBAL variables with capture + rollback statement pairs
  *    (common.c:441-464 set_global_rollback_from_hash);
  *  - the `--ignore-set` filter, both against the variable hash
  *    (myloader_common.c:101-107) and against SET statements replayed
  *    from dump files (myloader_common.c:109-120
  *    should_ignore_set_statement).
  *
  * Ordered, deterministic (the reference iterates a GHashTable; we keep
  * insertion order so generated statement lists are stable/testable).
  */
object SessionVariables {

  /** Ordered variable map with uppercase-key upsert semantics. */
  final case class Vars(entries: Vector[(String, String)] = Vector.empty) {
    def set(key: String, value: String): Vars = {
      val k = key.toUpperCase
      // replace keeps first-insert position like g_hash_table_insert
      val idx = entries.indexWhere(_._1 == k)
      Vars(if (idx < 0) entries :+ (k -> value)
           else entries.updated(idx, k -> value))
    }
    def remove(key: String): Vars = Vars(entries.filterNot(_._1 == key.toUpperCase))
    def contains(key: String): Boolean = entries.exists(_._1 == key.toUpperCase)
    def get(key: String): Option[String] =
      entries.collectFirst { case (k, v) if k == key.toUpperCase => v }
  }

  /** initialize_hash_of_session_variables (common.c:63-69). */
  def base(info: ServerDetect.ServerInfo): Vars = {
    if (info.mysqlLike)
      Vars().set("WAIT_TIMEOUT", "2147483").set("NET_WRITE_TIMEOUT", "2147483")
    else Vars()
  }

  /** myloader_initialize_hash_of_session_variables (myloader.c:103-110). */
  def loaderBase(info: ServerDetect.ServerInfo, commitCount: Int,
      enableBinlog: Boolean): Vars = {
    var v = base(info)
    if (commitCount > 1) v = v.set("AUTOCOMMIT", "0")
    if (!enableBinlog) v = v.set("SQL_LOG_BIN", "0")
    v
  }

  /** The per-product group chain, most specific last
    * (load_hash_of_all_variables_perproduct_from_key_file,
    * common.c:343-356): `base`, `base_<product-lowercase>`, then the
    * version parts appended cumulatively with `_`. */
  def productGroups(baseName: String, info: ServerDetect.ServerInfo): Seq[String] = {
    val product = productName(info.flavor).toLowerCase
    val g1 = s"${baseName}_$product"
    val g2 = s"${g1}_${info.major}"
    val g3 = s"${g2}_${info.secondary}"
    val g4 = s"${g3}_${info.revision}"
    Seq(baseName, g1, g2, g3, g4)
  }

  /** get_product_name (server_detect.c:55-67). */
  def productName(f: Snapshot.Flavor): String = f match {
    case Snapshot.Percona    => "Percona"
    case Snapshot.MySQL      => "MySQL"
    case Snapshot.MariaDB    => "MariaDB"
    case Snapshot.TiDB       => "TiDB"
    case Snapshot.ClickHouse => "Clickhouse"
    case Snapshot.Dolt       => "Dolt"
    case Snapshot.RDS        => "RDS"
    case Snapshot.Google     => "Google"
    case Snapshot.Unknown    => "unknown"
  }

  /** Apply defaults-file overrides for the group chain, later groups
    * winning; group lookup case-insensitive (m_key_file_has_group),
    * keys uppercased on insert (load_hash_from_key_file →
    * set_session_hash_insert, common.c:183-193). */
  def applyConfig(vars: Vars, ini: DefaultsFile.Ini, baseName: String,
      info: ServerDetect.ServerInfo): Vars =
    productGroups(baseName, info).foldLeft(vars) { (acc, g) =>
      ini.groupIgnoreCase(g).map(_.foldLeft(acc) { case (a, (k, v)) =>
        a.set(k, v)
      }).getOrElse(acc)
    }

  /** One SET statement per entry — plain `SET <kind> K = V` or, when
    * the value carries a trailing bang-comment open marker, the
    * version-comment wrapped form (refresh_set_from_hash,
    * common.c:407-423). */
  private def renderOne(kind: String, key: String, value: String): String = {
    val at = value.indexOf("/*!")
    if (at >= 0) {
      val marker = value.substring(at + 1) // "*!NNNNN"
      val v = value.substring(0, at).trim
      s"/$marker SET $kind $key = $v */"
    } else s"SET $kind $key = $value"
  }

  /** Session statement list with the FOREIGN_KEY_CHECKS=0 auto-default
    * (refresh_set_session_from_hash, common.c:429-438). */
  def renderSession(vars: Vars): Seq[String] = {
    val withFk = if (vars.contains("FOREIGN_KEY_CHECKS")) vars
      else vars.set("FOREIGN_KEY_CHECKS", "0")
    withFk.entries.map { case (k, v) => renderOne("SESSION", k, v) }
  }

  /** GLOBAL statements: (capture + set, rollback) — the reference saves
    * every current value into a user variable in ONE SELECT, emits the
    * sets, and keeps `SET GLOBAL k = @k` statements to restore on exit
    * (set_global_rollback_from_hash + refresh_set_from_hash,
    * common.c:441-464). */
  def renderGlobal(vars: Vars): (Seq[String], Seq[String]) = {
    if (vars.entries.isEmpty) return (Nil, Nil)
    val keys = vars.entries.map(_._1)
    val capture = s"SELECT ${keys.map("@@" + _).mkString(", ")} INTO ${keys.map("@" + _).mkString(", ")}"
    val sets = vars.entries.map { case (k, v) => renderOne("GLOBAL", k, v) }
    val rollback = keys.map(k => s"SET GLOBAL $k = @$k")
    (capture +: sets, rollback)
  }

  /** set_names_statement_template (common.c:86-88); the connection
    * default charset is BINARY (initialize_set_names, common.c:72-77 —
    * dump bytes verbatim, re-interpret nothing), executed right after
    * connect (connection.c:348). */
  def setNames(charset: String = "binary"): String =
    s"/*!40101 SET NAMES $charset*/"

  /** The dump worker's connection preamble, as mydumper composes it:
    * SET NAMES binary, then the session variables (flavor base +
    * `mydumper_session_variables*` defaults-file groups) rendered with
    * the FOREIGN_KEY_CHECKS auto-default. Prepend to the lock-mode's
    * workerInit via [[JdbcExtract.spec]]. */
  def dumperPreamble(info: ServerDetect.ServerInfo,
      ini: Option[DefaultsFile.Ini] = None,
      charset: String = "binary"): Seq[String] = {
    var v = base(info)
    ini.foreach(i => v = applyConfig(v, i, "mydumper_session_variables", info))
    setNames(charset) +: renderSession(v)
  }

  /** remove_ignore_set_session_from_hash (myloader_common.c:101-107). */
  def removeIgnored(vars: Vars, ignore: Seq[String]): Vars =
    ignore.foldLeft(vars)((v, k) => v.remove(k))

  /** should_ignore_set_statement (myloader_common.c:109-120): the
    * variable name is the token between the last space before the first
    * `=` and the `=` itself; dump-file SET statements whose variable is
    * on the --ignore-set list are skipped during restore. */
  def shouldIgnoreSetStatement(stmt: String, ignore: Seq[String]): Boolean = {
    val eq = stmt.indexOf('=')
    if (eq < 0 || ignore.isEmpty) false
    else {
      val head = stmt.substring(0, eq)
      val name = head.substring(head.lastIndexOf(' ') + 1).trim
      ignore.exists(_.equalsIgnoreCase(name))
    }
  }
}

package graft

import graft.core.DefaultsFile
import graft.extract.{ServerDetect, SessionVariables, Snapshot}
import org.scalatest.funsuite.AnyFunSuite

/** Session/global variable subsystem vs the reference
  * (common.c:63-69,183-193,343-356,407-464; myloader.c:103-110,515-591;
  * myloader_common.c:101-120). */
class SessionVariablesSpec extends AnyFunSuite {

  private val mysql8 = ServerDetect.ServerInfo(Snapshot.MySQL, 8, 0, 36)
  private val tidb = ServerDetect.ServerInfo(Snapshot.TiDB, 7, 5, 0)

  test("base defaults: WAIT/NET_WRITE timeouts only on mysql-like (common.c:63-69)") {
    assert(SessionVariables.base(mysql8).entries === Vector(
      "WAIT_TIMEOUT" -> "2147483", "NET_WRITE_TIMEOUT" -> "2147483"))
    assert(SessionVariables.base(tidb).entries.isEmpty)
  }

  test("loader extras: AUTOCOMMIT only when batching, SQL_LOG_BIN unless binlog (myloader.c:103-110)") {
    val v = SessionVariables.loaderBase(mysql8, commitCount = 1000, enableBinlog = false)
    assert(v.get("AUTOCOMMIT") === Some("0"))
    assert(v.get("SQL_LOG_BIN") === Some("0"))
    val single = SessionVariables.loaderBase(mysql8, commitCount = 1, enableBinlog = true)
    assert(single.get("AUTOCOMMIT").isEmpty)
    assert(single.get("SQL_LOG_BIN").isEmpty)
  }

  test("per-product group chain, cumulative version suffixes (common.c:343-356)") {
    assert(SessionVariables.productGroups("myloader_session_variables", mysql8) === Seq(
      "myloader_session_variables",
      "myloader_session_variables_mysql",
      "myloader_session_variables_mysql_8",
      "myloader_session_variables_mysql_8_0",
      "myloader_session_variables_mysql_8_0_36"))
    // product names match get_product_name (server_detect.c:55-67)
    assert(SessionVariables.productName(Snapshot.ClickHouse) === "Clickhouse")
    assert(SessionVariables.productName(Snapshot.Unknown) === "unknown")
  }

  test("config override: later (more specific) groups win; keys uppercase; case-insensitive groups") {
    val ini = DefaultsFile.parse(
      """[mydumper_session_variables]
        |wait_timeout = 300
        |custom_var = 1
        |
        |[MYDUMPER_SESSION_VARIABLES_MYSQL]
        |wait_timeout = 500
        |
        |[mydumper_session_variables_mysql_8]
        |net_read_timeout = 60
        |""".stripMargin)
    val v = SessionVariables.applyConfig(SessionVariables.base(mysql8), ini,
      "mydumper_session_variables", mysql8)
    // file override beats the built-in default; _mysql group beats base
    assert(v.get("WAIT_TIMEOUT") === Some("500"))
    assert(v.get("NET_WRITE_TIMEOUT") === Some("2147483"))
    assert(v.get("CUSTOM_VAR") === Some("1"))
    assert(v.get("NET_READ_TIMEOUT") === Some("60"))
  }

  test("session render: FOREIGN_KEY_CHECKS auto-default and version-comment values (common.c:407-438)") {
    val v = SessionVariables.Vars()
      .set("WAIT_TIMEOUT", "2147483")
      .set("SQL_MODE", "'NO_ENGINE_SUBSTITUTION' /*!40101")
    val stmts = SessionVariables.renderSession(v)
    assert(stmts === Seq(
      "SET SESSION WAIT_TIMEOUT = 2147483",
      "/*!40101 SET SESSION SQL_MODE = 'NO_ENGINE_SUBSTITUTION' */",
      "SET SESSION FOREIGN_KEY_CHECKS = 0"))
    // explicit FK setting suppresses the auto-default
    val explicit = SessionVariables.renderSession(
      SessionVariables.Vars().set("foreign_key_checks", "1"))
    assert(explicit === Seq("SET SESSION FOREIGN_KEY_CHECKS = 1"))
  }

  test("global render: capture into @vars, sets, rollback pairs (common.c:441-464)") {
    val v = SessionVariables.Vars()
      .set("innodb_flush_log_at_trx_commit", "0")
      .set("sync_binlog", "0")
    val (apply, rollback) = SessionVariables.renderGlobal(v)
    assert(apply === Seq(
      "SELECT @@INNODB_FLUSH_LOG_AT_TRX_COMMIT, @@SYNC_BINLOG INTO @INNODB_FLUSH_LOG_AT_TRX_COMMIT, @SYNC_BINLOG",
      "SET GLOBAL INNODB_FLUSH_LOG_AT_TRX_COMMIT = 0",
      "SET GLOBAL SYNC_BINLOG = 0"))
    assert(rollback === Seq(
      "SET GLOBAL INNODB_FLUSH_LOG_AT_TRX_COMMIT = @INNODB_FLUSH_LOG_AT_TRX_COMMIT",
      "SET GLOBAL SYNC_BINLOG = @SYNC_BINLOG"))
    assert(SessionVariables.renderGlobal(SessionVariables.Vars()) === ((Nil, Nil)))
  }

  test("ignore-set: hash removal and dump-statement filter (myloader_common.c:101-120)") {
    val v = SessionVariables.Vars().set("SQL_LOG_BIN", "0").set("AUTOCOMMIT", "0")
    val pruned = SessionVariables.removeIgnored(v, Seq("sql_log_bin"))
    assert(pruned.entries.map(_._1) === Vector("AUTOCOMMIT"))
    // statement filter: variable name = token after last space before '='
    assert(SessionVariables.shouldIgnoreSetStatement(
      "SET @@SESSION.SQL_LOG_BIN= 0", Seq("@@SESSION.SQL_LOG_BIN")))
    assert(SessionVariables.shouldIgnoreSetStatement(
      "SET SESSION sql_mode= ''", Seq("SQL_MODE")))
    assert(!SessionVariables.shouldIgnoreSetStatement(
      "SET SESSION sql_mode= ''", Seq("TIME_ZONE")))
    // reference-exact quirk: a space BEFORE '=' makes the parsed name
    // empty (g_strrstr lands on that space) → never ignored
    assert(!SessionVariables.shouldIgnoreSetStatement(
      "SET SESSION sql_mode = ''", Seq("SQL_MODE")))
    assert(!SessionVariables.shouldIgnoreSetStatement("FLUSH TABLES", Seq("X")))
  }

  test("dumper preamble: SET NAMES binary first, then session vars (connection.c:320-348)") {
    val stmts = SessionVariables.dumperPreamble(mysql8)
    assert(stmts.head === "/*!40101 SET NAMES binary*/")
    assert(stmts.contains("SET SESSION WAIT_TIMEOUT = 2147483"))
    assert(stmts.last === "SET SESSION FOREIGN_KEY_CHECKS = 0")
    // non-mysql-like: no timeout defaults, SET NAMES still present
    assert(SessionVariables.dumperPreamble(tidb) === Seq(
      "/*!40101 SET NAMES binary*/", "SET SESSION FOREIGN_KEY_CHECKS = 0"))
  }

  test("loader sessionInit end-to-end mirrors myloader.c:515-591 composition") {
    val ini = DefaultsFile.parse(
      """[myloader_session_variables]
        |long_query_time = 300
        |""".stripMargin)
    val stmts = graft.load.JdbcLoad.sessionInit(mysql8, commitCount = 1000,
      enableBinlog = false, ini = Some(ini), ignoreSet = Seq("SQL_LOG_BIN"))
    assert(stmts === Seq(
      "SET SESSION WAIT_TIMEOUT = 2147483",
      "SET SESSION NET_WRITE_TIMEOUT = 2147483",
      "SET SESSION AUTOCOMMIT = 0",
      "SET SESSION LONG_QUERY_TIME = 300",
      "SET SESSION FOREIGN_KEY_CHECKS = 0"))
  }

  test("defaults-file parser: GKeyFile semantics") {
    val ini = DefaultsFile.parse(
      """# comment
        |[a]
        |k = 1
        |k = 2
        |; semicolon comment
        |[B]
        |x=y
        |""".stripMargin)
    assert(ini.value("a", "k") === Some("2")) // last duplicate wins
    assert(ini.groupIgnoreCase("b").isDefined)
    assert(ini.group("b").isEmpty) // exact lookup is case-sensitive
  }
}

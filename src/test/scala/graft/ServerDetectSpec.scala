package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, ResultSet}

import graft.extract.{ServerDetect, Snapshot}
import graft.extract.Snapshot._
import org.scalatest.funsuite.AnyFunSuite

/** Execution-asserts the server-detection probe chain against a
  * recording fake driver — query order, short-circuits, and product/
  * version outcomes phase-for-phase with the reference's server_detect.c
  * (detect_product :78-103, detect_server_version :113-164,
  * detect_lower_case_table_names :166-180, arg override :260-276). */
class ServerDetectSpec extends AnyFunSuite {

  /** Connection routing every executeQuery through `route` (None = no
    * row); executed SQL accumulates in `log`. */
  private def fakeConn(log: collection.mutable.Buffer[String],
      route: String => Option[Seq[String]]): Connection = {
    def rs(r: Option[Seq[String]]): ResultSet = {
      var i = -1
      Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[ResultSet]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
            case "next" => i += 1; java.lang.Boolean.valueOf(i == 0 && r.isDefined)
            case "getString" => r.get(a(0).asInstanceOf[Integer] - 1)
            case "close" => null
            case other => throw new UnsupportedOperationException(other)
          }
        }).asInstanceOf[ResultSet]
    }
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
          case "createStatement" =>
            Proxy.newProxyInstance(getClass.getClassLoader,
              Array(classOf[java.sql.Statement]),
              new InvocationHandler {
                def invoke(p2: Any, m2: Method, a2: Array[AnyRef]): AnyRef =
                  m2.getName match {
                    case "executeQuery" =>
                      val sql = a2(0).asInstanceOf[String]
                      log += sql
                      rs(route(sql))
                    case "close" => null
                    case other => throw new UnsupportedOperationException(other)
                  }
              })
          case "close" => null
          case other => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[Connection]
  }

  test("product precedence and 'source' → MySQL (detect_product :78-103)") {
    // percona wins over mysql appearing in the other string
    assert(ServerDetect.detectProduct(
      Some("Percona Server (GPL)"), Some("8.0.36-28")) === Percona)
    assert(ServerDetect.detectProduct(
      Some("mariadb.org binary distribution"), Some("10.11.6-MariaDB")) === MariaDB)
    assert(ServerDetect.detectProduct(Some(""), Some("8.0.11-TiDB-v7.5.0")) === TiDB)
    assert(ServerDetect.detectProduct(Some("Dolt"), None) === Dolt)
    assert(ServerDetect.detectProduct(Some("(Google)"), Some("8.0.31")) === Google)
    // "Source distribution" counts as MySQL (:99-101)
    assert(ServerDetect.detectProduct(Some("Source distribution"), Some("8.4.2")) === MySQL)
    assert(ServerDetect.detectProduct(Some("unhelpful"), Some("9.9.9")) === Unknown)
    // case-insensitive, either argument
    assert(ServerDetect.detectProduct(None, Some("PERCONA-x")) === Percona)
  }

  test("version triple parses with strtol semantics (:106-110)") {
    assert(ServerDetect.parseVersion("8.0.40-azure") === ((8, 0, 40)))
    assert(ServerDetect.parseVersion("10.11.6-MariaDB-log") === ((10, 11, 6)))
    assert(ServerDetect.parseVersion("0.0.0") === ((0, 0, 0)))
    assert(ServerDetect.parseVersion("8.0") === ((8, 0, 0)))
    assert(ServerDetect.parseVersion("garbage") === ((0, 0, 0)))
    // limit-3 split: the third segment keeps its dots for strtol
    assert(ServerDetect.parseVersion("24.1.2.33") === ((24, 1, 2)))
  }

  test("--server-version override validates like the reference (:260-276)") {
    val i = ServerDetect.fromArg("mysql-8.0.36")
    assert(i === ServerDetect.ServerInfo(MySQL, 8, 0, 36))
    assert(ServerDetect.fromArg("percona-5.7.44").flavor === Percona)
    // no dash / wrong segment count → the reference's m_error
    intercept[IllegalArgumentException](ServerDetect.fromArg("mysql8.0.36"))
    intercept[IllegalArgumentException](ServerDetect.fromArg("mysql-8.0"))
  }

  test("known product: one probe, no fallbacks (detect_server_version :113-124)") {
    val log = collection.mutable.Buffer.empty[String]
    val conn = fakeConn(log, {
      case s if s.startsWith("SELECT @@version_comment") =>
        Some(Seq("MySQL Community Server - GPL", "8.0.36"))
      case _ => None
    })
    assert(ServerDetect.detect(conn) === ServerDetect.ServerInfo(MySQL, 8, 0, 36))
    assert(log === Seq("SELECT @@version_comment, @@version"),
      "a recognized product must not trigger the ClickHouse/Aurora probes")
  }

  test("unknown → ClickHouse probe via system.build_options (:126-145)") {
    val log = collection.mutable.Buffer.empty[String]
    val conn = fakeConn(log, {
      case s if s.startsWith("SELECT @@version_comment") => None // CH lacks it
      case s if s.startsWith("SHOW DATABASES LIKE 'system'") => Some(Seq("system"))
      case s if s.contains("build_options") =>
        Some(Seq("ClickHouse 24.1.2.33 (official build)"))
      case _ => None
    })
    val info = ServerDetect.detect(conn)
    assert(info.flavor === Snapshot.ClickHouse)
    assert((info.major, info.secondary, info.revision) === ((24, 1, 2)))
    assert(log.count(_.contains("aurora")) === 0,
      "build_options row short-circuits the Aurora probe (goto cleanup)")
  }

  test("unknown → Aurora probe → RDS keeps @@version (:147-152)") {
    val log = collection.mutable.Buffer.empty[String]
    val conn = fakeConn(log, {
      case s if s.startsWith("SELECT @@version_comment") =>
        Some(Seq("nondescript", "8.0.28"))
      case s if s.contains("aurora_version") => Some(Seq("3.04.1"))
      case _ => None
    })
    val info = ServerDetect.detect(conn)
    assert(info === ServerDetect.ServerInfo(RDS, 8, 0, 28))
    assert(log.exists(_.startsWith("SHOW DATABASES LIKE 'system'")),
      "the ClickHouse probe runs before the Aurora probe")
  }

  test("all probes dry → Unknown 0.0.0 (:153)") {
    val conn = fakeConn(collection.mutable.Buffer.empty, _ => None)
    assert(ServerDetect.detect(conn) ===
      ServerDetect.ServerInfo(Unknown, 0, 0, 0))
  }

  test("lower_case_table_names → CAST(/AS BINARY) wrappers (:166-180)") {
    def withValue(v: Option[String]) = ServerDetect.caseSensitivity(
      fakeConn(collection.mutable.Buffer.empty, {
        case s if s.contains("lower_case_table_names") => v.map(Seq(_))
        case _ => None
      }))
    assert(withValue(Some("1")) === (("CAST(", "AS BINARY)")))
    assert(withValue(Some("2")) === (("CAST(", "AS BINARY)")))
    assert(withValue(Some("0")) === (("", "")))
    assert(withValue(None) === (("", "")))
  }

  test("mysql-like and tablespace families (:70-76)") {
    import ServerDetect.ServerInfo
    assert(ServerInfo(Unknown, 0, 0, 0).mysqlLike)
    assert(ServerInfo(RDS, 8, 0, 0).mysqlLike)
    assert(!ServerInfo(TiDB, 7, 5, 0).mysqlLike)
    assert(!ServerInfo(Snapshot.ClickHouse, 24, 1, 0).mysqlLike)
    assert(ServerInfo(RDS, 8, 0, 0).supportsTablespaces)
    assert(!ServerInfo(MariaDB, 10, 11, 0).supportsTablespaces)
  }

  test("lock plan: LOCK INSTANCE is major==8 EXACTLY; RDS restricted") {
    // determine_ddl_lock_function `case 8:` (mydumper_start_dump.c:
    // 696,735): MySQL 9.x takes default_locking — no instance lock
    assert(Snapshot.plan(Auto, MySQL, serverMajor = 8).ddlLock ===
      Seq("LOCK INSTANCE FOR BACKUP"))
    assert(Snapshot.plan(Auto, MySQL, serverMajor = 9).ddlLock === Nil)
    assert(Snapshot.plan(Auto, Google, serverMajor = 8).ddlLock ===
      Seq("LOCK INSTANCE FOR BACKUP"))
    assert(Snapshot.plan(Auto, Dolt, serverMajor = 8).ddlLock === Nil)
    // --skip-ddl-locks nulls the slot everywhere (:1237-1240) and
    // demotes MariaDB BACKUP STAGE to FTWRL (:749)
    assert(Snapshot.plan(Auto, MySQL, serverMajor = 8,
      skipDdlLocks = true).ddlLock === Nil)
    val maria = Snapshot.plan(Auto, MariaDB, serverMajor = 10, serverMinor = 11,
      skipDdlLocks = true)
    assert(maria.controlLock.exists(_.contains("FLUSH TABLES WITH READ LOCK")))
    // --no-backup-locks suppresses only Percona 5.7's pair (:707-709)
    assert(Snapshot.plan(Auto, Percona, serverMajor = 5, serverMinor = 7,
      noBackupLocks = true).ddlLock === Nil)
    assert(Snapshot.plan(Auto, Percona, serverMajor = 5, serverMinor = 7)
      .ddlLock.head === "LOCK TABLES FOR BACKUP")
    // RDS: LOCK_ALL / SAFE_NO_LOCK only (:730-731)
    intercept[IllegalArgumentException](Snapshot.plan(Auto, RDS))
    assert(Snapshot.plan(SafeNoLock, RDS).abortOnDrift)
    assert(Snapshot.plan(LockAll, RDS, tables = Seq("t")).controlLock
      .head.startsWith("LOCK TABLES"))
  }
}

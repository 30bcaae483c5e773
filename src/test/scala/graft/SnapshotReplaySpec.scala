package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, ResultSet, ResultSetMetaData, SQLException}

import graft.extract.{Snapshot, SnapshotRunner}
import graft.extract.Snapshot._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** T1/T2 EXECUTION-asserted (round-6 upgrade from value-asserted): the
  * full per-flavor lock/snapshot statement sequences run end-to-end
  * through [[SnapshotRunner]] against a recording MySQL-protocol fake,
  * and the exact wire order is compared against the reference's
  * acquire-ddl → acquire-global → verify → worker-sync → re-verify →
  * release-reverse flow (mydumper_start_dump.c:605-769, 1214-1283).
  * No live MySQL exists in this sandbox; the fake replays the honest
  * JDBC surface (execute → result set rows) the runner consumes. */
class SnapshotReplaySpec extends AnyFunSuite {

  /** Records every (connection, statement) in execution order; SHOW /
    * SELECT probes answer with canned rows; named statements can be
    * made to fail their first N executions (FTWRL timeout shape). */
  private final class FakeServer(failFirstN: Map[String, Int] = Map.empty) {
    val log = mutable.Buffer.empty[(String, String)]
    private val failures = mutable.Map.empty[String, Int] ++= failFirstN
    var position = "1234"

    private def resultFor(sql: String): Option[Seq[Seq[String]]] = sql match {
      case Snapshot.TidbTsoProbe => Some(Seq(Seq("449348000000000000")))
      case s if s.startsWith("SHOW") => Some(Seq(Seq("binlog.000042", position)))
      case s if s.startsWith("SELECT") => Some(Seq(Seq(s"uuid:1-$position")))
      case _ => None
    }

    private def resultSet(rows: Seq[Seq[String]]): ResultSet = {
      val meta = Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[ResultSetMetaData]), new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "getColumnCount" => Integer.valueOf(rows.headOption.map(_.size).getOrElse(0))
            case other => throw new UnsupportedOperationException(other)
          }
        }).asInstanceOf[ResultSetMetaData]
      var i = -1
      Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[ResultSet]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "next" => i += 1; java.lang.Boolean.valueOf(i < rows.length)
            case "getMetaData" => meta
            case "getString" => rows(i)(args(0).asInstanceOf[Integer] - 1)
            case "close" => null
            case other => throw new UnsupportedOperationException(other)
          }
        }).asInstanceOf[ResultSet]
    }

    def connection(name: String): Connection =
      Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "createStatement" =>
              var last: Option[Seq[Seq[String]]] = None
              Proxy.newProxyInstance(getClass.getClassLoader,
                Array(classOf[java.sql.Statement]), new InvocationHandler {
                  def invoke(p2: Any, m2: Method, a2: Array[AnyRef]): AnyRef =
                    m2.getName match {
                      case "execute" =>
                        val sql = a2(0).asInstanceOf[String]
                        log += ((name, sql))
                        failures.get(sql).filter(_ > 0).foreach { n =>
                          failures(sql) = n - 1
                          throw new SQLException(s"fake lock wait timeout on: $sql")
                        }
                        last = resultFor(sql)
                        java.lang.Boolean.valueOf(last.isDefined)
                      case "getResultSet" => resultSet(last.getOrElse(Nil))
                      case "close" => null
                      case other => throw new UnsupportedOperationException(other)
                    }
                })
            case "close" => null
            case other => throw new UnsupportedOperationException(other)
          }
        }).asInstanceOf[Connection]
  }

  private val workerSync = Seq(
    "SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ",
    "SET TIME_ZONE = '+00:00'",
    "START TRANSACTION /*!40108 WITH CONSISTENT SNAPSHOT */")

  /** Drive the full lifecycle over the fake: 2 worker connections. */
  private def replay(srv: FakeServer, plan: Snapshot.Plan,
      lockRetries: Int = 2): Unit = {
    val ctl = srv.connection("ctl")
    val ddl = srv.connection("ddl")
    val started = SnapshotRunner.start(ctl, ddl, plan, lockRetries)
    SnapshotRunner.initWorker(srv.connection("w1"), started)
    SnapshotRunner.initWorker(srv.connection("w2"), started)
    SnapshotRunner.finish(ctl, ddl, started)
  }

  test("MySQL 8.0 auto: LOCK INSTANCE + FTWRL, verify twice, reverse release") {
    // the whole sequence shares ONE session — the reference only opens a
    // second connection for Percona 5.7 (mydumper_start_dump.c:718)
    val srv = new FakeServer
    replay(srv, plan(Auto, MySQL, serverMajor = 8, serverMinor = 0))
    assert(srv.log.toSeq === Seq(
      "ctl" -> "LOCK INSTANCE FOR BACKUP",
      "ctl" -> "FLUSH NO_WRITE_TO_BINLOG TABLES",
      "ctl" -> "FLUSH TABLES WITH READ LOCK",
      "ctl" -> "SHOW MASTER STATUS",
      "ctl" -> "SELECT @@gtid_executed") ++
      workerSync.map("w1" -> _) ++ workerSync.map("w2" -> _) ++ Seq(
      "ctl" -> "SHOW MASTER STATUS",
      "ctl" -> "SELECT @@gtid_executed",
      "ctl" -> "UNLOCK TABLES",
      "ctl" -> "UNLOCK INSTANCE"))
  }

  test("MySQL 8.4 auto speaks the renamed binlog-status verb on the wire") {
    val srv = new FakeServer
    replay(srv, plan(Auto, MySQL, serverMajor = 8, serverMinor = 4))
    assert(srv.log.count(_._2 == "SHOW BINARY LOG STATUS") === 2)
    assert(!srv.log.exists(_._2 == "SHOW MASTER STATUS"))
  }

  test("Percona 5.7 auto: backup locks + FTWRL, binlog released last") {
    val srv = new FakeServer
    replay(srv, plan(Auto, Percona, serverMajor = 5, serverMinor = 7))
    val ddlSeq = srv.log.filter(_._1 == "ddl").map(_._2)
    assert(ddlSeq === Seq("LOCK TABLES FOR BACKUP", "LOCK BINLOG FOR BACKUP",
      "UNLOCK TABLES", "UNLOCK BINLOG"))
    // global FTWRL on the control connection, released before the ddl pair
    val ctlSeq = srv.log.filter(_._1 == "ctl").map(_._2)
    assert(ctlSeq.take(2) === Seq("FLUSH NO_WRITE_TO_BINLOG TABLES",
      "FLUSH TABLES WITH READ LOCK"))
    assert(ctlSeq.last === "UNLOCK TABLES")
    assert(srv.log.last === ("ddl" -> "UNLOCK BINLOG"))
  }

  test("MariaDB 10.6 auto: the whole BACKUP STAGE ladder shares ONE session") {
    // backup stages are per-session server state: BLOCK_COMMIT on a
    // session that never ran START errors out, so every stage must run
    // on the control connection (reference second_conn = conn, :1099)
    val srv = new FakeServer
    replay(srv, plan(Auto, MariaDB, serverMajor = 10, serverMinor = 6))
    assert(srv.log.filter(_._1 == "ddl").isEmpty,
      "no statement may leave the control session")
    val ctlSeq = srv.log.filter(_._1 == "ctl").map(_._2)
    assert(ctlSeq === Seq(
      "BACKUP STAGE START", "BACKUP STAGE BLOCK_DDL",
      "BACKUP STAGE BLOCK_COMMIT",
      "SHOW BINLOG STATUS", "SELECT @@gtid_binlog_pos",
      "SHOW BINLOG STATUS", "SELECT @@gtid_binlog_pos",
      "BACKUP STAGE END"))
  }

  test("MariaDB 10.4 (pre-BACKUP STAGE) falls back to plain FTWRL") {
    val srv = new FakeServer
    replay(srv, plan(Auto, MariaDB, serverMajor = 10, serverMinor = 4))
    assert(srv.log.filter(_._1 == "ddl").isEmpty)
    assert(srv.log.exists(_._2 == "FLUSH TABLES WITH READ LOCK"))
    assert(!srv.log.exists(_._2.startsWith("BACKUP STAGE")))
  }

  test("TiDB auto: ONE control TSO distributed to control and every worker") {
    val srv = new FakeServer
    replay(srv, plan(Auto, TiDB))
    val pin = "SET SESSION tidb_snapshot = 449348000000000000"
    assert(srv.log.toSeq === Seq(
      "ctl" -> Snapshot.TidbTsoProbe,
      "ctl" -> pin, // master session pins too (reference :676-677)
      "w1" -> pin, "w2" -> pin))
  }

  test("FTWRL retries through a lock-wait timeout, then succeeds") {
    val srv = new FakeServer(failFirstN = Map("FLUSH TABLES WITH READ LOCK" -> 1))
    replay(srv, plan(Auto, MySQL, serverMajor = 8, serverMinor = 0))
    assert(srv.log.count(_._2 == "FLUSH TABLES WITH READ LOCK") === 2,
      "first FTWRL attempt must be retried, not fatal")
    assert(srv.log.last === ("ctl" -> "UNLOCK INSTANCE"), "dump completed after retry")
  }

  test("FTWRL with retries exhausted propagates the server error") {
    val srv = new FakeServer(failFirstN = Map("FLUSH TABLES WITH READ LOCK" -> 3))
    intercept[SQLException] {
      replay(srv, plan(Auto, MySQL, serverMajor = 8, serverMinor = 0), lockRetries = 1)
    }
  }

  test("SafeNoLock aborts when the position moves mid-sync; NoLock warns") {
    val drifting = new FakeServer
    val ctl = drifting.connection("ctl")
    val ddl = drifting.connection("ddl")
    val started = SnapshotRunner.start(ctl, ddl, plan(SafeNoLock, MySQL))
    drifting.position = "9999" // writes landed while workers synced
    intercept[IllegalStateException] {
      SnapshotRunner.finish(ctl, ddl, started)
    }
    val lax = new FakeServer
    val ctl2 = lax.connection("ctl")
    val started2 = SnapshotRunner.start(ctl2, ctl2, plan(NoLock, MySQL))
    lax.position = "9999"
    SnapshotRunner.finish(ctl2, ctl2, started2) // warns, does not throw
  }
}

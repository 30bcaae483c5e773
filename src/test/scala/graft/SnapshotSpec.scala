package graft

import graft.extract.{Replica, Snapshot}
import graft.extract.Snapshot._
import org.scalatest.funsuite.AnyFunSuite

/** Lock-mode matrix semantics (SURVEY §2.8 T1-T4) as pure values —
  * no live MySQL in this environment; the JDBC path consumes these. */
class SnapshotSpec extends AnyFunSuite {

  test("auto mode resolves per flavor (reference matrix)") {
    // MySQL 8+: DDL slot holds LOCK INSTANCE FOR BACKUP alongside the
    // global FTWRL (mydumper_start_dump.c:735-741)
    val my8 = plan(Auto, MySQL, serverMajor = 8)
    assert(my8.controlLock.contains("FLUSH TABLES WITH READ LOCK"))
    assert(my8.ddlLock === Seq("LOCK INSTANCE FOR BACKUP"))
    assert(my8.ddlUnlock === Seq("UNLOCK INSTANCE"))
    // pre-8 MySQL has no instance lock
    assert(plan(Auto, MySQL, serverMajor = 5, serverMinor = 7).ddlLock === Nil)
    // Percona 8 follows the MySQL-8 pair; 5.7 has its own backup locks
    assert(plan(Auto, Percona, serverMajor = 8).ddlLock
      === Seq("LOCK INSTANCE FOR BACKUP"))
    assert(plan(Auto, Percona, serverMajor = 5, serverMinor = 7).ddlLock
      === Seq("LOCK TABLES FOR BACKUP", "LOCK BINLOG FOR BACKUP"))
    // MariaDB >= 10.5: BACKUP STAGE ladder split across the two slots
    val maria = plan(Auto, MariaDB, serverMajor = 10, serverMinor = 6)
    assert(maria.ddlLock === Seq("BACKUP STAGE START", "BACKUP STAGE BLOCK_DDL"))
    assert(maria.controlLock === Seq("BACKUP STAGE BLOCK_COMMIT"))
    assert(maria.controlUnlock === Seq("BACKUP STAGE END"))
    // pre-10.5 MariaDB falls back to FTWRL
    assert(plan(Auto, MariaDB, serverMajor = 10, serverMinor = 4)
      .controlLock.contains("FLUSH TABLES WITH READ LOCK"))
    // TiDB takes no lock — its control statement is the TSO probe, not
    // a lock; workers pin to that one snapshot
    assert(plan(Auto, TiDB).controlLock === Seq(Snapshot.TidbTsoProbe))
    assert(plan(Auto, TiDB).workerInit.exists(_.contains("tidb_snapshot")))
  }

  test("every locking plan opens consistent snapshots on workers") {
    for (m <- Seq[LockMode](Ftwrl, LockAll, Gtid, NoLock, SafeNoLock);
         f <- Seq[Flavor](MySQL, MariaDB, Percona)) {
      val p = plan(m, f, Seq("`db`.`t`"))
      assert(p.workerInit.exists(_.contains("CONSISTENT SNAPSHOT")),
        s"$m/$f lacks snapshot")
      assert(p.workerInit.exists(_.contains("TIME_ZONE")), s"$m/$f lacks UTC pin")
    }
  }

  test("lock-all enumerates tables; unlock is symmetric") {
    val p = plan(LockAll, MySQL, Seq("`a`.`t1`", "`a`.`t2`"))
    assert(p.controlLock.head === "LOCK TABLES `a`.`t1` READ LOCAL, `a`.`t2` READ LOCAL")
    assert(p.controlUnlock === Seq("UNLOCK TABLES"))
  }

  test("no-lock warns, safe-no-lock aborts on drift (T3)") {
    assert(!plan(NoLock, MySQL).abortOnDrift)
    assert(plan(SafeNoLock, MySQL).abortOnDrift)
    assert(plan(SafeNoLock, MySQL).verify.nonEmpty)
  }

  test("lock-all refuses an empty table list (would render invalid SQL)") {
    intercept[IllegalArgumentException] { plan(LockAll, MySQL) }
  }

  test("verify probe tracks the MySQL 8.2/8.4 binlog-status verb rename") {
    // SHOW MASTER STATUS was removed in 8.4; modern servers must get the
    // renamed verb, legacy servers the old one
    assert(plan(NoLock, MySQL, serverMajor = 8, serverMinor = 0)
      .verify.contains("SHOW MASTER STATUS"))
    assert(plan(NoLock, MySQL, serverMajor = 8, serverMinor = 4)
      .verify.contains("SHOW BINARY LOG STATUS"))
    assert(plan(NoLock, MySQL, serverMajor = 9, serverMinor = 0)
      .verify.contains("SHOW BINARY LOG STATUS"))
    // MariaDB keeps its own verb regardless
    assert(plan(NoLock, MariaDB, serverMajor = 11, serverMinor = 4)
      .verify.contains("SHOW BINLOG STATUS"))
  }

  test("TiDB plans pin every worker to ONE control-connection TSO") {
    // per-worker NOW() timestamps would give each connection its own
    // snapshot — the exact inconsistency the machinery exists to prevent
    for (m <- Seq[LockMode](Auto, Gtid)) {
      val p = plan(m, TiDB)
      assert(p.controlLock === Seq(Snapshot.TidbTsoProbe), s"$m lacks TSO probe")
      assert(!p.workerInit.exists(_.contains("NOW()")), s"$m uses per-worker NOW()")
    }
    assert(Snapshot.tidbWorkerInit("449348000000000000")
      === Seq("SET SESSION tidb_snapshot = 449348000000000000"))
    intercept[IllegalArgumentException] { Snapshot.tidbWorkerInit("'; DROP") }
  }

  test("RDS source/master procedure cutoff matches the 8.0.23 rename") {
    import graft.extract.Replica
    def change(major: Int, minor: Int, patch: Int): String =
      Replica.verbs(MySQL, major, minor, patch, Replica.AwsRds).changeSource
    assert(change(8, 0, 22).endsWith("external_master"))
    assert(change(8, 0, 23).endsWith("external_source"))
    assert(change(8, 4, 0).endsWith("external_source"))
    assert(change(9, 0, 1).endsWith("external_source"))
    assert(change(5, 7, 44).endsWith("external_master"))
  }

  test("two-phase ordering: non-transactional first (T4)") {
    val (nonTrx, trx) = phases(Seq(("innodb_t", true), ("myisam_t", false)))
    assert(nonTrx === Seq("myisam_t"))
    assert(trx === Seq("innodb_t"))
  }

  // ------------------------------------------------------- T6 replica
  test("replica verb matrix follows the SLAVE->REPLICA rename eras") {
    import Replica._
    // MySQL 8.0.22+ speaks REPLICA; 8.0.21 and 5.7 still SLAVE
    assert(verbs(MySQL, 8, 0, 22).stopSqlThread === "STOP REPLICA SQL_THREAD")
    assert(verbs(MySQL, 8, 0, 21).stopSqlThread === "STOP SLAVE SQL_THREAD")
    assert(verbs(MySQL, 5, 7, 44).start === "START SLAVE")
    assert(verbs(MySQL, 8, 4, 0).changeSource === "CHANGE REPLICATION SOURCE")
    // MariaDB flips at 10.6 and keeps the multisource ALL form
    assert(verbs(MariaDB, 10, 6, 0).showAllStatus === Some("SHOW ALL REPLICAS STATUS"))
    assert(verbs(MariaDB, 10, 5, 9).showAllStatus === Some("SHOW ALL SLAVES STATUS"))
    assert(verbs(MariaDB, 10, 5, 9).stopSqlThread === "STOP SLAVE SQL_THREAD")
    // managed services route through procedures (no SUPER)
    val rds = verbs(MySQL, 8, 1, 0, control = AwsRds)
    assert(rds.stopSqlThread === "CALL mysql.rds_stop_replication()")
    assert(rds.changeSource === "CALL mysql.rds_set_external_source")
    assert(verbs(MySQL, 5, 7, 0, control = AwsRds).changeSource
      === "CALL mysql.rds_set_external_master")
  }

  test("replica stop/start plans probe status first, restart after") {
    import Replica._
    val v = verbs(MySQL, 8, 0, 30)
    val (probes, stop) = stopPlan(v)
    assert(probes === Seq("SHOW REPLICA STATUS"))
    assert(stop === "STOP REPLICA SQL_THREAD")
    val (msProbes, _) = stopPlan(verbs(MariaDB, 10, 6, 0), multisource = true)
    assert(msProbes === Seq("SHOW ALL REPLICAS STATUS"))
    assert(startPlan(v) === Seq("START REPLICA"))
  }

  test("replica coords parse both vocabulary eras and skip non-replicas") {
    import Replica._
    val oldRow = Map(
      "Master_Host" -> "10.0.0.1", "Relay_Master_Log_File" -> "bin.000042",
      "Exec_Master_Log_Pos" -> "193847", "Executed_Gtid_Set" -> "uuid:1-99\n",
      "Channel_Name" -> "")
    val c = coordsOf(oldRow).get
    assert(c.sourceHost === "10.0.0.1" && c.sourceLogFile === "bin.000042"
      && c.sourceLogPos === 193847L && c.gtid === Some("uuid:1-99")
      && c.channel === None)
    val newRow = Map(
      "Source_Host" -> "db2", "Relay_Source_Log_File" -> "bin.000007",
      "Exec_Source_Log_Pos" -> "4", "Channel_Name" -> "ch1")
    val c2 = coordsOf(newRow).get
    assert(c2.sourceLogFile === "bin.000007" && c2.channel === Some("ch1"))
    assert(coordsOf(Map("Slave_IO_State" -> "")) === None) // not a replica
  }

  test("change-source statement matches the era and channel") {
    import Replica._
    val c = Coords("h", "bin.000042", 193847L, Some("uuid:1-99"), Some("ch1"))
    assert(changeSourceStatement(verbs(MySQL, 8, 0, 30), c)
      === "CHANGE REPLICATION SOURCE TO SOURCE_LOG_FILE = 'bin.000042', SOURCE_LOG_POS = 193847 FOR CHANNEL 'ch1'")
    assert(changeSourceStatement(verbs(MySQL, 5, 7, 0), c.copy(channel = None))
      === "CHANGE MASTER TO MASTER_LOG_FILE = 'bin.000042', MASTER_LOG_POS = 193847")
    assert(changeSourceStatement(verbs(MySQL, 8, 0, 30), c, autoPosition = true)
      === "CHANGE REPLICATION SOURCE TO SOURCE_AUTO_POSITION = 1 FOR CHANNEL 'ch1'")
  }

  test("replica coords round-trip through the manifest position slot") {
    import Replica._
    val c = Coords("db1", "bin.000042", 193847L, Some("uuid:1-99"), Some("ch1"))
    assert(fromManifestPosition(toManifestPosition(c)) === Some(c))
    val bare = Coords("db1", "bin.000001", 4L)
    assert(fromManifestPosition(toManifestPosition(bare)) === Some(bare))
    val m = graft.core.DumpManifest("t0", "t1",
      sourcePosition = Some(toManifestPosition(c)))
    assert(m.sourcePosition.flatMap(fromManifestPosition) === Some(c))
  }
}

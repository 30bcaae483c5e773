package graft

import graft.extract.Snapshot
import graft.extract.Snapshot._
import org.scalatest.funsuite.AnyFunSuite

/** Lock-mode matrix semantics (SURVEY §2.8 T1-T4) as pure values —
  * no live MySQL in this environment; the JDBC path consumes these. */
class SnapshotSpec extends AnyFunSuite {

  test("auto mode resolves per flavor (reference matrix)") {
    assert(plan(Auto, MySQL).controlLock.contains("FLUSH TABLES WITH READ LOCK"))
    assert(plan(Auto, Percona).controlLock === Seq("LOCK TABLES FOR BACKUP"))
    assert(plan(Auto, MariaDB).controlLock.head === "BACKUP STAGE START")
    assert(plan(Auto, MariaDB).controlUnlock === Seq("BACKUP STAGE END"))
    assert(plan(Auto, TiDB).controlLock.isEmpty)
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

  test("two-phase ordering: non-transactional first (T4)") {
    val (nonTrx, trx) = phases(Seq(("innodb_t", true), ("myisam_t", false)))
    assert(nonTrx === Seq("myisam_t"))
    assert(trx === Seq("innodb_t"))
  }
}

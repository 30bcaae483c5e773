package graft.extract

/** Snapshot / lock-mode strategies for consistent JDBC extraction
  * (SURVEY §2.8 T1-T6).
  *
  * The reference guarantees a consistent dump by (a) quiescing DDL/commits
  * with a server-appropriate lock, (b) opening every worker connection
  * inside `START TRANSACTION WITH CONSISTENT SNAPSHOT`, (c) verifying the
  * binlog/GTID position didn't move, then (d) releasing the lock
  * (/root/reference/src/mydumper/mydumper_start_dump.c:605-1035,
  * mydumper_working_thread.c:453-501).
  *
  * On Spark the same split applies: the *control* statements run on one
  * driver-held connection; the *per-partition* statements go through
  * `JDBCOptions.sessionInitStatement` (or an explicit connection pool for
  * strict same-snapshot pinning — plain spark.read.jdbc opens fresh
  * connections per partition, which only GTID-verified modes can make
  * consistent). These strategy objects emit the statement sequences; they
  * are exercised as pure values in tests (no live MySQL in this
  * environment) and by the JDBC path in production.
  */
object Snapshot {

  /** Server flavor (reference server_detect.h:22-31; detection in
    * [[ServerDetect]]). */
  sealed trait Flavor
  case object MySQL extends Flavor       // 5.7/8.x
  case object Percona extends Flavor
  case object MariaDB extends Flavor     // >= 10.5
  case object TiDB extends Flavor
  case object Dolt extends Flavor        // MySQL wire protocol
  case object Google extends Flavor      // CloudSQL; locks like MySQL
  case object RDS extends Flavor         // Aurora; LockAll/SafeNoLock only
  case object ClickHouse extends Flavor
  case object Unknown extends Flavor     // mysql-like by default

  /** Lock mode matrix (reference AUTO/FTWRL/LOCK_ALL/GTID/NO_LOCK/…). */
  sealed trait LockMode
  case object Auto extends LockMode
  case object Ftwrl extends LockMode
  case object LockAll extends LockMode
  case object Gtid extends LockMode
  case object NoLock extends LockMode
  case object SafeNoLock extends LockMode

  /** The reference splits locking into TWO slots acquired in order
    * (mydumper_start_dump.c:693-767, 1243-1283): a DDL-quiesce lock on
    * its own second connection (`LOCK INSTANCE FOR BACKUP`, Percona
    * backup locks, MariaDB `BACKUP STAGE START/BLOCK_DDL`), then the
    * global lock on the control connection (FTWRL / `BACKUP STAGE
    * BLOCK_COMMIT`). Release runs in reverse. [[SnapshotRunner]]
    * executes this plan over live connections. */
  final case class Plan(
      ddlLock: Seq[String],         // DDL-quiesce slot, acquired FIRST
      ddlUnlock: Seq[String],       // released LAST
      controlLock: Seq[String],     // global lock on the control connection
      workerInit: Seq[String],      // sessionInitStatement per worker connection
      controlUnlock: Seq[String],   // after workers synced
      verify: Seq[String],          // position probes (run before + after sync)
      abortOnDrift: Boolean,        // SafeNoLock aborts, NoLock warns
      // Whether the DDL slot runs on its OWN connection: the reference
      // creates a second connection ONLY for Percona 5.7's backup locks
      // (mydumper_start_dump.c:718 `*conn = create_connection()`);
      // everywhere else `second_conn = conn` — MariaDB's BACKUP STAGE
      // ladder in particular is per-session state and MUST share the
      // control session or BLOCK_COMMIT errors with 'stage not started'
      ddlOnSeparateConnection: Boolean = false)

  /** One consistent TiDB snapshot for ALL workers: the control
    * connection reads the current TSO once (`controlProbe`), and every
    * worker pins to THAT value — `SET ... = NOW()` per worker would give
    * each connection its own timestamp, i.e. exactly the cross-worker
    * inconsistency the snapshot machinery exists to prevent (the
    * reference captures one TSO and distributes it,
    * mydumper_start_dump.c:1243-1250). */
  val TidbTsoProbe = "SELECT @@tidb_current_ts"
  def tidbWorkerInit(tso: String): Seq[String] = {
    require(tso.matches("[0-9]+"), s"not a TiDB TSO: $tso")
    Seq(s"SET SESSION tidb_snapshot = $tso")
  }

  /** Resolve Auto to the flavor-specific lock pair (reference
    * mydumper_start_dump.c:693-767 `determine_ddl_lock_function`,
    * 1214-1268). `serverMajor`/`serverMinor` pick version-appropriate
    * statements: `SHOW MASTER STATUS` was replaced by `SHOW BINARY LOG
    * STATUS` in MySQL 8.2 and REMOVED in 8.4; `LOCK INSTANCE FOR
    * BACKUP` exists on MySQL/Percona 8+; Percona 5.7 has its own backup
    * locks; MariaDB's `BACKUP STAGE` arrived in 10.5. */
  def plan(mode: LockMode, flavor: Flavor, tables: Seq[String] = Nil,
      serverMajor: Int = 8, serverMinor: Int = 0,
      // --skip-ddl-locks: nulls the DDL slot in EVERY mode
      // (mydumper_start_dump.c:1237-1240) and demotes MariaDB's BACKUP
      // STAGE ladder to plain FTWRL (:749)
      skipDdlLocks: Boolean = false,
      // --no-backup-locks: suppresses ONLY Percona 5.7's backup-lock
      // pair (mydumper_start_dump.c:707-709)
      noBackupLocks: Boolean = false): Plan = {
    // RDS/Aurora has no FTWRL worth trusting: the reference hard-errors
    // for any mode outside LOCK_ALL / SAFE_NO_LOCK
    // (mydumper_start_dump.c:730-731)
    require(flavor != RDS || mode == LockAll || mode == SafeNoLock,
      "We support LOCK_ALL and SAFE_NO_LOCK modes for RDS/Aurora. " +
        "Select one of them to configure --sync-thread-lock-mode")
    val workerInit = Seq(
      "SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ",
      "SET TIME_ZONE = '+00:00'",
      "START TRANSACTION /*!40108 WITH CONSISTENT SNAPSHOT */")
    val binlogStatus =
      if (serverMajor > 8 || (serverMajor == 8 && serverMinor >= 2))
        "SHOW BINARY LOG STATUS"
      else "SHOW MASTER STATUS"
    val verifyMySQL = Seq(binlogStatus, "SELECT @@gtid_executed")
    val verifyMaria = Seq("SHOW BINLOG STATUS", "SELECT @@gtid_binlog_pos")
    // workers pin to the control connection's TSO — resolved at runtime
    // by SnapshotRunner via TidbTsoProbe + tidbWorkerInit; the
    // placeholder documents the contract for callers that only inspect
    // the plan
    val tidbInit = Seq("SET SESSION tidb_snapshot = <control TSO via TidbTsoProbe>")
    val ftwrl = Seq("FLUSH NO_WRITE_TO_BINLOG TABLES", "FLUSH TABLES WITH READ LOCK")
    // the DDL-quiesce slot (reference determine_ddl_lock_function,
    // mydumper_start_dump.c:693-767): MySQL/Percona/Google hold LOCK
    // INSTANCE FOR BACKUP on major == 8 EXACTLY (`case 8:` — a 9.x
    // server takes default_locking, no instance lock); Percona 5.7 its
    // own pair unless --no-backup-locks; --skip-ddl-locks nulls the
    // slot everywhere (:1237-1240)
    val (ddlLock, ddlUnlock): (Seq[String], Seq[String]) =
      if (skipDdlLocks) (Nil, Nil)
      else flavor match {
        case MySQL | Percona | Google if serverMajor == 8 =>
          (Seq("LOCK INSTANCE FOR BACKUP"), Seq("UNLOCK INSTANCE"))
        case Percona if serverMajor == 5 && serverMinor == 7 && !noBackupLocks =>
          (Seq("LOCK TABLES FOR BACKUP", "LOCK BINLOG FOR BACKUP"),
            Seq("UNLOCK TABLES", "UNLOCK BINLOG"))
        case _ => (Nil, Nil)
      }
    val percona57 = flavor == Percona && serverMajor == 5 && serverMinor == 7 &&
      !noBackupLocks && !skipDdlLocks
    val mariaBackupStage =
      (serverMajor > 10 || (serverMajor == 10 && serverMinor >= 5)) &&
        !skipDdlLocks

    (mode, flavor) match {
      case (NoLock, _) =>
        Plan(Nil, Nil, Nil, workerInit, Nil,
          verifyOf(flavor, verifyMySQL, verifyMaria), abortOnDrift = false)
      case (SafeNoLock, _) =>
        Plan(Nil, Nil, Nil, workerInit, Nil,
          verifyOf(flavor, verifyMySQL, verifyMaria), abortOnDrift = true)
      case (Gtid, TiDB) =>
        Plan(Nil, Nil, Seq(TidbTsoProbe), tidbInit, Nil, Nil, abortOnDrift = true)
      case (Gtid, _) =>
        // workers re-open snapshots until binlog_snapshot_gtid_executed agrees
        Plan(Nil, Nil, Nil, workerInit :+ "SELECT @@binlog_snapshot_gtid_executed",
          Nil, verifyOf(flavor, verifyMySQL, verifyMaria), abortOnDrift = true)
      case (LockAll, _) =>
        // an empty table list would render "LOCK TABLES " — a server-side
        // syntax error at dump start; fail at plan time instead
        require(tables.nonEmpty, "LockAll needs a non-empty table list")
        val lock = s"LOCK TABLES ${tables.map(t => s"$t READ LOCAL").mkString(", ")}"
        Plan(Nil, Nil, Seq(lock), workerInit, Seq("UNLOCK TABLES"),
          verifyOf(flavor, verifyMySQL, verifyMaria), abortOnDrift = false)
      case (Auto, MariaDB) if mariaBackupStage =>
        // DDL slot = START + BLOCK_DDL (no release of its own); global
        // slot = BLOCK_COMMIT, released by BACKUP STAGE END (:606-614,
        // :751-756). Explicit FTWRL mode skips the stages (:749).
        Plan(Seq("BACKUP STAGE START", "BACKUP STAGE BLOCK_DDL"), Nil,
          Seq("BACKUP STAGE BLOCK_COMMIT"), workerInit,
          Seq("BACKUP STAGE END"), verifyMaria, abortOnDrift = false)
      case (Auto, TiDB) =>
        Plan(Nil, Nil, Seq(TidbTsoProbe), tidbInit, Nil, Nil, abortOnDrift = false)
      case (Ftwrl, MariaDB) | (Auto, MariaDB) =>
        // MariaDB < 10.5, or FTWRL forced: plain global FTWRL, no stages
        Plan(Nil, Nil, ftwrl, workerInit, Seq("UNLOCK TABLES"),
          verifyMaria, abortOnDrift = false)
      case (Ftwrl, _) | (Auto, _) =>
        // FTWRL global lock; the flavor/version DDL slot rides along
        // (reference keeps determine_ddl_lock_function in FTWRL mode too,
        // :1229-1232). Only Percona 5.7's backup locks get their own
        // connection (:718); LOCK INSTANCE shares the control session.
        // Dolt/Unknown/ClickHouse reach here via the reference's
        // default_locking branch (:765-766).
        Plan(ddlLock, ddlUnlock, ftwrl, workerInit, Seq("UNLOCK TABLES"),
          verifyOf(flavor, verifyMySQL, verifyMaria), abortOnDrift = false,
          ddlOnSeparateConnection = percona57)
    }
  }

  private def verifyOf(f: Flavor, mysql: Seq[String], maria: Seq[String]): Seq[String] =
    f match { case MariaDB => maria; case _ => mysql }

  /** Two-phase ordering (T4): non-transactional tables extract under the
    * lock, transactional ones inside the snapshot after unlock. */
  def phases(tables: Seq[(String, Boolean)]): (Seq[String], Seq[String]) = {
    val (trx, nonTrx) = tables.partition(_._2)
    (nonTrx.map(_._1), trx.map(_._1))
  }

  /** T5 — savepoint trick: statements wrapping each table's scan so the
    * server can release that table's MVCC history while the long
    * snapshot transaction stays open
    * (mydumper_working_thread.c:406-420,988). Issue the first before the
    * table's chunk scans on a worker connection, the second after. */
  def savepointAround(name: String = "graft"): (String, String) = {
    require(name.matches("[A-Za-z0-9_]+"), s"unsafe savepoint name: $name")
    (s"SAVEPOINT $name", s"ROLLBACK TO SAVEPOINT $name")
  }
}

package graft.extract

/** T6 — replica handling for consistent dumps taken FROM a replica
  * (reference: `src/mydumper/mydumper_start_dump.c:957-1010`
  * `m_stop_replica`, `:1440-1470` restart;
  * `src/server_detect.c:181-260` `detect_replica` verb matrix;
  * `src/mydumper/mydumper_working_thread.c:575-673`
  * `write_replica_info` coordinate capture).
  *
  * The reference stops the replica's SQL-applier thread before the dump
  * (so `Exec_Master_Log_Pos` freezes at a consistent point), records the
  * applied-source coordinates in the dump metadata (enough to seed
  * `CHANGE MASTER` / `CHANGE REPLICATION SOURCE` on a restored server),
  * and restarts the applier afterwards. On Spark the same statements run
  * driver-side on the control connection around the chunked read action —
  * this object emits the statement plans and parses the status row, in
  * the same pure-value style as [[Snapshot]] (no live MySQL here; the
  * verbs/parse logic is spec-tested and the manifest round-trips).
  */
object Replica {
  import Snapshot.{Flavor, MariaDB, TiDB}

  /** How replication is controlled (reference `source_control_command`):
    * managed services deny SUPER, so AWS RDS/Aurora routes through
    * `CALL mysql.rds_*` procedures instead of STOP/START statements. */
  sealed trait Control
  case object Traditional extends Control
  case object AwsRds extends Control

  /** The server's replication vocabulary. MySQL renamed SLAVE→REPLICA at
    * 8.0.22 and MariaDB at 10.5.1 (reference keys REPLICA off ≥10.6 to
    * dodge early-10.5 gaps — mirrored here); older servers only accept
    * the SLAVE spellings. */
  final case class Verbs(
      showStatus: String,
      showAllStatus: Option[String], // MariaDB multisource only
      stopSqlThread: String,
      start: String,
      reset: String,
      changeSource: String)

  def verbs(flavor: Flavor, major: Int, minor: Int, patch: Int,
      control: Control = Traditional): Verbs = control match {
    case AwsRds =>
      // reference common.h:27,30 + server_detect.c:249-258. The rds_*
      // source-named procedures landed with the 8.0.23 verb rename —
      // same cutoff as the Traditional branch below (the old
      // `minor > 0` test misclassified both 8.0.23+ and 9.x as legacy)
      val src =
        if (major > 8 || (major == 8 && (minor > 0 || patch >= 23))) "source"
        else "master"
      Verbs(
        showStatus = "SHOW SLAVE STATUS", showAllStatus = None,
        stopSqlThread = "CALL mysql.rds_stop_replication()",
        start = "CALL mysql.rds_start_replication()",
        reset = "CALL mysql.rds_reset_external_master()",
        changeSource = s"CALL mysql.rds_set_external_$src")
    case Traditional =>
      val replicaEra = flavor match {
        case MariaDB => major > 10 || (major == 10 && minor >= 6)
        case TiDB    => false // TiDB has no binlog replica applier
        case _       => // MySQL/Percona lineage: >= 8.0.22
          major > 8 || (major == 8 && (minor > 0 || patch >= 22))
      }
      if (replicaEra)
        Verbs(
          showStatus = "SHOW REPLICA STATUS",
          showAllStatus =
            if (flavor == MariaDB) Some("SHOW ALL REPLICAS STATUS") else None,
          stopSqlThread = "STOP REPLICA SQL_THREAD",
          start = "START REPLICA",
          reset = "RESET REPLICA",
          changeSource = "CHANGE REPLICATION SOURCE")
      else
        Verbs(
          showStatus = "SHOW SLAVE STATUS",
          showAllStatus =
            if (flavor == MariaDB) Some("SHOW ALL SLAVES STATUS") else None,
          stopSqlThread = "STOP SLAVE SQL_THREAD",
          start = "START SLAVE",
          reset = "RESET SLAVE",
          changeSource = "CHANGE MASTER")
  }

  /** Replica coordinates at dump time: the source position the applier
    * had EXECUTED (not merely downloaded) when it was stopped — the
    * point a restore must resume replication from. */
  final case class Coords(
      sourceHost: String,
      sourceLogFile: String,
      sourceLogPos: Long,
      gtid: Option[String] = None,
      channel: Option[String] = None)

  /** Control-connection statements before the chunk reads: probe status
    * (multisource-aware on MariaDB — reference checks
    * `@@default_master_connection` first), then stop the SQL thread.
    * Returned as (probes, stop) so the caller can skip the stop when the
    * probe shows no replication configured, as the reference does. */
  def stopPlan(v: Verbs, multisource: Boolean = false): (Seq[String], String) = {
    val probe = if (multisource) v.showAllStatus.getOrElse(v.showStatus)
                else v.showStatus
    (Seq(probe), v.stopSqlThread)
  }

  /** After the read action completes (success or abort): restart the
    * applier. Only issued if the stop actually ran (reference tracks
    * `replica_stopped`). */
  def startPlan(v: Verbs): Seq[String] = Seq(v.start)

  /** Parse coordinates from a SHOW SLAVE/REPLICA STATUS row (column→value,
    * case preserved as returned by the server). Accepts both vocabulary
    * eras, exactly the alternates the reference matches
    * (`mydumper_working_thread.c:609-623`). Returns None when the server
    * is not a replica (no Master_Host/Source_Host). */
  def coordsOf(row: Map[String, String]): Option[Coords] = {
    val m = row.map { case (k, vv) => k.toLowerCase -> vv }
    def first(keys: String*): Option[String] =
      keys.iterator.map(m.get).collectFirst { case Some(s) if s.nonEmpty => s }
    for {
      host <- first("master_host", "source_host")
      log  <- first("relay_master_log_file", "relay_source_log_file")
      pos  <- first("exec_master_log_pos", "exec_source_log_pos")
    } yield Coords(
      sourceHost = host,
      sourceLogFile = log,
      sourceLogPos = pos.toLong,
      gtid = first("executed_gtid_set", "gtid_slave_pos", "gtid_source_pos")
        .map(_.replace("\n", "")),
      channel = first("connection_name", "channel_name").filter(_.length > 1))
  }

  /** The restore-side statement seeded from the captured coordinates —
    * what the reference writes into the metadata `[replication]` section
    * for myloader to optionally execute. `autoPosition` switches to
    * GTID auto-positioning (coords kept as comments in the reference;
    * here the file/pos clauses are simply omitted). */
  def changeSourceStatement(v: Verbs, c: Coords,
      autoPosition: Boolean = false): String = {
    val forChannel = c.channel.map(ch => s" FOR CHANNEL '$ch'").getOrElse("")
    val newEra = v.changeSource.startsWith("CHANGE REPLICATION")
    val (fileK, posK, autoK) =
      if (newEra) ("SOURCE_LOG_FILE", "SOURCE_LOG_POS", "SOURCE_AUTO_POSITION")
      else ("MASTER_LOG_FILE", "MASTER_LOG_POS", "MASTER_AUTO_POSITION")
    val opts =
      if (autoPosition) s"$autoK = 1"
      else s"$fileK = '${c.sourceLogFile}', $posK = ${c.sourceLogPos}"
    s"${v.changeSource} TO $opts$forChannel"
  }

  /** Serialize coords into the manifest's `sourcePosition` slot (and
    * back) so a dump taken from a replica carries its resume point —
    * the analog of the reference's metadata `[replication]` section. */
  def toManifestPosition(c: Coords): String =
    Seq(
      Some(s"host=${c.sourceHost}"),
      Some(s"file=${c.sourceLogFile}"),
      Some(s"pos=${c.sourceLogPos}"),
      c.gtid.map(g => s"gtid=$g"),
      c.channel.map(ch => s"channel=$ch")).flatten.mkString(";")

  def fromManifestPosition(s: String): Option[Coords] = {
    val kv = s.split(';').iterator.map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap
    for {
      host <- kv.get("host")
      file <- kv.get("file")
      pos  <- kv.get("pos").flatMap(p => scala.util.Try(p.toLong).toOption)
    } yield Coords(host, file, pos, kv.get("gtid"), kv.get("channel"))
  }
}

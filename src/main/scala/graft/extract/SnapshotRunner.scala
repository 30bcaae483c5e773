package graft.extract

import java.sql.Connection

/** Executes a [[Snapshot.Plan]] over live JDBC connections in the
  * reference's phase order (mydumper_start_dump.c:1243-1283):
  *
  *  1. DDL lock on its own connection (`LOCK INSTANCE FOR BACKUP`,
  *     Percona backup locks, MariaDB `BACKUP STAGE START/BLOCK_DDL`);
  *  2. global lock on the control connection — FTWRL runs as
  *     flush-then-lock with bounded retries (the reference's
  *     `ftwrl_timeout_retries` loop, mydumper_start_dump.c:646-668);
  *     a TiDB plan's "lock" is the TSO probe, whose result every
  *     worker (and the control session itself) pins to (:668-678);
  *  3. verify-probe capture (binlog/GTID position) before workers open
  *     their snapshots;
  *  4. per-worker session init;
  *  5. re-verify once all workers hold snapshots — drift aborts when
  *     the plan says so (SafeNoLock/Gtid, T3) and warns otherwise;
  *  6. release: global lock first, DDL lock last (reverse of acquire).
  *
  * The runner talks plain `java.sql` so it is execution-testable
  * against any recording driver (SnapshotReplaySpec) and usable as-is
  * against a live server.
  */
object SnapshotRunner {

  /** In-flight snapshot: TSO-resolved worker init + the pre-sync
    * position capture the release phase compares against. */
  final case class Started(
      plan: Snapshot.Plan,
      workerInit: Seq[String],
      preVerify: Seq[Seq[String]])

  /** Execute one statement; if it yields a result set, return its rows
    * as strings (column order preserved). */
  private def exec(conn: Connection, sql: String): Seq[Seq[String]] = {
    val st = conn.createStatement()
    try {
      if (st.execute(sql)) {
        val rs = st.getResultSet
        try {
          val n = rs.getMetaData.getColumnCount
          val rows = Seq.newBuilder[Seq[String]]
          while (rs.next()) rows += (1 to n).map(i => String.valueOf(rs.getString(i)))
          rows.result()
        } finally rs.close()
      } else Nil
    } finally st.close()
  }

  /** Lock statements retry on SQLException up to `retries` extra
    * attempts — FTWRL can time out behind a long-running query and the
    * reference loops rather than fail the dump
    * (mydumper_start_dump.c:652-663). */
  private def execWithRetry(conn: Connection, sql: String, retries: Int): Seq[Seq[String]] = {
    var attempt = 0
    while (true) {
      try return exec(conn, sql)
      catch {
        case e: java.sql.SQLException =>
          attempt += 1
          if (attempt > retries) throw e
      }
    }
    Nil // unreachable
  }

  private val TsoPlaceholder = "<control TSO via TidbTsoProbe>"

  /** Phases 1-3: acquire locks, resolve the TiDB TSO into the worker
    * init, capture the pre-sync verify probes. `ddl` is the second
    * connection used ONLY when the plan says the DDL slot needs its own
    * session (Percona 5.7 backup locks, mydumper_start_dump.c:718);
    * every other flavor's DDL statements — MariaDB's per-session
    * BACKUP STAGE ladder in particular — run on the control
    * connection, exactly as the reference's `second_conn = conn`. */
  def start(control: Connection, ddl: Connection, plan: Snapshot.Plan,
      lockRetries: Int = 2): Started = {
    val ddlConn = if (plan.ddlOnSeparateConnection) ddl else control
    plan.ddlLock.foreach(s => execWithRetry(ddlConn, s, lockRetries))
    val probeRows = plan.controlLock.flatMap(s => execWithRetry(control, s, lockRetries))
    val workerInit =
      if (plan.workerInit.exists(_.contains(TsoPlaceholder))) {
        val tso = probeRows.headOption.flatMap(_.headOption).getOrElse(
          throw new IllegalStateException("TiDB TSO probe returned no rows"))
        val resolved = plan.workerInit.map {
          case s if s.contains(TsoPlaceholder) => Snapshot.tidbWorkerInit(tso).head
          case s => s
        }
        // the control session pins to the same TSO as the workers
        // (reference set_tidb_snapshot(conn), :676-677)
        resolved.foreach(s => exec(control, s))
        resolved
      } else plan.workerInit
    val pre = plan.verify.map(v => exec(control, v).flatten)
    Started(plan, workerInit, pre)
  }

  /** Phase 4: one call per worker connection, each statement executed
    * individually (MySQL Connector/J rejects multi-statement init). */
  def initWorker(worker: Connection, started: Started): Unit =
    started.workerInit.foreach(s => exec(worker, s))

  /** Phases 5-6: re-probe, enforce the drift policy, then release in
    * reverse order. Returns the post-sync capture for the manifest. */
  def finish(control: Connection, ddl: Connection, started: Started): Seq[Seq[String]] = {
    val post = started.plan.verify.map(v => exec(control, v).flatten)
    if (post != started.preVerify) {
      val msg = s"source position moved while workers synced: " +
        s"${started.preVerify} -> $post"
      if (started.plan.abortOnDrift) throw new IllegalStateException(msg)
      else System.err.println(s"[snapshot] WARNING: $msg (continuing, NoLock policy)")
    }
    started.plan.controlUnlock.foreach(s => exec(control, s))
    val ddlConn = if (started.plan.ddlOnSeparateConnection) ddl else control
    started.plan.ddlUnlock.foreach(s => exec(ddlConn, s))
    post
  }
}

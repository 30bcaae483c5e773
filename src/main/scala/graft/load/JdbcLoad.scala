package graft.load

import org.apache.spark.sql.{DataFrame, SaveMode}

/** The JDBC restore surface (SURVEY §2.1 S12, §2.9 L4): maps the
  * reference's loader knobs onto `df.write.jdbc` options.
  *
  *  - `--rows` batch splitting        → `batchsize`
  *  - `--threads` connection pool     → `numPartitions` (one connection
  *    per partition; repartition if the plan has more)
  *  - overwrite modes FAIL/TRUNCATE/DROP (myloader.h:35) →
  *    SaveMode.ErrorIfExists / `truncate=true` + Overwrite / Overwrite
  *  - session defaults (UNIQUE_CHECKS=0 etc., mydumper.cnf:40-44) →
  *    [[GraftConnectionProvider]] (NOT `sessionInitStatement`, which
  *    only the read path consumes — the write path would silently skip
  *    the init; the provider hook covers both paths, one statement per
  *    execute, no allowMultiQueries requirement)
  *
  * Like JdbcExtract, exercised by spec on the generated options — no
  * live MySQL in this environment (the provider itself is spec'd
  * against a fake java.sql.Driver).
  */
object JdbcLoad {

  sealed trait Overwrite
  object Overwrite {
    case object Fail extends Overwrite      // error if table exists
    case object Truncate extends Overwrite  // keep DDL, truncate + insert
    case object Drop extends Overwrite      // drop + recreate
    case object Delete extends Overwrite    // keep DDL, DELETE FROM + insert
    case object Append extends Overwrite    // the reference's NONE
  }

  /** Pre-restore purge of an EXISTING target table on a live connection
    * — the loader's overwrite_table switch (myloader_restore_job.c:
    * 121-168, purge modes myloader.h:35):
    *
    *  - `Drop`     → `DROP TABLE IF EXISTS` (:127-138; the caller then
    *    replays the dump's DDL, like the reference's CREATE retry path).
    *    Engines without IF EXISTS (Derby) swallow the missing-object
    *    error instead.
    *  - `Truncate` → `TRUNCATE TABLE` (:140-150) — DDL and indexes stay.
    *  - `Delete`   → `DELETE FROM` (:151-162) — transactional row purge.
    *  - `Fail`     → restoring onto an existing table is an error (the
    *    default purge_mode, myloader_restore_job.c:44): probe catalog
    *    metadata and throw if present.
    *  - `Append`   → no purge (the reference's NONE).
    */
  def purge(conn: java.sql.Connection, db: String, table: String,
      mode: Overwrite, quote: String = "\""): Unit = {
    val q = quote
    val target = s"$q$db$q.$q$table$q"
    def exec(sql: String, swallowMissing: Boolean): Unit = {
      val st = conn.createStatement()
      try st.execute(sql)
      catch {
        case e: java.sql.SQLException
          if swallowMissing &&
            (e.getSQLState == "42Y55" || e.getSQLState == "42X05" ||
              Option(e.getMessage).exists(_.toLowerCase.contains("does not exist"))) => ()
      } finally st.close()
    }
    def exists: Boolean = {
      val rs = conn.getMetaData.getTables(null, db, table, null)
      try rs.next() finally rs.close()
    }
    mode match {
      case Overwrite.Drop =>
        exec(s"DROP TABLE $target", swallowMissing = true)
      case Overwrite.Truncate =>
        exec(s"TRUNCATE TABLE $target", swallowMissing = false)
      case Overwrite.Delete =>
        exec(s"DELETE FROM $target", swallowMissing = false)
      case Overwrite.Fail =>
        if (exists) throw new IllegalStateException(
          s"table $db.$table already exists and purge mode is FAIL " +
            "(myloader_restore_job.c:44 default)")
      case Overwrite.Append => ()
    }
  }

  final case class Spec(
      mode: SaveMode,
      options: Map[String, String])

  /** The loader's per-connection session statement list, exactly as the
    * reference composes it (myloader.c:515-591): flavor base defaults →
    * loader extras (AUTOCOMMIT with batched commits, SQL_LOG_BIN) →
    * defaults-file `myloader_session_variables*` per-product groups →
    * --ignore-set removal → render with the FOREIGN_KEY_CHECKS=0
    * auto-default. Feed the result to [[spec]]'s `sessionStatements`. */
  def sessionInit(info: graft.extract.ServerDetect.ServerInfo,
      commitCount: Int = 1000, enableBinlog: Boolean = false,
      ini: Option[graft.core.DefaultsFile.Ini] = None,
      ignoreSet: Seq[String] = Nil): Seq[String] = {
    import graft.extract.SessionVariables
    var v = SessionVariables.loaderBase(info, commitCount, enableBinlog)
    ini.foreach(i => v = SessionVariables.applyConfig(v, i,
      "myloader_session_variables", info))
    v = SessionVariables.removeIgnored(v, ignoreSet)
    SessionVariables.renderSession(v)
  }

  def spec(url: String, table: String, user: String, password: String,
      overwrite: Overwrite = Overwrite.Append,
      batchSize: Int = 1000,             // reference queries-per-transaction
      connections: Int = 4,              // reference --threads
      disableChecks: Boolean = true,
      sessionStatements: Option[Seq[String]] = None): Spec = {
    val (mode, extra) = overwrite match {
      case Overwrite.Fail     => (SaveMode.ErrorIfExists, Map.empty[String, String])
      case Overwrite.Truncate => (SaveMode.Overwrite, Map("truncate" -> "true"))
      case Overwrite.Drop     => (SaveMode.Overwrite, Map.empty[String, String])
      // Delete purges rows via [[purge]] on a live connection first;
      // the write itself then appends into the kept DDL
      case Overwrite.Delete   => (SaveMode.Append, Map.empty[String, String])
      case Overwrite.Append   => (SaveMode.Append, Map.empty[String, String])
    }
    val session = sessionStatements match {
      case Some(stmts) => GraftConnectionProvider.options(stmts)
      case None if disableChecks =>
        GraftConnectionProvider.options(Seq(
          "SET UNIQUE_CHECKS=0", "SET FOREIGN_KEY_CHECKS=0", "SET SQL_LOG_BIN=0"))
      case None => Map.empty[String, String]
    }
    Spec(mode, Map(
      "url" -> url, "dbtable" -> table,
      "user" -> user, "password" -> password,
      "batchsize" -> batchSize.toString,
      "numPartitions" -> connections.toString,
      "isolationLevel" -> "READ_COMMITTED") ++ extra ++ session)
  }

  def write(df: DataFrame, s: Spec): Unit =
    df.write.format("jdbc").mode(s.mode).options(s.options).save()
}

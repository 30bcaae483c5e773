package graft.load

import java.sql.{Connection, Driver}
import java.util.Properties

import org.apache.spark.sql.jdbc.JdbcConnectionProvider

/** Per-connection session initialization for BOTH jdbc read and write
  * paths, as a [[JdbcConnectionProvider]] (Spark's public SPI; every
  * connection — JDBCRDD partition reads AND JdbcUtils.savePartition
  * writes — is created through `ConnectionProvider.create`, which
  * dispatches here when the `connectionProvider` option names us).
  *
  * This replaces two broken mappings of the reference's session setup
  * (mydumper.cnf:40-44 `UNIQUE_CHECKS=0` etc., and the dump-side worker
  * init, mydumper_working_thread.c detect_quote_character era):
  *  - `sessionInitStatement` is consumed only by the READ path
  *    (JDBCRDD); `df.write.format("jdbc")` silently ignores it.
  *  - JDBCRDD runs the option as ONE `Statement.execute`, so ';'-joined
  *    statements fail on MySQL Connector/J unless `allowMultiQueries=
  *    true` is in the URL.
  * Here each statement executes individually on every fresh connection,
  * so multi-statement init works on any driver, on both paths.
  *
  * Registered via ServiceLoader
  * (`META-INF/services/org.apache.spark.sql.jdbc.JdbcConnectionProvider`);
  * selected deterministically by setting the jdbc option
  * `connectionProvider=graftSessionInit` alongside
  * [[GraftConnectionProvider.InitOption]].
  */
object GraftConnectionProvider {
  val Name = "graftSessionInit"
  val InitOption = "graft.sessionInitStatements"

  /** When set (to the pool size = worker count), connections come from
    * [[PinnedConnectionPool]] — N physical members per executor whose
    * session init (and therefore MVCC snapshot) runs once and survives
    * partition-read close() calls, the reference's worker model. */
  val PoolOption = "graft.pinnedPoolSize"

  /** Statements are joined with RS (0x1e) — a control char that cannot
    * appear in SQL text — so statements containing ';' survive. */
  val Separator = "\u001e"

  /** Option keys that are Spark-side (or ours) and must not leak to the
    * JDBC driver as connection properties. */
  private val NonDriverKeys = // all lowercase: compared via k.toLowerCase
    Set(InitOption.toLowerCase, PoolOption.toLowerCase,
      "connectionprovider", "dbtable", "query", "url",
      "numpartitions", "partitioncolumn", "lowerbound", "upperbound",
      "truncate", "isolationlevel", "sessioninitstatement")

  /** The jdbc options that route connection creation through this
    * provider with the given init statements; `pinnedPool = Some(n)`
    * additionally pins n snapshot-holding connections per JVM. */
  def options(statements: Seq[String],
      pinnedPool: Option[Int] = None): Map[String, String] = {
    val base =
      if (statements.isEmpty) Map.empty[String, String]
      else Map(
        InitOption -> statements.mkString(Separator),
        "connectionProvider" -> Name)
    pinnedPool match {
      case Some(n) =>
        base + (PoolOption -> n.toString) + ("connectionProvider" -> Name)
      case None => base
    }
  }

  private[load] def statementsOf(options: Map[String, String]): Seq[String] =
    options.get(InitOption).toSeq
      .flatMap(_.split(Separator)).map(_.trim).filter(_.nonEmpty)
}

class GraftConnectionProvider extends JdbcConnectionProvider {
  import GraftConnectionProvider._

  override val name: String = Name

  override def canHandle(driver: Driver, options: Map[String, String]): Boolean =
    options.contains(InitOption) || options.contains(PoolOption)

  override def getConnection(driver: Driver, options: Map[String, String]): Connection =
    options.get(PoolOption) match {
      case Some(size) =>
        PinnedConnectionPool.checkout(
          PinnedConnectionPool.Key(options("url"), options.getOrElse("user", "")),
          size.toInt, statementsOf(options), () => rawConnect(driver, options))
      case None =>
        val conn = rawConnect(driver, options)
        try {
          val st = conn.createStatement()
          try statementsOf(options).foreach(st.execute)
          finally st.close()
          conn
        } catch { case e: Throwable =>
          try conn.close() catch { case _: Throwable => () }
          throw e
        }
    }

  private def rawConnect(driver: Driver, options: Map[String, String]): Connection = {
    val props = new Properties()
    options.foreach { case (k, v) =>
      if (!NonDriverKeys.contains(k.toLowerCase)) props.setProperty(k, v)
    }
    val conn = driver.connect(options("url"), props)
    require(conn != null, s"driver refused url ${options("url")}")
    conn
  }

  override def modifiesSecurityContext(
      driver: Driver, options: Map[String, String]): Boolean = false
}

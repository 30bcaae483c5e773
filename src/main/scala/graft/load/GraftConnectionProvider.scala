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

  /** Statements are joined with RS (0x1e) — a control char that cannot
    * appear in SQL text — so statements containing ';' survive. */
  val Separator = "\u001e"

  /** Option keys that are Spark-side (or ours) and must not leak to the
    * JDBC driver as connection properties. */
  private val NonDriverKeys =
    Set(InitOption, "connectionprovider", "dbtable", "query", "url",
      "numpartitions", "partitioncolumn", "lowerbound", "upperbound",
      "truncate", "isolationlevel", "sessioninitstatement")

  /** The jdbc options that route connection creation through this
    * provider with the given init statements. */
  def options(statements: Seq[String]): Map[String, String] =
    if (statements.isEmpty) Map.empty
    else Map(
      InitOption -> statements.mkString(Separator),
      "connectionProvider" -> Name)

  private[load] def statementsOf(options: Map[String, String]): Seq[String] =
    options.get(InitOption).toSeq
      .flatMap(_.split(Separator)).map(_.trim).filter(_.nonEmpty)
}

class GraftConnectionProvider extends JdbcConnectionProvider {
  import GraftConnectionProvider._

  override val name: String = Name

  override def canHandle(driver: Driver, options: Map[String, String]): Boolean =
    options.contains(InitOption)

  override def getConnection(driver: Driver, options: Map[String, String]): Connection = {
    val props = new Properties()
    options.foreach { case (k, v) =>
      if (!NonDriverKeys.contains(k.toLowerCase)) props.setProperty(k, v)
    }
    val conn = driver.connect(options("url"), props)
    require(conn != null, s"driver refused url ${options("url")}")
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

  override def modifiesSecurityContext(
      driver: Driver, options: Map[String, String]): Boolean = false
}

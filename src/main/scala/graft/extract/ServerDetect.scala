package graft.extract

import java.sql.Connection

/** Server product/version detection (reference src/server_detect.c) —
  * the probe chain that picks the lock matrix, replica vocabulary, and
  * case-sensitivity wrappers before any extraction starts.
  *
  * Mirrored exactly:
  *   - product precedence percona > mariadb > tidb > dolt > google >
  *     mysql/"source", case-insensitive substring over BOTH
  *     `@@version_comment` and `@@version` (detect_product,
  *     server_detect.c:78-103);
  *   - unknown product → ClickHouse probe (`SHOW DATABASES LIKE
  *     'system'` then `system.build_options` VERSION_FULL,
  *     :126-145) → Aurora probe (`SHOW GLOBAL VARIABLES LIKE
  *     'aurora_version'` → RDS, :147-152) → 0.0.0;
  *   - version triple via strtol per dot-segment (detect_version,
  *     :106-110): leading digits parse, trailing garbage ignored
  *     ("40-azure" → 40), absent/non-numeric → 0;
  *   - `--server-version <product>-<major.minor.rev>` override with the
  *     reference's exact two-part / three-segment validation
  *     (server_detect:260-276);
  *   - `@@lower_case_table_names` ≠ 0 → wrap name comparisons in
  *     `CAST(… AS BINARY)` (detect_lower_case_table_names, :166-180;
  *     CAST/AS_BINARY common.h:54-55).
  *
  * Every probe is failure-tolerant (the reference m_warns and moves on):
  * a dialect that lacks the variable simply leaves the product Unknown.
  */
object ServerDetect {
  import Snapshot._

  final case class ServerInfo(flavor: Flavor, major: Int, secondary: Int,
      revision: Int) {
    /** is_mysql_like (server_detect.c:70-72). */
    def mysqlLike: Boolean = flavor match {
      case Percona | MariaDB | MySQL | Dolt | Unknown | RDS | Google => true
      case _ => false
    }
    /** server_support_tablespaces (server_detect.c:74-76). */
    def supportsTablespaces: Boolean = flavor match {
      case Percona | MySQL | Unknown | RDS => true
      case _ => false
    }
  }

  /** detect_product (server_detect.c:78-103): first match in precedence
    * order over either string wins; "source" (as in "Source
    * distribution") counts as MySQL. */
  def detectProduct(versionComment: Option[String],
      version: Option[String]): Flavor = {
    val hay = Seq(versionComment, version).flatten.map(_.toLowerCase)
    def has(s: String) = hay.exists(_.contains(s))
    if (has("percona")) Percona
    else if (has("mariadb")) MariaDB
    else if (has("tidb")) TiDB
    else if (has("dolt")) Dolt
    else if (has("google")) Google
    else if (has("mysql") || has("source")) MySQL
    else Unknown
  }

  /** strtol(seg, NULL, 10): optional sign + leading digits; anything
    * else (including empty) parses 0. */
  private[extract] def strtol(s: String): Int = {
    val t = s.trim
    val digits = t.takeWhile(_.isDigit) match {
      case "" if t.startsWith("-") => "-" + t.drop(1).takeWhile(_.isDigit)
      case d => d
    }
    if (digits.isEmpty || digits == "-") 0
    else try digits.toInt catch { case _: NumberFormatException => 0 }
  }

  /** detect_version over a dot-split with limit 3 (server_detect.c:
    * 106-110,155): "8.0.40-azure" → (8,0,40); missing segments → 0. */
  def parseVersion(v: String): (Int, Int, Int) = {
    val p = v.split("\\.", 3)
    (strtol(p.lift(0).getOrElse("")),
     strtol(p.lift(1).getOrElse("")),
     strtol(p.lift(2).getOrElse("")))
  }

  /** `--server-version` override (server_detect.c:260-276): must be
    * `<product>-<version>` and the version must have three dot
    * segments, with the reference's exact error otherwise. */
  def fromArg(arg: String): ServerInfo = {
    val parts = arg.split("-", 2)
    def fail() = throw new IllegalArgumentException(
      "Not able to correctly determine the product and version which " +
        "should be <product>-<version> where version will 3 number " +
        "delimited by dots")
    if (parts.length != 2) fail()
    val flavor = detectProduct(Some(parts(0)), Some(parts(1)))
    if (parts(1).split("\\.", -1).length != 3) fail()
    val (ma, mi, re) = parseVersion(parts(1))
    ServerInfo(flavor, ma, mi, re)
  }

  /** One row of strings from a probe query; None when the statement
    * errors (dialect lacks it) or returns no row — the reference's
    * m_warning-and-continue. */
  private def probeRow(conn: Connection, sql: String, cols: Int): Option[Seq[String]] =
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        try {
          if (rs.next()) Some((1 to cols).map(i => Option(rs.getString(i)).getOrElse("")))
          else None
        } finally rs.close()
      } finally st.close()
    } catch { case _: java.sql.SQLException => None }

  /** detect_server_version (server_detect.c:113-164): the live probe
    * chain. Probe order and short-circuits are execution-asserted in
    * ServerDetectSpec against a recording fake driver. */
  def detect(conn: Connection): ServerInfo = {
    val first = probeRow(conn, "SELECT @@version_comment, @@version", 2)
    val comment = first.map(_(0))
    val version = first.map(_(1))
    var product = detectProduct(comment, version)
    var ver = version.getOrElse("0.0.0")

    if (product == Unknown) {
      val hasSystemDb = probeRow(conn, "SHOW DATABASES LIKE 'system'", 1)
      val buildOptions = if (hasSystemDb.isDefined)
        probeRow(conn,
          "SELECT value FROM system.build_options where name='VERSION_FULL' LIMIT 1", 1)
      else None
      buildOptions match {
        case Some(Seq(full)) =>
          // "ClickHouse 24.1.2.33 …" → product + version from token 2;
          // a VERSION_FULL without "clickhouse" short-circuits the
          // remaining probes with version 0.0.0 (the goto cleanup path)
          val lower = full.toLowerCase
          if (lower.contains("clickhouse") ||
              comment.exists(_.toLowerCase.contains("clickhouse"))) {
            product = ClickHouse
            ver = lower.split(" ", 2).lift(1).getOrElse("0.0.0")
          } else ver = "0.0.0"
        case None =>
          if (probeRow(conn,
              "SHOW GLOBAL VARIABLES LIKE 'aurora_version'", 1).isDefined)
            product = RDS // version stays @@version (server_detect.c:150-151)
          else ver = "0.0.0"
      }
    }
    val (ma, mi, re) = parseVersion(ver)
    ServerInfo(product, ma, mi, re)
  }

  /** detect_lower_case_table_names (server_detect.c:166-180): on a
    * case-folding server, name comparisons wrap in `CAST( <col> AS
    * BINARY)` — the exact macro pair (common.h:54-55), spacing supplied
    * by the interpolation site (e.g. `SHOW FUNCTION STATUS WHERE %s Db
    * %s = '…'`, mydumper_jobs.c:706). */
  def caseSensitivity(conn: Connection): (String, String) = {
    val folds = probeRow(conn, "SELECT @@lower_case_table_names", 1)
      .exists(r => strtol(r.head) != 0)
    if (folds) ("CAST(", "AS BINARY)") else ("", "")
  }
}

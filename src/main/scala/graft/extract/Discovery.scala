package graft.extract

import java.sql.Connection

import graft.core.{ColumnMeta, TableMeta}

/** S2/S3 — catalog discovery over a live JDBC source: enumerate schemas
  * and tables, hydrate [[TableMeta]] (columns with ordinal/type/null,
  * primary key, row estimate), and apply [[TableFilter]] — the engine
  * analog of the reference's database walk (`SHOW DATABASES` →
  * `SHOW TABLE STATUS` → per-table column probes,
  * `src/mydumper/mydumper_databases.c`,
  * `mydumper_working_thread.c:1150-1260`).
  *
  * Implemented over `java.sql.DatabaseMetaData`, not vendor SQL: the
  * same calls resolve on MySQL, MariaDB, Derby, anything with a JDBC
  * driver — which is also what lets the discovery path run live in this
  * environment (`DerbyRoundTripSpec`). Engine/rows, which standard
  * metadata does not expose, are left for the vendor-specific probe the
  * caller may layer on (`SHOW TABLE STATUS` on MySQL lineage); filters
  * that depend on them degrade gracefully (empty engine matches no
  * ignore-list entry; rows = -1 means "unknown" to the chunk chooser,
  * which then probes bounds itself).
  *
  * All calls run on the driver-side control connection — discovery is
  * control-plane metadata (thousands of rows at most), never a Spark
  * job.
  */
object Discovery {

  /** Whether this driver exposes databases as JDBC CATALOGS rather than
    * schemas: MySQL Connector/J (default databaseTerm=CATALOG) returns
    * an EMPTY getSchemas() result and matches databases through the
    * catalog argument — schema-based lookups silently discover nothing
    * on the very server family the dumper targets. Derby/Postgres-style
    * drivers populate getSchemas. Decide by what the driver reports. */
  private def usesCatalogs(conn: Connection): Boolean = {
    val rs = conn.getMetaData.getSchemas
    try !rs.next() finally rs.close()
  }

  /** All non-system database names (the reference's SHOW DATABASES minus
    * its hardcoded system-schema skips — TableFilter owns that policy,
    * so here every database is returned), from whichever namespace axis
    * the driver uses (schemas, or catalogs on MySQL lineage). */
  def schemas(conn: Connection): Seq[String] =
    if (usesCatalogs(conn)) {
      val rs = conn.getMetaData.getCatalogs
      try {
        val out = Seq.newBuilder[String]
        while (rs.next()) out += rs.getString("TABLE_CAT")
        out.result()
      } finally rs.close()
    } else {
      val rs = conn.getMetaData.getSchemas
      try {
        val out = Seq.newBuilder[String]
        while (rs.next()) out += rs.getString("TABLE_SCHEM")
        out.result()
      } finally rs.close()
    }

  /** Escape `_`/`%` in an identifier used where JDBC expects a PATTERN
    * (getColumns/getPrimaryKeys table argument): underscored table names
    * are the norm in MySQL schemas, and unescaped they match sibling
    * tables (`order_items` also matches `order1items`), merging foreign
    * columns into the TableMeta. */
  private def escapePattern(md: java.sql.DatabaseMetaData, name: String): String = {
    val esc = Option(md.getSearchStringEscape).getOrElse("\\")
    name.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
  }

  /** TableMeta for every base table in `schema` (views excluded, as the
    * reference dumps them through the schema path, not the data path). */
  def tables(conn: Connection, schema: String): Seq[TableMeta] = {
    val md = conn.getMetaData
    // route the database name down the axis the driver uses
    val (cat, sch) =
      if (usesCatalogs(conn)) (schema, null) else (null, schema)
    val names = {
      val rs = md.getTables(cat, sch, "%", Array("TABLE"))
      try {
        val out = Seq.newBuilder[String]
        while (rs.next()) out += rs.getString("TABLE_NAME")
        out.result()
      } finally rs.close()
    }
    names.map { t =>
      val cols = {
        val rs = md.getColumns(cat, sch, escapePattern(md, t), "%")
        try {
          val out = Seq.newBuilder[ColumnMeta]
          while (rs.next()) out += ColumnMeta(
            name = rs.getString("COLUMN_NAME"),
            dataType = rs.getString("TYPE_NAME").toLowerCase,
            nullable = rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
            isGenerated = "YES".equalsIgnoreCase(
              // IS_GENERATEDCOLUMN is optional in the spec; treat
              // absence as not-generated
              scala.util.Try(rs.getString("IS_GENERATEDCOLUMN")).getOrElse("NO")),
            ordinal = rs.getInt("ORDINAL_POSITION"))
          out.result()
        } finally rs.close()
      }
      val pk = {
        // getPrimaryKeys takes a LITERAL table name (no pattern), so no
        // escaping here — only the catalog/schema axis routing
        val rs = md.getPrimaryKeys(cat, sch, t)
        try {
          val out = Seq.newBuilder[(Short, String)]
          while (rs.next()) out += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
          out.result().sortBy(_._1).map(_._2)
        } finally rs.close()
      }
      TableMeta(database = schema, table = t, columns = cols.sortBy(_.ordinal),
        primaryKey = pk)
    }
  }

  /** UPDATE_TIME per table in `schema` — the `--updated-since` probe
    * (the reference's get_not_updated queries
    * information_schema.TABLES.UPDATE_TIME,
    * mydumper_start_dump.c:525-545). Servers without the view (Derby
    * here) or with NULL UPDATE_TIME return no entry for the table —
    * and an UNKNOWN age never skips (TableFilter.accepts treats a
    * missing updateTime as passing, the safe direction: better to dump
    * a table twice than silently drop one). */
  def updateTimes(conn: Connection, schema: String): Map[String, java.time.Instant] =
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT TABLE_NAME, UPDATE_TIME FROM information_schema.TABLES " +
            s"WHERE TABLE_SCHEMA = '$schema' AND TABLE_TYPE = 'BASE TABLE'")
        try {
          val out = Map.newBuilder[String, java.time.Instant]
          while (rs.next()) {
            val ts = rs.getTimestamp(2)
            if (ts != null) out += rs.getString(1) -> ts.toInstant
          }
          out.result()
        } finally rs.close()
      } finally st.close()
    } catch { case _: java.sql.SQLException => Map.empty }

  /** The full discovery walk: all schemas × tables, filtered (S3 — the
    * reference's `--all-databases` with `--regex`/`--tables-list`/
    * skiplist applied before any scan; `updatedSince` consults the
    * per-schema [[updateTimes]] probe only when set). */
  def allTables(conn: Connection, spec: TableFilter.Spec): Seq[TableMeta] =
    schemas(conn).flatMap { s =>
      val ut =
        if (spec.updatedSince.isDefined) updateTimes(conn, s)
        else Map.empty[String, java.time.Instant]
      tables(conn, s).filter(t => TableFilter.accepts(spec, t, ut.get(t.table)))
    }

  /** A discovered view: its name, typed column list (for the
    * dependency-placeholder table and for --views-as-tables, where the
    * REAL types matter because the placeholder holds data), and the
    * CREATE VIEW text when the backend exposes one. */
  final case class ViewMeta(schema: String, name: String,
      columns: Seq[(String, String)], definition: Option[String])

  /** View discovery (specific_33/35 surface: `--views-as-tables` /
    * `--no-views` both need the view LIST before they can route it).
    * Standard JDBC metadata — `getTables(types=VIEW)` + `getColumns` —
    * so it runs live on any driver; the definition text comes from
    * [[viewDefinition]]'s per-backend probe and may be absent (a view
    * without retrievable DDL still dumps its placeholder, and under
    * views-as-tables its data — the reference too dumps the placeholder
    * before the `SHOW CREATE VIEW` round trip,
    * mydumper_jobs.c:472-620). */
  def views(conn: Connection, schema: String): Seq[ViewMeta] = {
    val md = conn.getMetaData
    val (cat, sch) =
      if (usesCatalogs(conn)) (schema, null) else (null, schema)
    val names = {
      val rs = md.getTables(cat, sch, "%", Array("VIEW"))
      try {
        val out = Seq.newBuilder[String]
        while (rs.next()) out += rs.getString("TABLE_NAME")
        out.result()
      } finally rs.close()
    }
    names.map { v =>
      val cols = {
        val rs = md.getColumns(cat, sch, escapePattern(md, v), "%")
        try {
          val out = Seq.newBuilder[(Int, String, String)]
          while (rs.next()) out += ((rs.getInt("ORDINAL_POSITION"),
            rs.getString("COLUMN_NAME"), rs.getString("TYPE_NAME").toLowerCase))
          out.result()
        } finally rs.close()
      }
      ViewMeta(schema, v, cols.sortBy(_._1).map(c => (c._2, c._3)),
        viewDefinition(conn, schema, v))
    }
  }

  /** Best-effort CREATE VIEW text: `SHOW CREATE VIEW` on MySQL lineage
    * (column 2, `mydumper_jobs.c:556-612`), else Derby's SYS.SYSVIEWS
    * catalog (which stores the submitted CREATE VIEW statement), else
    * None — callers degrade to placeholder-only artifacts. */
  def viewDefinition(conn: Connection, schema: String,
      view: String): Option[String] = {
    def probe(sql: String, col: Int): Option[String] =
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(sql)
          try { if (rs.next()) Option(rs.getString(col)) else None }
          finally rs.close()
        } finally st.close()
      } catch { case _: java.sql.SQLException => None }
    val esc = view.replace("`", "``")
    probe(s"SHOW CREATE VIEW `${schema.replace("`", "``")}`.`$esc`", 2)
      .orElse(probe(
        "SELECT V.VIEWDEFINITION FROM SYS.SYSVIEWS V " +
          "JOIN SYS.SYSTABLES T ON V.TABLEID = T.TABLEID " +
          "JOIN SYS.SYSSCHEMAS S ON T.SCHEMAID = S.SCHEMAID " +
          s"WHERE S.SCHEMANAME = '${schema.replace("'", "''")}' " +
          s"AND T.TABLENAME = '${view.replace("'", "''")}'", 1))
  }

  /** Physical-partition discovery (C5 input;
    * mydumper_partition_chunks.c:119-141 get_partitions_for_table): the
    * reference's exact information_schema query, filtered through the
    * per-table partition_regex like its eval_pcre_regex (unanchored).
    * A backend without the PARTITIONS view (the query throws) reports
    * no partitions, matching the reference's NULL-result fallback. */
  def partitions(conn: Connection, db: String, table: String,
      partitionRegex: Option[String] = None): Seq[String] = {
    val q = "select DISTINCT PARTITION_NAME from information_schema.PARTITIONS " +
      "where PARTITION_NAME is not null and TABLE_SCHEMA=? and TABLE_NAME=?"
    val found =
      try {
        val ps = conn.prepareStatement(q)
        try {
          ps.setString(1, db); ps.setString(2, table)
          val rs = ps.executeQuery()
          try {
            val out = Seq.newBuilder[String]
            while (rs.next()) out += rs.getString(1)
            out.result()
          } finally rs.close()
        } finally ps.close()
      } catch { case _: java.sql.SQLException => Nil }
    filterPartitions(found, partitionRegex)
  }

  /** Keep only partitions matching the regex (unanchored substring
    * match, eval_pcre_regex semantics); no regex keeps everything. */
  def filterPartitions(partitions: Seq[String],
      regex: Option[String]): Seq[String] =
    regex match {
      case Some(r) => val re = r.r; partitions.filter(p => re.findFirstIn(p).isDefined)
      case None    => partitions
    }
}

package graft.extract

import graft.core.{ChunkSpec, TableConfig, TableMeta}
import graft.operators.ChunkPlanner
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.sql.Connection
import java.util.Properties

/** The JDBC extraction surface (SURVEY §2.1 S1, §2.8 T1): turns a chunk
  * plan + snapshot plan into the exact `spark.read.jdbc(url, table,
  * predicates, props)` invocation — one chunk WHERE per Spark partition,
  * one connection per partition, each connection initialized with the
  * lock-mode's worker statements via [[graft.load.GraftConnectionProvider]]
  * (Spark's `sessionInitStatement` runs everything as ONE
  * Statement.execute, which MySQL Connector/J rejects for multi-statement
  * init unless allowMultiQueries=true; the provider executes each
  * statement individually instead). The control-connection halves of the
  * plan run driver-side over plain java.sql before/after the read action.
  *
  * No live MySQL exists in this environment, so the builder is exercised
  * by spec on the generated options (JdbcExtractSpec); the parquet dev
  * slice stands in for the source elsewhere (SURVEY §7 module 4).
  */
object JdbcExtract {

  final case class Spec(
      url: String,
      table: String,
      predicates: Array[String],
      props: Properties)

  /** Build the read spec. `where` is ANDed into every chunk predicate
    * (the reference ANDs user/per-table WHERE into each chunk query,
    * mydumper_write.c:1052-1054). `pinnedWorkers = Some(n)` routes every
    * partition read through n pooled snapshot-holding connections per
    * JVM (the reference's `--threads` worker model — SURVEY §7 hard #1)
    * instead of one fresh connection per partition. */
  def spec(url: String, table: String, chunks: ChunkSpec,
      snapshot: Snapshot.Plan, user: String, password: String,
      where: Option[String] = None, fetchSize: Int = 10000,
      pinnedWorkers: Option[Int] = None, quote: String = "`",
      // connection preamble executed BEFORE the lock-mode statements on
      // every worker (SET NAMES + session variables — the reference's
      // m_connect + set_session order, connection.c:320-348); build with
      // [[SessionVariables.dumperPreamble]]
      sessionPreamble: Seq[String] = Nil): Spec = {
    // physical-partition plans MUST go through readPartitioned: their
    // placeholder predicates are all `1=1` (the PARTITION clause cannot
    // ride in a WHERE), so passing them here would scan the whole table
    // once PER partition — N duplicate copies of every row
    require(!chunks.isInstanceOf[ChunkSpec.Partitions],
      "ChunkSpec.Partitions cannot be expressed as WHERE predicates — " +
        "use readPartitioned (per-partition dbtable subqueries)")
    val base = ChunkPlanner.toPredicates(chunks, quote)
    val preds = (base, where) match {
      case (Array(), None)    => Array.empty[String]
      case (Array(), Some(w)) => Array(w)
      case (ps, None)         => ps
      case (ps, Some(w))      => ps.map(p => s"($p) AND ($w)")
    }
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("fetchsize", fetchSize.toString)
    // stream rows instead of buffering the result set (the reference's
    // mysql_use_result, mydumper_write.c:1047): MySQL Connector/J streams
    // when fetchsize = Integer.MIN_VALUE; other drivers honor fetchsize
    graft.load.GraftConnectionProvider.options(
        sessionPreamble ++ snapshot.workerInit, pinnedWorkers)
      .foreach { case (k, v) => props.setProperty(k, v) }
    Spec(url, table, preds, props)
  }

  /** Run the read: one Spark partition per predicate (or a single
    * partition for a whole-table spec). */
  def read(spark: SparkSession, s: Spec): DataFrame =
    if (s.predicates.isEmpty) spark.read.jdbc(s.url, s.table, s.props)
    else spark.read.jdbc(s.url, s.table, s.predicates, s.props)

  /** C5 — physical-partition scan: MySQL's `PARTITION (p)` clause can't
    * ride in a WHERE predicate, so each partition becomes its own
    * dbtable subquery (the documented Spark idiom for server-side
    * clauses), one jdbc read per partition, unioned. Parallelism = one
    * Spark task per physical partition — exactly the reference's
    * partition-chunk consumers (mydumper_partition_chunks.c:46-141). */
  def partitionDbtables(table: String, partitions: Seq[String],
      where: Option[String] = None): Seq[String] = {
    // the user/per-table WHERE rides inside each partition subquery —
    // the reference ANDs it into every partition job's dump query
    // (mydumper_write.c:1052-1054), and a subquery is the only way a
    // server-side clause reaches Spark's JDBC scan
    val w = where.map(c => s" WHERE $c").getOrElse("")
    partitions.map(p =>
      s"(SELECT * FROM $table PARTITION ($p)$w) AS __graft_$p")
  }

  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitions: Seq[String], props: Properties,
      where: Option[String] = None): DataFrame = {
    require(partitions.nonEmpty, "no physical partitions to read")
    partitionDbtables(table, partitions, where)
      .map(sub => spark.read.jdbc(url, sub, props))
      .reduce(_ unionAll _)
  }

  // ---------------------------------------------------------------------
  // C1 over a live control connection — the reference's per-table
  // strategy chooser (set_chunk_strategy_for_dbt, mydumper_chunks.c:
  // 312-345): rows probe → partition probe → MIN/MAX probe → plan.
  // ---------------------------------------------------------------------

  /** Planner knobs, mirroring the reference's globals: `rows` =
    * `--rows min:start:max` (mydumper_table.c:414-440), `checkRowCount`
    * = `--check-row-count` (COUNT(*) instead of the estimate,
    * mydumper_chunks.c:316-319), `splitPartitions` =
    * `--split-partitions`, `splitIntegerTables` = `--split-integer-tables`
    * default-on, `maxThreadsPerTable` sizes the auto step. */
  final case class PlanConfig(
      rows: Option[graft.core.ChunkRows] = None,
      checkRowCount: Boolean = false,
      splitPartitions: Boolean = false,
      splitIntegerTables: Boolean = true,
      maxThreadsPerTable: Int = 4,
      quote: String = "`")

  /** `SELECT COUNT(*)` rows probe (get_rows_from_count,
    * mydumper_chunks.c:290-310). The reference's cheap default is an
    * EXPLAIN row estimate (get_rows_from_explain, :259-288) whose output
    * shape is MySQL-specific — callers on MySQL pass an EXPLAIN-based
    * `estimator` to [[chunkStrategy]]; COUNT is the portable fallback
    * and the exact `--check-row-count` behavior. */
  def rowsFromCount(conn: Connection, qualifiedTable: String,
      where: Option[String]): Long = {
    val sql = s"SELECT COUNT(*) FROM $qualifiedTable" +
      where.map(w => s" WHERE $w").getOrElse("")
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      try { rs.next(); rs.getLong(1) } finally rs.close()
    } finally st.close()
  }

  /** MIN/MAX bounds probe (A1; initialize_chunk_step_item,
    * mydumper_chunks.c:114-123: `SELECT MIN(f),MAX(f) FROM t [WHERE]`).
    * Returns None when the table is empty / all-NULL (the reference's
    * "It is NONE with minmax == NULL"). Values come back as strings;
    * the caller types them off the probe's JDBC column type. */
  def minMaxProbe(conn: Connection, qualifiedTable: String, column: String,
      where: Option[String], quote: String): Option[(String, String, Int)] = {
    val qc = s"$quote$column$quote"
    val sql = s"SELECT MIN($qc), MAX($qc) FROM $qualifiedTable" +
      where.map(w => s" WHERE $w").getOrElse("")
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      try {
        if (!rs.next()) None
        else {
          val mn = rs.getString(1)
          val mx = rs.getString(2)
          if (mn == null || mx == null) None
          else Some((mn, mx, rs.getMetaData.getColumnType(1)))
        }
      } finally rs.close()
    } finally st.close()
  }

  private val IntJdbcTypes: Set[Int] = Set(java.sql.Types.TINYINT,
    java.sql.Types.SMALLINT, java.sql.Types.INTEGER, java.sql.Types.BIGINT)

  private val BinaryJdbcTypes: Set[Int] = Set(java.sql.Types.BINARY,
    java.sql.Types.VARBINARY, java.sql.Types.LONGVARBINARY)

  /** MIN/MAX bounds of a BINARY key, read as bytes — `getString` on a
    * binary column is driver-defined (Derby hex-encodes, MySQL returns
    * the raw bytes as a charset-mangled string), so the binary branch
    * re-probes through the one representation every driver agrees on. */
  def minMaxBytesProbe(conn: Connection, qualifiedTable: String,
      column: String, where: Option[String], quote: String)
      : Option[(Array[Byte], Array[Byte])] = {
    val qc = s"$quote$column$quote"
    val sql = s"SELECT MIN($qc), MAX($qc) FROM $qualifiedTable" +
      where.map(w => s" WHERE $w").getOrElse("")
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      try {
        if (!rs.next()) None
        else {
          val mn = rs.getBytes(1)
          val mx = rs.getBytes(2)
          if (mn == null || mx == null) None else Some((mn, mx))
        }
      } finally rs.close()
    } finally st.close()
  }

  /** Integer type-NAME check for catalog metadata (the descent's second
    * key column is typed off [[TableMeta]] column info, not a probe's
    * JDBC metadata). Tolerates display widths and modifiers —
    * `INT(11)`, `bigint unsigned`. */
  private def isIntTypeName(t: String): Boolean = {
    val head = t.toLowerCase.takeWhile(c => c != '(' && c != ' ')
    Set("tinyint", "smallint", "mediumint", "int", "integer", "bigint",
      "byte", "short", "long").contains(head)
  }

  /** Per-leading-value MIN/MAX bounds of the second key column — the
    * descent's probe. The reference walks nested levels with one
    * MIN/MAX query per prefix value (mydumper_integer_chunks.c:640-699,
    * update_integer_min/max with the prefix pinned in the WHERE); one
    * GROUP BY round trip returns the identical bounds for every prefix
    * at once. NULL prefixes and all-NULL groups are skipped — those
    * rows ride the plan's first-chunk NULL catch-all. */
  def groupedMinMaxProbe(conn: Connection, qualifiedTable: String,
      prefixColumn: String, column: String, where: Option[String],
      quote: String): Seq[(Long, Long, Long)] = {
    val qp = s"$quote$prefixColumn$quote"
    val qc = s"$quote$column$quote"
    val sql = s"SELECT $qp, MIN($qc), MAX($qc) FROM $qualifiedTable" +
      where.map(w => s" WHERE $w").getOrElse("") +
      s" GROUP BY $qp ORDER BY $qp"
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      try {
        val buf = Seq.newBuilder[(Long, Long, Long)]
        while (rs.next()) {
          val v = rs.getString(1)
          val lo = rs.getString(2)
          val hi = rs.getString(3)
          if (v != null && lo != null && hi != null)
            buf += ((v.toLong, lo.toLong, hi.toLong))
        }
        buf.result()
      } finally rs.close()
    } finally st.close()
  }

  /** The descent itself (mydumper_integer_chunks.c:354-396: multicolumn
    * keys split one more level when the leading column alone cannot):
    * requires an INTEGER second PK column; each probed prefix gets the
    * same auto-step formula the single-column path uses, applied to ITS
    * gap (a prefix whose gap fits one step stays one chunk). Returns
    * None — caller falls back to WholeTable — when there is no usable
    * second column or the probe finds nothing to split. */
  private def multiColumnDescent(conn: Connection, qualified: String,
      meta: TableMeta, pk: String, minStep: Long, pc: PlanConfig,
      where: Option[String]): Option[ChunkSpec] =
    for {
      pk2 <- meta.primaryKey.drop(1).headOption
      pk2Meta <- meta.columns.find(_.name == pk2)
      if isIntTypeName(pk2Meta.dataType)
      groups = groupedMinMaxProbe(conn, qualified, pk, pk2, where, pc.quote)
      if groups.nonEmpty
      // descend only when it buys parallelism: >1 chunk total
      if groups.size > 1 || groups.exists(g => math.abs(g._3 - g._2) > minStep)
    } yield {
      val parts = groups.map { case (v, lo2, hi2) =>
        val gap2 = math.abs(hi2 - lo2)
        val step =
          if (gap2 <= minStep) gap2 + 1 // one chunk covers the prefix
          else {
            val auto = gap2 / (math.pow(2, pc.maxThreadsPerTable).toLong - 1)
            val start = pc.rows.map(_.start).filter(_ > 0).getOrElse(auto)
            val maxStep = pc.rows.map(_.max).filter(_ > 0).getOrElse(Long.MaxValue)
            math.min(math.max(start, minStep), maxStep)
          }
        graft.core.ChunkSpec.MultiIntPart(v, lo2, hi2, step)
      }
      val nullable = meta.columns.find(_.name == pk).forall(_.nullable) ||
        pk2Meta.nullable
      ChunkSpec.MultiIntRange(pk, pk2, parts, includeNullChunk = nullable)
    }

  /** Choose the chunk plan for one table, phase-for-phase the
    * reference's `set_chunk_strategy_for_dbt` (mydumper_chunks.c:312-345):
    *
    *  1. rows probe — COUNT(*) under `--check-row-count`, else the
    *     injected `estimator` (EXPLAIN on MySQL);
    *  2. rows ≤ min step → whole table, nothing else probed;
    *  3. physical partitions — probed only when `--split-partitions` or
    *     a per-table `partition_regex` asks for them (:325-330), and
    *     they win over every other strategy;
    *  4. integer/string PK bounds probe (initialize_chunk_step_item):
    *     an integer key whose [min,max] gap ≤ min step stays whole
    *     (:156-157); otherwise the auto step is
    *     `gap / (2^maxThreadsPerTable - 1)` clamped into the
    *     `--rows` [min,max] bounds (:173-199); a string key takes the
    *     quantile-free first-byte split (our Spark-side replacement for
    *     the LEFT(f,1) char walk);
    *  5. no usable key → whole table (new_none_chunk_step).
    *
    * Multi-column keys descend one level like the reference (position
    * ≤ 2, mydumper_integer_chunks.c:107-108,354-396): an integer leading
    * column whose gap ≤ min step but whose table still exceeds the step
    * — the `(tenant_id, seq)` shape — splits on the SECOND key column
    * per leading value ([[multiColumnDescent]]). Returns the plan plus
    * the probed row count (feeds manifests like dbt->rows_total). */
  def chunkStrategy(conn: Connection, meta: TableMeta,
      cfg: TableConfig = TableConfig.empty,
      pc: PlanConfig = PlanConfig(),
      estimator: (Connection, String, Option[String]) => Long = rowsFromCount)
      : (ChunkSpec, Long) = {
    val q = pc.quote
    val qualified = s"$q${meta.database}$q.$q${meta.table}$q"
    val rows =
      if (pc.checkRowCount) rowsFromCount(conn, qualified, None)
      else estimator(conn, qualified, None)
    val minStep = pc.rows.map(_.min).getOrElse(ChunkPlanner.MinChunkStepSize)
    if (rows <= minStep) return (ChunkSpec.WholeTable, rows)

    if (pc.splitPartitions || cfg.partitionRegex.isDefined) {
      val parts = Discovery.partitions(conn, meta.database, meta.table,
        cfg.partitionRegex)
      if (parts.nonEmpty) return (ChunkSpec.Partitions(parts), rows)
    }

    if (!pc.splitIntegerTables) return (ChunkSpec.WholeTable, rows)

    val plan = for {
      pk <- meta.primaryKey.headOption
      pkMeta = meta.columns.find(_.name == pk)
      (mn, mx, jdbcType) <- minMaxProbe(conn, qualified, pk, cfg.where, q)
    } yield {
      val nullable = pkMeta.forall(_.nullable)
      if (IntJdbcTypes.contains(jdbcType)) {
        val (lo, hi) = (mn.toLong, mx.toLong)
        val gap = math.abs(hi - lo)
        if (gap <= minStep)
          // the leading column alone can't split (low-cardinality head
          // of a composite key): descend one level before giving up
          multiColumnDescent(conn, qualified, meta, pk, minStep, pc,
            cfg.where).getOrElse(ChunkSpec.WholeTable)
        else {
          val auto = gap / (math.pow(2, pc.maxThreadsPerTable).toLong - 1)
          val start = pc.rows.map(_.start).filter(_ > 0).getOrElse(auto)
          val maxStep = pc.rows.map(_.max).filter(_ > 0).getOrElse(Long.MaxValue)
          val step = math.min(math.max(start, minStep), maxStep)
          ChunkSpec.IntRange(pk, lo, hi, step, includeNullChunk = nullable)
        }
      } else if (BinaryJdbcTypes.contains(jdbcType)) {
        // BINARY key (the reference's specific_19 BINARY(16)-PK suite):
        // the probe's string form is driver-defined, so re-probe as
        // bytes and split on the FIRST BYTE — the binary analog of the
        // char walk, with X'..' boundaries ([[ChunkSpec.BinaryRange]])
        // because a quoted string literal cannot compare against a
        // binary column
        val plan = for {
          (b0, b1) <- minMaxBytesProbe(conn, qualified, pk, cfg.where, q)
          if b1.nonEmpty
          // walk to the FIRST DIFFERING byte (the binary analog of the
          // string branch's char walk): fixed-prefix keys — a version
          // byte, a tenant prefix, time-ordered UUIDv7 — share byte 0,
          // and a first-byte-only split would silently degrade to
          // WholeTable, losing all extract parallelism
          diff = (0 until math.min(b0.length, b1.length))
            .find(i => b0(i) != b1(i))
            .getOrElse(math.min(b0.length, b1.length))
          if diff < b1.length // min == max: a single key value can't split
          prefix = b0.take(diff).map(b => f"${b & 0xff}%02x").mkString
          // a MIN that ENDS at the divergence point sorts before every
          // continuation byte — treat its missing byte as -1
          lo = if (diff < b0.length) b0(diff) & 0xff else -1
          hi = b1(diff) & 0xff
          span = hi - lo
          if span > 0
        } yield {
          val cuts = math.min(span, pc.maxThreadsPerTable * 4)
          val bounds = (1 to cuts)
            .map(i => prefix + f"${lo + i * span / (cuts + 1) + 1}%02x")
            .distinct
          ChunkSpec.BinaryRange(pk, bounds, includeNullChunk = nullable)
        }
        plan.getOrElse(ChunkSpec.WholeTable)
      } else if (mn.isEmpty || mx.isEmpty) {
        // an empty-string MIN has no first character to walk from
        ChunkSpec.WholeTable
      } else {
        // first-byte split across the probed [min,max] character range —
        // the reference's initial char step (LEFT(MIN(f),1)/LEFT(MAX(f),1),
        // mydumper_chunks.c:116,227-233) without the server round trips
        // of its midpoint walk
        val (c0, c1) = (mn.head, mx.head)
        val span = c1 - c0
        val cuts = math.min(span, pc.maxThreadsPerTable * 4)
        val bounds =
          if (cuts <= 0) Nil
          else (1 to cuts.toInt)
            .map(i => (c0 + i * span / (cuts + 1) + 1).toChar.toString)
            .distinct
        if (bounds.isEmpty) ChunkSpec.WholeTable
        else ChunkSpec.StringRange(pk, bounds, includeNullChunk = nullable)
      }
    }
    (plan.getOrElse(ChunkSpec.WholeTable), rows)
  }

  /** One-call per-table extract: [[chunkStrategy]] → the matching read
    * path (predicates for range plans, per-partition dbtable subqueries
    * for ByPartition — the split [[spec]] refuses to cross). This is the
    * composition the reference runs per table job; the per-table WHERE
    * and projection land via [[spec]]'s `where` / the caller's select. */
  def extractTable(spark: SparkSession, conn: Connection, url: String,
      meta: TableMeta, snapshot: Snapshot.Plan, user: String,
      password: String, cfg: TableConfig = TableConfig.empty,
      pc: PlanConfig = PlanConfig(),
      estimator: (Connection, String, Option[String]) => Long = rowsFromCount,
      pinnedWorkers: Option[Int] = None): (DataFrame, Long) = {
    val (plan, rows) = chunkStrategy(conn, meta, cfg, pc, estimator)
    val q = pc.quote
    val qualified = s"$q${meta.database}$q.$q${meta.table}$q"
    plan match {
      case ChunkSpec.Partitions(parts) =>
        val base = spec(url, qualified, ChunkSpec.WholeTable, snapshot,
          user, password, pinnedWorkers = pinnedWorkers)
        (readPartitioned(spark, url, qualified, parts, base.props, cfg.where), rows)
      case other =>
        val s = spec(url, qualified, other, snapshot, user, password,
          where = cfg.where, pinnedWorkers = pinnedWorkers, quote = q)
        (read(spark, s), rows)
    }
  }
}

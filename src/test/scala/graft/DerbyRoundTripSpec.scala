package graft

import java.sql.DriverManager
import java.util.Properties

import graft.extract.{Discovery, JdbcExtract, Snapshot, TableFilter}
import graft.functions.Checksum
import graft.load.{GraftConnectionProvider, JdbcLoad, PinnedConnectionPool}
import graft.operators.ChunkPlanner

/** LIVE JDBC integration: embedded Derby (ships in /opt/spark/jars as
  * Spark's metastore dependency) stands in for the MySQL server, turning
  * the snapshot/pool/load wiring from pure-value specs into an executed
  * end-to-end path: per-connection session init → predicate-chunked
  * `spark.read.jdbc` extract → `JdbcLoad` write-back → checksum equality
  * (the reference's dump→restore→`CHECKSUM TABLE` contract,
  * mydumper_working_thread.c:453-501, myloader_restore.c:457-543).
  *
  * The session-init execution proof is structural: rows live in schema
  * GRAFT_S, while Derby resolves unqualified table names against the
  * user's default schema (APP). Every read/write below names the bare
  * table — it can only resolve if [[GraftConnectionProvider]] actually
  * ran `SET SCHEMA GRAFT_S` on that specific JDBC connection. No
  * mocking: a skipped init is a hard failure, on each of the paths
  * (plain read, pinned-pool read, write, write's table-exists probe).
  */
class DerbyRoundTripSpec extends SparkTestBase {

  private val Rows = 5000

  test("chunked extract -> load -> checksum round trip over live Derby") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", dbDir) // keeps derby.log there
    val url = s"jdbc:derby:$dbDir/srcdb;create=true"

    // ---- seed the "server": 5000 rows, sparse PK, some NULL payloads
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA GRAFT_S")
      st.execute(
        "CREATE TABLE GRAFT_S.LINE (ID INT NOT NULL PRIMARY KEY, GRP INT, PAYLOAD VARCHAR(64))")
      // PAYLOAD is CLOB here because Spark's DerbyDialect maps StringType
      // to CLOB on the write path (setNull(CLOB) against a VARCHAR
      // column is a Derby type error); the source stays VARCHAR to
      // exercise the ordinary string read
      st.execute(
        "CREATE TABLE GRAFT_S.LINE_OUT (ID INT NOT NULL, GRP INT, PAYLOAD CLOB)")
      st.close()
      val ps = conn.prepareStatement("INSERT INTO GRAFT_S.LINE VALUES (?, ?, ?)")
      (0 until Rows).foreach { i =>
        ps.setInt(1, i * 3) // sparse key: chunk math must not assume density
        ps.setInt(2, i % 7)
        if (i % 11 == 0) ps.setNull(3, java.sql.Types.VARCHAR)
        else ps.setString(3, s"payload-$i")
        ps.addBatch()
        if (i % 500 == 499) ps.executeBatch()
      }
      ps.executeBatch()
      ps.close()

      // ---- S2/S3: catalog discovery over live JDBC metadata — the
      // discovered primary key drives the chunk plan below, so the
      // discovery output is consumed, not just asserted
      val metas = Discovery.allTables(conn,
        TableFilter.Spec(regex = Some("^GRAFT_S\\.")))
      assert(metas.map(_.table).sorted === Seq("LINE", "LINE_OUT"))
      val lineMeta = metas.find(_.table == "LINE").get
      assert(lineMeta.primaryKey === Seq("ID"))
      assert(lineMeta.columns.map(_.name) === Seq("ID", "GRP", "PAYLOAD"))
      assert(!lineMeta.columns.head.nullable && lineMeta.columns.last.nullable)
      assert(ChunkPlanner.choose(Rows.toLong,
        lineMeta.columns.head.dataType match { case t => Some(t) },
        Nil) === ChunkPlanner.Strategy.IntRange)
      val pkCol = lineMeta.primaryKey.head

      // ---- control-connection probe (A1) + chunk plan (C2, ANSI quote)
      val bounds = conn.createStatement()
        .executeQuery(s"SELECT MIN($pkCol), MAX($pkCol) FROM GRAFT_S.LINE")
      bounds.next()
      val (lo, hi) = (bounds.getLong(1), bounds.getLong(2))
      assert(lo === 0L && hi === (Rows - 1) * 3L)
      val chunks = ChunkPlanner.integerChunks(pkCol, lo, hi, step = 2500L,
        includeNull = false, quote = "\"")
      assert(chunks.size === (hi / 2500 + 1))

      // ---- chunked read through the session-init provider
      val snapshot = Snapshot.Plan(
        ddlLock = Nil, ddlUnlock = Nil,
        controlLock = Nil, workerInit = Seq("SET SCHEMA GRAFT_S"),
        controlUnlock = Nil, verify = Nil, abortOnDrift = false)
      val spec = JdbcExtract.spec(url, "LINE",
        graft.core.ChunkSpec.WholeTable, snapshot, user = "APP", password = "")
        .copy(predicates = chunks.map(_.where).toArray)
      val df = JdbcExtract.read(spark, spec)
      assert(df.rdd.getNumPartitions === chunks.size,
        "one Spark partition per chunk predicate")
      assert(df.count() === Rows)
      val srcSum = df.agg(org.apache.spark.sql.functions.sum("ID")).head().getLong(0)

      // ---- pinned-pool read (T1 worker model): same rows through 2
      // snapshot-holding physical connections that survive partition
      // close() calls
      val pooledSpec = JdbcExtract.spec(url, "LINE",
        graft.core.ChunkSpec.WholeTable, snapshot, user = "APP", password = "",
        pinnedWorkers = Some(2))
        .copy(predicates = chunks.map(_.where).toArray)
      assert(JdbcExtract.read(spark, pooledSpec).count() === Rows)
      val poolKey = PinnedConnectionPool.Key(url, "APP")
      assert(PinnedConnectionPool.poolSize(poolKey) === 2,
        "exactly 2 physical members despite 7 partition reads")
      PinnedConnectionPool.shutdown(poolKey)

      // ---- load back (L4): batched, 2 connections, session init on the
      // write path too (write target is also schema-qualified only via
      // SET SCHEMA)
      val loadSpec = JdbcLoad.spec(url, "LINE_OUT", user = "APP",
        password = "", overwrite = JdbcLoad.Overwrite.Append,
        batchSize = 500, connections = 2, disableChecks = false)
      val withInit = loadSpec.copy(options = loadSpec.options ++
        GraftConnectionProvider.options(Seq("SET SCHEMA GRAFT_S")))
      JdbcLoad.write(df.repartition(2), withInit)

      // ---- verify: reference semantics — restored table checksums equal
      val plain = new Properties()
      plain.setProperty("user", "APP")
      val src = spark.read.jdbc(url, "GRAFT_S.LINE", plain)
      val dst = spark.read.jdbc(url, "GRAFT_S.LINE_OUT", plain)
      assert(dst.count() === Rows)
      val cols = Seq("ID", "GRP", "PAYLOAD")
      val srcCk = src.agg(Checksum.tableChecksum(src, cols)).head().getLong(0)
      val dstCk = dst.agg(Checksum.tableChecksum(dst, cols)).head().getLong(0)
      assert(srcCk === dstCk, "dump->load round trip changed data")
      assert(dst.agg(org.apache.spark.sql.functions.sum("ID")).head().getLong(0) === srcSum)

      // ---- idempotent reload (L5 resume): truncate-mode write replaces
      // rather than duplicates
      val truncSpec = JdbcLoad.spec(url, "GRAFT_S.LINE_OUT", user = "APP",
        password = "", overwrite = JdbcLoad.Overwrite.Truncate,
        batchSize = 500, connections = 2, disableChecks = false)
      JdbcLoad.write(df.repartition(2), truncSpec)
      assert(spark.read.jdbc(url, "GRAFT_S.LINE_OUT", plain).count() === Rows,
        "truncate reload must not duplicate rows")
    } finally {
      conn.close()
      try DriverManager.getConnection(s"jdbc:derby:$dbDir/srcdb;shutdown=true")
      catch { case _: java.sql.SQLException => () } // XJ015: normal shutdown
    }
  }

  test("extractTable auto-plans the chunk strategy over live Derby") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_xt").toString
    System.setProperty("derby.system.home", dbDir)
    val url = s"jdbc:derby:$dbDir/xtdb;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA GRAFT_E")
      st.execute(
        "CREATE TABLE GRAFT_E.LINE (ID INT NOT NULL PRIMARY KEY, GRP INT)")
      st.close()
      val ps = conn.prepareStatement("INSERT INTO GRAFT_E.LINE VALUES (?, ?)")
      (0 until Rows).foreach { i =>
        ps.setInt(1, i * 3); ps.setInt(2, i % 7); ps.addBatch()
        if (i % 500 == 499) ps.executeBatch()
      }
      ps.executeBatch(); ps.close()

      val meta = Discovery.allTables(conn,
        TableFilter.Spec(regex = Some("^GRAFT_E\\."))).find(_.table == "LINE").get
      val snapshot = Snapshot.Plan(
        ddlLock = Nil, ddlUnlock = Nil, controlLock = Nil,
        workerInit = Nil, controlUnlock = Nil, verify = Nil,
        abortOnDrift = false)
      // COUNT probe 5000 rows; gap 14997 → auto step 14997/15 = 999
      // clamps up to the 1000 min step → 15 int-range chunks, each its
      // own Spark partition — the whole reference planning sequence
      // executed live, no hand-built chunk list
      val (df, rows) = JdbcExtract.extractTable(spark, conn, url, meta,
        snapshot, user = "APP", password = "",
        pc = JdbcExtract.PlanConfig(quote = "\""))
      assert(rows === Rows.toLong)
      assert(df.rdd.getNumPartitions === 15, "one partition per planned chunk")
      assert(df.count() === Rows)

      // per-table WHERE reaches both the bounds probe and every chunk read
      val expected = (0 until Rows).count(_ % 7 < 3)
      val (dfW, _) = JdbcExtract.extractTable(spark, conn, url, meta,
        snapshot, user = "APP", password = "",
        cfg = graft.core.TableConfig(where = Some("GRP < 3")),
        pc = JdbcExtract.PlanConfig(quote = "\""))
      assert(dfW.count() === expected)
    } finally {
      conn.close()
      try DriverManager.getConnection(s"jdbc:derby:$dbDir/xtdb;shutdown=true")
      catch { case _: java.sql.SQLException => () }
    }
  }
}

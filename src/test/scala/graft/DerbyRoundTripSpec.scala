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

  test("tableThreads=4 live round trip: concurrent dump -> load -> checksum") {
    // the round-7 concurrent pool (Dump.run tableThreads>1) was
    // parity-tested on artifacts only; this drives it through a LIVE
    // source: four Derby tables extracted over JDBC, dumped CONCURRENTLY
    // (schema+data files interleaving in time), restored with checksum
    // verification, one table written back to the server and
    // checksum-compared there
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_tt").toString
    System.setProperty("derby.system.home", dbDir)
    val url = s"jdbc:derby:$dbDir/ttdb;create=true"
    val conn = DriverManager.getConnection(url)
    val out = java.nio.file.Files.createTempDirectory("graft_derby_ttd").toString
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA GRAFT_P")
      val sizes = Seq("T1" -> 2000, "T2" -> 800, "T3" -> 300, "T4" -> 50)
      sizes.foreach { case (t, n) =>
        st.execute(s"CREATE TABLE GRAFT_P.$t " +
          "(ID INT NOT NULL PRIMARY KEY, PAYLOAD VARCHAR(64))")
        val ps = conn.prepareStatement(s"INSERT INTO GRAFT_P.$t VALUES (?, ?)")
        (0 until n).foreach { i =>
          ps.setInt(1, i)
          if (i % 13 == 0) ps.setNull(2, java.sql.Types.VARCHAR)
          else ps.setString(2, s"$t-payload-$i")
          ps.addBatch()
        }
        ps.executeBatch(); ps.close()
      }
      st.execute("CREATE TABLE GRAFT_P.T1_OUT (ID INT NOT NULL, PAYLOAD CLOB)")
      st.close()

      val snapshot = Snapshot.Plan(
        ddlLock = Nil, ddlUnlock = Nil, controlLock = Nil,
        workerInit = Seq("SET SCHEMA GRAFT_P"), controlUnlock = Nil,
        verify = Nil, abortOnDrift = false)
      def dfOf(t: String) = JdbcExtract.read(spark, JdbcExtract.spec(url, t,
        graft.core.ChunkSpec.WholeTable, snapshot, user = "APP", password = ""))
      // mixed phases: T2/T4 non-transactional (dump first), T1/T3 trx
      val tables = Seq(("t1", dfOf("T1"), true), ("t2", dfOf("T2"), false),
        ("t3", dfOf("T3"), true), ("t4", dfOf("T4"), false))
      val manifest = Dump.run(spark, tables,
        Dump.Config(outDir = out, db = "derby"), tableThreads = 4)
      // manifest order = input order within each phase, non-trx first,
      // REGARDLESS of completion order under the 4-thread pool
      assert(manifest.tables.map(_.table) === Seq("t2", "t4", "t1", "t3"))
      assert(manifest.tables.map(_.rows).sum === 3150L)

      // directory-only restore with checksum verification against the
      // concurrently-written artifacts
      val selfSources = Load.sourcesFromDir(out)
      assert(selfSources.map(_.table).sorted ===
        Seq("derby.t1", "derby.t2", "derby.t3", "derby.t4"))
      val restoredDir = java.nio.file.Files
        .createTempDirectory("graft_derby_ttr").toString
      val results = Load.run(spark, out, selfSources) { (stem, df) =>
        df.write.mode("overwrite").parquet(s"$restoredDir/$stem")
      }
      assert(results.forall(_.checksumOk.contains(true)),
        s"concurrent dump artifacts failed checksum: $results")

      // write the restored T1 back into the live server and checksum it
      // there against the source table
      val back = spark.read.parquet(s"$restoredDir/derby.t1")
      val loadSpec = JdbcLoad.spec(url, "T1_OUT", user = "APP",
        password = "", overwrite = JdbcLoad.Overwrite.Append,
        batchSize = 500, connections = 2, disableChecks = false)
      val withInit = loadSpec.copy(options = loadSpec.options ++
        GraftConnectionProvider.options(Seq("SET SCHEMA GRAFT_P")))
      JdbcLoad.write(back.repartition(2), withInit)
      val plain = new Properties()
      plain.setProperty("user", "APP")
      val srcT1 = spark.read.jdbc(url, "GRAFT_P.T1", plain)
      val dstT1 = spark.read.jdbc(url, "GRAFT_P.T1_OUT", plain)
      val cols = Seq("ID", "PAYLOAD")
      assert(dstT1.count() === 2000L)
      assert(srcT1.agg(Checksum.tableChecksum(srcT1, cols)).head().getLong(0)
        === dstT1.agg(Checksum.tableChecksum(dstT1, cols)).head().getLong(0),
        "live write-back after concurrent dump changed data")
    } finally {
      conn.close()
      try DriverManager.getConnection(s"jdbc:derby:$dbDir/ttdb;shutdown=true")
      catch { case _: java.sql.SQLException => () }
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

  test("binary(16) and char(5) primary keys chunk and extract live " +
      "(reference specific_19 / specific_20)") {
    // the reference's non-integer-key suites: a BINARY(16) PK must split
    // through X'..' hex-literal ranges (a quoted string literal is a
    // type error against a binary column) and a CHAR(5) PK through the
    // first-character walk — both as LIVE auto-planned extracts, not
    // hand-built chunk lists
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_bk").toString
    System.setProperty("derby.system.home", dbDir)
    val url = s"jdbc:derby:$dbDir/bkdb;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA GRAFT_B")
      st.execute("CREATE TABLE GRAFT_B.BIN16 " +
        "(ID CHAR(16) FOR BIT DATA NOT NULL PRIMARY KEY, V INT)")
      st.execute("CREATE TABLE GRAFT_B.CH5 " +
        "(ID CHAR(5) NOT NULL PRIMARY KEY, V INT)")
      st.execute("CREATE TABLE GRAFT_B.BINPFX " +
        "(ID CHAR(16) FOR BIT DATA NOT NULL PRIMARY KEY, V INT)")
      st.close()
      val pb = conn.prepareStatement("INSERT INTO GRAFT_B.BIN16 VALUES (?, ?)")
      (0 until Rows).foreach { i =>
        // first byte spreads the full 0..250 range; tail disambiguates
        val b = new Array[Byte](16)
        b(0) = ((i * 7) % 251).toByte
        b(1) = (i >> 8).toByte; b(2) = i.toByte
        pb.setBytes(1, b); pb.setInt(2, i); pb.addBatch()
        if (i % 500 == 499) pb.executeBatch()
      }
      pb.executeBatch(); pb.close()
      val pc5 = conn.prepareStatement("INSERT INTO GRAFT_B.CH5 VALUES (?, ?)")
      (0 until Rows).foreach { i =>
        val s5 = f"${('a' + i % 26).toChar}${i}%04d"
        pc5.setString(1, s5); pc5.setInt(2, i); pc5.addBatch()
        if (i % 500 == 499) pc5.executeBatch()
      }
      pc5.executeBatch(); pc5.close()
      // fixed-prefix keys (version byte + tenant prefix, the UUIDv7 /
      // time-ordered shape): every key shares bytes 0..2, spread starts
      // at byte 3 — a first-byte-only planner degrades this to
      // WholeTable and a serial extract
      val pfx = conn.prepareStatement("INSERT INTO GRAFT_B.BINPFX VALUES (?, ?)")
      (0 until Rows).foreach { i =>
        val b = new Array[Byte](16)
        b(0) = 0x42; b(1) = 0x00; b(2) = 0x07
        b(3) = ((i * 7) % 251).toByte
        b(4) = (i >> 8).toByte; b(5) = i.toByte
        pfx.setBytes(1, b); pfx.setInt(2, i); pfx.addBatch()
        if (i % 500 == 499) pfx.executeBatch()
      }
      pfx.executeBatch(); pfx.close()

      val snapshot = Snapshot.Plan(
        ddlLock = Nil, ddlUnlock = Nil, controlLock = Nil,
        workerInit = Nil, controlUnlock = Nil, verify = Nil,
        abortOnDrift = false)
      val metas = Discovery.allTables(conn,
        TableFilter.Spec(regex = Some("^GRAFT_B\\.")))
      val binMeta = metas.find(_.table == "BIN16").get
      val ch5Meta = metas.find(_.table == "CH5").get

      // the auto-planner must pick the binary branch with >1 X'..' chunk
      val (binPlan, binRows) = JdbcExtract.chunkStrategy(conn, binMeta,
        pc = JdbcExtract.PlanConfig(quote = "\""))
      assert(binRows === Rows.toLong)
      binPlan match {
        case graft.core.ChunkSpec.BinaryRange(c, bounds, _) =>
          assert(c === "ID")
          assert(bounds.nonEmpty && bounds.forall(_.matches("[0-9a-f]{2}")))
        case other => fail(s"binary PK planned $other, expected BinaryRange")
      }
      val (binDf, _) = JdbcExtract.extractTable(spark, conn, url, binMeta,
        snapshot, user = "APP", password = "",
        pc = JdbcExtract.PlanConfig(quote = "\""))
      assert(binDf.rdd.getNumPartitions > 1,
        "binary key must yield a parallel extract")
      assert(binDf.count() === Rows.toLong)
      // every row lands in exactly one chunk (half-open ranges):
      // distinct IDs prove no chunk overlap double-reads a row
      assert(binDf.select("ID").distinct().count() === Rows.toLong)

      // the planner walks to the first DIFFERING byte: bounds carry the
      // 3-byte shared prefix plus the split byte (8 hex chars), and the
      // extract stays parallel with no row loss or double-read
      val pfxMeta = metas.find(_.table == "BINPFX").get
      val (pfxPlan, _) = JdbcExtract.chunkStrategy(conn, pfxMeta,
        pc = JdbcExtract.PlanConfig(quote = "\""))
      pfxPlan match {
        case graft.core.ChunkSpec.BinaryRange(c, bounds, _) =>
          assert(c === "ID")
          assert(bounds.nonEmpty && bounds.forall(_.matches("420007[0-9a-f]{2}")),
            s"expected prefix-walked bounds, got $bounds")
        case other => fail(s"fixed-prefix binary PK planned $other, " +
          "expected BinaryRange (first-differing-byte walk)")
      }
      val (pfxDf, _) = JdbcExtract.extractTable(spark, conn, url, pfxMeta,
        snapshot, user = "APP", password = "",
        pc = JdbcExtract.PlanConfig(quote = "\""))
      assert(pfxDf.rdd.getNumPartitions > 1,
        "fixed-prefix binary key must still yield a parallel extract")
      assert(pfxDf.count() === Rows.toLong)
      assert(pfxDf.select("ID").distinct().count() === Rows.toLong)

      val (ch5Plan, _) = JdbcExtract.chunkStrategy(conn, ch5Meta,
        pc = JdbcExtract.PlanConfig(quote = "\""))
      assert(ch5Plan.isInstanceOf[graft.core.ChunkSpec.StringRange],
        s"char(5) PK planned $ch5Plan")
      val (ch5Df, _) = JdbcExtract.extractTable(spark, conn, url, ch5Meta,
        snapshot, user = "APP", password = "",
        pc = JdbcExtract.PlanConfig(quote = "\""))
      assert(ch5Df.rdd.getNumPartitions > 1)
      assert(ch5Df.count() === Rows.toLong)
      assert(ch5Df.select("ID").distinct().count() === Rows.toLong)
    } finally {
      conn.close()
      try DriverManager.getConnection(s"jdbc:derby:$dbDir/bkdb;shutdown=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("degenerate --rows 2:2:1 over a sparse integer PK extracts " +
      "complete and non-overlapping (reference specific_34)") {
    // the reference's specific_34 regression: sysbench-style ids spaced
    // 3 apart dumped with the degenerate min:start:max = 2:2:1 triple
    // (max < start) caused inconsistencies in its adaptive walker. Our
    // planner clamps step = min(max(start, min), max) = 1 and the
    // min-aligned inclusive ranges must still cover every row exactly
    // once — no loss, no double-read, at ~600 one-id chunks.
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_s34").toString
    System.setProperty("derby.system.home", dbDir)
    val url = s"jdbc:derby:$dbDir/s34db;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA GRAFT_34")
      st.execute("CREATE TABLE GRAFT_34.SBTEST " +
        "(ID INT NOT NULL PRIMARY KEY, K INT NOT NULL, C VARCHAR(120))")
      st.close()
      val n = 200
      val ps = conn.prepareStatement("INSERT INTO GRAFT_34.SBTEST VALUES (?, ?, ?)")
      (1 to n).foreach { i =>
        ps.setInt(1, i * 3); ps.setInt(2, 500 + i % 60)
        ps.setString(3, s"payload-$i"); ps.addBatch()
        if (i % 100 == 0) ps.executeBatch()
      }
      ps.executeBatch(); ps.close()
      val metas = Discovery.allTables(conn,
        TableFilter.Spec(regex = Some("^GRAFT_34\\.")))
      val meta = metas.find(_.table == "SBTEST").get
      val pc = JdbcExtract.PlanConfig(quote = "\"",
        rows = Some(graft.core.ChunkRows(2, 2, 1)))
      val (plan, rows) = JdbcExtract.chunkStrategy(conn, meta, pc = pc)
      assert(rows === n.toLong)
      plan match {
        case graft.core.ChunkSpec.IntRange(c, lo, hi, step, _) =>
          assert(c === "ID" && lo === 3 && hi === n * 3)
          assert(step === 1, s"2:2:1 must clamp the step to max=1, got $step")
        case other => fail(s"sparse PK planned $other, expected IntRange")
      }
      val snapshot = Snapshot.Plan(
        ddlLock = Nil, ddlUnlock = Nil, controlLock = Nil,
        workerInit = Nil, controlUnlock = Nil, verify = Nil,
        abortOnDrift = false)
      val (df, _) = JdbcExtract.extractTable(spark, conn, url, meta,
        snapshot, user = "APP", password = "", pc = pc)
      assert(df.count() === n.toLong, "degenerate step lost rows")
      assert(df.select("ID").distinct().count() === n.toLong,
        "degenerate step double-read rows")
      assert(df.rdd.getNumPartitions > 1,
        "the clamped step must still split the extract")
    } finally {
      conn.close()
      try DriverManager.getConnection(s"jdbc:derby:$dbDir/s34db;shutdown=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

  test("overwrite-mode matrix FAIL/NONE/DROP/TRUNCATE/DELETE against " +
      "live Derby (myloader.h:35, myloader_restore_job.c:121-168)") {
    // each purge mode restores dump rows onto a PRE-EXISTING populated
    // table and must leave exactly the reference-specified state:
    // FAIL errors, NONE appends, DROP recreates clean, TRUNCATE and
    // DELETE empty in place (DDL kept — the index survives both)
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_ow").toString
    System.setProperty("derby.system.home", dbDir)
    val url = s"jdbc:derby:$dbDir/owdb;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA GRAFT_O")
      st.close()
      val oldRows = 7
      val newRows = 100
      def seed(t: String): Unit = {
        val s = conn.createStatement()
        s.execute(s"CREATE TABLE GRAFT_O.$t " +
          "(ID INT NOT NULL PRIMARY KEY, PAYLOAD VARCHAR(32))")
        s.execute(s"CREATE INDEX ${t}_PIDX ON GRAFT_O.$t (PAYLOAD)")
        s.close()
        val ps = conn.prepareStatement(s"INSERT INTO GRAFT_O.$t VALUES (?, ?)")
        (1000 until 1000 + oldRows).foreach { i =>
          ps.setInt(1, i); ps.setString(2, s"old-$i"); ps.addBatch()
        }
        ps.executeBatch(); ps.close()
      }
      def indexExists(t: String): Boolean = {
        val rs = conn.getMetaData.getIndexInfo(null, "GRAFT_O", t, false, false)
        try {
          var found = false
          while (rs.next() && !found)
            found = Option(rs.getString("INDEX_NAME")).contains(s"${t}_PIDX")
          found
        } finally rs.close()
      }
      import spark.implicits._
      val dump = (0 until newRows)
        .map(i => (i, s"new-$i")).toDF("ID", "PAYLOAD")
      def count(t: String): Long = {
        val s = conn.createStatement()
        val rs = s.executeQuery(s"SELECT COUNT(*) FROM GRAFT_O.$t")
        try { rs.next(); rs.getLong(1) } finally { rs.close(); s.close() }
      }
      def restore(t: String, mode: JdbcLoad.Overwrite): Unit = {
        JdbcLoad.purge(conn, "GRAFT_O", t, mode)
        if (mode == JdbcLoad.Overwrite.Drop) {
          // the reference replays the dump's CREATE after a DROP
          // (schema_state=NOT_CREATED retry, myloader_restore_job.c:364)
          val s = conn.createStatement()
          s.execute(s"CREATE TABLE GRAFT_O.$t " +
            "(ID INT NOT NULL PRIMARY KEY, PAYLOAD VARCHAR(32))")
          s.close()
        }
        JdbcLoad.write(dump.repartition(2), JdbcLoad.spec(url, s"GRAFT_O.$t",
          user = "APP", password = "",
          overwrite = if (mode == JdbcLoad.Overwrite.Drop ||
            mode == JdbcLoad.Overwrite.Truncate) JdbcLoad.Overwrite.Append
          else mode,
          connections = 2, disableChecks = false))
      }

      seed("T_FAIL")
      val e = intercept[IllegalStateException] {
        restore("T_FAIL", JdbcLoad.Overwrite.Fail)
      }
      assert(e.getMessage.contains("FAIL"))
      assert(count("T_FAIL") === oldRows, "FAIL mode must not touch rows")

      seed("T_NONE") // the reference's NONE: no purge, dump appends
      restore("T_NONE", JdbcLoad.Overwrite.Append)
      assert(count("T_NONE") === oldRows + newRows)

      seed("T_DROP")
      restore("T_DROP", JdbcLoad.Overwrite.Drop)
      assert(count("T_DROP") === newRows)
      assert(!indexExists("T_DROP"),
        "DROP recreates from dump DDL; the pre-existing index is gone")

      seed("T_TRUNC")
      restore("T_TRUNC", JdbcLoad.Overwrite.Truncate)
      assert(count("T_TRUNC") === newRows)
      assert(indexExists("T_TRUNC"), "TRUNCATE keeps DDL and indexes")

      seed("T_DEL")
      restore("T_DEL", JdbcLoad.Overwrite.Delete)
      assert(count("T_DEL") === newRows)
      assert(indexExists("T_DEL"), "DELETE keeps DDL and indexes")

      // DROP on a missing table is tolerated (IF EXISTS semantics)
      JdbcLoad.purge(conn, "GRAFT_O", "T_GONE", JdbcLoad.Overwrite.Drop)
    } finally {
      conn.close()
      try DriverManager.getConnection(s"jdbc:derby:$dbDir/owdb;shutdown=true")
      catch { case _: java.sql.SQLException => () }
    }
  }
}

package graft

import java.nio.file.Files
import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.extract.Discovery
import graft.functions.Checksum
import graft.sources.SqlInsertReader

/** Live view surface (specific_33 `--views-as-tables`, specific_35
  * `--no-views`, and the definer flip of specific_11/12 on the view
  * path): views are DISCOVERED from a live catalog (standard JDBC
  * metadata on embedded Derby, the same stand-in DerbyRoundTripSpec
  * uses for the server), then routed through the three reference modes
  * by [[Dump.dumpViews]] — placeholder+CREATE VIEW pair by default,
  * nothing under no-views, real-typed placeholder + the view's ROWS
  * under views-as-tables (mydumper_jobs.c:472-620,
  * mydumper_working_thread.c view routing). The views-as-tables leg
  * closes the loop the file-shape specs could not: live view data →
  * SQL dump → restore → checksum equality against the live SELECT. */
class ViewLiveSpec extends SparkTestBase {

  test("live Derby views: discovery + default / no-views / views-as-tables " +
      "modes (specific_33/35)") {
    val dbDir = Files.createTempDirectory("graft_derby_view").toString
    System.setProperty("derby.system.home", dbDir)
    val url = s"jdbc:derby:$dbDir/viewdb;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA GRAFT_V")
      st.execute("CREATE TABLE GRAFT_V.ORDERS (" +
        "ID INT NOT NULL PRIMARY KEY, GRP INT, AMOUNT INT, NOTE VARCHAR(32))")
      // a projecting + filtering view with RENAMED columns: the
      // placeholder must carry the view's own column names/types, not
      // the base table's
      st.execute("CREATE VIEW GRAFT_V.BIG_ORDERS (OID, BUCKET, AMT) AS " +
        "SELECT ID, GRP, AMOUNT FROM GRAFT_V.ORDERS WHERE AMOUNT > 500")
      st.close()
      val ps = conn.prepareStatement("INSERT INTO GRAFT_V.ORDERS VALUES (?,?,?,?)")
      (0 until 2000).foreach { i =>
        ps.setInt(1, i); ps.setInt(2, i % 5); ps.setInt(3, i % 1000)
        ps.setString(4, s"note-$i"); ps.addBatch()
        if (i % 500 == 499) ps.executeBatch()
      }
      ps.executeBatch(); ps.close()

      // ---- discovery: the view list is separate from the base-table
      // walk (Discovery.tables keeps excluding views from the data path)
      val metas = Discovery.tables(conn, "GRAFT_V")
      assert(metas.map(_.table) === Seq("ORDERS"),
        "views must not leak into the base-table data walk")
      val vs = Discovery.views(conn, "GRAFT_V")
      assert(vs.map(_.name) === Seq("BIG_ORDERS"))
      val v = vs.head
      assert(v.columns.map(_._1) === Seq("OID", "BUCKET", "AMT"))
      assert(v.columns.map(_._2).forall(_ == "integer"), v.columns.toString)
      assert(v.definition.exists(_.toUpperCase.contains("AMOUNT > 500")),
        s"Derby catalog definition not retrieved: ${v.definition}")

      def cfg(dir: String) = Dump.Config(outDir = dir, db = "gv")
      def names(dir: String): Seq[String] =
        new java.io.File(dir).listFiles().map(_.getName).toSeq.sorted

      // ---- default: placeholder + view file, NO data files
      val d1 = Files.createTempDirectory("graft_view_d1").toString
      val r1 = Dump.dumpViews(vs, cfg(d1))
      assert(r1.isEmpty, "default mode must not dump view data")
      assert(names(d1) === Seq("gv.BIG_ORDERS-schema-view.sql",
        "gv.BIG_ORDERS-schema.sql"))
      val placeholder = new String(Files.readAllBytes(
        java.nio.file.Paths.get(d1, "gv.BIG_ORDERS-schema.sql")))
      // reference placeholder: first column keeps its type, rest
      // collapse to int (here all int anyway) — and it is a TABLE
      assert(placeholder.contains("CREATE TABLE IF NOT EXISTS"))
      val viewFile = new String(Files.readAllBytes(
        java.nio.file.Paths.get(d1, "gv.BIG_ORDERS-schema-view.sql")))
      assert(viewFile.toUpperCase.contains("AMOUNT > 500"),
        "live catalog CREATE VIEW text must reach the view file")
      assert(Load.classify("gv.BIG_ORDERS-schema-view.sql") === Load.SchemaView)
      // the placeholder must NOT become a data-phase source (no chunks)
      assert(Load.sourcesFromDir(d1).isEmpty)

      // ---- no-views: nothing view-related at all
      val d2 = Files.createTempDirectory("graft_view_d2").toString
      assert(Dump.dumpViews(vs, cfg(d2), noViews = true).isEmpty)
      assert(names(d2).isEmpty, s"no-views leaked artifacts: ${names(d2)}")

      // ---- views-as-tables: real-typed placeholder, no view file, and
      // the view's rows dumped + restored checksum-exact
      val plain = new Properties(); plain.setProperty("user", "APP")
      val d3 = Files.createTempDirectory("graft_view_d3").toString
      val r3 = Dump.dumpViews(vs, cfg(d3), viewsAsTables = true,
        readView = name => spark.read.jdbc(url, s"GRAFT_V.$name", plain))
      assert(r3.map(_.table) === Seq("BIG_ORDERS"))
      assert(r3.head.rows === 998L) // AMOUNT in 501..999, per 1000-cycle x2
      assert(!names(d3).exists(_.endsWith("-schema-view.sql")),
        "views-as-tables must not also emit the CREATE VIEW file")
      val vat = new String(Files.readAllBytes(
        java.nio.file.Paths.get(d3, "gv.BIG_ORDERS-schema.sql")))
      // dumpTable's own DDL emitter re-writes the stem's -schema.sql from
      // the DataFrame schema, so the restore target is a real-typed
      // CREATE TABLE (INT columns), not the int-collapsed placeholder
      assert(vat.toUpperCase.contains("`OID` INT") &&
        vat.toUpperCase.contains("`AMT` INT"),
        s"views-as-tables table DDL must keep REAL column types:\n$vat")
      // data phase sees it like any base table
      assert(Load.sourcesFromDir(d3).map(_.table) === Seq("gv.BIG_ORDERS"))
      val live = spark.read.jdbc(url, "GRAFT_V.BIG_ORDERS", plain)
      val back = SqlInsertReader.read(spark, d3, live.schema,
        "gv.BIG_ORDERS.*.sql*")
      assert(back.count() === 998L)
      val cols = live.columns.toSeq
      def ck(df: org.apache.spark.sql.DataFrame) =
        df.agg(Checksum.tableChecksum(df, cols)).head().getLong(0)
      assert(ck(back) === ck(live),
        "views-as-tables restore diverged from the live view's rows")

      // ---- definer flip on the view path (specific_11/12 flavor): a
      // MySQL-lineage CREATE VIEW with a DEFINER token strips under
      // skip-definer and survives without it
      val withDefiner = v.copy(definition = Some(
        "CREATE DEFINER=`admin`@`%` SQL SECURITY INVOKER VIEW BIG_ORDERS " +
          "AS SELECT ID, GRP, AMOUNT FROM ORDERS WHERE AMOUNT > 500"))
      val d4 = Files.createTempDirectory("graft_view_d4").toString
      Dump.dumpViews(Seq(withDefiner), cfg(d4), skipDefiner = true)
      val stripped = new String(Files.readAllBytes(
        java.nio.file.Paths.get(d4, "gv.BIG_ORDERS-schema-view.sql")))
      assert(!stripped.contains("DEFINER="), "skip-definer left the token")
      val d5 = Files.createTempDirectory("graft_view_d5").toString
      Dump.dumpViews(Seq(withDefiner), cfg(d5))
      val kept = new String(Files.readAllBytes(
        java.nio.file.Paths.get(d5, "gv.BIG_ORDERS-schema-view.sql")))
      assert(kept.contains("DEFINER=`admin`@`%`"), "default dropped DEFINER")
    } finally {
      conn.close()
      try DriverManager.getConnection(s"jdbc:derby:$dbDir/viewdb;shutdown=true")
      catch { case _: java.sql.SQLException => () }
    }
  }
}

package graft

import graft.sources.SchemaObjects

/** View-pair / header / definer fidelity vs the reference
  * (mydumper_common.c:127-151,406-423; mydumper_jobs.c:472-620;
  * common.c:799-837). */
class SchemaObjectsSpec extends SparkTestBase {

  test("file header shapes per server family (mydumper_common.c:406-423)") {
    assert(SchemaObjects.fileHeader() ===
      "/*!40101 SET NAMES binary*/;\n" +
      "/*!40014 SET FOREIGN_KEY_CHECKS=0*/;\n" +
      "/*!40103 SET TIME_ZONE='+00:00' */;\n")
    // sql_mode rides in the header unless --compact
    val withMode = SchemaObjects.fileHeader(sqlMode = Some("''"))
    assert(withMode.contains("/*!40101 SET SQL_MODE=''*/;\n"))
    assert(!SchemaObjects.fileHeader(sqlMode = Some("''"), compact = true)
      .contains("SQL_MODE"))
    // TiDB: time zone only; other engines: bare FK line
    assert(SchemaObjects.fileHeader(mysqlLike = false, tidb = true) ===
      "/*!40103 SET TIME_ZONE='+00:00' */;\n")
    assert(SchemaObjects.fileHeader(mysqlLike = false) ===
      "SET FOREIGN_KEY_CHECKS=0;\n")
    assert(SchemaObjects.fileHeader(skipTz = true) ===
      "/*!40101 SET NAMES binary*/;\n/*!40014 SET FOREIGN_KEY_CHECKS=0*/;\n")
  }

  test("definer rewrite: 50-char window, CREATE-only, space-blank skip (common.c:799-837)") {
    val ddl = "CREATE ALGORITHM=UNDEFINED DEFINER=`root`@`%` SQL SECURITY DEFINER VIEW `v1` AS select 1"
    // skip blanks the token in place, preserving length
    val skipped = SchemaObjects.updateDefiner(ddl, skip = true)
    assert(skipped.length === ddl.length)
    assert(!skipped.contains("DEFINER=`root`"))
    // the trailing SQL SECURITY DEFINER survives (outside the token)
    assert(skipped.contains("SQL SECURITY DEFINER"))
    // replace swaps the token once
    val replaced = SchemaObjects.updateDefiner(ddl, replace = Some("DEFINER=`app`@`localhost`"))
    assert(replaced.contains("DEFINER=`app`@`localhost` SQL SECURITY"))
    assert(!replaced.contains("`root`"))
    // non-CREATE statements pass through
    assert(SchemaObjects.updateDefiner("ALTER DEFINER=`x`@`%` EVENT e", skip = true)
      === "ALTER DEFINER=`x`@`%` EVENT e")
    // a DEFINER beyond the 50-char window is untouched (reference
    // searches g_strstr_len(str, 50, ...))
    val far = "CREATE VIEW `a_really_long_view_name_padding_x` AS /* DEFINER=`x`@`%` */ select 1"
    assert(far.indexOf(" DEFINER=") > 50)
    assert(SchemaObjects.updateDefiner(far, skip = true) === far)
    // token at end of statement (no trailing space): the reference's
    // `if (to)` guard bails — statement unchanged
    val tail = "CREATE EVENT e DEFINER=`root`@`%`"
    assert(SchemaObjects.updateDefiner(tail, skip = true) === tail)
    assert(SchemaObjects.updateDefiner(tail, replace = Some("DEFINER=x")) === tail)
  }

  test("view dependency table: first column keeps its type, rest collapse to int (mydumper_jobs.c:519-540)") {
    val t = SchemaObjects.viewDependencyTable("v1",
      Seq("id" -> "bigint", "name" -> "varchar(64)", "total" -> "decimal(18,2)"))
    assert(t ===
      "CREATE TABLE IF NOT EXISTS `v1`(\n" +
      "`id` bigint,\n" +
      "`name` int,\n" +
      "`total` int\n" +
      ") ENGINE=MEMORY ENCRYPTION='N';\n")
    // --views-as-tables keeps real types (the placeholder holds data)
    val vat = SchemaObjects.viewDependencyTable("v1",
      Seq("id" -> "bigint", "name" -> "varchar(64)"), viewsAsTables = true)
    assert(vat.contains("`name` varchar(64)"))
    // non-MySQL lineage: no ENCRYPTION clause
    assert(!SchemaObjects.viewDependencyTable("v", Seq("a" -> "int"),
      encryption = false).contains("ENCRYPTION"))
  }

  test("schema-view file: DROP pair, charset save/restore around the definer-rewritten view") {
    val f = SchemaObjects.createViewFile("v1",
      "CREATE DEFINER=`root`@`%` VIEW `v1` AS select `id` from `t`",
      skipDefiner = true)
    val lines = f.split("\n").toSeq
    val dropTableAt = lines.indexWhere(_ == "DROP TABLE IF EXISTS `v1`;")
    val dropViewAt = lines.indexWhere(_ == "DROP VIEW IF EXISTS `v1`;")
    val saveAt = lines.indexWhere(_.startsWith("SET @PREV_CHARACTER_SET_CLIENT"))
    val viewAt = lines.indexWhere(_.startsWith("CREATE "))
    val restoreAt = lines.indexWhere(_ == "SET character_set_client = @PREV_CHARACTER_SET_CLIENT;")
    assert(dropTableAt >= 0 && dropTableAt < dropViewAt)
    assert(dropViewAt < saveAt && saveAt < viewAt && viewAt < restoreAt)
    assert(!f.contains("DEFINER=`root`"))
    assert(f.endsWith("SET collation_connection = @PREV_COLLATION_CONNECTION;\n"))
  }

  test("triggers file: per-trigger charset + DROP + body semicolon guard (mydumper_jobs.c:344-407)") {
    val body = "CREATE DEFINER=`root`@`%` TRIGGER upd BEFORE UPDATE ON t FOR EACH ROW\nBEGIN\n  SET NEW.x = 1;\n  SET NEW.y = 2;\nEND"
    val f = SchemaObjects.createTriggersFile(
      Seq(("upd", body, "utf8mb4", "utf8mb4_0900_ai_ci")), skipDefiner = true)
    assert(f.contains("DROP TRIGGER IF EXISTS `upd`;\n"))
    assert(!f.contains("DEFINER=`root`"))
    // the `;\n` → `; \n` rewrite: no statement terminator survives
    // INSIDE the body (the final terminator is the appended one)
    val bodyPart = f.substring(f.indexOf("CREATE"), f.indexOf("END;"))
    assert(!bodyPart.contains(";\n"))
    assert(bodyPart.contains("SET NEW.x = 1; \n"))
    // charset restore follows the definition
    assert(f.indexOf("SET character_set_client = @PREV_CHARACTER_SET_CLIENT;")
      > f.indexOf("END;"))
    // two triggers → two charset save blocks
    val two = SchemaObjects.createTriggersFile(Seq(
      ("a", "CREATE TRIGGER a BEFORE INSERT ON t FOR EACH ROW SET @x=1", "latin1", "latin1_swedish_ci"),
      ("b", "CREATE TRIGGER b AFTER INSERT ON t FOR EACH ROW SET @y=2", "utf8mb4", "utf8mb4_0900_ai_ci")))
    assert("SET @PREV_CHARACTER_SET_CLIENT".r.findAllIn(two).size === 2)
    assert(two.contains("SET character_set_client = latin1;"))
  }

  test("sequence file: DROP pair, CREATE SEQUENCE, DO SETVAL (mydumper_jobs.c:623-693)") {
    val f = SchemaObjects.createSequenceFile("s1",
      "CREATE SEQUENCE `s1` start with 1 minvalue 1 maxvalue 9223372036854775806 increment by 1 cache 1000 nocycle ENGINE=InnoDB",
      nextValue = Some(4242))
    assert(f.contains("DROP TABLE IF EXISTS `s1`;\nDROP VIEW IF EXISTS `s1`;\n"))
    assert(f.contains("CREATE SEQUENCE `s1` start with 1"))
    assert(f.endsWith("DO SETVAL(`s1`, 4242, 0);\n"))
    assert(Load.classify("tpch.s1-schema-sequence.sql") === Load.SchemaSequence)
    // no captured position → no SETVAL line
    assert(!SchemaObjects.createSequenceFile("s1", "CREATE SEQUENCE `s1`")
      .contains("SETVAL"))
  }

  test("post file: functions/procedures before events, skip-only definer (mydumper_jobs.c:700-830)") {
    val f = SchemaObjects.createPostFile(Seq(
      ("EVENT", "ev1", "CREATE DEFINER=`root`@`%` EVENT ev1 ON SCHEDULE EVERY 1 DAY DO SET @x=1", "utf8mb4", "utf8mb4_0900_ai_ci"),
      ("PROCEDURE", "p1", "CREATE DEFINER=`root`@`%` PROCEDURE p1()\nBEGIN\n  SET @a=1;\nEND", "utf8mb4", "utf8mb4_0900_ai_ci"),
      ("FUNCTION", "f1", "CREATE DEFINER=`root`@`%` FUNCTION f1() RETURNS int RETURN 1", "utf8mb4", "utf8mb4_0900_ai_ci")),
      skipDefiner = true)
    // reference emit order: FUNCTION, PROCEDURE, then EVENT
    val fAt = f.indexOf("DROP FUNCTION IF EXISTS `f1`;")
    val pAt = f.indexOf("DROP PROCEDURE IF EXISTS `p1`;")
    val eAt = f.indexOf("DROP EVENT IF EXISTS `ev1`;")
    assert(fAt >= 0 && fAt < pAt && pAt < eAt)
    assert(!f.contains("DEFINER=`root`"))
    // procedure body semicolons guarded
    assert(f.contains("SET @a=1; \n"))
    assert(Load.classify("tpch-schema-post.sql") === Load.SchemaPost)
  }

  test("SQL data files start with the header block; round trip unaffected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hdr_").toString
    Dump.run(spark, Seq(("region", Tables.region(spark, sf), true)),
      Dump.Config(outDir = dir, db = "tpch"))
    val dataFile = new java.io.File(dir).listFiles()
      .filter(f => Load.classify(f.getName) == Load.Data).minBy(_.getName)
    val text = new String(java.nio.file.Files.readAllBytes(dataFile.toPath))
    assert(text.startsWith("/*!40101 SET NAMES binary*/;\n" +
      "/*!40014 SET FOREIGN_KEY_CHECKS=0*/;\n" +
      "/*!40103 SET TIME_ZONE='+00:00' */;\n"))
    // the reader skips the header statements and yields the same rows
    val src = Load.sourcesFromDir(dir)
    val back = graft.sources.SqlInsertReader.read(spark, dir,
      src.head.schema, glob = "tpch.region.*.sql*")
    assert(back.count() === Tables.region(spark, sf).count())
    // headerless mode for engine-internal dumps
    val dir2 = java.nio.file.Files.createTempDirectory("graft_nohdr_").toString
    Dump.run(spark, Seq(("region", Tables.region(spark, sf), true)),
      Dump.Config(outDir = dir2, db = "tpch", sqlFileHeaders = false))
    val f2 = new java.io.File(dir2).listFiles()
      .filter(f => Load.classify(f.getName) == Load.Data).minBy(_.getName)
    assert(new String(java.nio.file.Files.readAllBytes(f2.toPath))
      .startsWith("INSERT INTO"))
  }

  test("Dump.writeView emits the pair; router classifies both; views-as-tables emits one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_view_").toString
    val paths = Dump.writeView(dir, "tpch", "v_totals",
      Seq("o_custkey" -> "bigint", "total" -> "decimal(18,2)"),
      "CREATE DEFINER=`root`@`%` VIEW `v_totals` AS select 1")
    assert(paths.map(_.getFileName.toString) ===
      Seq("tpch.v_totals-schema.sql", "tpch.v_totals-schema-view.sql"))
    assert(Load.classify(paths.head.getFileName.toString) === Load.Schema)
    assert(Load.classify(paths(1).getFileName.toString) === Load.SchemaView)
    // placeholder restores before the view phase
    assert(Load.phaseOf(Load.Schema) < Load.phaseOf(Load.SchemaView))
    val dep = new String(java.nio.file.Files.readAllBytes(paths.head))
    assert(dep.contains("CREATE TABLE IF NOT EXISTS `v_totals`("))
    assert(dep.contains("ENGINE=MEMORY"))
    val vat = Dump.writeView(dir, "tpch", "v2", Seq("a" -> "int"),
      "CREATE VIEW `v2` AS select 1", viewsAsTables = true)
    assert(vat.map(_.getFileName.toString) === Seq("tpch.v2-schema.sql"))
    // the placeholder parses despite its unindented reference layout +
    // header, and a view stem is EXCLUDED from data-phase sources while
    // the views-as-tables placeholder (no -schema-view sibling) loads
    val parsed = graft.sources.DdlEmitter.parseColumns(
      new String(java.nio.file.Files.readAllBytes(paths.head)))
    assert(parsed.map(_._1) === Seq("o_custkey", "total"))
    val srcs = Load.sourcesFromDir(dir)
    assert(!srcs.exists(_.table.contains("v_totals")))
    assert(srcs.exists(_.table.contains("v2")))
  }
}

package graft

import graft.load.RestoreStatements
import graft.sources.SchemaObjects
import org.scalatest.funsuite.AnyFunSuite

/** Restore-side statement reader vs the dump writers' byte shapes
  * (myloader_restore.c:825-870, common.c:1124-1149). */
class RestoreStatementsSpec extends AnyFunSuite {

  test("split: ;\\n-tail completion, trigger bodies stay whole") {
    val file = SchemaObjects.createTriggersFile(Seq(
      ("upd", "CREATE TRIGGER upd BEFORE UPDATE ON t FOR EACH ROW\nBEGIN\n  SET NEW.x = 1;\n  SET NEW.y = 2;\nEND",
        "utf8mb4", "utf8mb4_0900_ai_ci")))
    val stmts = RestoreStatements.split(file)
    // the CREATE TRIGGER with two internal `; \n` guards is ONE statement
    val creates = stmts.filter(_.startsWith("CREATE TRIGGER"))
    assert(creates.size === 1)
    assert(creates.head.contains("SET NEW.x = 1; \n"))
    assert(creates.head.contains("END;\n"))
    // headers/charset/drops each split on their own terminator
    assert(stmts.exists(_.startsWith("/*!40101 SET NAMES")))
    assert(stmts.exists(_.startsWith("DROP TRIGGER IF EXISTS `upd`")))
    // every piece of the file is accounted for
    assert(stmts.mkString === file)
  }

  test("kind probe windows (myloader_restore.c:866,878)") {
    assert(RestoreStatements.kindOf("INSERT INTO t VALUES (1);\n") === RestoreStatements.Insert)
    assert(RestoreStatements.kindOf("LOAD DATA LOCAL INFILE 'f' INTO TABLE t;\n") === RestoreStatements.LoadData)
    assert(RestoreStatements.kindOf("CREATE TABLE t (a int);\n") === RestoreStatements.Other)
    assert(RestoreStatements.kindOf("SET NAMES binary;\n") === RestoreStatements.Other)
  }

  test("prepare: restore-time definer rewrite, ignore-set drop, JDBC trim") {
    val s = "CREATE DEFINER=`root`@`%` VIEW `v` AS select 1;\n"
    assert(RestoreStatements.prepare(s, skipDefiner = true).exists(!_.contains("DEFINER=`root`")))
    // ignore-set drops the statement entirely
    assert(RestoreStatements.prepare("SET @@SESSION.SQL_LOG_BIN= 0;\n",
      ignoreSet = Seq("@@SESSION.SQL_LOG_BIN")).isEmpty)
    // trailing `;` and newline trimmed for JDBC execute
    assert(RestoreStatements.prepare("DROP VIEW IF EXISTS `v`;\n")
      === Some("DROP VIEW IF EXISTS `v`"))
  }

  test("executeSchemaFile drives a view pair end-to-end in order") {
    val f = SchemaObjects.createViewFile("v1",
      "CREATE DEFINER=`root`@`%` VIEW `v1` AS select `id` from `t`")
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = RestoreStatements.executeSchemaFile(f, ran += _, skipDefiner = true)
    assert(n === ran.size)
    val di = ran.indexWhere(_.startsWith("DROP TABLE IF EXISTS `v1`"))
    val vi = ran.indexWhere(_.startsWith("CREATE"))
    assert(di >= 0 && di < vi)
    assert(ran(vi).contains("VIEW `v1`"))
    assert(!ran(vi).contains("`root`"))
    // dump-side wrote WITH definer; restore-side skip removed it — the
    // reference applies the rewrite on BOTH ends
  }
}

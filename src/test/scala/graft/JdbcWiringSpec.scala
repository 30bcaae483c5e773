package graft

import graft.core.ChunkSpec
import graft.extract.{JdbcExtract, Snapshot}
import graft.load.JdbcLoad
import org.apache.spark.sql.SaveMode

/** JDBC wiring (no live server): the generated read/write invocations
  * carry the reference's semantics — chunk predicates per partition,
  * snapshot statements per connection, loader batch/overwrite knobs. */
class JdbcWiringSpec extends SparkTestBase {

  test("extract spec: chunk predicates AND user where, snapshot session init") {
    val plan = Snapshot.plan(Snapshot.Gtid, Snapshot.MySQL)
    val s = JdbcExtract.spec("jdbc:mysql://h/db", "db.t",
      ChunkSpec.IntRange("id", 0, 99, 50), plan,
      user = "u", password = "p", where = Some("active = 1"))
    assert(s.predicates.length === 2)
    assert(s.predicates.forall(_.endsWith(" AND (active = 1)")))
    assert(s.predicates.head.contains("IS NULL")) // first chunk keeps NULLs
    val init = s.props.getProperty("sessionInitStatement")
    assert(init.contains("START TRANSACTION"))
    assert(init.contains("TIME_ZONE"))
    assert(s.props.getProperty("fetchsize") === "10000")
  }

  test("extract spec: whole table with no where has no predicates") {
    val plan = Snapshot.plan(Snapshot.NoLock, Snapshot.MySQL)
    val s = JdbcExtract.spec("jdbc:mysql://h/db", "db.t",
      ChunkSpec.WholeTable, plan, "u", "p")
    assert(s.predicates.isEmpty)
  }

  test("load spec: overwrite modes map to SaveMode + truncate option") {
    val t = JdbcLoad.spec("jdbc:mysql://h/db", "db.t", "u", "p",
      overwrite = JdbcLoad.Overwrite.Truncate)
    assert(t.mode === SaveMode.Overwrite)
    assert(t.options("truncate") === "true")
    assert(t.options("batchsize") === "1000")
    assert(t.options("sessionInitStatement").contains("UNIQUE_CHECKS=0"))
    val f = JdbcLoad.spec("jdbc:mysql://h/db", "db.t", "u", "p",
      overwrite = JdbcLoad.Overwrite.Fail, disableChecks = false)
    assert(f.mode === SaveMode.ErrorIfExists)
    assert(!f.options.contains("sessionInitStatement"))
  }
}

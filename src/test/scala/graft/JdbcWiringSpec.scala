package graft

import java.sql.{Connection, Driver}
import java.util.ServiceLoader

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.core.ChunkSpec
import graft.extract.{JdbcExtract, Snapshot}
import graft.load.{GraftConnectionProvider, JdbcLoad}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.jdbc.JdbcConnectionProvider

/** JDBC wiring (no live server): the generated read/write invocations
  * carry the reference's semantics — chunk predicates per partition,
  * snapshot statements per connection, loader batch/overwrite knobs —
  * and the session-init connection provider actually EXECUTES its
  * statements (verified against a fake java.sql.Driver, since Spark's
  * own sessionInitStatement is read-path-only and single-statement). */
class JdbcWiringSpec extends SparkTestBase {

  test("extract spec: chunk predicates AND user where, snapshot session init") {
    val plan = Snapshot.plan(Snapshot.Gtid, Snapshot.MySQL)
    val s = JdbcExtract.spec("jdbc:mysql://h/db", "db.t",
      ChunkSpec.IntRange("id", 0, 99, 50), plan,
      user = "u", password = "p", where = Some("active = 1"))
    assert(s.predicates.length === 2)
    assert(s.predicates.forall(_.endsWith(" AND (active = 1)")))
    assert(s.predicates.head.contains("IS NULL")) // first chunk keeps NULLs
    val init = s.props.getProperty(GraftConnectionProvider.InitOption)
    assert(init.contains("START TRANSACTION"))
    assert(init.contains("TIME_ZONE"))
    // routed through the provider so each statement executes individually
    assert(s.props.getProperty("connectionProvider") === GraftConnectionProvider.Name)
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
    assert(t.options(GraftConnectionProvider.InitOption).contains("UNIQUE_CHECKS=0"))
    assert(t.options("connectionProvider") === GraftConnectionProvider.Name)
    // the read-path-only option must NOT appear: the write path ignores
    // it, and relying on it would silently skip the session setup
    assert(!t.options.contains("sessionInitStatement"))
    val f = JdbcLoad.spec("jdbc:mysql://h/db", "db.t", "u", "p",
      overwrite = JdbcLoad.Overwrite.Fail, disableChecks = false)
    assert(f.mode === SaveMode.ErrorIfExists)
    assert(!f.options.contains(GraftConnectionProvider.InitOption))
  }

  /** Fake driver: hands out proxy Connections that record every
    * Statement.execute(sql) into `executed`. */
  private class FakeDriver extends Driver {
    val executed = mutable.Buffer.empty[String]
    override def connect(url: String, info: java.util.Properties): Connection = {
      val handler = new java.lang.reflect.InvocationHandler {
        def invoke(proxy: Any, m: java.lang.reflect.Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "equals"   => java.lang.Boolean.valueOf(proxy.asInstanceOf[AnyRef] eq args(0))
            case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
            case "toString" => "FakeConnection"
            case "createStatement" =>
              java.lang.reflect.Proxy.newProxyInstance(
                getClass.getClassLoader, Array(classOf[java.sql.Statement]),
                (_, sm, sargs) => sm.getName match {
                  case "execute" => executed += sargs(0).toString; java.lang.Boolean.TRUE
                  case "close"   => null
                  case _         => null
                })
            case "close" => null
            case _       => null
          }
      }
      java.lang.reflect.Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Connection]), handler).asInstanceOf[Connection]
    }
    override def acceptsURL(url: String): Boolean = true
    override def getPropertyInfo(u: String, p: java.util.Properties) = Array.empty
    override def getMajorVersion = 1
    override def getMinorVersion = 0
    override def jdbcCompliant() = false
    override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException
  }

  test("connection provider executes each init statement individually") {
    val d = new FakeDriver
    val stmts = Seq("SET UNIQUE_CHECKS=0", "SET FOREIGN_KEY_CHECKS=0",
      "SET SQL_LOG_BIN=0")
    val opts = GraftConnectionProvider.options(stmts) +
      ("url" -> "jdbc:fake://h/db")
    val p = new GraftConnectionProvider
    assert(p.canHandle(d, opts))
    assert(!p.canHandle(d, Map("url" -> "jdbc:fake://h/db")))
    val conn = p.getConnection(d, opts)
    assert(conn != null)
    assert(d.executed.toSeq === stmts) // one execute() per statement, in order
  }

  test("statements containing semicolons survive the option round-trip") {
    val stmts = Seq("SET @msg = 'a;b;c'", "START TRANSACTION")
    val opts = GraftConnectionProvider.options(stmts) + ("url" -> "jdbc:fake://x")
    val d = new FakeDriver
    new GraftConnectionProvider().getConnection(d, opts)
    assert(d.executed.toSeq === stmts)
  }

  test("pinned pool: N physical connections serve many checkout/close cycles") {
    import graft.load.PinnedConnectionPool
    var connects = 0
    val d = new FakeDriver { }
    val key = PinnedConnectionPool.Key("jdbc:fake://pinned", "u")
    val init = Seq("SET A", "START TRANSACTION /*snapshot*/")
    def mk() = { connects += 1; d.connect("jdbc:fake://pinned", new java.util.Properties) }
    try {
      // 5 sequential partition reads over a 2-member pool
      (1 to 5).foreach { _ =>
        val c = PinnedConnectionPool.checkout(key, 2, init, () => mk())
        assert(!c.isClosed)
        c.close()          // JDBCRDD's per-partition close -> returned, not closed
        assert(c.isClosed) // proxy reports returned state
        c.close()          // double-close is a no-op per JDBC contract
      }
      assert(connects === 2, "pool must reuse physical connections")
      // init (and so the snapshot) ran once per PHYSICAL member
      assert(d.executed.toSeq === init ++ init)
      assert(PinnedConnectionPool.poolSize(key) === 2)
      // use-after-return is a bug, not a silent wrong-snapshot read
      val c = PinnedConnectionPool.checkout(key, 2, init, () => mk())
      c.close()
      intercept[Throwable](c.createStatement())
    } finally PinnedConnectionPool.shutdown(key)
    assert(PinnedConnectionPool.poolSize(key) === 0)
  }

  test("pinned pool blocks concurrent checkouts at the cap and serves all") {
    import graft.load.PinnedConnectionPool
    import java.util.concurrent.atomic.AtomicInteger
    val d = new FakeDriver
    val key = PinnedConnectionPool.Key("jdbc:fake://conc", "u")
    val inUse = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    try {
      val threads = (1 to 8).map { _ =>
        new Thread(() => {
          val c = PinnedConnectionPool.checkout(key, 2, Nil,
            () => d.connect("jdbc:fake://conc", new java.util.Properties))
          val cur = inUse.incrementAndGet()
          peak.updateAndGet(m => math.max(m, cur))
          Thread.sleep(15) // hold the member briefly
          inUse.decrementAndGet()
          c.close()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(30000))
      assert(peak.get() <= 2, s"more members in use than the pool size: ${peak.get()}")
      assert(PinnedConnectionPool.poolSize(key) === 2)
    } finally PinnedConnectionPool.shutdown(key)
  }

  test("provider routes through the pinned pool when the option is set") {
    import graft.load.PinnedConnectionPool
    val d = new FakeDriver
    val opts = GraftConnectionProvider.options(
      Seq("START TRANSACTION /*snapshot*/"), pinnedPool = Some(1)) +
      ("url" -> "jdbc:fake://viaprovider", "user" -> "u")
    val p = new GraftConnectionProvider
    try {
      assert(p.canHandle(d, opts))
      val c1 = p.getConnection(d, opts); c1.close()
      val c2 = p.getConnection(d, opts); c2.close()
      // one physical connection, one snapshot open, two partition reads
      assert(d.executed.toSeq === Seq("START TRANSACTION /*snapshot*/"))
    } finally PinnedConnectionPool.shutdown(
      PinnedConnectionPool.Key("jdbc:fake://viaprovider", "u"))
  }

  test("physical partitions map to PARTITION-clause dbtable subqueries") {
    val subs = JdbcExtract.partitionDbtables("db.t", Seq("p0", "p1"))
    assert(subs === Seq(
      "(SELECT * FROM db.t PARTITION (p0)) AS __graft_p0",
      "(SELECT * FROM db.t PARTITION (p1)) AS __graft_p1"))
  }

  test("provider is discoverable through the JdbcConnectionProvider SPI") {
    val names = ServiceLoader.load(classOf[JdbcConnectionProvider])
      .iterator().asScala.map(_.name).toSet
    assert(names.contains(GraftConnectionProvider.Name))
  }
}

package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, ResultSet}

import graft.core.{ChunkRows, ChunkSpec, ColumnMeta, TableConfig, TableMeta}
import graft.extract.JdbcExtract
import org.scalatest.funsuite.AnyFunSuite

/** Execution-asserts the per-table strategy chooser against a recording
  * fake driver: probe order, short-circuits, and plan choice phase-for-
  * phase with the reference's set_chunk_strategy_for_dbt
  * (mydumper_chunks.c:312-345) + initialize_chunk_step_item (:104-253).
  */
class ChunkStrategySpec extends AnyFunSuite {

  /** One canned result: a row of string cells + the JDBC type reported
    * for column 1 (the MIN/MAX probe types off it); `more` holds
    * additional rows (the descent's GROUP BY probe is multi-row). */
  private case class Res(row: Seq[String], colType: Int = java.sql.Types.VARCHAR,
      more: Seq[Seq[String]] = Nil)

  /** Connection whose every query routes through `route`; executed SQL
    * accumulates in `log` (prepared-statement params appended). */
  private def fakeConn(log: collection.mutable.Buffer[String],
      route: String => Res): Connection = {
    def rs(r: Res): ResultSet = {
      var i = -1
      val meta = Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[java.sql.ResultSetMetaData]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
            case "getColumnType"  => Integer.valueOf(r.colType)
            case "getColumnCount" => Integer.valueOf(r.row.length)
            case other            => throw new UnsupportedOperationException(other)
          }
        })
      Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[ResultSet]),
        new InvocationHandler {
          val rows = (r.row +: r.more).filter(_.nonEmpty)
          def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
            case "next" => i += 1; java.lang.Boolean.valueOf(i < rows.length)
            case "getString" => rows(i)(a(0).asInstanceOf[Integer] - 1)
            case "getLong" =>
              java.lang.Long.valueOf(rows(i)(a(0).asInstanceOf[Integer] - 1).toLong)
            case "getMetaData" => meta
            case "close"       => null
            case other         => throw new UnsupportedOperationException(other)
          }
        }).asInstanceOf[ResultSet]
    }
    def statement(sqlAtCreate: Option[String]): AnyRef = {
      var sql = sqlAtCreate.getOrElse("")
      val params = collection.mutable.Map.empty[Int, String]
      val ifaces: Array[Class[_]] =
        Array(classOf[java.sql.PreparedStatement], classOf[java.sql.Statement])
      Proxy.newProxyInstance(getClass.getClassLoader, ifaces,
        new InvocationHandler {
          def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
            case "setString" =>
              params(a(0).asInstanceOf[Integer].intValue) = a(1).asInstanceOf[String]
              null
            case "executeQuery" =>
              if (a != null && a.nonEmpty) sql = a(0).asInstanceOf[String]
              val bound = params.toSeq.sortBy(_._1).map(_._2)
              log += (sql +: bound).mkString(" | ")
              rs(route(sql))
            case "close" => null
            case other   => throw new UnsupportedOperationException(other)
          }
        })
    }
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" => statement(Some(a(0).asInstanceOf[String]))
          case "createStatement"  => statement(None)
          case "close"            => null
          case other              => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[Connection]
  }

  private def meta(pkType: String = "INTEGER", nullablePk: Boolean = false) =
    TableMeta("shop", "orders",
      columns = Seq(ColumnMeta("id", pkType, nullable = nullablePk),
        ColumnMeta("note", "VARCHAR")),
      primaryKey = Seq("id"))

  test("small table short-circuits to WholeTable before any other probe") {
    val log = collection.mutable.Buffer.empty[String]
    val conn = fakeConn(log, {
      case q if q.startsWith("SELECT COUNT(*)") => Res(Seq("800"))
      case q => fail(s"unexpected probe after short-circuit: $q")
    })
    // rows=800 ≤ min step 1000 → Whole, even though partition_regex is
    // set (reference checks rows BEFORE probing partitions, :323-325)
    val (plan, rows) = JdbcExtract.chunkStrategy(conn, meta(),
      cfg = TableConfig(partitionRegex = Some("p.*")))
    assert(plan === ChunkSpec.WholeTable && rows === 800L)
    assert(log.size === 1 && log.head.contains("COUNT(*)"))
  }

  test("partition plan wins over the integer key and prunes by regex") {
    val log = collection.mutable.Buffer.empty[String]
    val conn = fakeConn(log, {
      case q if q.startsWith("SELECT COUNT(*)")                 => Res(Seq("50000"))
      case q if q.contains("information_schema.PARTITIONS") => Res(Seq("p2023"))
      case q => fail(s"min/max must not be probed when partitions exist: $q")
    })
    val (plan, _) = JdbcExtract.chunkStrategy(conn, meta(),
      cfg = TableConfig(partitionRegex = Some("^p20")))
    assert(plan === ChunkSpec.Partitions(Seq("p2023")))
  }

  test("integer key: auto step = gap/(2^threads - 1) clamped to --rows bounds") {
    def run(rows: Option[ChunkRows], lo: Long, hi: Long,
        count: Long = 50000L): ChunkSpec = {
      val log = collection.mutable.Buffer.empty[String]
      val conn = fakeConn(log, {
        case q if q.startsWith("SELECT COUNT(*)") => Res(Seq(count.toString))
        case q if q.startsWith("SELECT MIN(") =>
          Res(Seq(lo.toString, hi.toString), java.sql.Types.INTEGER)
        case q => fail(s"unexpected: $q")
      })
      JdbcExtract.chunkStrategy(conn, meta(),
        pc = JdbcExtract.PlanConfig(rows = rows))._1
    }
    // gap 149999, auto = 149999/(2^4-1) = 9999 ≥ min step → kept
    assert(run(None, 0L, 149999L) ===
      ChunkSpec.IntRange("id", 0L, 149999L, 9999L, includeNullChunk = false))
    // explicit --rows start beats auto; max bound clamps
    assert(run(Some(ChunkRows(1000, 5000, 5000)), 0L, 149999L) ===
      ChunkSpec.IntRange("id", 0L, 149999L, 5000L, includeNullChunk = false))
    // tiny auto step (12000/15 = 800) clamps UP to the min step (:198-199)
    assert(run(None, 0L, 12000L) ===
      ChunkSpec.IntRange("id", 0L, 12000L, 1000L, includeNullChunk = false))
    // gap ≤ min step → whole even though the rowcount is large (:156-157)
    assert(run(None, 100L, 900L) === ChunkSpec.WholeTable)
  }

  test("(tenant_id, seq) composite key descends to the second column") {
    // reference behavior (mydumper_integer_chunks.c:354-396): 3 tenants
    // in [1,3] (gap 2 ≤ min step) over 150k rows — the leading column
    // alone can't split, so each tenant gets nested ranges on `seq`
    val log = collection.mutable.Buffer.empty[String]
    val conn = fakeConn(log, {
      case q if q.startsWith("SELECT COUNT(*)") => Res(Seq("150000"))
      case q if q.startsWith("SELECT MIN(`tenant_id`)") =>
        Res(Seq("1", "3"), java.sql.Types.INTEGER)
      case q if q.startsWith("SELECT `tenant_id`, MIN(`seq`), MAX(`seq`)") =>
        Res(Seq("1", "0", "149999"), java.sql.Types.INTEGER,
          more = Seq(Seq("2", "0", "89999"), Seq("3", "500", "700")))
      case q => fail(s"unexpected probe: $q")
    })
    val composite = TableMeta("shop", "orders",
      columns = Seq(ColumnMeta("tenant_id", "INT", nullable = false),
        ColumnMeta("seq", "BIGINT", nullable = false),
        ColumnMeta("note", "VARCHAR")),
      primaryKey = Seq("tenant_id", "seq"))
    val (plan, rows) = JdbcExtract.chunkStrategy(conn, composite)
    assert(rows === 150000L)
    plan match {
      case ChunkSpec.MultiIntRange("tenant_id", "seq", parts, includeNull) =>
        assert(!includeNull, "both key columns NOT NULL")
        assert(parts.map(_.prefixValue) === Seq(1L, 2L, 3L))
        // per-prefix auto step = gap/(2^4-1) on THAT prefix's gap
        assert(parts(0) === graft.core.ChunkSpec.MultiIntPart(1L, 0L, 149999L, 9999L))
        assert(parts(1) === graft.core.ChunkSpec.MultiIntPart(2L, 0L, 89999L, 5999L))
        // tiny gap (200 ≤ min step) → one chunk covering the prefix
        assert(parts(2) === graft.core.ChunkSpec.MultiIntPart(3L, 500L, 700L, 201L))
      case other => fail(s"expected MultiIntRange, got $other")
    }
    // the descent probe is ONE grouped round trip, ordered by prefix
    assert(log.exists(_.startsWith(
      "SELECT `tenant_id`, MIN(`seq`), MAX(`seq`) FROM `shop`.`orders` " +
        "GROUP BY `tenant_id` ORDER BY `tenant_id`")), log.mkString("\n"))
    // predicates carry the reference's nested shape and count > 3
    val preds = graft.operators.ChunkPlanner.toPredicates(plan)
    assert(preds.length > 3, s"only ${preds.length} chunks")
    assert(preds.head === "(`tenant_id` = 1 AND (`seq` >= 0 AND `seq` <= 9998))",
      preds.head)
    assert(preds.last === "(`tenant_id` = 3 AND (`seq` >= 500 AND `seq` <= 700))",
      preds.last)
  }

  test("descent without a second integer column stays WholeTable") {
    val conn = fakeConn(collection.mutable.Buffer.empty[String], {
      case q if q.startsWith("SELECT COUNT(*)") => Res(Seq("150000"))
      case q if q.startsWith("SELECT MIN(") =>
        Res(Seq("1", "3"), java.sql.Types.INTEGER)
      case q => fail(s"descent must not probe a VARCHAR second column: $q")
    })
    val composite = TableMeta("shop", "orders",
      columns = Seq(ColumnMeta("tenant_id", "INT", nullable = false),
        ColumnMeta("code", "VARCHAR")),
      primaryKey = Seq("tenant_id", "code"))
    assert(JdbcExtract.chunkStrategy(conn, composite)._1 === ChunkSpec.WholeTable)
  }

  test("string key splits the first-byte range; empty bounds fall back whole") {
    val log = collection.mutable.Buffer.empty[String]
    val conn = fakeConn(log, {
      case q if q.startsWith("SELECT COUNT(*)") => Res(Seq("50000"))
      case q if q.startsWith("SELECT MIN(") => Res(Seq("aardvark", "zebra"))
      case q => fail(s"unexpected: $q")
    })
    val (plan, _) = JdbcExtract.chunkStrategy(conn,
      meta(pkType = "VARCHAR", nullablePk = true))
    plan match {
      case ChunkSpec.StringRange("id", bounds, includeNull) =>
        assert(bounds.nonEmpty && bounds === bounds.sorted)
        assert(bounds.forall(b => b >= "a" && b <= "z"), s"bounds: $bounds")
        assert(includeNull, "nullable key keeps the NULL chunk")
      case other => fail(s"expected StringRange, got $other")
    }
    // single-character span: no interior cut points → whole table
    val one = fakeConn(collection.mutable.Buffer.empty[String], {
      case q if q.startsWith("SELECT COUNT(*)") => Res(Seq("50000"))
      case q if q.startsWith("SELECT MIN(")     => Res(Seq("mm", "mz"))
      case q                                    => fail(s"unexpected: $q")
    })
    assert(JdbcExtract.chunkStrategy(one,
      meta(pkType = "VARCHAR"))._1 === ChunkSpec.WholeTable)
  }

  test("all-NULL key or no PK falls back to WholeTable (\"It is NONE\")") {
    val conn = fakeConn(collection.mutable.Buffer.empty[String], {
      case q if q.startsWith("SELECT COUNT(*)") => Res(Seq("50000"))
      case q if q.startsWith("SELECT MIN(")     => Res(Seq(null, null))
      case q                                    => fail(s"unexpected: $q")
    })
    assert(JdbcExtract.chunkStrategy(conn, meta())._1 === ChunkSpec.WholeTable)
    val noPk = fakeConn(collection.mutable.Buffer.empty[String], {
      case q if q.startsWith("SELECT COUNT(*)") => Res(Seq("50000"))
      case q                                    => fail(s"unexpected: $q")
    })
    assert(JdbcExtract.chunkStrategy(noPk,
      meta().copy(primaryKey = Nil))._1 === ChunkSpec.WholeTable)
  }

  test("probes carry the reference's quoting and WHERE placement") {
    val log = collection.mutable.Buffer.empty[String]
    val conn = fakeConn(log, {
      case q if q.startsWith("SELECT COUNT(*)") => Res(Seq("50000"))
      case q if q.startsWith("SELECT MIN(") =>
        Res(Seq("0", "149999"), java.sql.Types.BIGINT)
      case q => fail(s"unexpected: $q")
    })
    JdbcExtract.chunkStrategy(conn, meta(),
      cfg = TableConfig(where = Some("grp < 5")))
    // rows probe is whole-table (reference passes NULL where, :317);
    // the MIN/MAX probe carries the per-table WHERE (:121)
    assert(log.head === "SELECT COUNT(*) FROM `shop`.`orders`")
    assert(log(1) ===
      "SELECT MIN(`id`), MAX(`id`) FROM `shop`.`orders` WHERE grp < 5")
  }

  test("partition subqueries embed the per-table WHERE") {
    assert(JdbcExtract.partitionDbtables("`shop`.`orders`", Seq("p1"),
      where = Some("grp < 5")) ===
      Seq("(SELECT * FROM `shop`.`orders` PARTITION (p1) WHERE grp < 5) AS __graft_p1"))
  }
}

package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, ResultSet}

import graft.extract.Discovery
import org.scalatest.funsuite.AnyFunSuite

/** Discovery against a CATALOG-style driver (MySQL Connector/J default:
  * databases are JDBC catalogs, getSchemas() is empty) — the Derby spec
  * covers the schema axis; this fake covers the axis the main target
  * family actually uses, plus the metadata-pattern escaping. */
class DiscoveryCatalogSpec extends AnyFunSuite {

  private def resultSet(rows: Seq[Map[String, Any]]): ResultSet = {
    var i = -1
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[ResultSet]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "next"  => i += 1; java.lang.Boolean.valueOf(i < rows.length)
            case "close" => null
            case "getString" => rows(i)(args(0).asInstanceOf[String]).asInstanceOf[AnyRef]
            case "getInt" =>
              Integer.valueOf(rows(i)(args(0).asInstanceOf[String]).asInstanceOf[Int])
            case "getShort" => java.lang.Short.valueOf(
              rows(i)(args(0).asInstanceOf[String]).asInstanceOf[Int].toShort)
            case other => throw new UnsupportedOperationException(other)
          }
      }).asInstanceOf[ResultSet]
  }

  // two tables whose names differ at an underscore position: the JDBC
  // pattern semantics of getColumns would merge them without escaping
  private val colsByTable = Map(
    "order_items" -> Seq("oi_id", "oi_qty"),
    "order1items" -> Seq("x_id"))

  private def fakeMeta(observedPatterns: scala.collection.mutable.Buffer[String]): DatabaseMetaData =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[DatabaseMetaData]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "getSchemas"  => resultSet(Nil) // catalog-style driver
          case "getCatalogs" => resultSet(Seq(Map("TABLE_CAT" -> "shop")))
          case "getSearchStringEscape" => "\\"
          case "getTables" =>
            assert(args(0) === "shop" && args(1) == null,
              "database must route down the CATALOG axis")
            resultSet(colsByTable.keys.toSeq.sorted.map(t => Map("TABLE_NAME" -> t)))
          case "getColumns" =>
            val pattern = args(2).asInstanceOf[String]
            observedPatterns += pattern
            // honest JDBC pattern semantics: '\\'-escaped chars are
            // literal, bare '_' matches any char, bare '%' any run
            val rx = new StringBuilder
            var j = 0
            while (j < pattern.length) {
              pattern(j) match {
                case '\\' if j + 1 < pattern.length =>
                  rx ++= java.util.regex.Pattern.quote(pattern(j + 1).toString); j += 2
                case '_' => rx += '.'; j += 1
                case '%' => rx ++= ".*"; j += 1
                case c => rx ++= java.util.regex.Pattern.quote(c.toString); j += 1
              }
            }
            val matched = colsByTable.keys.filter(_.matches(rx.toString)).toSeq.sorted
            resultSet(matched.flatMap(t => colsByTable(t).zipWithIndex.map {
              case (c, i) => Map("COLUMN_NAME" -> c, "TYPE_NAME" -> "BIGINT",
                "NULLABLE" -> DatabaseMetaData.columnNullable,
                "IS_GENERATEDCOLUMN" -> "NO", "ORDINAL_POSITION" -> (i + 1))
            }))
          case "getPrimaryKeys" =>
            val t = args(2).asInstanceOf[String]
            resultSet(colsByTable(t).take(1).map(c =>
              Map("KEY_SEQ" -> 1, "COLUMN_NAME" -> c)))
          case other => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[DatabaseMetaData]

  test("catalog-style drivers discover databases and keep sibling tables apart") {
    val patterns = scala.collection.mutable.Buffer.empty[String]
    val meta = fakeMeta(patterns)
    val conn = Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "getMetaData" => meta
          case "close"       => null
          case other => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[Connection]

    assert(Discovery.schemas(conn) === Seq("shop"),
      "databases must come from getCatalogs when getSchemas is empty")
    val tables = Discovery.tables(conn, "shop")
    assert(tables.map(_.table).sorted === Seq("order1items", "order_items"))
    val orderItems = tables.find(_.table == "order_items").get
    assert(orderItems.columns.map(_.name) === Seq("oi_id", "oi_qty"),
      s"merged sibling columns: ${orderItems.columns.map(_.name)}")
    assert(orderItems.primaryKey === Seq("oi_id"))
    // and the escaping actually happened on the wire
    assert(patterns.exists(_.contains("\\_")),
      s"table-name pattern was not escaped: $patterns")
  }

  test("updated-since probes information_schema UPDATE_TIME and skips " +
      "only KNOWN-stale tables (get_not_updated, mydumper_start_dump.c:525)") {
    val cutoff = java.time.Instant.parse("2026-08-01T00:00:00Z")
    val stale = java.sql.Timestamp.from(cutoff.minusSeconds(86400 * 30))
    def utRs(rows: Seq[(String, java.sql.Timestamp)]): ResultSet = {
      var i = -1
      Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[ResultSet]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "next" => i += 1; java.lang.Boolean.valueOf(i < rows.length)
            case "getString" => rows(i)._1
            case "getTimestamp" => rows(i)._2
            case "close" => null
            case other => throw new UnsupportedOperationException(other)
          }
        }).asInstanceOf[ResultSet]
    }
    val observedSql = scala.collection.mutable.Buffer.empty[String]
    val stmt = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Statement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "executeQuery" =>
            observedSql += args(0).asInstanceOf[String]
            // order1items is KNOWN stale; order_items has NULL
            // UPDATE_TIME (InnoDB after restart) → no row survives the
            // null filter → unknown age → must be KEPT
            utRs(Seq("order1items" -> stale))
          case "close" => null
          case other => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[java.sql.Statement]
    val meta = fakeMeta(scala.collection.mutable.Buffer.empty[String])
    val conn = Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "getMetaData" => meta
          case "createStatement" => stmt
          case "close" => null
          case other => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[Connection]
    val kept = Discovery.allTables(conn,
      graft.extract.TableFilter.Spec(updatedSince = Some(cutoff)))
    assert(kept.map(_.table) === Seq("order_items"),
      s"stale table kept or unknown-age table dropped: ${kept.map(_.table)}")
    assert(observedSql.exists(s => s.contains("information_schema.TABLES") &&
      s.contains("UPDATE_TIME")), observedSql)
    // without the knob, no probe fires at all (no wasted catalog query)
    observedSql.clear()
    val all = Discovery.allTables(conn, graft.extract.TableFilter.Spec())
    assert(all.size === 2 && observedSql.isEmpty,
      s"updated-since probe must be lazy: $observedSql")
  }

  test("partition discovery replays the reference query and filters by regex") {
    def positionalRs(names: Seq[String]): ResultSet = {
      var i = -1
      Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[ResultSet]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "next"      => i += 1; java.lang.Boolean.valueOf(i < names.length)
            case "getString" => names(i)
            case "close"     => null
            case other       => throw new UnsupportedOperationException(other)
          }
        }).asInstanceOf[ResultSet]
    }
    val observed = scala.collection.mutable.Buffer.empty[(String, String, String)]
    var sql = ""; var p1 = ""; var p2 = ""
    val stmt = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.PreparedStatement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "setString" =>
            if (args(0).asInstanceOf[Integer] == 1) p1 = args(1).asInstanceOf[String]
            else p2 = args(1).asInstanceOf[String]
            null
          case "executeQuery" =>
            observed += ((sql, p1, p2))
            positionalRs(Seq("p2023", "p2024", "pmax"))
          case "close" => null
          case other   => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[java.sql.PreparedStatement]
    val conn = Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" => sql = args(0).asInstanceOf[String]; stmt
          case "close"            => null
          case other              => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[Connection]

    assert(Discovery.partitions(conn, "shop", "orders") ===
      Seq("p2023", "p2024", "pmax"))
    val (q, d, t) = observed.head
    assert(q.contains("information_schema.PARTITIONS") &&
      q.contains("PARTITION_NAME is not null"),
      s"not the reference's catalog query: $q") // mydumper_partition_chunks.c:121
    assert(d === "shop" && t === "orders")
    // per-table partition_regex prunes, unanchored like eval_pcre_regex
    assert(Discovery.partitions(conn, "shop", "orders", Some("^p20")) ===
      Seq("p2023", "p2024"))
    // a backend without the PARTITIONS view reports no partitions
    val failing = Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" =>
            throw new java.sql.SQLException("Partitioning is not supported")
          case other => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[Connection]
    assert(Discovery.partitions(failing, "shop", "orders") === Nil)
  }
}

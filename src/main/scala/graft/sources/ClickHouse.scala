package graft.sources

import org.apache.spark.sql.types._

/** ClickHouse sink surface (SURVEY §2.1 S7).
  *
  * The reference's CLICKHOUSE output mode shares the SQL-INSERT row
  * serialization (`mydumper_write.c:252-265` — CLICKHOUSE and SQL_INSERT
  * take the same branch) and adds, per data file, a loader statement
  * `INSERT INTO `t` FROM INFILE '<basename>' FORMAT MySQLDump;`
  * (`write_clickhouse_statement`, `mydumper_write.c:630-640`). The engine
  * mirrors that: data chunks come from [[SqlInsertWriter]] unchanged, and
  * this object renders the companion loader script plus — an engine
  * extension the reference lacks, since it copies MySQL DDL verbatim —
  * a ClickHouse-dialect CREATE TABLE so the target table can be created
  * without hand-translating types.
  */
object ClickHouse {

  /** Spark type → ClickHouse type. Nullability is part of the type in
    * ClickHouse (`Nullable(T)`), unlike MySQL's column attribute. Nested
    * values serialize as JSON text on the SQL dump surface, so they load
    * as String (same contract as [[DdlEmitter]]'s JSON mapping). */
  def chType(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case BooleanType        => "UInt8"
      case ByteType           => "Int8"
      case ShortType          => "Int16"
      case IntegerType        => "Int32"
      case LongType           => "Int64"
      case FloatType          => "Float32"
      case DoubleType         => "Float64"
      case d: DecimalType     => s"Decimal(${d.precision}, ${d.scale})"
      case DateType           => "Date32"
      case _: TimestampType   => "DateTime64(6, 'UTC')"
      case TimestampNTZType   => "DateTime64(6)"
      case BinaryType | StringType => "String"
      case _: ArrayType | _: MapType | _: StructType => "String" // JSON text
      case other => throw new IllegalArgumentException(s"no ClickHouse type for $other")
    }
    if (nullable) s"Nullable($base)" else base
  }

  /** ClickHouse CREATE TABLE. MergeTree needs an ORDER BY; with no known
    * key the table is unordered (`ORDER BY tuple()`), never a guessed
    * column — same rule as the MySQL emitter's PRIMARY KEY. ORDER BY
    * columns must be non-Nullable in ClickHouse, so key columns are
    * declared with their base type. */
  def createTable(db: String, table: String, schema: StructType,
      orderBy: Seq[String] = Nil): String = {
    require(orderBy.forall(schema.fieldNames.contains),
      s"orderBy ${orderBy.mkString(",")} not all in schema")
    val cols = schema.fields.map { f =>
      val nullable = f.nullable && !orderBy.contains(f.name)
      s"  `${f.name}` ${chType(f.dataType, nullable)}"
    }
    val key = if (orderBy.isEmpty) "tuple()"
              else orderBy.map(c => s"`$c`").mkString("(", ", ", ")")
    (s"CREATE TABLE `$db`.`$table` (" +:
      cols.mkString(",\n") +:
      Seq(") ENGINE = MergeTree ORDER BY " + key + ";")).mkString("\n")
  }

  /** The per-data-file loader statement (mydumper_write.c:630-640).
    * FULLY QUALIFIED `db`.`table`: [[createTable]] creates the table
    * under `db`, so an unqualified INSERT would resolve against
    * clickhouse-client's default database and fail (or hit an unrelated
    * table of the same name). */
  def insertFromInfile(db: String, table: String, fileBasename: String): String =
    s"INSERT INTO `$db`.`$table` FROM INFILE '$fileBasename' FORMAT MySQLDump;"

  /** One executable restore script per table: `clickhouse-client
    * --multiquery < db.table-load.sql` replays every chunk in name
    * order (chunk files are independent, so a caller can also fan the
    * statements out over many clickhouse-client processes). */
  def loaderScript(db: String, table: String,
      dataFileBasenames: Seq[String]): String =
    dataFileBasenames.sorted.map(insertFromInfile(db, table, _))
      .mkString("\n") + "\n"
}

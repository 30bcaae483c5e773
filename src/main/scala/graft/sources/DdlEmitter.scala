package graft.sources

import org.apache.spark.sql.types._

/** Dump-side DDL emitter (S4's writer half): renders a Spark schema as
  * the `CREATE TABLE` text a dump carries in its `db.table-schema.sql`
  * file — the engine analog of the reference's
  * `write_table_definition_into_file` (`mydumper_jobs.c:238`, which
  * copies the server's SHOW CREATE TABLE; here the engine IS the source,
  * so the DDL derives from the DataFrame schema). The mapping is the
  * inverse of the loader's type coercions, so a dump → DDL → load round
  * trip reproduces the schema; nested types serialize as JSON text on
  * the SQL/CSV surfaces and are declared as JSON columns. */
object DdlEmitter {

  def sqlType(dt: DataType): String = dt match {
    case ByteType               => "TINYINT"
    case ShortType              => "SMALLINT"
    case IntegerType            => "INT"
    case LongType               => "BIGINT"
    case FloatType              => "FLOAT"
    case DoubleType             => "DOUBLE"
    case d: DecimalType         => s"DECIMAL(${d.precision},${d.scale})"
    case BooleanType            => "TINYINT(1)"
    case DateType               => "DATE"
    case _: TimestampType       => "TIMESTAMP(6)"
    case TimestampNTZType       => "DATETIME(6)"
    case BinaryType             => "LONGBLOB"
    case StringType             => "LONGTEXT"
    case _: ArrayType | _: MapType | _: StructType => "JSON"
    case other => throw new IllegalArgumentException(s"no SQL type for $other")
  }

  /** CREATE TABLE text. `pk` columns must exist in the schema; `quote`
    * follows the target server's identifier convention (the same knob
    * as ChunkPlanner's predicate quoting). */
  def createTable(db: String, table: String, schema: StructType,
      pk: Seq[String] = Nil, quote: String = "`"): String = {
    def q(s: String) = s"$quote$s$quote"
    require(pk.forall(schema.fieldNames.contains),
      s"pk ${pk.mkString(",")} not all in schema")
    val cols = schema.fields.map { f =>
      s"  ${q(f.name)} ${sqlType(f.dataType)}${if (f.nullable) "" else " NOT NULL"}"
    }
    val pkLine =
      if (pk.isEmpty) Nil
      else Seq(s"  PRIMARY KEY (${pk.map(q).mkString(", ")})")
    (s"CREATE TABLE ${q(db)}.${q(table)} (" +:
      (cols ++ pkLine).mkString(",\n") +:
      Seq(");")).mkString("\n")
  }

  /** Inverse type mapping — SQL type text back to the Spark type.
    * `TINYINT(1)` is the boolean spelling (MySQL convention, mirrored by
    * [[sqlType]]); `JSON` loads as StringType because nested values
    * serialize as JSON TEXT on the SQL/CSV dump surfaces — the loader
    * hands the JSON string to `from_json` when the caller knows the
    * element type. */
  def toDataType(sql: String): DataType = {
    val t = sql.trim.toUpperCase
    val Dec = """DECIMAL\((\d+),(\d+)\)""".r
    t match {
      case "TINYINT(1)"           => BooleanType
      case "TINYINT"              => ByteType
      case "SMALLINT"             => ShortType
      case "INT" | "INTEGER"      => IntegerType
      case "BIGINT"               => LongType
      case "FLOAT"                => FloatType
      case "DOUBLE"               => DoubleType
      case Dec(p, s)              => DecimalType(p.toInt, s.toInt)
      case "DATE"                 => DateType
      case "TIMESTAMP(6)" | "TIMESTAMP" => TimestampType
      case "DATETIME(6)" | "DATETIME"   => TimestampNTZType
      case "LONGBLOB"             => BinaryType
      case "LONGTEXT" | "JSON"    => StringType
      case other => throw new IllegalArgumentException(s"no Spark type for $other")
    }
  }

  /** Reconstruct a StructType from [[createTable]] output — the full
    * loader-side inverse: a dump's schema file alone recovers the read
    * schema. */
  def toStructType(ddl: String): StructType =
    StructType(parseColumns(ddl).map { case (name, sqlT, nullable) =>
      StructField(name, toDataType(sqlT), nullable)
    })

  /** Parse the column list back out of [[createTable]] output — the
    * loader-side inverse used when a dump's schema file is the only
    * schema source. Returns (name, sqlType, nullable).
    *
    * Anchored on the CREATE TABLE line, so file headers (SET NAMES /
    * FK / TZ blocks) and unindented foreign layouts — the reference's
    * view-dependency placeholder writes columns with no indent
    * (mydumper_jobs.c:519-533) — both parse; key/constraint lines are
    * excluded by keyword, not indentation. */
  def parseColumns(ddl: String): Seq[(String, String, Boolean)] = {
    // the identifier is the leading quoted token — it may contain spaces
    // (createTable quotes it for exactly that reason), so it must be
    // peeled off with the quote-aware pattern BEFORE whitespace-splitting
    // the type; splitting first truncates `order date` to `order` and
    // reads "date`" as the type
    val Quoted = """^(?:`([^`]+)`|"([^"]+)")\s+(\S+)(.*)$""".r
    val NonColumn = """^(PRIMARY\s+KEY|UNIQUE\s|KEY\s|INDEX\s|FULLTEXT\s|SPATIAL\s|CONSTRAINT\s|\))""".r
    val lines = ddl.linesIterator.toVector
    val start = lines.indexWhere(_.contains("CREATE TABLE"))
    if (start < 0) return Nil
    lines.drop(start + 1)
      .takeWhile(l => !l.trim.startsWith(")"))
      .map(_.trim.stripSuffix(","))
      .filter(l => l.nonEmpty && NonColumn.findFirstIn(l.toUpperCase).isEmpty)
      .map {
        case l @ Quoted(bt, dq, sqlType, _) =>
          (Option(bt).getOrElse(dq), sqlType, !l.toUpperCase.endsWith("NOT NULL"))
        case l => // unquoted identifier (foreign DDL) — old path
          val parts = l.split("\\s+", 3)
          (parts(0), parts(1), !l.toUpperCase.endsWith("NOT NULL"))
      }
  }
}

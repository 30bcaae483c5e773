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

  /** Parse the column list back out of [[createTable]] output — the
    * loader-side inverse used when a dump's schema file is the only
    * schema source. Returns (name, sqlType, nullable). */
  def parseColumns(ddl: String): Seq[(String, String, Boolean)] =
    ddl.linesIterator.toSeq
      .filter(l => l.startsWith("  ") && !l.trim.startsWith("PRIMARY KEY"))
      .map(_.trim.stripSuffix(","))
      .map { l =>
        val parts = l.split("\\s+", 3)
        val name = parts(0).replaceAll("^[`\"]|[`\"]$", "")
        val notNull = l.toUpperCase.endsWith("NOT NULL")
        (name, parts(1), !notNull)
      }
}

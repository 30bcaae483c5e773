package graft

import graft.core.DumpManifest
import graft.functions.Checksum
import graft.load.DependencyScheduler
import graft.load.DependencyScheduler.TablePlan
import graft.sources.{CsvDump, SqlInsertReader}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, row_number}
import org.apache.spark.sql.types.StructType

import scala.concurrent.ExecutionContext

/** The load pipeline (SURVEY §3.2): discovery → file-type routing (S11)
  * → dependency-ordered restore (L1) → checksum verification (L5).
  *
  * The restore target is pluggable: a lake write (parquet), or a JDBC
  * sink (`df.write.jdbc`, S12 semantics) — the scheduler and verification
  * are identical. Discovery classifies files by the dump naming scheme
  * (`db.table.NNNNN[.NNNNN].sql[.gz]`).
  */
object Load {

  sealed trait FileType
  case object Data extends FileType
  case object Schema extends FileType          // db.table-schema.sql
  case object SchemaCreate extends FileType    // db-schema-create.sql
  case object SchemaView extends FileType      // db.table-schema-view.sql
  case object SchemaSequence extends FileType  // db.table-schema-sequence.sql
  case object SchemaTriggers extends FileType  // db.table-schema-triggers.sql
  case object SchemaPost extends FileType      // db-schema-post.sql (routines/events)
  case object SchemaClickHouse extends FileType // db.table-schema-clickhouse.sql (S7)
  case object LoaderScript extends FileType    // db.table-load.sql (S7 INSERT..FROM INFILE)
  case object Metadata extends FileType
  case object Unknown extends FileType

  /** S11 router: classify a dump file name — the full reference taxonomy
    * (myloader_common.c:538-545,630-639, myloader_process.c:385):
    * database creates, table schemas, views, sequences, triggers, post
    * objects, data chunks, metadata. Schema files may be compressed like
    * data files. Order sensitivity: `-schema-view.sql` must match before
    * the generic `-schema.sql` suffix test. */
  def classify(name: String): FileType = {
    val n = name.stripSuffix(".gz").stripSuffix(".zst")
    n match {
      case _ if n.endsWith("-schema-create.sql")   => SchemaCreate
      case _ if n.endsWith("-schema-view.sql")     => SchemaView
      case _ if n.endsWith("-schema-sequence.sql") => SchemaSequence
      case _ if n.endsWith("-schema-triggers.sql") => SchemaTriggers
      case _ if n.endsWith("-schema-post.sql")     => SchemaPost
      case _ if n.endsWith("-schema-clickhouse.sql") => SchemaClickHouse
      case _ if n.endsWith("-load.sql")            => LoaderScript
      case _ if n.endsWith("-schema.sql")          => Schema
      case _ if n == "metadata" || n == "metadata.json" => Metadata
      case _ if n.matches(""".+\.\d{5}(\.\d{5})?\.(sql|dat|csv|jsonl)""") => Data
      case _ => Unknown
    }
  }

  /** Phase rank for [[classify]] output, mirroring the reference restore
    * order (databases → table schemas → data → triggers-after-their-
    * table → views/sequences → post). Feeds
    * [[graft.load.DependencyScheduler.RestorePlan]]. */
  def phaseOf(t: FileType): Int = t match {
    case SchemaCreate                  => 0
    case Schema                        => 1
    case Data                          => 2
    case SchemaTriggers                => 3 // per-table, after its data
    case SchemaView | SchemaSequence   => 4 // after ALL tables
    case SchemaPost                    => 5
    // ClickHouse artifacts are consumed by clickhouse-client, not the
    // lake restore path — routed but never auto-executed here
    case SchemaClickHouse | LoaderScript | Metadata | Unknown => 6
  }

  /** Discover (db.table → data files) groups under a dump dir.
    * `extraDataExt` admits exec-per-thread dumps whose filter chose its
    * own extension (classified as if the custom suffix were `.sql`). */
  def discover(dir: String, extraDataExt: Option[String] = None): Map[String, Seq[String]] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filterNot(_.getName.startsWith("."))
    def effectiveName(n: String): String =
      extraDataExt.filter(n.endsWith)
        .map(e => n.dropRight(e.length) + ".sql").getOrElse(n)
    files.filter(f => classify(effectiveName(f.getName)) == Data)
      .groupBy { f =>
        // db.table.NNNNN... → db.table
        f.getName.split("\\.").take(2).mkString(".")
      }
      .map { case (k, v) => k -> v.map(_.getPath).toSeq }
  }

  final case class TableSource(
      table: String, // file stem (db.stem) — globs data files
      schema: StructType,
      expectedChecksum: Option[Long] = None,
      // real table name when the dump used a surrogate stem for a
      // filename-unsafe name (manifest `filename` key; Dump.StemRegistry)
      realTable: Option[String] = None)

  final case class Result(table: String, rows: Long, checksumOk: Option[Boolean])

  /** Build TableSources purely from a dump directory: schemas from the
    * `db.table-schema.sql` files ([[graft.sources.DdlEmitter]] inverse),
    * expected rows/checksums from the `metadata` manifest — the restore
    * needs NOTHING but the directory, exactly the reference's contract
    * (myloader consumes only dump files). Tables without a schema file
    * are skipped (parquet dumps embed their schema and load directly). */
  def sourcesFromDir(dir: String): Seq[TableSource] = {
    val manifest = graft.sources.Manifest.read(dir)
    val checksums: Map[String, Long] = manifest
      .map(_.tables.flatMap(t => t.dataChecksum.map(c => t.table -> c.toLong)).toMap)
      .getOrElse(Map.empty)
    // surrogate stem → manifest entry (filename-unsafe table names;
    // the dump's StemRegistry recorded the mapping under `filename`)
    val byStem: Map[String, graft.core.TableManifest] = manifest
      .map(_.tables.flatMap(t => t.filename.map(_ -> t)).toMap)
      .getOrElse(Map.empty)
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    files.filter(f => classify(f.getName) == Schema).toSeq
      .map { f =>
        val table = f.getName.stripSuffix("-schema.sql")
          .stripSuffix("-schema.sql.gz").stripSuffix("-schema.sql.zst")
        val ddl = readSmallText(f.toPath)
        // manifest entries may carry the bare table name while files use
        // the db.table stem — accept either key; surrogate stems resolve
        // through the manifest's filename mapping
        val bare = table.split("\\.", 2).last
        val surrogate = byStem.get(bare)
        val checksum = checksums.get(table)
          .orElse(checksums.get(bare))
          .orElse(surrogate.flatMap(_.dataChecksum.map(_.toLong)))
        val schema = graft.sources.DdlEmitter.toStructType(ddl)
        // an unparseable schema file must stop the restore, not feed an
        // empty StructType downstream (zero columns reads zero data and
        // "succeeds")
        if (schema.isEmpty) throw new IllegalStateException(
          s"schema file ${f.getName} parsed to zero columns — corrupt or not DDL")
        TableSource(table, schema, checksum,
          realTable = surrogate.map(_.table))
      }.sortBy(_.table)
  }

  /** Read a small control file (schema DDL, metadata), decompressing by
    * extension — [[classify]] accepts `.gz`/`.zst` names (the reference
    * compresses schema files alongside data, myloader_process.c:120), so
    * the parse side must decode them too: feeding gzip bytes to the DDL
    * parser would silently yield an empty schema. Codecs match the dump
    * side (JVM gzip; zstd-jni, already on the Spark classpath). */
  def readSmallText(p: java.nio.file.Path): String = {
    val raw = new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(p))
    val in: java.io.InputStream = p.getFileName.toString match {
      case n if n.endsWith(".gz")  => new java.util.zip.GZIPInputStream(raw)
      case n if n.endsWith(".zst") => new com.github.luben.zstd.ZstdInputStream(raw)
      case _                       => raw
    }
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Restore dumped tables through the dependency scheduler, verifying
    * checksums against the manifest (the reference's --checksum=fail
    * gate: a mismatch throws). `writeTarget` is the restore sink (lake
    * write / JDBC batch write). `decode = Some((cmd, ext))` restores
    * exec-per-thread dumps: data files carrying `ext` stream through
    * the inverse child command ([[graft.sources.SqlInsertReader
    * .readFiltered]]) instead of the codec-routed text reader. */
  def run(spark: SparkSession, dumpDir: String, sources: Seq[TableSource],
      failOnChecksum: Boolean = true,
      decode: Option[(Seq[String], String)] = None)(
      writeTarget: (String, DataFrame) => Unit): Seq[Result] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val results = new java.util.concurrent.ConcurrentHashMap[String, Result]()
    val plans = sources.map { src =>
      TablePlan(
        name = src.table,
        createSchema = () => (), // lake targets: schema = parquet metadata
        dataJobs = Seq(() => {
          val df = decode match {
            case Some((cmd, ext)) => SqlInsertReader.readFiltered(spark,
              dumpDir, src.schema, cmd, glob = s"${src.table}.*$ext")
            case None => SqlInsertReader.read(spark, dumpDir, src.schema,
              glob = s"${src.table}.*.sql*")
          }
          val (rows, cs) = rowsAndChecksum(df)
          val ok = src.expectedChecksum.map(_ == cs)
          if (failOnChecksum && ok.contains(false))
            throw new IllegalStateException(
              s"checksum mismatch for ${src.table}: expected ${src.expectedChecksum.get}, got $cs")
          writeTarget(src.table, df)
          results.put(src.table, Result(src.table, rows, ok))
        }))
    }
    DependencyScheduler.run(plans)
    sources.map(s => results.get(s.table))
  }

  private def rowsAndChecksum(df: DataFrame): (Long, Long) = {
    val r = df.agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
      Checksum.tableChecksum(df)).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Verify a manifest against restored tables (L5 standalone form). */
  /** Row-level merge of an incremental dump into a base snapshot (the
    * row-granularity analog of the loader's table-level overwrite modes;
    * pairs with an `--updated-since`-filtered dump): latest version per
    * key wins, delta rows beat base rows at equal versions. One shuffle
    * on the key; at 100 TB the delta is small next to base, so AQE picks
    * a broadcast/skew-aware plan on its own. Deterministic: ties inside
    * a side resolve by the largest version, and `__is_delta` breaks
    * base-vs-delta ties. */
  def mergeSnapshot(base: DataFrame, delta: DataFrame, keyCol: String,
      versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = base.withColumn("__is_delta", lit(0))
      .unionByName(delta.withColumn("__is_delta", lit(1)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("__is_delta").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__is_delta")
  }

  def verifyChecksums(manifest: DumpManifest,
      restored: Map[String, DataFrame]): Map[String, Boolean] =
    manifest.tables.flatMap { t =>
      restored.get(t.table).map { df =>
        val cs = df.agg(Checksum.tableChecksum(df)).head().getLong(0)
        t.table -> t.dataChecksum.contains(cs.toString)
      }
    }.toMap
}

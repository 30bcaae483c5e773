package graft

import graft.core.DumpManifest
import graft.functions.Checksum
import graft.load.DependencyScheduler
import graft.load.DependencyScheduler.TablePlan
import graft.sources.{CsvDump, LoadDataReader, LoadDataStatement, LoadDataWriter, SqlInsertReader}
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
  case object Data extends FileType            // db.table[.NNNNN[.NNNNN]].sql
  case object LoadData extends FileType        // db.table.NNNNN.dat (LOAD DATA text)
  case object Schema extends FileType          // db.table-schema.sql
  case object SchemaCreate extends FileType    // db-schema-create.sql
  case object SchemaTablespace extends FileType // all-schema-create-tablespace.sql
  case object SchemaView extends FileType      // db.table-schema-view.sql
  case object SchemaSequence extends FileType  // db.table-schema-sequence.sql
  case object SchemaTriggers extends FileType  // db.table-schema-triggers.sql
  case object SchemaPost extends FileType      // db-schema-post.sql (routines/events)
  case object SchemaClickHouse extends FileType // db.table-schema-clickhouse.sql (S7)
  case object LoaderScript extends FileType    // db.table-load.sql (S7 INSERT..FROM INFILE)
  case object Metadata extends FileType        // metadata / metadata.header (global)
  case object MetadataPartial extends FileType // metadata.partial*, or bare metadata in stream mode
  case object Resume extends FileType          // resume (only with resume enabled)
  case object Unknown extends FileType         // reference IGNORED

  /** Strip the trailing compression / exec-filter extension the way the
    * reference's suffix probe does (myloader_common.c:491-517
    * m_filename_has_suffix: exec extension first, then .gz, then .zst —
    * exactly one layer, and only a KNOWN extension; `db.t.sql.lz4` does
    * NOT classify). */
  private def stripCodecExt(name: String, execExt: Option[String]): String =
    execExt.filter(e => e.nonEmpty && name.endsWith(e) && name.length > e.length)
      .map(e => name.dropRight(e.length))
      .getOrElse {
        if (name.endsWith(".gz")) name.dropRight(3)
        else if (name.endsWith(".zst")) name.dropRight(4)
        else name
      }

  /** S11 router: classify a dump file name — the reference's
    * get_file_type taxonomy and PROBE ORDER
    * (myloader_process_filename.c:119-199): metadata names first
    * (`metadata.header` global; bare `metadata` partial in stream mode,
    * global otherwise; `metadata.partial*` prefix partial — none of them
    * when the name carries `.sql` or the exec-filter extension), then the
    * `--source-db` prefix gate, then `-schema.sql`, the tablespace file,
    * `resume`/`resume.partial` (fatal unless resume mode, ditto the
    * partial), the object-schema suffixes, and only then bare `.sql` →
    * DATA and `.dat` → LOAD_DATA; anything else is ignored. Every suffix
    * probe accepts one compression/exec extension layer
    * (myloader_common.c:491 m_filename_has_suffix).
    *
    * Engine extensions beyond the reference: `-schema-clickhouse.sql` /
    * `-load.sql` (S7 artifacts), `metadata.json` (manifest), and `.csv`/
    * `.jsonl` chunk files from our own lake dumps. */
  def classify(name: String, stream: Boolean = false,
      resumeEnabled: Boolean = false, sourceDb: Option[String] = None,
      execExt: Option[String] = None): FileType = {
    val n = stripCodecExt(name, execExt)
    // reference guard: a *.sql / exec-filtered name is never metadata
    val metadataEligible =
      !(name.endsWith(".sql") || execExt.exists(e => e.nonEmpty && name.endsWith(e)))
    if (metadataEligible && name == "metadata.header") Metadata
    else if (metadataEligible && name == "metadata")
      (if (stream) MetadataPartial else Metadata)
    else if (metadataEligible && name == "metadata.json") Metadata
    else if (metadataEligible && name.startsWith("metadata.partial")) MetadataPartial
    else if (sourceDb.exists(db => !sourceDbAdmits(name, db))) Unknown
    else if (n.endsWith("-schema.sql")) Schema
    else if (name == "all-schema-create-tablespace.sql") SchemaTablespace
    else if (name == "resume") {
      if (!resumeEnabled) throw new IllegalStateException(
        "resume file found, but resume mode not enabled — remove it or restart with resume")
      Resume
    }
    else if (name == "resume.partial") throw new IllegalStateException(
      "resume.partial file found — remove it and restart if you consider it safe")
    else if (n.endsWith("-schema-view.sql")) SchemaView
    else if (n.endsWith("-schema-sequence.sql")) SchemaSequence
    else if (n.endsWith("-schema-triggers.sql")) SchemaTriggers
    else if (n.endsWith("-schema-post.sql")) SchemaPost
    else if (n.endsWith("-schema-create.sql")) SchemaCreate
    else if (n.endsWith("-schema-clickhouse.sql")) SchemaClickHouse
    else if (n.endsWith("-load.sql")) LoaderScript
    else if (n.endsWith(".sql")) Data
    else if (n.endsWith(".dat")) LoadData
    else if (n.matches(""".+\.\d{5}(\.\d{5})?\.(csv|jsonl)""")) Data
    else Unknown
  }

  /** `--source-db` admission (myloader_process_filename.c:155): the name
    * must start with the source db followed by `.` (table files) or `-`
    * (the db's schema-create), or carry the `mydumper_` surrogate-stem
    * prefix — everything else is ignored. */
  def sourceDbAdmits(filename: String, sourceDb: String): Boolean =
    (filename.startsWith(sourceDb) && filename.length > sourceDb.length &&
      (filename.charAt(sourceDb.length) == '.' ||
       filename.charAt(sourceDb.length) == '-')) ||
      filename.startsWith("mydumper_")

  /** (database, table) from a dump file name, the loader's filter hook
    * (myloader_common.c:532-560 get_database_table_from_filename_for_
    * filter): object-schema suffixes strip their marker then split on
    * `.`; data files split on `.` and take the first two tokens. None
    * when the name yields no pair (reference returns FALSE → the file
    * passes filters unexamined). */
  def databaseTableOf(name: String, execExt: Option[String] = None): Option[(String, String)] = {
    val n = stripCodecExt(name, execExt)
    val markers = Seq("-schema-view", "-schema-sequence", "-schema-triggers",
      "-schema-post", "-schema")
    markers.find(m => n.endsWith(m + ".sql")) match {
      case Some(m) =>
        val stem = n.dropRight(m.length + 4)
        val parts = stem.split("\\.")
        // >2 dots: the reference punts ("get the db and table from the
        // create table statement", myloader_common.c:660-663)
        if (parts.length == 2) Some((parts(0), parts(1))) else None
      case None if n.endsWith(".sql") || n.endsWith(".dat") =>
        val parts = n.split("\\.", 4)
        if (parts.length >= 2) Some((parts(0), parts(1))) else None
      case None => None
    }
  }

  /** Filename-level table filtering, the loader's should_queue_filename
    * (myloader_common.c:578-600): bare `metadata` is never queued, the
    * tablespace file always is, no-filters short-circuits true, and
    * otherwise the (db, table) parsed from the name runs the tables-list
    * → skiplist → regex chain (eval_table, myloader_common.c:562-576);
    * names that parse to no pair pass. */
  def shouldQueueFilename(name: String,
      spec: graft.extract.TableFilter.Spec,
      execExt: Option[String] = None): Boolean = {
    if (name == "metadata") false
    else if (name == "all-schema-create-tablespace.sql") true
    else if (spec.tablesList.isEmpty && spec.skiplist.isEmpty &&
      spec.regex.isEmpty && spec.regexes.isEmpty) true
    else databaseTableOf(name, execExt).forall { case (db, table) =>
      graft.extract.TableFilter.evalNameOnly(spec, db, table)
    }
  }

  /** Phase rank for [[classify]] output, mirroring the reference restore
    * order (tablespaces → databases → table schemas → data →
    * triggers-after-their-table → views/sequences → post). Feeds
    * [[graft.load.DependencyScheduler.RestorePlan]]. */
  def phaseOf(t: FileType): Int = t match {
    case SchemaTablespace              => 0 // CREATE TABLESPACE precedes any table
    case SchemaCreate                  => 1
    case Schema                        => 2
    case Data | LoadData               => 3
    case SchemaTriggers                => 4 // per-table, after its data
    case SchemaView | SchemaSequence   => 5 // after ALL tables
    case SchemaPost                    => 6
    // ClickHouse artifacts are consumed by clickhouse-client, not the
    // lake restore path — routed but never auto-executed here
    case SchemaClickHouse | LoaderScript | Metadata | MetadataPartial |
         Resume | Unknown => 7
  }

  /** Discover (db.table → data files) groups under a dump dir.
    * `extraDataExt` admits exec-per-thread dumps whose filter chose its
    * own extension (classified as if the custom suffix were `.sql`). */
  def discover(dir: String, extraDataExt: Option[String] = None,
      resumeEnabled: Boolean = false): Map[String, Seq[String]] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filterNot(_.getName.startsWith("."))
    def effectiveName(n: String): String =
      extraDataExt.filter(n.endsWith)
        .map(e => n.dropRight(e.length) + ".sql").getOrElse(n)
    files.filter(f =>
        classify(effectiveName(f.getName), resumeEnabled = resumeEnabled) == Data)
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
      realTable: Option[String] = None,
      // --resume (myloader_directory.c:83-113): restrict the restore to
      // exactly these dump file NAMES — the files a crashed prior run
      // left unprocessed. None = every file matching the stem's glob.
      onlyFiles: Option[Seq[String]] = None)

  final case class Result(table: String, rows: Long, checksumOk: Option[Boolean])

  /** Build TableSources purely from a dump directory: schemas from the
    * `db.table-schema.sql` files ([[graft.sources.DdlEmitter]] inverse),
    * expected rows/checksums from the `metadata` manifest — the restore
    * needs NOTHING but the directory, exactly the reference's contract
    * (myloader consumes only dump files). Tables without a schema file
    * are skipped (parquet dumps embed their schema and load directly). */
  def sourcesFromDir(dir: String, resumeEnabled: Boolean = false): Seq[TableSource] = {
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
    // a stem with a -schema-view.sql sibling is a VIEW: its -schema.sql
    // is the dependency placeholder table (mydumper_jobs.c:472-556) and
    // carries no data chunks — the view phase restores it, not the data
    // phase (views-as-tables dumps have no sibling and DO load here)
    val viewStems: Set[String] = files.map(_.getName)
      .filter(n => classify(n, resumeEnabled = resumeEnabled) == SchemaView)
      .map(_.replaceFirst("-schema-view\\.sql(\\.gz|\\.zst)?$", "")).toSet
    files.filter(f =>
        classify(f.getName, resumeEnabled = resumeEnabled) == Schema).toSeq
      .filterNot(f => viewStems.contains(
        f.getName.replaceFirst("-schema\\.sql(\\.gz|\\.zst)?$", "")))
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

  /** The loader's checksum treatment (myloader_arguments.c:78-92):
    * `fail` aborts on mismatch, `warn` (the reference default) logs and
    * continues, `skip` doesn't verify at all. */
  sealed trait ChecksumMode
  case object ChecksumFail extends ChecksumMode
  case object ChecksumWarn extends ChecksumMode
  case object ChecksumSkip extends ChecksumMode

  /** `--checksum` value parse — unknown values reject with the
    * reference's message (myloader_arguments.c:92). */
  def checksumModeOf(v: Option[String]): ChecksumMode = v.map(_.toLowerCase) match {
    case None | Some("warn") => ChecksumWarn
    case Some("fail")        => ChecksumFail
    case Some("skip")        => ChecksumSkip
    case Some(other) => throw new IllegalArgumentException(
      s"--checksum accepts: fail, warn (default), skip — got '$other'")
  }

  /** Restore dumped tables through the dependency scheduler, verifying
    * checksums against the manifest per [[ChecksumMode]]. `writeTarget`
    * is the restore sink (lake write / JDBC batch write). `decode =
    * Some((cmd, ext))` restores exec-per-thread dumps: data files
    * carrying `ext` stream through the inverse child command
    * ([[graft.sources.SqlInsertReader.readFiltered]]) instead of the
    * codec-routed text reader. */
  def run(spark: SparkSession, dumpDir: String, sources: Seq[TableSource],
      checksumMode: ChecksumMode = ChecksumWarn,
      decode: Option[(Seq[String], String)] = None)(
      writeTarget: (String, DataFrame) => Unit): Seq[Result] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val results = new java.util.concurrent.ConcurrentHashMap[String, Result]()
    val plans = sources.map { src =>
      TablePlan(
        name = src.table,
        createSchema = () => (), // lake targets: schema = parquet metadata
        dataJobs = Seq(() => {
          // --resume: a file whitelist replaces the stem glob — Hadoop
          // brace alternation reads exactly the listed chunks. Each
          // reader keeps only ITS extension: a LOAD_DATA resume list
          // names .dat chunks alongside their .sql companion
          // statements, which must not reach the row reader.
          def globOr(default: String, keepExt: String): String =
            src.onlyFiles.map(_.filter(_.contains(keepExt))) match {
              case Some(fs) if fs.isEmpty =>
                throw new IllegalStateException(
                  s"--resume lists no $keepExt files for ${src.table}")
              case Some(fs) if fs.size == 1 => fs.head
              case Some(fs) => s"{${fs.mkString(",")}}"
              case None => default
            }
          // data chunks all start with `stem.` (schema siblings use the
          // `stem-` dash forms); a stem with ZERO chunks is a --no-data /
          // schema-only dump — the reference CREATES those tables empty
          // (myloader restores the DDL with no data jobs), so the lake
          // analog is an empty frame with the dump's schema, not a
          // zero-files glob crash
          val stemFiles = Option(new java.io.File(dumpDir).listFiles())
            .getOrElse(Array.empty[java.io.File])
            .filter(f => f.getName.startsWith(s"${src.table}."))
          val df = if (stemFiles.isEmpty && src.onlyFiles.isEmpty) {
            spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
              src.schema)
          } else decode match {
            case Some((cmd, ext)) => SqlInsertReader.readFiltered(spark,
              dumpDir, src.schema, cmd, glob = globOr(s"${src.table}.*$ext", ext))
            case None =>
              // LOAD_DATA/CSV dumps restore through the .dat reader with
              // the delimiters recovered FROM the companion statement —
              // myloader likewise rewrites the statement it finds
              // (myloader_process.c) instead of assuming defaults
              val dirFiles = stemFiles
                .filter(f => src.onlyFiles.forall(fs =>
                  fs.contains(f.getName) || f.getName.endsWith(".sql")))
              if (dirFiles.exists(f => classify(f.getName) == LoadData)) {
                val opts = dirFiles
                  .filter(_.getName.endsWith(".sql")).sortBy(_.getName)
                  .iterator
                  .flatMap(f => LoadDataStatement.parse(
                    java.nio.file.Files.readString(f.toPath)))
                  .nextOption()
                  .map(p => LoadDataWriter.Options(format = p.format,
                    header = p.header, hexBlob = p.hexCols.nonEmpty))
                  .getOrElse(LoadDataWriter.Options())
                LoadDataReader.read(spark, dumpDir, src.schema, opts,
                  glob = globOr(s"${src.table}.*.dat*", ".dat"))
              } else SqlInsertReader.read(spark, dumpDir, src.schema,
                glob = globOr(s"${src.table}.*.sql*", ".sql"))
          }
          // skip mode never computes the verification scan — at scale
          // that's a whole extra pass over the data
          val (rows, ok) = checksumMode match {
            case ChecksumSkip => (df.count(), None)
            case _ =>
              val (r, cs) = rowsAndChecksum(df)
              val matches = src.expectedChecksum.map(_ == cs)
              if (matches.contains(false)) {
                val msg = s"checksum mismatch for ${src.table}: " +
                  s"expected ${src.expectedChecksum.get}, got $cs"
                if (checksumMode == ChecksumFail)
                  throw new IllegalStateException(msg)
                else System.err.println(s"[graft] WARN $msg")
              }
              (r, matches)
          }
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
    // zero-row table: the checksum agg yields NULL; the dump side
    // records 0 for it (schema-only / --no-data dumps)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
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

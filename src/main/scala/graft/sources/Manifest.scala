package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.core.{DumpManifest, TableManifest}

/** Persist / reload the dump manifest as the dump dir's `metadata` file —
  * the reference's INI-ish layout (`mydumper_start_dump.c:1161-1182`
  * writes `# Started dump at:`, `[config]`, per-table sections;
  * `myloader_process.c:662` requires `[config]` on the restore side).
  * Self-contained writer/parser (ordered sections, `key = value` lines,
  * `#` comments), so a dump directory is fully self-describing: schema
  * files + data chunks + this manifest — no live source needed to
  * restore or verify. */
object Manifest {

  val FileName = "metadata"

  def render(m: DumpManifest): String = {
    val sb = new StringBuilder
    sb ++= s"# Started dump at: ${m.startedAt}\n"
    sb ++= "\n[config]\n"
    sb ++= s"quote-character = ${m.quoteChar}\n"
    m.sourcePosition.foreach(p => sb ++= s"source-position = $p\n")
    m.tables.foreach { t =>
      sb ++= s"\n[${t.table}]\n"
      sb ++= s"rows = ${t.rows}\n"
      t.dataChecksum.foreach(c => sb ++= s"data-checksum = $c\n")
      t.schemaChecksum.foreach(c => sb ++= s"schema-checksum = $c\n")
      if (t.files.nonEmpty) sb ++= s"files = ${t.files.mkString(",")}\n"
      t.filename.foreach(f => sb ++= s"filename = $f\n")
    }
    sb ++= s"\n# Finished dump at: ${m.finishedAt}\n"
    sb.result()
  }

  def write(outDir: String, m: DumpManifest): java.nio.file.Path = {
    val p = Paths.get(outDir, FileName)
    Files.createDirectories(p.getParent)
    Files.write(p, render(m).getBytes(StandardCharsets.UTF_8))
    p
  }

  def parse(text: String): DumpManifest = {
    var started = ""; var finished = ""
    var quote = "`"; var sourcePos: Option[String] = None
    val tables = Seq.newBuilder[TableManifest]
    var section: Option[String] = None
    var cur: Option[TableManifest] = None
    // only the FIRST [config] section is config — a table literally
    // named `config` (dump output always writes db.table, but foreign
    // manifests may not) must not have its rows/checksums swallowed by
    // the config branch (the reference avoids the collision by quoting
    // table sections, mydumper_common.c metadata writer)
    var configSeen = false
    var inConfig = false
    def flush(): Unit = { cur.foreach(tables += _); cur = None }
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.startsWith("# Started dump at:"))
        started = line.stripPrefix("# Started dump at:").trim
      else if (line.startsWith("# Finished dump at:"))
        finished = line.stripPrefix("# Finished dump at:").trim
      else if (line.startsWith("[") && line.endsWith("]")) {
        flush()
        section = Some(line.substring(1, line.length - 1))
        inConfig = section.get == "config" && !configSeen
        if (inConfig) configSeen = true
        else cur = Some(TableManifest(section.get, rows = 0L))
      } else if (line.contains("=") && !line.startsWith("#")) {
        val Array(k, v) = line.split("=", 2).map(_.trim)
        if (inConfig) k match {
          case "quote-character" => quote = v
          case "source-position" => sourcePos = Some(v)
          case _                 => ()
        } else cur.foreach { t =>
          k match {
            case "rows"            => cur = Some(t.copy(rows = v.toLong))
            case "data-checksum"   => cur = Some(t.copy(dataChecksum = Some(v)))
            case "schema-checksum" => cur = Some(t.copy(schemaChecksum = Some(v)))
            case "files"           => cur = Some(t.copy(files = v.split(",").toSeq))
            case "filename"        => cur = Some(t.copy(filename = Some(v)))
            case _                 => ()
          }
        }
      }
    }
    flush()
    DumpManifest(started, finished, quote, sourcePos, tables.result())
  }

  def read(dir: String): Option[DumpManifest] = {
    val p = Paths.get(dir, FileName)
    if (!Files.exists(p)) None
    else Some(parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }
}

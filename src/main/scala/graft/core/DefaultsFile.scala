package graft.core

/** GKeyFile-style defaults-file parser (the reference's `--defaults-file`
  * / `--defaults-extra-file` surface, common.c:96-120 load_config_file):
  * `[group]` sections, `key = value` entries, `#`/`;` comment lines.
  * Group and key order are preserved (the reference iterates keys in
  * file order via g_key_file_get_keys), duplicate keys within a group
  * keep the LAST value (GKeyFile semantics), and group lookup has a
  * case-insensitive variant mirroring m_key_file_has_group
  * (common.c:357-369). */
object DefaultsFile {

  final case class Ini(groups: Vector[(String, Vector[(String, String)])]) {

    /** Exact-name group fetch (g_key_file_get_keys order). */
    def group(name: String): Option[Vector[(String, String)]] =
      groups.collectFirst { case (g, kvs) if g == name => kvs }

    /** Case-insensitive lookup: the FIRST group whose name matches
      * ignoring case (m_key_file_has_group walks get_groups in order). */
    def groupIgnoreCase(name: String): Option[Vector[(String, String)]] =
      groups.collectFirst { case (g, kvs) if g.equalsIgnoreCase(name) => kvs }

    def value(groupName: String, key: String): Option[String] =
      group(groupName).flatMap(_.collectFirst { case (k, v) if k == key => v })
  }

  def parse(text: String): Ini = {
    val groups = Vector.newBuilder[(String, Vector[(String, String)])]
    var current: Option[String] = None
    var entries = Vector.empty[(String, String)]
    def flush(): Unit = current.foreach { g =>
      groups += ((g, entries)); entries = Vector.empty
    }
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#") || line.startsWith(";")) ()
      else if (line.startsWith("[") && line.endsWith("]")) {
        flush()
        current = Some(line.substring(1, line.length - 1).trim)
      } else if (line.contains("=") && current.isDefined) {
        val Array(k, v) = line.split("=", 2).map(_.trim)
        // GKeyFile: a repeated key replaces the earlier value
        entries = entries.filterNot(_._1 == k) :+ (k -> v)
      } else if (current.isDefined) {
        // bare key = boolean switch: the reference preprocesses these
        // to `key= 1` before the GKeyFile parse (load_config_file,
        // common.c:107-118) — record with an EMPTY value so consumers
        // can tell flag-form from a real `key=1` value
        entries = entries.filterNot(_._1 == line) :+ (line -> "")
      }
    }
    flush()
    Ini(groups.result())
  }

  def read(path: java.nio.file.Path): Ini =
    parse(new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8))
}

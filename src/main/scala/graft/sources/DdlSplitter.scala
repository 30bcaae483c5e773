package graft.sources

/** CREATE TABLE splitter for fast parallel load (SURVEY §2.9 L2).
  *
  * The reference splits a dumped `CREATE TABLE` so secondary indexes and
  * constraints are applied *after* the data loads
  * (/root/reference/src/common.c:1440-1508): the bare table is created
  * first, `ADD KEY/UNIQUE/FULLTEXT/SPATIAL` batches follow the data phase
  * (batched by `optimize_keys_batchsize`), `ADD CONSTRAINT` last. Indexes
  * whose first column is the AUTO_INCREMENT column stay in the CREATE
  * (dropping them would break the engine's auto-inc requirement).
  *
  * Pure string surgery on the driver — no Spark involvement; the outputs
  * feed the JDBC DDL phase of a restore, or map to post-write OPTIMIZE /
  * Z-ORDER steps for lake targets.
  */
object DdlSplitter {

  final case class Split(
      create: String,             // bare CREATE TABLE (PK + auto-inc-leading keys kept)
      indexAlters: Seq[String],   // ALTER TABLE ... ADD KEY/UNIQUE/FULLTEXT/SPATIAL
      constraintAlters: Seq[String], // ALTER TABLE ... ADD CONSTRAINT
      engine: Option[String] = None) // ENGINE= value, for optimize-keys gating

  /** Engines whose CREATE is worth splitting — the reference's
    * `--optimize-keys-engines` default (common_options.c:210-211);
    * other engines load with indexes in place (IS_TRX_TABLE flag,
    * common.c:1495-1504). */
  val DefaultOptimizeEngines: Set[String] = Set("InnoDB", "ROCKSDB")

  def optimizeEligible(s: Split,
      engines: Set[String] = DefaultOptimizeEngines): Boolean =
    s.engine.exists(e => engines.exists(_.equalsIgnoreCase(e)))

  private val IndexLine =
    """^\s*(UNIQUE KEY|UNIQUE INDEX|FULLTEXT KEY|FULLTEXT INDEX|SPATIAL KEY|SPATIAL INDEX|KEY|INDEX)\s.*""".r
  private val ConstraintLine = """^\s*CONSTRAINT\s.*""".r
  private val AutoIncCol = """`([^`]+)`[^,]*\bAUTO_INCREMENT\b""".r

  /** Split one CREATE TABLE statement. `batchSize` = index clauses per
    * ALTER; 0 (the reference default, common.c:41) means unlimited —
    * one ALTER carries every moved index. Regardless of batch size, at
    * most ONE FULLTEXT index rides per ALTER (MySQL cannot add two in
    * one statement — the reference's fulltext_counter break,
    * common.c:1464-1469). `splitIndexes = false` (SKIP mode / engine
    * not in --optimize-keys-engines) keeps every key in the CREATE. */
  def split(createTable: String, batchSize: Int = 0,
      splitIndexes: Boolean = true): Split = {
    val lines = createTable.split("\n").toIndexedSeq
    val tableName = lines.headOption
      .flatMap("""CREATE TABLE\s+(`[^`]+`(?:\.`[^`]+`)?|\S+)""".r
        .findFirstMatchIn(_).map(_.group(1)))
      .getOrElse("`t`")
    // per line: [^,]* in the pattern must not span column definitions
    val autoInc = lines.flatMap(l => AutoIncCol.findFirstMatchIn(l).map(_.group(1)))
      .headOption
    // ENGINE= value, last occurrence wins (common.c:1495-1504)
    val engine = lines.reverseIterator
      .flatMap("""ENGINE=(\S+)""".r.findFirstMatchIn(_).map(_.group(1)))
      .toSeq.headOption

    val body = scala.collection.mutable.ArrayBuffer.empty[String]
    val indexes = scala.collection.mutable.ArrayBuffer.empty[String]
    val constraints = scala.collection.mutable.ArrayBuffer.empty[String]

    lines.foreach {
      case l @ IndexLine(_*) if splitIndexes && !leadsWithAutoInc(l, autoInc) =>
        indexes += l.trim.stripSuffix(",")
      case l @ ConstraintLine(_*) =>
        constraints += l.trim.stripSuffix(",")
      case l => body += l
    }

    // drop a dangling comma on the last column/PK line before ')'
    val cleaned = fixTrailingCommas(body.toIndexedSeq)

    // sequential batching, the reference's walk (common.c:1451-1480):
    // a batch closes when it already holds batchSize indexes (0 = no
    // cap) or when a second FULLTEXT would join it
    val batches = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
    var batch = Vector.empty[String]
    var fulltextInBatch = 0
    indexes.foreach { clause =>
      val isFulltext = clause.toUpperCase.startsWith("FULLTEXT")
      val full = batchSize > 0 && batch.size >= batchSize
      if (batch.nonEmpty && (full || (isFulltext && fulltextInBatch >= 1))) {
        batches += batch; batch = Vector.empty; fulltextInBatch = 0
      }
      batch :+= clause
      if (isFulltext) fulltextInBatch += 1
    }
    if (batch.nonEmpty) batches += batch

    val idxAlters = batches.map { g =>
      s"ALTER TABLE $tableName " + g.map(clause => "ADD " + clause).mkString(", ") + ";"
    }.toSeq
    val conAlters =
      if (constraints.isEmpty) Nil
      else Seq(s"ALTER TABLE $tableName " +
        constraints.map(c => "ADD " + c).mkString(", ") + ";")
    Split(cleaned.mkString("\n"), idxAlters, conAlters, engine)
  }

  /** True if the index's first column is the auto-increment column
    * (must stay in CREATE — reference common.c skip rule). */
  private def leadsWithAutoInc(indexLine: String, autoInc: Option[String]): Boolean =
    autoInc.exists { c =>
      """\(\s*`([^`]+)`""".r.findFirstMatchIn(indexLine)
        .exists(_.group(1) == c)
    }

  private def fixTrailingCommas(lines: IndexedSeq[String]): IndexedSeq[String] = {
    val out = lines.toArray
    // find the line preceding the closing ')' and strip its trailing comma
    val closeIdx = out.lastIndexWhere(_.trim.startsWith(")"))
    if (closeIdx > 0) {
      var i = closeIdx - 1
      while (i >= 0 && out(i).trim.isEmpty) i -= 1
      if (i >= 0 && out(i).trim.endsWith(","))
        out(i) = out(i).reverse.replaceFirst(",", "").reverse
    }
    out.toIndexedSeq
  }
}

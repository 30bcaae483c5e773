package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DecimalType, StructField, StructType, TimestampNTZType, TimestampType}

/** Typed rows for the custom-state operator (schemas are fixed here —
  * the one place Dataset[T] beats DataFrame, SURVEY §1). */
case class UserEvent(user_id: Long, value: Double)
case class UserAgg(count: Long, sum: Double)
case class UserTotal(user_id: Long, events: Long, total_value: Double)

/** Structured-Streaming re-expression of the reference's stream pipeline
  * (SURVEY §2.10, §3.3).
  *
  * The reference streams *finished files*: the dump pushes each closed
  * file onto stdout (`mydumper_stream.c:56-140`), the loader consumes
  * files as they arrive and starts work before the dump ends. Spark's
  * native equivalent is a landing directory: the producer writes
  * partition files, the consumer `readStream`s the directory and
  * processes each micro-batch (`Trigger.AvailableNow` for catch-up runs,
  * ProcessingTime for daemon mode — reference T7 snapshot-interval).
  */
object LandingStream {

  /** Producer half: write a DataFrame to the landing dir as parquet
    * (per-partition files appear atomically — the handoff unit, like the
    * reference's per-chunk files). */
  def produce(df: DataFrame, landingDir: String): Unit =
    df.write.mode("append").parquet(landingDir)

  /** Rewrite TIMESTAMP_NTZ fields to TIMESTAMP in a declared read schema.
    * `withWatermark` (and every downstream event-time op) requires the
    * UTC-adjusted TimestampType; parquet written by Spark 3.4+ with
    * isAdjustedToUTC=false infers to NTZ and would poison the stream.
    * Declaring TimestampType makes the parquet reader surface the stored
    * micros as instants — value-stable under a UTC session TZ (pinned in
    * every graft session). */
  def utcSchema(schema: StructType): StructType =
    StructType(schema.fields.map {
      case StructField(n, TimestampNTZType, nullable, m) =>
        StructField(n, TimestampType, nullable, m)
      case f => f
    })

  /** Consumer half: stream the landing dir; `handle` runs per micro-batch
    * (the myloader "process file as it arrives" loop — e.g. a JDBC batch
    * write, S12). maxFilesPerTrigger bounds batch size like the
    * reference's queue backpressure. */
  def consume(spark: SparkSession, landingDir: String, schema: StructType,
      checkpoint: String, availableNow: Boolean = true,
      maxFilesPerTrigger: Int = 1000)(
      handle: (DataFrame, Long) => Unit): StreamingQuery = {
    val src = spark.readStream
      .schema(utcSchema(schema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
    val w = src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) => handle(batch, id))
    (if (availableNow) w.trigger(Trigger.AvailableNow())
     else w.trigger(Trigger.ProcessingTime("60 seconds"))) // daemon cadence analog
      .start()
  }

  /** File-event stream — the reference's stream protocol header
    * (`\n-- <basename> <size>\n`, mydumper_stream.c:56-140) re-expressed:
    * the producer announces each CLOSED dump file as one event line
    * `<kind>\t<table>\t<path>` in `eventsDir`; the consumer streams the
    * lines and routes each to `handle` in arrival order (driver-side —
    * orchestration state is O(files seen), the data work each event
    * triggers is a distributed action). Pair with
    * [[graft.load.StreamingLoader]] for schema/data/finish routing.
    *
    * `follow = false` (catch-up restore after a finished dump) latches
    * the available event files once and drains them —
    * Trigger.AvailableNow. `follow = true` is the CONCURRENT mode
    * (loader running while the dump still produces): a short
    * ProcessingTime cadence keeps discovering events announced after
    * query start — AvailableNow would silently never see them — and the
    * caller stops the query from its own completion signal (the
    * producer's terminal `done` event, see [[Dump]] stream mode). */
  def consumeFileEvents(spark: SparkSession, eventsDir: String,
      checkpoint: String, follow: Boolean = false)(
      handle: (String, String, String) => Unit): StreamingQuery =
    spark.readStream.text(eventsDir)
      .withColumn("_src", input_file_name())
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // within a micro-batch, cross-file row order is not guaranteed;
        // producer event-file names encode arrival time, so sorting on
        // them restores announce order ("end" must follow its data)
        batch.collect().sortBy(_.getString(1)).foreach { r =>
          r.getString(0).split("\t", 3) match {
            case Array(kind, table, path) => handle(kind, table, path)
            case other => throw new IllegalArgumentException(
              s"malformed file event: ${other.mkString("\t")}")
          }
        }
      }
      .trigger(if (follow) Trigger.ProcessingTime("1 second")
               else Trigger.AvailableNow())
      .start()

  /** Per-JVM tiebreaker for same-millisecond announcements. */
  private val announceSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Hadoop configuration for driver-side protocol I/O: the active
    * session's (so object-store credentials and scheme wiring follow
    * the Spark job's), else a bare default — the announce paths must
    * work from producer processes that may announce before (or
    * without) building a session. */
  private[graft] def protocolHadoopConf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Producer half of [[consumeFileEvents]]: announce one closed file.
    * Names order by WALL-CLOCK millis + a per-JVM sequence — nanoTime
    * has an arbitrary (possibly negative) per-JVM origin, so a daemon
    * restart could announce its `end` event with a SMALLER name than the
    * old JVM's data events and the consumer's catch-up batch would run
    * post jobs before any data loaded. Wall clock is monotonic across
    * restarts at the seconds-between-runs granularity this protocol
    * needs (the reference's analog is pipe arrival order).
    *
    * Written through the Hadoop FS API — the shards/events this
    * protocol hands off are produced by Spark writers that speak any
    * Hadoop scheme, so the announce leg must too (a java.nio write
    * would silently target the LOCAL disk under an s3a:// events dir).
    * The event file lands as a dot-prefixed temp (invisible to the
    * consumer's file-source listing) and RENAMES to its final name, so
    * a consumer can never read a half-written line. */
  def announceFile(eventsDir: String, kind: String, table: String,
      path: String): Unit = {
    val line = s"$kind\t$table\t$path\n"
    val dir = new org.apache.hadoop.fs.Path(eventsDir)
    // RAW local fs when the scheme is checksummed: ChecksumFileSystem
    // would drop a binary `.ev_*.txt.crc` sidecar next to every event —
    // junk in a directory whose listing IS the protocol (consumers and
    // tooling read every visible file as a text event)
    val fs = dir.getFileSystem(protocolHadoopConf()) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }
    fs.mkdirs(dir)
    // zero-padded time so lexical filename order == announce order
    val name =
      f"ev_${System.currentTimeMillis()}%016d_${announceSeq.incrementAndGet()}%08d_${math.abs(path.hashCode)}%08x.txt"
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, name)))
      throw new java.io.IOException(s"announce rename failed under $eventsDir")
  }

  /** Event-time tumbling-window aggregate with watermark over a streaming
    * events source — the engine's declared streaming surface (§2.10):
    * batch-equivalent of Queries.qWindowEvents. */
  def windowedEventCounts(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** Arbitrary keyed state via mapGroupsWithState (the §2.10 declared
    * custom-state surface): running per-user event totals held in the
    * state store across micro-batches; each batch emits the refreshed
    * totals for the users it touched (Update output mode). State is one
    * fixed-size record per key — at 100 TB the store scales with
    * distinct users, not events, and RocksDB-backed state keeps it off
    * the executor heap. */
  def statefulUserTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserAgg]) =>
          var s = state.getOption.getOrElse(UserAgg(0L, 0.0))
          it.foreach(e => s = UserAgg(s.count + 1, s.sum + e.value))
          state.update(s)
          UserTotal(uid, s.count, s.sum)
      }
  }

  /** Watermarked stream-stream join (§2.10 declared surface): each click
    * joins the same user's views from the preceding hour. Both sides
    * carry watermarks and the join condition bounds event-time distance,
    * so Spark can expire buffered state — without the time bound a
    * stream-stream join's state grows forever. Works identically on
    * batch DataFrames (the spec cross-checks exactly that). */
  def clickViewJoin(clicks: DataFrame, views: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val v = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("view_ts"))
    c.join(v,
      col("user_id") === col("v_user_id") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("click_ts"))
      .select("click_id", "user_id", "click_ts", "view_id", "view_ts")
  }

  /** Streaming exactly-once landing: drop replayed rows by key within
    * the watermark horizon (`dropDuplicatesWithinWatermark`) — the
    * loader-side "already restored this file" resume check re-expressed
    * over rows. State holds one entry per key only until the watermark
    * passes it, so the store is bounded by the replay window, not the
    * stream's lifetime — the property that keeps this viable at 100 TB
    * (a full-history dropDuplicates would grow state forever). */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming session windows (gap-close semantics, the streaming twin
    * of Queries.qSessionWindow): per-user sessions close after `gap` of
    * event-time silence; watermark lets Spark finalize and evict closed
    * sessions from the state store. */
  def sessionEventCounts(events: DataFrame, gap: String = "15 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sum_value"))
      .select(col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("user_id"), col("cnt"), col("sum_value"))

  /** Sliding-window variant (declared in §2.10: tumbling + sliding). */
  def slidingEventCounts(events: DataFrame, window_ : String = "1 hour",
      slide: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("cnt"))
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.sources.SqlInsertReader
import graft.streaming.LandingStream

/** NTZ is a first-class input, not a trap: the same events-like table in
  * both parquet timestamp physical shapes — TIMESTAMP (isAdjustedToUTC,
  * the engine's native event-time type) and TIMESTAMP_NTZ (what Spark
  * 3.4+ writes for unadjusted micros, and what the driver's regenerated
  * testdata exposed in round 6) — must flow identically through query,
  * dump→load, and streaming paths. Reference analog: MySQL TIMESTAMP vs
  * DATETIME are distinct types the reference dumps byte-exactly
  * (mydumper_write.c:653-674, DATETIME mapped at DdlEmitter.scala:73);
  * graft's session TZ is pinned UTC so the two shapes carry identical
  * values and must produce identical results. */
class TimestampShapeSpec extends SparkTestBase {

  /** One fixture dir per shape, each holding `events.parquet` so
    * Tables.events can load it like driver testdata. */
  private lazy val nEvents: Long = Tables.events(spark, sf).limit(2000).count()
  private lazy val fixtures: Map[String, String] = {
    val base = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(2000)
    Seq(
      "utc" -> base,
      "ntz" -> base.withColumn("ts", col("ts").cast(TimestampNTZType))
    ).map { case (kind, df) =>
      val dir = Files.createTempDirectory(s"graft_tsshape_${kind}_").toString
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      kind -> dir
    }.toMap
  }

  test("fixture premise: the two dirs really hold different parquet types") {
    assert(spark.read.parquet(s"${fixtures("utc")}/events.parquet")
      .schema("ts").dataType === TimestampType)
    assert(spark.read.parquet(s"${fixtures("ntz")}/events.parquet")
      .schema("ts").dataType === TimestampNTZType)
  }

  test("Tables.events normalizes both shapes to TimestampType with equal values") {
    val both = fixtures.view.mapValues(Tables.events(spark, _)).toMap
    both.values.foreach(df =>
      assert(df.schema("ts").dataType === TimestampType))
    assert(both("utc").exceptAll(both("ntz")).isEmpty &&
      both("ntz").exceptAll(both("utc")).isEmpty,
      "normalized values must be identical under the UTC session")
  }

  test("interval arithmetic and bigint casts work on both shapes") {
    def q(dir: String): DataFrame =
      Tables.events(spark, dir).select(col("event_id"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).as("ts_plus"),
        (col("ts").cast(LongType) / lit(3600)).cast(LongType).as("epoch_hr"))
        .orderBy("event_id")
    val (u, n) = (q(fixtures("utc")), q(fixtures("ntz")))
    assert(u.count() === nEvents)
    assert(u.exceptAll(n).isEmpty && n.exceptAll(u).isEmpty)
  }

  test("SQL dump -> load round-trips both shapes to the same values") {
    val rendered = fixtures.map { case (kind, dir) =>
      val ev = Tables.t(spark, dir, "events") // RAW shape, not normalized:
      // the dump writers must handle NTZ themselves (SqlInsert.scala:240)
      val out = Files.createTempDirectory(s"graft_tsdump_${kind}_").toString
      Dump.dumpTable(ev, "events", Dump.Config(outDir = out, checksum = false))
      val back = SqlInsertReader.read(spark, out, ev.schema, "graft.events.*.sql*")
      assert(back.count() === nEvents, s"$kind round-trip lost rows")
      // compare on normalized micros so the two shapes are comparable
      kind -> back.select(col("event_id"),
        col("ts").cast(TimestampType).cast(LongType).as("us"))
    }
    val (u, n) = (rendered("utc"), rendered("ntz"))
    assert(u.exceptAll(n).isEmpty && n.exceptAll(u).isEmpty,
      "UTC and NTZ dumps must restore identical instants")
  }

  test("LOAD_DATA dump -> load round-trips both shapes to the same values") {
    val rendered = fixtures.map { case (kind, dir) =>
      val ev = Tables.t(spark, dir, "events") // RAW shape: the .dat
      // writer's own TimestampNTZType branch (LoadDataDump.scala:147)
      val out = Files.createTempDirectory(s"graft_tslddump_${kind}_").toString
      Dump.dumpTable(ev, "events", Dump.Config(outDir = out,
        format = Dump.LoadDataFormat(), checksum = false))
      val back = graft.sources.LoadDataReader.read(
        spark, out, ev.schema, graft.sources.LoadDataWriter.Options(),
        glob = "graft.events.*.dat*")
      assert(back.count() === nEvents, s"$kind LOAD_DATA round-trip lost rows")
      kind -> back.select(col("event_id"),
        col("ts").cast(TimestampType).cast(LongType).as("us"))
    }
    val (u, n) = (rendered("utc"), rendered("ntz"))
    assert(u.exceptAll(n).isEmpty && n.exceptAll(u).isEmpty,
      "UTC and NTZ LOAD_DATA dumps must restore identical instants")
  }

  test("streaming watermark window runs on an NTZ landing dir") {
    val landing = s"${fixtures("ntz")}/events.parquet" // raw NTZ files
    val ckpt = Files.createTempDirectory("graft_tsshape_ckpt_").toString
    val raw = spark.read.parquet(landing).schema
    assert(raw("ts").dataType === TimestampNTZType)
    // utcSchema is the declared-schema gate: without it withWatermark
    // throws EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE (the round-6 breakage)
    val stream = spark.readStream.schema(LandingStream.utcSchema(raw))
      .parquet(landing)
    val q = LandingStream.windowedEventCounts(stream)
      .writeStream.format("memory").queryName("ntz_winagg")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT sum(cnt) FROM ntz_winagg").head().getLong(0)
    assert(streamed === nEvents, s"watermarked agg saw $streamed of $nEvents events")
  }
}

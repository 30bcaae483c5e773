package graft

import graft.cli.Main
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Property sweep of the lake conform path (cli/Main.runLoad's
  * manifest-schema conform: partition-column reorder, JSON
  * type-widening casts, unbase64, all-null restore) — round-10 verdict
  * ask #6. Schemas are ScalaCheck-style randomized under a FIXED seed
  * (replayable) from a pool of the shapes that hide edge cases: binary,
  * nested struct, array, timestamp, decimal, all-null columns, plus a
  * low-cardinality partition column; every case round-trips through all
  * six lake layouts (parquet, orc, jsonl — each plain and
  * hive-partitioned) with --checksum fail — the dump-side CRC is
  * the equality oracle. */
class LakeConformSpec extends SparkTestBase {

  private case class ColSpec(field: StructField, gen: (Int, scala.util.Random) => Any)

  private def pool: Seq[ColSpec] = Seq(
    ColSpec(StructField("s_str", StringType, nullable = true),
      (i, r) => if (r.nextInt(5) == 0) null else s"v${r.nextInt(1000)} '\"q\\${i}"),
    ColSpec(StructField("s_allnull", StringType, nullable = true),
      (_, _) => null),
    ColSpec(StructField("s_bin", BinaryType, nullable = true),
      (i, r) => { val b = new Array[Byte](8); r.nextBytes(b); b }),
    ColSpec(StructField("s_dbl", DoubleType, nullable = true),
      (i, r) => r.nextInt(100000) / 64.0), // binary-exact doubles
    ColSpec(StructField("s_dec", DecimalType(9, 2), nullable = true),
      (i, r) => new java.math.BigDecimal(r.nextInt(100000)).movePointLeft(2)),
    ColSpec(StructField("s_bool", BooleanType, nullable = true),
      (_, r) => r.nextBoolean()),
    ColSpec(StructField("s_ts", TimestampType, nullable = true),
      (i, r) => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        1700000000L + r.nextInt(1000000), r.nextInt(1000) * 1000000L))),
    ColSpec(StructField("s_arr", ArrayType(LongType), nullable = true),
      (i, r) => Seq.fill(r.nextInt(4))(r.nextLong() % 1000)),
    ColSpec(StructField("s_struct",
      StructType(Seq(StructField("a", LongType), StructField("b", StringType))),
      nullable = true),
      (i, r) => Row(r.nextInt(100).toLong, s"n${r.nextInt(10)}")))

  test("randomized schemas round-trip checksum-exact through all four " +
      "lake layouts (seeded sweep)") {
    val seed = 424242
    val rnd = new scala.util.Random(seed)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_lc_src_").toString
    for (case_ <- 1 to 4) {
      // random non-empty column subset, random order — plus the
      // mandatory id and partition columns
      val cols = rnd.shuffle(pool).take(2 + rnd.nextInt(pool.size - 1))
      val schema = StructType(
        StructField("id", LongType, nullable = false) +:
        StructField("p", IntegerType, nullable = false) +:
        cols.map(_.field))
      val rows = (0 until 200).map { i =>
        Row.fromSeq(i.toLong +: (i % 3) +: cols.map(_.gen(i, rnd)))
      }
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      val table = s"lcase$case_"
      df.repartition(4).write.mode("overwrite")
        .parquet(s"$srcDir/$table.parquet")
      for {
        fmt <- Seq("parquet", "orc", "jsonl")
        partitioned <- Seq(false, true)
      } {
        val label = s"case $case_ $fmt partitioned=$partitioned " +
          s"cols=${cols.map(_.field.name).mkString(",")}"
        val out = java.nio.file.Files.createTempDirectory("graft_lc_out_").toString
        val target = java.nio.file.Files.createTempDirectory("graft_lc_t_").toString
        val lf = java.nio.file.Files.createTempFile("graft_lc_log", ".txt").toString
        val dumpArgs = Array("dump", "--source-dir", srcDir, "-o", out,
          "--tables-list", table, "--format", fmt) ++
          (if (partitioned) Array("--partition-by", "p") else Array.empty[String])
        Main.main(dumpArgs)
        Main.main(Array("load", "-d", out, "--target", target,
          "--checksum", "fail", "--logfile", lf))
        val lines = scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(java.nio.file.Paths.get(lf)))
          .asScala.filter(_.startsWith("[graft] restored"))
        assert(lines.size === 1 && lines.head.endsWith("checksum ok"),
          s"$label: $lines")
        // belt and braces: value-level equality, not just CRC agreement
        val back = spark.read.parquet(s"$target/graft.$table")
        // nullable-insensitive: parquet round trips relax nullability
        def shape(s: StructType): Seq[(String, String)] =
          s.fields.toSeq.map(f => f.name -> f.dataType.sql)
        assert(shape(back.schema) === shape(df.schema), s"$label schema drift")
        assert(back.exceptAll(df).count() === 0 &&
          df.exceptAll(back).count() === 0, s"$label value drift")
      }
    }
  }
}

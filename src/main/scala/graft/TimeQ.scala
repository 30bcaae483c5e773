package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time one catalog query N times in a warm JVM —
  * separates steady-state cost from first-run codegen/scan setup.
  * Usage: runMain graft.TimeQ <query> [reps] (SPARK_GRAFT_SF_DIR). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // same extensions as Bench/Verify — without them q_range_join_auto
      // would time the un-rewritten nested-loop plan
      .withExtensions(new org.apache.spark.sql.graftnative.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"TIMEQ $name ${times.map(t => f"$t%.3f").mkString(" ")}")
    spark.stop()
  }
}

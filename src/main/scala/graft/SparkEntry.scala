package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator catalog lives in [[Queries]]; this object is the stable
  * entry surface the driver invokes.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the broadcast star join + decimal-exact revenue rollup. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qJoinRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. EVERY gate carries one (round 7): seeded
    * hashing replays via inline plane/constant literals, CRC32 via a
    * portable SQL reimplementation — zero rows-only checks remain
    * (HarnessHonestySpec pins the set empty). */
  def oracleSql: Map[String, String] = Queries.oracles
}

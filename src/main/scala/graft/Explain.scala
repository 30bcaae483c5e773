package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new org.apache.spark.sql.graftnative.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_filter_where", "q_join_revenue", "q1_agg", "q_ann_batch",
        "q_dedup_ngram", "q_range_join", "q_range_join_auto", "q_cube",
        "q_dedup_clusters", "q_sample_hash", "q_topk_revenue",
        "q_window_range", "q_checksum_md5")
    for (n <- names) {
      println(s"===== $n =====")
      println(Queries.all(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(4000))
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev measurement utility (guide §1: measure first): per catalog query,
  * count Spark JOBS (each one a driver-side action barrier), STAGES
  * (each an exchange boundary) and summed task time, against wall time.
  * wall ≫ task-time/cores means the query is orchestration-bound — the
  * cost is sequential actions (eager checkpoints, convergence probes),
  * not data work; that is the signal that motivated the round-15
  * iterative-loop restructurings. Usage:
  *   runMain graft.JobCount q_pagerank q_dedup_clusters ...
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graftnative.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        if (sys.env.contains("GRAFT_JOBCOUNT_STAGES"))
          System.err.println(f"[stage] ${s.stageInfo.taskMetrics.executorRunTime / 1e3}%8.2fs ${s.stageInfo.numTasks}%4d tasks  ${s.stageInfo.name}")
      }
    })
    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // one warmup pass of the first query so JIT/codegen noise doesn't
    // land in the first row
    SparkEntry.queries(names.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    sweep()
    println(f"${"query"}%-28s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"task_s"}%8s")
    for (n <- names) {
      jobs.set(0); stages.set(0); taskMs.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      println(f"$n%-28s $wall%8.3f ${jobs.get}%5d ${stages.get}%7d ${taskMs.get / 1e3}%8.2f")
      sweep()
    }
    spark.stop()
  }
}

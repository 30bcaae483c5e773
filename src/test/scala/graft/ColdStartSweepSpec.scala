package graft

/** One-shot (cold) timing sweep (ignored by default — run with
  * `testOnly graft.ColdStartSweepSpec` after flipping ignore→test) over the whole catalog at sf0.01 —
  * surfaces codegen/JIT cliffs that min-of-N benching hides. Not a
  * perf gate: prints the ranking for analysis. */
class ColdStartSweepSpec extends SparkTestBase {
  ignore("cold one-shot sweep") {
    val d = "/root/testdata/sf0.01"
    val times = Queries.all.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      name -> (System.nanoTime() - t0) / 1e9
    }
    times.sortBy(-_._2).take(20).foreach { case (n, s) =>
      println(f"$n%-28s $s%6.2f s")
    }
    println(f"TOTAL ${times.map(_._2).sum}%.1f s")
  }
}

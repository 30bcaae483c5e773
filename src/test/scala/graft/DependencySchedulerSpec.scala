package graft

import graft.load.DependencyScheduler
import graft.load.DependencyScheduler._
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{ConcurrentLinkedQueue, Executors}
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.ExecutionContext
import scala.jdk.CollectionConverters._

/** State-machine ordering contract (reference
  * myloader_worker_loader_main.c:94-338): schema before data, indexes
  * after all data, per-table concurrency cap respected. */
class DependencySchedulerSpec extends AnyFunSuite {

  implicit val ec: ExecutionContext =
    ExecutionContext.fromExecutor(Executors.newFixedThreadPool(8))

  test("schema -> data -> index ordering per table") {
    val log = new ConcurrentLinkedQueue[String]()
    val plans = Seq("a", "b").map { t =>
      TablePlan(
        name = t,
        createSchema = () => log.add(s"$t:schema"),
        dataJobs = (1 to 3).map(i => () => { log.add(s"$t:data$i"); () }),
        postDataJobs = Seq(() => log.add(s"$t:index")))
    }
    val progress = DependencyScheduler.run(plans)
    assert(progress.snapshot.values.forall(_ == AllDone))
    Seq("a", "b").foreach { t =>
      val events = log.asScala.toSeq.filter(_.startsWith(t))
      assert(events.head === s"$t:schema")
      assert(events.last === s"$t:index")
      assert(events.count(_.contains("data")) === 3)
    }
  }

  test("per-table parallelism cap holds") {
    val inFlight = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val plan = TablePlan(
      name = "t",
      createSchema = () => (),
      dataJobs = (1 to 12).map(_ => () => {
        val n = inFlight.incrementAndGet()
        maxSeen.updateAndGet(m => math.max(m, n))
        Thread.sleep(20)
        inFlight.decrementAndGet()
        ()
      }),
      maxThreadsPerTable = 2)
    DependencyScheduler.run(Seq(plan))
    assert(maxSeen.get() <= 2, s"cap violated: ${maxSeen.get()}")
  }

  test("runAll phases: databases -> tables(+triggers after data) -> views -> post") {
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val plan = DependencyScheduler.RestorePlan(
      databaseJobs = Seq(() => log.add("db:create")),
      tables = Seq("a", "b").map { t =>
        TablePlan(
          name = t,
          createSchema = () => log.add(s"$t:schema"),
          dataJobs = (1 to 2).map(i => () => log.add(s"$t:data$i")),
          postDataJobs = Seq(() => log.add(s"$t:index")),
          triggerJobs = Seq(() => log.add(s"$t:trigger")))
      },
      viewJobs = Seq(() => log.add("view:v1")),
      postJobs = Seq(() => log.add("post:routine")))
    val progress = DependencyScheduler.runAll(plan)
    assert(progress.snapshot.values.forall(_ == AllDone))
    val events = log.asScala.toSeq
    assert(events.head === "db:create")
    // per-table: trigger strictly after that table's data and indexes
    Seq("a", "b").foreach { t =>
      val te = events.filter(_.startsWith(t))
      assert(te.last === s"$t:trigger")
      assert(te.dropRight(1).last === s"$t:index")
    }
    // global barriers: every table event precedes the view, view precedes post
    val vi = events.indexOf("view:v1")
    val pi = events.indexOf("post:routine")
    assert(events.zipWithIndex.filter(_._1.exists(_ == ':')).forall { case (e, i) =>
      !(e.startsWith("a") || e.startsWith("b")) || i < vi
    })
    assert(vi < pi && pi === events.size - 1)
  }
}

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
}

package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.util.Random

import graft.load.{DependencyScheduler, StreamingLoader}
import org.scalatest.funsuite.AnyFunSuite

/** Interleaving fuzz for the incremental loader: many random arrival
  * orders of (schema, data...) events across several tables, with jobs
  * that sleep random sub-ms amounts — whatever the interleaving, no data
  * job may run before its table's schema, every offered job must run
  * exactly once, and every table must end AllDone. Pure JVM (jobs are
  * closures), so dozens of schedules run in seconds. */
class StreamingLoaderFuzzSpec extends AnyFunSuite {

  test("random event interleavings never break ordering or lose work") {
    val rnd = new Random(7)
    (1 to 25).foreach { round =>
      val loader = new StreamingLoader(maxThreadsPerTable = 3)
      val tables = (1 to 3).map(i => s"t$i")
      val created = tables.map(_ -> new AtomicBoolean(false)).toMap
      val ran = tables.map(_ -> new AtomicLong(0)).toMap
      val violations = new AtomicLong(0)
      val nData = tables.map(_ -> (1 + rnd.nextInt(6))).toMap
      // build the event list, then shuffle it (schema may land anywhere)
      val events: Seq[(String, String)] =
        rnd.shuffle(tables.flatMap(t =>
          ("schema", t) +: Seq.fill(nData(t))(("data", t))))
      events.foreach {
        case ("schema", t) =>
          loader.offerSchema(t, () => {
            Thread.sleep(rnd.nextInt(3).toLong)
            created(t).set(true)
          })
        case (_, t) =>
          loader.offerData(t, () => {
            if (!created(t).get()) violations.incrementAndGet()
            Thread.sleep(rnd.nextInt(2).toLong)
            ran(t).incrementAndGet()
          })
      }
      val done = Future.sequence(tables.map(t => loader.finish(t)))
      Await.result(done, Duration.Inf)
      assert(violations.get() === 0, s"round $round: data before schema")
      tables.foreach { t =>
        assert(ran(t).get() === nData(t).toLong,
          s"round $round: $t ran ${ran(t).get()} of ${nData(t)} jobs")
        assert(loader.state(t) === DependencyScheduler.AllDone)
      }
    }
  }
}

package graft.load

import java.util.concurrent.{ConcurrentHashMap, Semaphore}
import scala.concurrent.{ExecutionContext, Future}
import scala.jdk.CollectionConverters._

/** Restore-side dependency scheduler (SURVEY §2.9 L1).
  *
  * Reimplements the reference's per-table state machine
  * (/root/reference/src/myloader/myloader.h:116,
  * myloader_worker_loader_main.c:94-338):
  * NOT_CREATED → CREATING → CREATED → DATA_DONE → INDEX_ENQUEUED →
  * ALL_DONE, with: data jobs dispatched only once the schema is CREATED,
  * a per-table concurrency cap (`--max-threads-per-table`), and index
  * builds enqueued only after all of a table's data jobs finish.
  *
  * Here the "jobs" are caller-provided thunks (typically Spark actions:
  * a JDBC DDL statement, a partitioned write, an ALTER batch). The
  * scheduler is pure driver-side coordination — Spark executors do the
  * data movement inside each thunk.
  */
object DependencyScheduler {

  sealed trait State
  case object NotCreated extends State
  case object Creating extends State
  case object Created extends State
  case object DataDone extends State
  case object AllDone extends State

  final case class TablePlan(
      name: String,
      createSchema: () => Unit,
      dataJobs: Seq[() => Unit],
      postDataJobs: Seq[() => Unit] = Nil, // deferred indexes / constraints
      triggerJobs: Seq[() => Unit] = Nil,  // after THIS table's data+indexes
      maxThreadsPerTable: Int = 4)

  /** Whole-restore phase plan mirroring the reference's object ordering
    * (myloader_process.c:385,472,530; myloader_common.c:538-545):
    * database creates first; tables (schema → data → indexes → triggers,
    * per-table pipelined); views and sequences only after EVERY table is
    * done (a view may reference any table); routines/events ("post")
    * last. Triggers restore per-table after its data, so the loads
    * themselves never fire them — the reference's `--skip-triggers`-less
    * default behavior. */
  final case class RestorePlan(
      databaseJobs: Seq[() => Unit] = Nil,
      tables: Seq[TablePlan] = Nil,
      viewJobs: Seq[() => Unit] = Nil,      // incl. sequences
      postJobs: Seq[() => Unit] = Nil)      // routines / events

  final class Progress {
    private[load] val states = new ConcurrentHashMap[String, State]()
    def state(table: String): State = states.getOrDefault(table, NotCreated)
    def snapshot: Map[String, State] = states.asScala.toMap
  }

  /** Run all table plans respecting the state machine. Blocks the
    * CALLING thread until every table reaches ALL_DONE (or any job
    * throws); pool threads are never parked on other futures — the
    * per-table pipeline CHAINS (flatMap) on its data futures instead of
    * Await-ing them, so the scheduler cannot deadlock on a bounded
    * ExecutionContext (N tables used to park N pool threads waiting for
    * data futures that had no thread left to run on). The per-table
    * semaphore wait is wrapped in `blocking` so compensating ECs (the
    * global ForkJoin pool) grow past it. */
  def run(plans: Seq[TablePlan])(implicit ec: ExecutionContext): Progress = {
    val progress = new Progress
    val futures = plans.map { p =>
      progress.states.put(p.name, NotCreated)
      Future {
        progress.states.put(p.name, Creating)
        p.createSchema()
        progress.states.put(p.name, Created)
      }.flatMap { _ =>
        // data jobs: bounded per-table parallelism (reference cap)
        val sem = new Semaphore(math.max(p.maxThreadsPerTable, 1))
        Future.sequence(p.dataJobs.map { job =>
          Future {
            scala.concurrent.blocking(sem.acquire())
            try job() finally sem.release()
          }
        })
      }.map { _ =>
        progress.states.put(p.name, DataDone)
        // deferred indexes strictly after data (reference index pool),
        // then this table's triggers (so data loads never fired them)
        p.postDataJobs.foreach(_.apply())
        p.triggerJobs.foreach(_.apply())
        progress.states.put(p.name, AllDone)
      }
    }
    scala.concurrent.Await.result(
      Future.sequence(futures), scala.concurrent.duration.Duration.Inf)
    progress
  }

  /** Run a full restore in reference phase order: databases → tables
    * (parallel, per-table state machine) → views/sequences → post.
    * The cross-phase barriers are the ONLY global synchronization —
    * within the table phase everything pipelines per table. */
  def runAll(plan: RestorePlan)(implicit ec: ExecutionContext): Progress = {
    plan.databaseJobs.foreach(_.apply())
    val progress = run(plan.tables)
    plan.viewJobs.foreach(_.apply())
    plan.postJobs.foreach(_.apply())
    progress
  }
}

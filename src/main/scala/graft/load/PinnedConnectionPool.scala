package graft.load

import java.sql.Connection
import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap, TimeUnit}

/** Strict snapshot pinning over JDBC (SURVEY §7 "hard" #1): plain
  * `spark.read.jdbc` opens a FRESH connection per partition, so each
  * chunk read gets its own MVCC snapshot — fine for GTID-verified modes,
  * wrong for the reference's core model of N worker connections that
  * open `START TRANSACTION WITH CONSISTENT SNAPSHOT` once (under the
  * global lock) and then serve MANY chunk queries each
  * (mydumper_working_thread.c:453-501).
  *
  * This pool reproduces that model per executor JVM: the first checkout
  * materializes `size` physical connections, runs the session-init
  * statements once on each (the snapshot opens here, while the driver
  * still holds the control lock), and hands out close-suppressing
  * proxies — JDBCRDD's per-partition `close()` RETURNS the connection
  * instead of closing it, so its snapshot survives for the next chunk.
  * Checkout blocks when all members are busy: pool size = worker-thread
  * count is the same backpressure the reference gets from `--threads`.
  *
  * Scale note: pinning is per-JVM. On a cluster each executor owns an
  * independent pool whose members open their snapshots at first use —
  * consistent only under a still-held global lock or a GTID-verified
  * snapshot (extract/Snapshot Gtid plan); that caveat is the reference's
  * own (its workers sync under the same conditions). `shutdownAll` (or
  * `shutdown(url, user)`) really closes members — call it driver-side
  * after the dump's final action.
  */
object PinnedConnectionPool {

  /** Pool identity includes the SESSION SETUP, not just the endpoint: a
    * checkout with different init statements (or size) must get a
    * different pool — silently reusing connections initialized by an
    * earlier job would serve reads from that job's still-open snapshot
    * transaction. */
  final case class Key(url: String, user: String, size: Int = 0,
      init: Seq[String] = Nil)

  private final class Pool(val conns: ArrayBlockingQueue[Connection],
      val physical: java.util.List[Connection])

  private val pools = new ConcurrentHashMap[Key, Pool]()

  /** Checkout (creating the pool on first use). `mk` opens a physical
    * connection; `init` runs once per physical member at creation. */
  def checkout(key: Key, size: Int, init: Seq[String],
      mk: () => Connection, timeoutSec: Long = 3600L): Connection = {
    val pool = pools.computeIfAbsent(key.copy(size = size, init = init), _ => {
      val q = new ArrayBlockingQueue[Connection](size)
      val phys = new java.util.ArrayList[Connection](size)
      try {
        var i = 0
        while (i < size) {
          val c = mk()
          phys.add(c) // add BEFORE init so a failing init still closes c
          val st = c.createStatement()
          try init.foreach(st.execute) finally st.close()
          q.put(c); i += 1
        }
      } catch {
        case e: Throwable =>
          // partial failure: close whatever was opened — each member may
          // hold an open CONSISTENT SNAPSHOT transaction, and leaking it
          // pins server connection slots + MVCC history until JVM death
          phys.forEach(c => try c.close() catch { case _: Throwable => () })
          throw e
      }
      new Pool(q, phys)
    })
    val conn = pool.conns.poll(timeoutSec, TimeUnit.SECONDS)
    require(conn != null, s"pinned-pool checkout timed out after ${timeoutSec}s")
    proxy(conn, pool)
  }

  /** Close-suppressing proxy: `close()` returns the member to the pool;
    * everything else delegates. `isClosed` reflects checkout state so
    * double-close is a no-op, as the JDBC contract requires. */
  private def proxy(conn: Connection, pool: Pool): Connection = {
    val returned = new java.util.concurrent.atomic.AtomicBoolean(false)
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[Connection]),
      (p: Any, m: java.lang.reflect.Method, args: Array[AnyRef]) =>
        m.getName match {
          case "close" =>
            if (returned.compareAndSet(false, true)) pool.conns.put(conn)
            null
          case "isClosed" => java.lang.Boolean.valueOf(returned.get())
          case "equals"   => java.lang.Boolean.valueOf(p.asInstanceOf[AnyRef] eq args(0))
          case "hashCode" => Integer.valueOf(System.identityHashCode(p))
          case "toString" => s"PinnedConnection($conn)"
          case _ =>
            require(!returned.get(), "connection used after return to pool")
            // unwrap reflection's InvocationTargetException: callers
            // (Spark's JdbcUtils retry/rollback, dialect error
            // classification) catch SQLException — an undeclared
            // wrapped checked exception would surface as
            // UndeclaredThrowableException and skip all of that
            try m.invoke(conn, args: _*)
            catch {
              case e: java.lang.reflect.InvocationTargetException =>
                throw e.getCause
            }
        }).asInstanceOf[Connection]
  }

  /** Stored keys carry (size, init); an endpoint-level `Key(url, user)`
    * matches every pool for that endpoint, a fully-specified key only
    * its own. */
  private def matching(key: Key): Seq[Key] = {
    val ks = java.util.Collections.list(pools.keys())
    val b = Seq.newBuilder[Key]
    ks.forEach { k =>
      if (k.url == key.url && k.user == key.user &&
          (key.init.isEmpty && key.size == 0 || k == key)) b += k
    }
    b.result()
  }

  /** Really close matching pools' physical members (driver-side, after
    * the dump's last action). An endpoint-level key closes EVERY pool
    * for that (url, user). */
  def shutdown(key: Key): Unit = matching(key).foreach { k =>
    Option(pools.remove(k)).foreach { p =>
      p.physical.forEach(c => try c.close() catch { case _: Throwable => () })
    }
  }

  def shutdownAll(): Unit = {
    val keys = java.util.Collections.list(pools.keys())
    keys.forEach(k => Option(pools.remove(k)).foreach { p =>
      p.physical.forEach(c => try c.close() catch { case _: Throwable => () })
    })
  }

  /** Physical members pooled for `key` (endpoint-level keys sum across
    * that endpoint's pools; 0 = none). */
  def poolSize(key: Key): Int =
    matching(key).flatMap(k => Option(pools.get(k))).map(_.physical.size).sum
}

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

  final case class Key(url: String, user: String)

  private final class Pool(val conns: ArrayBlockingQueue[Connection],
      val physical: java.util.List[Connection])

  private val pools = new ConcurrentHashMap[Key, Pool]()

  /** Checkout (creating the pool on first use). `mk` opens a physical
    * connection; `init` runs once per physical member at creation. */
  def checkout(key: Key, size: Int, init: Seq[String],
      mk: () => Connection, timeoutSec: Long = 3600L): Connection = {
    val pool = pools.computeIfAbsent(key, _ => {
      val q = new ArrayBlockingQueue[Connection](size)
      val phys = new java.util.ArrayList[Connection](size)
      var i = 0
      while (i < size) {
        val c = mk()
        val st = c.createStatement()
        try init.foreach(st.execute) finally st.close()
        phys.add(c); q.put(c); i += 1
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
            m.invoke(conn, args: _*)
        }).asInstanceOf[Connection]
  }

  /** Really close one pool's physical members (driver-side, after the
    * dump's last action). */
  def shutdown(key: Key): Unit = Option(pools.remove(key)).foreach { p =>
    p.physical.forEach(c => try c.close() catch { case _: Throwable => () })
  }

  def shutdownAll(): Unit = {
    val keys = java.util.Collections.list(pools.keys())
    keys.forEach(k => shutdown(k))
  }

  /** Number of physical members currently pooled for `key` (0 = no pool). */
  def poolSize(key: Key): Int =
    Option(pools.get(key)).map(_.physical.size).getOrElse(0)
}

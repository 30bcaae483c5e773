package graft

import graft.extract.{Snapshot, Throttle}
import graft.sources.ExecHook
import java.nio.file.Files

/** T5/T8/S10 driver-side control surface: savepoint statement pairs,
  * chunk-launch pacing, pause gate, and the per-file exec hook — all
  * deterministic (injected clock/sleep/runner), no live server. */
class ThrottleSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("pacer enforces the minimum interval between chunk launches") {
    var clock = 0L
    var slept = Vector.empty[Long]
    val p = new Throttle.Pacer(100L, now = () => clock,
      sleep = ms => { slept :+= ms; clock += ms })
    p.acquire()             // first launch: free
    clock += 30
    p.acquire()             // 30ms elapsed -> sleep 70
    clock += 250
    p.acquire()             // long gap -> free
    p.acquire()             // immediate -> sleep full 100
    assert(slept === Vector(70L, 100L))
  }

  test("pause gate polls until resumed and reports the wait") {
    var left = 3
    var slept = 0
    val polls = Throttle.awaitResume(
      paused = () => { left -= 1; left >= 0 },
      pollMs = 5L, sleep = _ => slept += 1)
    assert(polls === 3 && slept === 3)
    assert(Throttle.awaitResume(() => false, 5L, _ => fail("must not sleep")) === 0)
  }

  test("savepoint pair brackets a table scan; unsafe names rejected") {
    val (begin, end) = Snapshot.savepointAround()
    assert(begin === "SAVEPOINT graft" && end === "ROLLBACK TO SAVEPOINT graft")
    intercept[IllegalArgumentException](Snapshot.savepointAround("x; DROP"))
  }

  test("exec hook runs once per matching file, in name order, FILENAME substituted") {
    val dir = Files.createTempDirectory("graft_exec_").toString
    Seq("graft.t.00001.sql", "graft.t.00000.sql", "other.txt")
      .foreach(n => Files.writeString(java.nio.file.Paths.get(dir, n), "x"))
    var ran = Vector.empty[Seq[String]]
    val res = ExecHook.run(dir, "graft.t.*.sql", "upload FILENAME",
      runner = cmd => { ran :+= cmd; 0 })
    assert(res.map(_._2) === Seq(0, 0))
    // the path rides as $1 (positional arg), never spliced into the
    // command text — spaces/metacharacters in file names stay inert
    assert(ran.map(_.last) === Vector(s"$dir/graft.t.00000.sql",
      s"$dir/graft.t.00001.sql"))
    assert(ran.forall(_.contains("""upload "$1"""")))
  }

  test("exec hook is safe for paths with spaces and shell metacharacters") {
    val dir = Files.createTempDirectory("graft_exec_inj_").toString
    val tricky = "graft.my table.00000.sql" // space in table name
    Files.writeString(java.nio.file.Paths.get(dir, tricky), "x")
    val marker = s"$dir/marker"
    val res = ExecHook.run(dir, "graft.*.sql", s"cp FILENAME $marker")
    assert(res.map(_._2) === Seq(0), "command failed on a spaced path")
    assert(Files.exists(java.nio.file.Paths.get(marker)))
  }

  test("exec hook really spawns the shell command") {
    val dir = Files.createTempDirectory("graft_exec_sh_").toString
    Files.writeString(java.nio.file.Paths.get(dir, "graft.t.00000.sql"), "x")
    val marker = s"$dir/marker"
    val res = ExecHook.run(dir, "graft.t.*.sql", s"cp FILENAME $marker")
    assert(res === Seq((s"$dir/graft.t.00000.sql", 0)))
    assert(Files.exists(java.nio.file.Paths.get(marker)))
  }
}

package graft

import graft.cli.Main
import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {

  test("flag parsing: long, short-alias, valueless, ignored") {
    val o = Main.parseFlags(Array(
      "--source-dir", "/data", "-o", "/out", "--compress",
      "--tables-list", "a,b", "-t", "8", "--pmm-path", "/x"))
    assert(o("source-dir") === "/data")
    assert(o("outputdir") === "/out")
    assert(o("compress") === "true")
    assert(o("tables-list") === "a,b")
    assert(o("threads") === "8")
    assert(!o.contains("pmm-path")) // accepted-but-ignored operational flag
  }
}

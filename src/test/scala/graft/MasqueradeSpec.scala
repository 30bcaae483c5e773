package graft

import graft.functions.Masquerade
import graft.functions.Masquerade._
import org.apache.spark.sql.functions._

class MasqueradeSpec extends SparkTestBase {
  import spark.implicits._

  private def one(fn: MaskFn, v: String): String = {
    val df = Seq(Option(v)).toDF("c")
    df.select(fn(col("c")).as("m")).head().getString(0)
  }

  test("constant / null / affix / regex semantics") {
    assert(one(Constant("X"), "abc") === "X")
    assert(one(Affix("p-", "-s"), "v") === "p-v-s")
    assert(one(Regex("[0-9]+", "#"), "a12b345") === "a#b#")
    val df = Seq(Option("x")).toDF("c")
    assert(df.select(Null(col("c"))).head().isNullAt(0))
  }

  test("NULL inputs propagate to NULL outputs (reference NULL rules)") {
    val df = Seq[Option[String]](None).toDF("c")
    Seq[MaskFn](Constant("X"), Affix("p", "s"), Regex("a", "b"),
      RandomIntDet, RandomStringDet, RandomUuidDet).foreach { fn =>
      assert(df.select(fn(col("c"))).head().isNullAt(0), s"$fn broke NULL")
    }
  }

  test("deterministic hash masks: length-preserving, stable, value-keyed") {
    val mi = one(RandomIntDet, "customer42")
    assert(mi.length === "customer42".length)
    assert(mi.forall(_.isDigit))
    assert(one(RandomIntDet, "customer42") === mi) // stable
    assert(one(RandomIntDet, "customer43") !== mi) // keyed
    val ms = one(RandomStringDet, "abcdef")
    assert(ms.length === 6 && ms.forall(c => c >= 'a' && c <= 'p'))
    val uuid = one(RandomUuidDet, "x")
    assert(uuid.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }

  test("chain composes in order (F10)") {
    val chained = Masquerade.chain(Seq(Regex("[0-9]", "x"), Affix("<", ">")))(col("c"))
    val out = Seq(Option("a1")).toDF("c").select(chained).head().getString(0)
    assert(out === "<ax>")
  }

  test("directive parser round-trips the reference grammar subset") {
    assert(Masquerade.parse("constant 'FIXED'") === Constant("FIXED"))
    assert(Masquerade.parse("regex '[a-z]+' 'X'") === Regex("[a-z]+", "X"))
    assert(Masquerade.parse("apply 'p' 's'") === Affix("p", "s"))
    assert(Masquerade.parse("random_int") === RandomIntDet)
    assert(Masquerade.parse("null") === Null)
    // unknown functions fall back to identity with a message — the
    // reference's forgiving default (mydumper_masquerade.c:653-658) —
    // and random_format routes through the template parser
    assert(Masquerade.parse("bogus") === Masquerade.Identity)
    assert(Masquerade.parse("") === Masquerade.Identity)
    assert(Masquerade.parse("random_format id-<number 4>") ===
      Masquerade.Format(Seq(Masquerade.FormatPart.Lit("id-"),
        Masquerade.FormatPart.Num(4))))
  }

  test("file dictionary part: deterministic, in-dictionary, null-safe (F5)") {
    val dict = java.nio.file.Files.createTempFile("mask_dict", ".txt")
    java.nio.file.Files.write(dict,
      "alice\nbob\n\ncarol\ndenise\n".getBytes("UTF-8"))
    try {
      val part = FormatPart.File(dict.toString)
      assert(part.lines === Vector("alice", "bob", "carol", "denise"))
      // length-range restriction mirrors the reference's per-length draw
      assert(FormatPart.File(dict.toString, minLen = 4, maxLen = 5).lines
        === Vector("alice", "carol"))
      val fn = Format(Seq(FormatPart.Lit("u:"), part))
      val out = one(fn, "customer42")
      assert(out.startsWith("u:") && part.lines.contains(out.drop(2)))
      assert(one(fn, "customer42") === out)  // stable
      val other = one(fn, "customer7")       // keyed (these two differ)
      assert(part.lines.contains(other.drop(2)))
      // NULL propagates
      val nulled = Seq(Option.empty[String]).toDF("c")
        .select(fn(col("c"))).head()
      assert(nulled.isNullAt(0))
    } finally java.nio.file.Files.delete(dict)
  }

  test("format template parser handles string/number/file parts (F5)") {
    val dict = java.nio.file.Files.createTempFile("mask_dict2", ".txt")
    java.nio.file.Files.write(dict, "word\n".getBytes("UTF-8"))
    try {
      val f = Masquerade.parseFormat(s"id-<number 4>/<string 3> <file $dict>!")
      assert(f.parts(0) === FormatPart.Lit("id-"))
      assert(f.parts(1) === FormatPart.Num(4))
      assert(f.parts(2) === FormatPart.Lit("/"))
      assert(f.parts(3) === FormatPart.Str(3))
      assert(f.parts(4) === FormatPart.Lit(" "))
      assert(f.parts(5) === FormatPart.FileDict(Vector("word")))
      assert(f.parts(6) === FormatPart.Lit("!"))
      val out = one(f, "k1")
      assert(out.matches("id-[0-9]{4}/[a-p]{3} word!"))
      intercept[IllegalArgumentException](Masquerade.parseFormat("<bogus 1>"))
    } finally java.nio.file.Files.delete(dict)
  }

  test("registry applies per db.table.column rules") {
    val reg = Registry(Map(
      "db.t.name" -> Seq(Constant("MASKED")),
      "db.t.bal"  -> Seq(Null)))
    val df = Seq(("alice", "10.5", "keep")).toDF("name", "bal", "other")
    val out = reg(df, "db", "t").head()
    assert(out.getString(0) === "MASKED")
    assert(out.isNullAt(1))
    assert(out.getString(2) === "keep")
  }
}

package graft

import graft.functions.UrlFunctions
import org.apache.spark.sql.functions._

/** URL canonicalization contract: casing, default-port stripping, utm
  * param removal, fragment drop, empty path, unparseable → null, and
  * the eTLD+1 heuristic incl. two-level suffixes. */
class UrlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def canonOf(urls: String*): Seq[String] =
    urls.toSeq.toDF("u")
      .select(UrlFunctions.canonical(col("u"))).collect().map(_.getString(0)).toSeq

  test("canonicalization rules") {
    assert(canonOf(
      "HTTP://WWW.Example.COM:80/A/B?utm_source=x&id=3#frag",
      "https://site.org:443/",
      "https://site.org:8443/x?utm_medium=a&utm_campaign=b",
      "http://h.net",
      "ftp://files.example.com/pub",
      "not a url",
      "//missing.scheme/path") === Seq(
      "http://www.example.com/A/B?id=3", // host lowered, :80 dropped, utm gone, fragment gone; PATH case kept
      "https://site.org/",
      "https://site.org:8443/x", // non-default port kept; all-utm query drops the '?'
      "http://h.net/", // empty path -> "/"
      "ftp://files.example.com/pub", // non-http scheme passes through
      null, null))
  }

  test("registered domain: eTLD+1 with two-level suffixes") {
    val got = Seq("www.example.co.uk", "a.b.news.com.au", "sub.example.com",
      "example.com", "localhost", "co.uk")
      .toDF("h").select(UrlFunctions.registeredDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("example.co.uk", "news.com.au", "example.com",
      "example.com", "localhost", "co.uk"))
  }

  test("query param filter keeps order and drops empties") {
    val df = Seq("http://h.com/p?utm_source=s&a=1&utm_x=2&b=2&&c=3").toDF("u")
    assert(df.select(UrlFunctions.cleanQuery(col("u"))).head().getString(0)
      === "a=1&b=2&c=3")
  }
}

/** Line-level boilerplate strip: both filter legs (too short /
  * stopword-starved), content retention, and the empty-string (never
  * null) contract for all-boilerplate docs. */
class BoilerplateSpec extends SparkTestBase {
  import graft.functions.TextFunctions
  import spark.implicits._

  private def clean(t: String): String =
    Seq(t).toDF("t")
      .select(TextFunctions.stripBoilerplate(col("t"))).head().getString(0)

  test("content lines survive, nav and cookie lines are stripped") {
    val doc = Seq(
      "Accept cookies subscribe now", // >=4 words but zero stopwords
      "the quick brown fox is over the lazy dog of yore", // content
      "menu home login", // too short
      "this line of text is a perfectly normal one", // content
      "buy now").mkString("\n")
    assert(clean(doc) === Seq(
      "the quick brown fox is over the lazy dog of yore",
      "this line of text is a perfectly normal one").mkString("\n"))
  }

  test("all-boilerplate docs clean to empty string, never null") {
    assert(clean("menu\nlogin now\nbuy buy buy buy") === "")
    // and a single content line has no stray separators
    assert(clean("a b c the d") === "a b c the d")
  }

  test("thresholds are exact integer cross-multiplication at the boundary") {
    // 20 words, exactly 1 stopword -> 1*20 >= 20*1 holds (kept);
    // 21 words, 1 stopword -> 20 < 21 (dropped)
    val kept = ("the " + Seq.fill(19)("word").mkString(" "))
    val dropped = ("the " + Seq.fill(20)("word").mkString(" "))
    assert(clean(kept) === kept)
    assert(clean(dropped) === "")
  }
}

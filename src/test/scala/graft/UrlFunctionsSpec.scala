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

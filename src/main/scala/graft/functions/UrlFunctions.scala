package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL operators for crawl curation — the step between "fetched bytes"
  * and every per-domain decision this engine already makes (PageRank
  * authority joins, per-domain sampling quotas, heavy-hitter domains):
  * parse, canonicalize, and reduce a URL column to its registered
  * domain. Pure Column expressions (regexp + array built-ins, all
  * codegen), no UDF — a 100 TB URL column normalizes inside the scan's
  * whole-stage codegen.
  *
  * Canonicalization contract (the common crawl-dedup baseline):
  * lowercase scheme and host, strip the fragment, drop default ports
  * (http:80, https:443), empty path → "/", drop `utm_*` tracking
  * params (order of surviving params preserved — param sorting changes
  * real-world semantics for some sites and is deliberately NOT done).
  * Every rule is SQL-replayable; the value gate replays them all in
  * DuckDB over closed-form synthesized URLs.
  */
object UrlFunctions {

  /** scheme://host[:port][path][?query][#fragment] */
  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$"

  def scheme(u: Column): Column = lower(regexp_extract(u, UrlRe, 1))
  def host(u: Column): Column = lower(regexp_extract(u, UrlRe, 2))
  def port(u: Column): Column = regexp_extract(u, UrlRe, 3)
  def path(u: Column): Column = regexp_extract(u, UrlRe, 4)
  def query(u: Column): Column = regexp_extract(u, UrlRe, 5)

  /** Query with `utm_*` tracking params dropped (empty string if none
    * survive). */
  def cleanQuery(u: Column): Column =
    array_join(
      filter(split(query(u), "&"),
        p => !(p.startsWith("utm_") || p === "")), "&")

  /** The canonical form (contract in the object doc). Unparseable URLs
    * (no scheme://host) canonicalize to NULL — the decode-to-null rule
    * every parser in this engine follows. */
  def canonical(u: Column): Column = {
    val sch = scheme(u)
    val hst = host(u)
    val prt = port(u)
    val keepPort = prt =!= "" &&
      !(sch === "http" && prt === "80") && !(sch === "https" && prt === "443")
    val pth = when(path(u) === "", "/").otherwise(path(u))
    val q = cleanQuery(u)
    when(sch === "" || hst === "", lit(null).cast("string"))
      .otherwise(concat(
        sch, lit("://"), hst,
        when(keepPort, concat(lit(":"), prt)).otherwise(lit("")),
        pth,
        when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Two-level public suffixes the heuristic recognizes (the high-traffic
    * subset; a production deployment swaps in the full PSL snapshot —
    * the COLUMN ALGEBRA is the operator, the list is data). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.tw",
    "com.ar", "co.za", "com.sg", "com.tr")

  /** eTLD+1 of a (lowercased) host: last two labels, or last three when
    * the last two form a listed two-level suffix. Hosts with one label
    * (localhost, intranet names) pass through unchanged. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val lastTwo = concat(element_at(labels, -2), lit("."), element_at(labels, -1))
    when(n <= 1, hostCol)
      .when(n >= 3 && lastTwo.isin(TwoLevelSuffixes: _*),
        concat(element_at(labels, -3), lit("."), lastTwo))
      .otherwise(lastTwo)
  }
}

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

  /** Every http(s) URL mentioned in free TEXT — the outlink-extraction
    * step that turns a crawled document into link-graph edges (feeding
    * [[registeredDomain]] grouping, PageRank authority, domain quotas).
    * Greedy non-whitespace match with trailing prose punctuation
    * (`.,!?;:'"`) stripped per URL — "see https://a.com/x)." yields
    * "https://a.com/x". A trailing `)` is stripped ONLY when the URL
    * contains no `(` (the standard heuristic): Wikipedia-style
    * `/Foo_(bar)` paths keep their balanced close-paren, while a URL
    * that merely sat inside prose parentheses loses it. Limitation
    * (documented, matches the common extractors): a paren-path URL that
    * is ALSO wrapped in prose parens keeps one `)` too many. Pure
    * codegen regexp/conditional algebra, replayable in any RE2/PCRE
    * engine (no lookbehind). */
  def extractUrls(text: Column): Column =
    transform(
      regexp_extract_all(text, lit("https?://[^\\s]+"), lit(0)),
      u => when(u.contains("("), regexp_replace(u, "[.,!?;:'\"]+$", ""))
        .otherwise(regexp_replace(u, "[.,)!?;:'\"]+$", "")))

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

  /** eTLD+1 of a (lowercased) host under the FULL publicsuffix.org rule
    * algebra, driven by the [[PublicSuffixes]] snapshot (the list is
    * data; this is the algorithm):
    *
    *   - an EXCEPTION rule (`!www.ck`) prevails over every other match:
    *     the exception string itself is the registrable domain;
    *   - otherwise the LONGEST matching rule wins, where a plain rule
    *     of k labels makes the host's last k labels the public suffix,
    *     and a wildcard rule `*.base` (base of k labels) makes the last
    *     k+1 labels the public suffix;
    *   - no rule matches ⇒ the implicit `*` default: the last label is
    *     the public suffix;
    *   - registrable domain = public suffix + one more label. A host
    *     that IS a public suffix (or a single label — localhost,
    *     intranet names) passes through unchanged, the engine's
    *     documented grouping for unregistrable hosts.
    *
    * Pure column algebra: per rule depth one [[inSet]] hash probe over
    * the host's last-k-label string — no UDF, no join; a 100 TB URL
    * column resolves inside the scan's codegen. Rule classes and depths
    * are derived from the snapshot at class-init time, so swapping in a
    * bigger PSL dump changes nothing here. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column =
      if (k == 1) element_at(labels, -1)
      else concat_ws(".", (k to 1 by -1).map(i => element_at(labels, -i)): _*)
    val base = when(n <= 1, hostCol)
    // exceptions first (they beat longer wildcard matches by spec)
    val withExc = PublicSuffixes.exceptionsByLen.toSeq.sortBy(-_._1)
      .foldLeft(base) { case (acc, (len, excs)) =>
        acc.when(n >= len && inSet(lastK(len), excs), lastK(len))
      }
    // then by public-suffix length, longest first; at each depth a
    // plain rule (last ps labels listed) or a wildcard rule (last ps-1
    // labels are a listed base) claims the suffix
    val resolved = (PublicSuffixes.maxPsLen to 2 by -1)
      .foldLeft(withExc) { case (acc, ps) =>
        val plain = PublicSuffixes.normalByLen.get(ps)
          .map(s => inSet(lastK(ps), s))
        val wild = PublicSuffixes.wildcardBasesByLen.get(ps - 1)
          .map(s => inSet(lastK(ps - 1), s))
        (plain ++ wild).reduceOption(_ || _) match {
          case None => acc
          case Some(cond) =>
            acc.when(n > ps && cond, lastK(ps + 1))
              .when(n === ps && cond, hostCol) // host IS a public suffix
        }
      }
    // implicit `*` default: last label is the public suffix
    resolved.otherwise(lastK(2))
  }

  /** Set-membership probe built DIRECTLY as a Catalyst `InSet` node —
    * one plan node holding one hash set. `isin(values: _*)` builds an
    * `In` with one Literal CHILD per value; at the full PSL's ~10k
    * rules that put ~60k literal nodes into every plan that touches
    * [[registeredDomain]], and the optimizer's repeated tree copies
    * turned planning time into the dominant cost of every URL gate
    * (q_curate 1.4→8 s measured — ALL of it driver-side). Same
    * semantics, same codegen'd set probe, constant plan size. */
  private def inSet(c: Column, values: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(org.apache.spark.sql.catalyst.expressions.InSet(toExpr(c),
      values.iterator
        .map(v => org.apache.spark.unsafe.types.UTF8String.fromString(v)
          .asInstanceOf[Any]).toSet))
  }
}

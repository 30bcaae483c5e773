package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis functions for the training-data pipeline extensions
  * (builder brief: language-ID, quality scoring, token counting, document
  * fingerprinting). All pure `functions._` compositions — whole-stage
  * codegen, no UDFs, no shuffle; they scale as a map over the documents
  * table.
  */
object TextFunctions {

  /** Truncate to 4 decimals via floor — unlike round(), floor of an
    * identical double is identical in every engine (no half-way tie
    * semantics), which the DuckDB oracle comparison relies on. */
  def trunc4(c: Column): Column = floor(c * lit(10000.0)) / lit(10000.0)

  /** Count of `[A-Za-z ]` characters — native codegen byte scan,
    * value-identical to `length(regexp_replace(text, "[^A-Za-z ]", ""))`
    * without the per-row automaton + replaced-string allocation (the
    * quality pass's alpha-ratio numerator runs over every corpus byte). */
  def alphaSpaceCount(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(org.apache.spark.sql.graftnative.AsciiAlphaSpaceCount(
      ColumnBridge.expression(text)))
  }

  /** Adjacent element pairs of a string array as `struct<l, r>` —
    * shared by the bigram-LM and BPE pair extractions. The `size >= 2`
    * guard is load-bearing: `sequence(0, -1)` steps DOWNWARD (yielding
    * [0, -1]), it is not empty, so sub-2-element arrays must
    * short-circuit to an explicit empty. */
  def adjacentPairs(arr: Column): Column = {
    val pairsOf = (a: Column) => {
      val zipped = org.apache.spark.sql.functions.transform(
        sequence(lit(0), size(a) - 2),
        i => struct(element_at(a, i + 1).as("l"), element_at(a, i + 2).as("r")))
      zipped
    }
    when(size(arr) >= 2, pairsOf(arr))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** Whitespace-token count; empty/blank text → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word chunks + digit runs + punctuation marks,
    * the usual cheap proxy for tokenizer load. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\\s]"), lit(0)))

  /** Mean word length over whitespace tokens (0 for blank). */
  def meanWordLen(text: Column): Column = {
    val t = trim(text)
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(trunc4((length(t) - (n - 1)).cast(DoubleType) / n.cast(DoubleType)))
  }

  private val punctClass = "[.,;:!?'\"()\\[\\]{}-]"

  /** Punctuation density per character (0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      trunc4(size(regexp_extract_all(text, lit(punctClass), lit(0))).cast(DoubleType)
        / length(text).cast(DoubleType)))

  private val stopwords = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")
  private val stopwordPattern = "\\b(" + stopwords.mkString("|") + ")\\b"

  /** Stopword hits / token count — high for natural prose, low for tables
    * or boilerplate. */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      trunc4(size(regexp_extract_all(lower(text), lit(stopwordPattern), lit(0))).cast(DoubleType)
        / n.cast(DoubleType)))
  }

  /** Line-level boilerplate removal (the jusText/CCNet-shaped cleaning
    * step between HTML extraction and document-level quality scoring):
    * navigation/footer/cookie-banner lines are short and nearly
    * stopword-free, while content prose is long and stopword-dense, so
    * a line survives iff it has ≥ `minWords` words AND its exact-match
    * stopword share is ≥ stopNum/stopDen (integer cross-multiplied —
    * no float ratio, so the rule replays bit-exact in SQL). Pure
    * higher-order Column algebra over `split(text, "\n")` — no UDF, no
    * shuffle, embarrassingly parallel at 100 TB. A document whose every
    * line is boilerplate cleans to the empty string (never null).
    * Word matching is exact-token (isin), deliberately different from
    * [[stopwordRatio]]'s substring-tolerant regexp: line filtering
    * wants precision, corpus scoring wants recall. */
  def stripBoilerplate(text: Column, minWords: Int = 4,
      stopNum: Int = 1, stopDen: Int = 20): Column =
    array_join(filter(split(text, "\n"), l => {
      val ws = filter(split(lower(trim(l)), "\\s+"), w => w =!= "")
      size(ws) >= minWords &&
        size(filter(ws, w => w.isin(stopwords: _*))) * lit(stopDen) >=
          size(ws) * lit(stopNum)
    }), "\n")

  /** `tokenCount(stripBoilerplate(text))` WITHOUT materializing the
    * cleaned string: one aggregate over the line array summing each
    * surviving line's word count. Provably equal to the two-step form
    * (kept lines are non-empty — ≥ minWords ≥ 1 words — and "\n"-joined
    * text re-splits on the same `\s+` class), pinned by spec. The
    * cheap branch for pipelines that need only the length decision
    * (e.g. [[graft.operators.Curation]]'s narrow verdict frame), not
    * the text itself. */
  def cleanTokenCount(text: Column, minWords: Int = 4,
      stopNum: Int = 1, stopDen: Int = 20): Column = {
    require(minWords >= 1, s"minWords=$minWords: a 0-word keep rule " +
      "breaks the count==0 <=> all-boilerplate equivalence")
    aggregate(split(text, "\n"), lit(0), (acc, l) => {
      val ws = filter(split(lower(trim(l)), "\\s+"), w => w =!= "")
      val kept = size(ws) >= minWords &&
        size(filter(ws, w => w.isin(stopwords: _*))) * lit(stopDen) >=
          size(ws) * lit(stopNum)
      acc + when(kept, size(ws)).otherwise(lit(0))
    })
  }

  /** Composite quality score in [0,1]: long enough, punctuated, some
    * stopwords, sane mean word length. Deliberately simple + deterministic. */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(length(text).cast(DoubleType) / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val wl        = meanWordLen(text)
    val wlScore   = when(wl >= 3.0 && wl <= 10.0, lit(1.0)).otherwise(lit(0.5))
    trunc4(lenScore * 0.4 + stopScore * 0.3 + wlScore * 0.3)
  }

  /** Stopword lists per language for the n-gram/stopword language-ID
    * heuristic. Scores = distinct-marker hits; argmax wins, ties broken by
    * fixed language order (en first). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that"),
    "es" -> Seq("el", "la", "los", "las", "que", "por", "una"),
    "fr" -> Seq("le", "les", "des", "est", "avec", "pour", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** `\b` word boundaries only fire next to ASCII word characters
    * ([A-Za-z0-9_]) in both Java regex and RE2 — adjacent to CJK they
    * never match, so boundary-wrapped Chinese markers score 0 on pure
    * Chinese text and "zh" was unreachable. CJK needs no boundaries
    * (no spaces to over-match across): bare alternation is correct. */
  private def isCjk(words: Seq[String]): Boolean =
    words.exists(_.exists(_ >= '⺀'))

  private def markerPattern(words: Seq[String]): String =
    if (isCjk(words)) "(" + words.mkString("|") + ")"
    else "\\b(" + words.mkString("|") + ")\\b"

  private def markerHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text), lit(markerPattern(words)), lit(0)))

  /** Language-ID: argmax of marker-word hit counts; "und" when nothing
    * matches. Single-Column form for expression contexts; prefer
    * [[withLangId]] in DataFrame pipelines — this inlined tree repeats
    * each regex across the when-chain and the greatest(), and the
    * resulting codegen unit measured 9 s of first-use JIT + 2× the
    * steady-state cost of the two-projection form. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ws) => (lang, markerHits(text, ws)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Language-ID as a pipeline stage: adds `outCol` to `df`. Each marker
    * regex is scored ONCE into an intermediate projection (regex columns
    * are non-cheap, so Catalyst keeps the projection boundary instead of
    * re-inlining them into every argmax branch), then the argmax case
    * reads the scored columns. Same result as [[langId]], measured 2×
    * faster warm and ~15× faster on first use (small codegen units JIT
    * in milliseconds). */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String = "lang_pred"): org.apache.spark.sql.DataFrame = {
    val scoreCols = langMarkers.map { case (lang, ws) =>
      markerHits(col(textCol), ws).as(s"__s_$lang")
    }
    val scored = df.select(col("*") +: scoreCols: _*)
    val best = langMarkers.map(m => col(s"__s_${m._1}")).reduce(greatest(_, _))
    val pred = langMarkers.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(col(s"__s_$lang") === best && col(s"__s_$lang") > 0, lit(lang))
        .otherwise(acc)
    }
    scored.withColumn(outCol, pred)
      .drop(langMarkers.map(m => s"__s_${m._1}"): _*)
  }

  /** Per-LINE language segmentation — the CCNet move for MIXED-language
    * documents (a doc-level language label mislabels half of a bilingual
    * page): every non-empty trimmed line is language-ID'd through the
    * fast two-projection [[withLangId]], then per document we report the
    * line count, the number of CONSECUTIVE-language segments (run-length
    * over position-ordered line langs — computed by an array fold after
    * `array_sort`, no window, so a billion-doc corpus never single-tasks
    * a skewed key) and the dominant language with its exact fixed-point
    * share. Docs with no non-empty lines survive with (0, 0, "und", 0).
    *
    * Dominant-language argmax is `max(struct(count, lang))` — an
    * associative aggregate (partial-aggregates map-side; ties break
    * toward the lexicographically larger lang, deterministically,
    * replayable as ORDER BY c DESC, lang DESC LIMIT 1). */
  def langSegments(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(filter(transform(split(col(textCol), "\n"), l => trim(l)),
        l => l =!= "")).as(Seq("pos", "line")))
    val scored = withLangId(lines, "line", "line_lang")
    val rle = aggregate(
      transform(array_sort(collect_list(struct(col("pos"), col("line_lang")))),
        x => x.getField("line_lang")),
      struct(lit(0L).as("n"), lit("").as("last")),
      (acc, l) => struct(
        when(l === acc.getField("last"), acc.getField("n"))
          .otherwise(acc.getField("n") + 1L).as("n"),
        l.as("last")),
      acc => acc.getField("n"))
    val perDoc = scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_lines"), rle.as("n_segments"))
    val dominant = scored.groupBy(col(idCol), col("line_lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(max(struct(col("c"), col("line_lang"))).as("m"), sum("c").as("tot"))
      .select(col(idCol), col("m.line_lang").as("main_lang"),
        floor(col("m.c").cast("double") * 1000.0 / col("tot").cast("double"))
          .cast(org.apache.spark.sql.types.LongType).as("main_permille"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .join(dominant, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("main_lang"), lit("und")).as("main_lang"),
        coalesce(col("main_permille"), lit(0L)).as("main_permille"))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text,
    * truncated to 16 hex chars — the exact-dup key. */
  def fingerprint(text: Column): Column =
    substring(md5(lower(regexp_replace(trim(text), "\\s+", " ")).cast(BinaryType)), 1, 16)

  /** Word n-gram shingles (n consecutive tokens joined by space) — input
    * to MinHash / Jaccard dedup. */
  def shingles(text: Column, n: Int): Column = {
    val words = split(lower(trim(text)), "\\s+")
    when(size(words) < n, array(concat_ws(" ", words)))
      .otherwise(transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  // --- PII detection/redaction (the reference's masquerade concept
  // extended to unstructured text; patterns deliberately simple regex —
  // portable across engines, codegen'd, no model dependency) ---

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}"
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Count of PII-looking spans per kind. */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long"))

  /** Redact all three PII kinds with typed placeholder tokens —
    * composable with the masquerade registry (F6 regex chain). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Rolling polynomial hash over tokens (Rabin-Karp style): distributed
    * left-fold, no state outside the row. Arithmetic is kept modular
    * (acc < 2^31, term < 2^31, base < 2^21) so `acc*B + h` peaks below
    * 2^52 — never overflows a long under ANSI mode regardless of
    * document length. Per-token hash is the first 7 md5 hex chars (not
    * xxhash64) so DuckDB replays the identical fold with
    * list_reduce — the fingerprint is engine-portable, like the
    * md5-prefix sampler. */
  def rollingHash(text: Column): Column = {
    val mod = lit(2147483647L) // 2^31 - 1 (Mersenne prime)
    aggregate(split(lower(trim(text)), "\\s+"), lit(0L),
      (acc, w) => pmod(acc * lit(1000003L) +
        conv(substring(md5(w.cast(BinaryType)), 1, 7), 16, 10).cast(LongType), mod))
  }
}

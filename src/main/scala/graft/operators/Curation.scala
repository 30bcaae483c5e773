package graft.operators

import graft.functions.{TextFunctions, UrlFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The whole crawl-curation pass as ONE composable operator — the
  * pipeline a 100 TB web corpus runs between "fetched pages" and
  * "training shards", chaining the engine's own primitives:
  *
  *   1. line-level boilerplate strip ([[graft.functions.TextFunctions
  *      .stripBoilerplate]]);
  *   2. minimum-length filter on the CLEANED text (token count — short
  *      husks left after nav/footer removal);
  *   3. canonical-URL exact dedup ([[graft.functions.UrlFunctions
  *      .canonical]]; the smallest doc_id among same-canonical
  *      SURVIVORS of stage 2 is kept — stage order matters and is part
  *      of the contract: a dup group whose canonical doc was
  *      length-rejected falls to the next-smallest survivor);
  *   4. per-domain quota ([[UrlFunctions.registeredDomain]] +
  *      deterministic md5 rank among stage-3 survivors, the
  *      [[Sampling.topKPerGroup]] rule).
  *
  * Every document gets a VERDICT, not just a filter: `keep` plus
  * `reason` (the FIRST failing stage — "boilerplate_only", "too_short",
  * "dup_url", "over_quota", or null when kept), because production
  * curation is audited by reason histograms, not survivor counts.
  * Everything is deterministic and engine-portable (md5 ranks, integer
  * thresholds, no RNG), so the whole four-stage chain value-replays in
  * SQL — the q_curate gate's oracle recomputes every verdict.
  *
  * Scale shape: two window passes (canonical group, domain group) over
  * survivor subsets plus pure column maps; both windows rank only to a
  * constant (min / quota), so the salted-prefilter trick applies if a
  * single canonical/domain group ever reaches task scale — at that
  * point the group IS a dup storm and the verdict degenerates to
  * "almost everything dropped" anyway.
  */
object Curation {

  def curate(docs: DataFrame, idCol: String, textCol: String,
      urlCol: String, minTokens: Int = 8, domainCap: Int = 100,
      bpMinWords: Int = 4): DataFrame = {
    val id = col(idCol)
    val clean = TextFunctions.stripBoilerplate(col(textCol), minWords = bpMinWords)
    val canon = UrlFunctions.canonical(col(urlCol))
    val dom = UrlFunctions.registeredDomain(UrlFunctions.host(col(urlCol)))
    val staged = docs.select(col("*"),
      clean.as("clean_text"), canon.as("canon_url"), dom.as("reg_dom"))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("clean_text")))
      .withColumn("bp_only", length(col("clean_text")) === 0)
      .withColumn("too_short", !col("bp_only") && col("n_tokens") < minTokens)
    // stage-3 candidates: survivors of 1–2; the kept doc per canonical
    // is the SMALLEST id among them (deterministic canonical selection)
    val lenPass = !col("bp_only") && !col("too_short")
    // docs whose URL doesn't parse can't be attributed to a canonical
    // or a domain — they SKIP stages 3–4 by contract (flagging them
    // dups of each other via the shared NULL group would be wrong)
    val wCanon = Window.partitionBy(col("canon_url"))
    val withDup = staged.withColumn("canon_keep_id",
      min(when(lenPass, id)).over(wCanon))
      .withColumn("dup_url", lenPass && col("canon_url").isNotNull &&
        id =!= col("canon_keep_id"))
    // stage-4 candidates: survivors of 1–3, md5-ranked within domain.
    // Rank = running count of SURVIVORS in (md5, id) order — a
    // survivor's rank counts only survivors at or before it, so
    // non-survivors interleave without consuming quota
    val dupPass = lenPass && !col("dup_url")
    val wDomRank = Window.partitionBy(col("reg_dom"))
      .orderBy(md5(id.cast(StringType)), id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withQuota = withDup
      .withColumn("dom_rank", sum(when(dupPass, 1L).otherwise(0L)).over(wDomRank))
      .withColumn("over_quota", dupPass && col("reg_dom").isNotNull &&
        col("dom_rank") > domainCap)
    withQuota.select(col("*"),
      when(col("bp_only"), "boilerplate_only")
        .when(col("too_short"), "too_short")
        .when(col("dup_url"), "dup_url")
        .when(col("over_quota"), "over_quota")
        .as("reason"))
      .withColumn("keep", col("reason").isNull)
      .drop("canon_keep_id", "dom_rank")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-global sentence/paragraph deduplication — the CCNet move
  * (Wenzek et al. 2020): a sentence that appears in many documents is
  * boilerplate (cookie banners, nav text, license blurbs) even when no
  * two documents are near-duplicates as wholes. Every sentence is
  * counted across the WHOLE corpus; per document we report how much of
  * it is globally-repeated and rebuild the text with the repeated
  * sentences removed.
  *
  * Complements the existing dedup family: [[Dedup]] drops whole
  * near-duplicate documents, [[graft.functions.TextFunctions.stripBoilerplate]]
  * filters lines by local shape — this is the cross-document middle
  * ground.
  *
  * Contract: sentences split on `[.!?]+\s+` runs, trimmed, empties
  * dropped; duplicates decided on the EXACT trimmed sentence (md5 as
  * the shuffle key so wide sentences don't fatten the count exchange);
  * `cleanText` re-joins survivors in original order with ". " (the
  * terminal punctuation consumed by the split is normalized away —
  * this is a dedup-normalization view, not a reversible transform).
  *
  * Plan shape at 100 TB: posexplode → count groupBy on the 32-char
  * hash (map-side partials absorb hot boilerplate sentences) → hash
  * equi-join back (a hot sentence is one BUILD row, many probe rows)
  * → per-doc aggregate whose order is restored by `array_sort` on
  * (pos, sentence) structs, not a window — no single-task sort on any
  * skewed key. Docs whose text yields no sentences survive via the
  * final left join with zero counts and an empty clean text.
  */
object SentenceDedup {

  private[operators] def sentenceArr(textCol: Column): Column =
    filter(transform(split(textCol, "[.!?]+\\s+"), s => trim(s)), s => s =!= "")

  /** Per-document sentence dedup stats + cleaned text. A sentence is
    * "duplicated" when its corpus-wide occurrence count ≥ `minCount`
    * (occurrences, not distinct documents: a sentence repeated inside
    * one document is boilerplate too). Output: idCol, n_sents, n_dup,
    * dup_permille (integer fixed point), clean_text. */
  def dedupSentences(df: DataFrame, textCol: String, idCol: String,
      minCount: Int = 2): DataFrame = {
    require(minCount >= 2, s"minCount=$minCount")
    val sents = df
      .select(col(idCol), posexplode(sentenceArr(col(textCol))).as(Seq("pos", "sent")))
      .withColumn("sh", md5(col("sent")))
    val counts = sents.groupBy("sh").agg(count(lit(1)).as("n_occ"))
    val isDup = col("n_occ") >= minCount
    val perDoc = sents.join(counts, Seq("sh"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_sents"),
        sum(when(isDup, 1L).otherwise(0L)).as("n_dup"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!isDup, struct(col("pos"), col("sent"))))),
            x => x.getField("sent")),
          ". ").as("clean_text"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_sents"), lit(0L)).as("n_sents"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_sents"), lit(0L)) === 0, lit(0L))
          .otherwise(floor(col("n_dup").cast("double") * 1000.0 /
            col("n_sents").cast("double")).cast(LongType))
          .as("dup_permille"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}

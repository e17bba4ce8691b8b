package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Composite document quality gate — the terminal keep/drop decision of a
 * pre-training data pipeline (the C4/CCNet/Gopher pattern: individual
 * signals feed ordered rules; a document is dropped by the FIRST rule it
 * fails, and the reason code is kept for pipeline accounting/ablations).
 *
 * Rules, in order (first failure wins):
 *   1. `too_few_tokens`   whitespace token count < `minTokens`
 *   2. `non_target_lang`  language-ID ([[TextFunctions.langId]]) ∉ `langs`
 *   3. `low_quality`      [[TextFunctions.qualityScore]] (round-6) < `minQuality`
 *   4. `repetitive`       top-bigram fraction (the bigram branch of
 *                         [[Dedup.docRepetitionStats]]) > `maxTopBigram`
 *   5. `ok`               kept
 *
 * Returns (doc_id, reason, keep). Reason-code accounting (`groupBy(reason)
 * .count`) is the standard pipeline health dashboard; `filter(keep)` is
 * the corpus that proceeds to dedup/sampling.
 *
 * Plan shape: the scalar signals (tokens, quality, lang) are ONE narrow
 * scan-side projection — no shuffle; only the repetition signal aggregates
 * (doc-keyed, see [[Dedup.docRepetitionStats]]) and joins back on doc_id.
 * At 100 TB the join is a plain hash equi-join on the doc key; nothing in
 * the gate introduces a corpus-wide key.
 */
object QualityGate {

  def apply(docs: DataFrame, minTokens: Int = 40, minQuality: Double = 0.70,
      langs: Set[String] = Set("en"), maxTopBigram: Double = 0.10,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(langs.nonEmpty, "target language set must be non-empty")
    val qUdf = udf((t: String) => TextFunctions.qualityScore(t))
    val lUdf = udf((t: String) => TextFunctions.langId(t)._1)
    val sig = docs.select(col(idCol).as("doc_id"),
      graft.functions.NativeExpressions.wsTokenCount(col(textCol)).as("ws_tokens"),
      round(qUdf(col(textCol)), 6).as("quality"),
      lUdf(col(textCol)).as("pred_lang"))
    // ONLY the bigram branch of the repetition signals — the gate must not
    // pay docRepetitionStats's duplicate-line aggregation chain for a
    // signal it discards (docs with < 2 tokens are absent → coalesce 0)
    val rep = Dedup.bigramTopCounts(docs, textCol, idCol)
      .select(col("doc_id"),
        coalesce(round(col("top_n").cast("double") / col("n_bigrams"), 6),
          lit(0.0)).as("top_bigram_frac"))
    val langArr = array(langs.toSeq.sorted.map(lit): _*)
    sig.join(rep, Seq("doc_id"), "left")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
      .withColumn("reason",
        when(col("ws_tokens") < minTokens, "too_few_tokens")
          .when(!array_contains(langArr, col("pred_lang")), "non_target_lang")
          .when(col("quality") < minQuality, "low_quality")
          .when(col("top_bigram_frac") > maxTopBigram, "repetitive")
          .otherwise("ok"))
      .select(col("doc_id"), col("reason"), (col("reason") === "ok").as("keep"))
  }
}

package graft.operators

import graft.functions.TextFns
import graft.plans.Stage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY.md §2.10):
  * per-document statistics, heuristic language ID, token counting, and
  * corpus-level term frequencies. Single narrow pass per document for the
  * per-doc operators; the corpus term-frequency op is one explode +
  * hash-aggregate (map-side partial combine keeps the shuffle at
  * |vocabulary|, not |tokens|).
  */
object TextAnalysis {

  /** Per-document stats: token count, punctuation, alpha ratio, BPE-ish
    * token estimate, composite quality score. Ratio columns are emitted as
    * basis-point floors — see [[TextFns.qualityScore]] on why `round(x,4)`
    * is not portable cross-engine for rational-valued ratios. */
  def docStats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).as("n_chars_measured"),
      TextFns.tokenCount(col("text")).as("n_tokens"),
      TextFns.punctCount(col("text")).as("n_punct"),
      TextFns.basisPoints(TextFns.alphaRatio(col("text"))).as("alpha_bp"),
      TextFns.bpeTokenEstimate(col("text")).as("n_bpe_tokens"),
      TextFns.basisPoints(TextFns.qualityScore(col("text"))).as("quality_bp"))

  /** Heuristic language ID next to the labeled lang. Tokens are staged —
    * the marker-hit scores reference them ~12× per document. */
  def langId(documents: DataFrame): DataFrame =
    Stage(documents.select(col("doc_id"), col("lang"), col("text")),
      "w", TextFns.tokens(col("text")))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        TextFns.langIdFromTokens(col("w")).as("predicted_lang"))

  /** Document fingerprints (md5 + min/max shingle hash); tokens and
    * shingles staged once each ([[graft.plans.Stage]]). */
  def fingerprints(documents: DataFrame): DataFrame = {
    val toks = Stage(documents.select(col("doc_id"), col("text")),
      "w", TextFns.tokens(col("text")))
    val sh = Stage(toks.select(col("doc_id"), col("w")),
      "sh", TextFns.shingles(col("w"), 5))
    sh.select(col("doc_id"),
      md5(concat_ws(" ", col("w"))).as("full_md5"),
      array_min(transform(col("sh"), s => md5(s))).as("min_shingle"),
      array_max(transform(col("sh"), s => md5(s))).as("max_shingle"))
  }

  /** Corpus term frequency: top-`k` tokens by count (ties broken by token
    * text, for determinism). */
  def topTerms(documents: DataFrame, k: Int): DataFrame =
    documents
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
}

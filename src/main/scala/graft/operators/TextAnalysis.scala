package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Per-document text-analysis operators: one scan, per-row expressions,
  * no shuffle — the shape that scales linearly to 100 TB. */
object TextAnalysis {

  /** doc_id + token counts (whitespace and regex/BPE-ish). */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      TF.tokenCount(col(textCol)).as("n_tokens"),
      TF.regexTokenCount(col(textCol)).as("n_regex_tokens"))

  /** Quality features + composite score per document. */
  def qualityFeatures(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      TF.tokenCount(col(textCol)).as("n_tokens"),
      TF.meanTokenLength(col(textCol)).as("mean_token_len"),
      TF.stopwordRatio(col(textCol)).as("stopword_ratio"),
      TF.punctRatio(col(textCol)).as("punct_ratio"),
      TF.upperRatio(col(textCol)).as("upper_ratio"))

  /** Composite quality score per document (heuristic; no SQL oracle). */
  def qualityScores(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TF.qualityScore(col(textCol)).as("quality_score"))

  /** Language identification (function-word voting). */
  def languageId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TF.langId(col(textCol)).as("lang_pred"))

  /** 64-bit content fingerprints: SimHash + rolling-hash min-shingle. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      TF.simHash(TF.tokens(col(textCol))).as("simhash"),
      TF.docFingerprint(col(textCol)).as("fingerprint"))
}

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

  /** Intra-document repetition statistics — the "repeated boilerplate"
    * quality signal (n-gram-level repetition filters in web-corpus
    * cleaning): token count, distinct-token count, the most frequent
    * token's count, and the repetition ratio 1 − distinct/total. All
    * per-row work over the token array — no explode, no shuffle. The
    * max-frequency pass is a one-pass JIT'd UDF with a per-doc hash map
    * (the HOF form would run an interpreted lambda per element — the
    * measured 2-20× trap VectorKernels exists to avoid). */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val toks = TF.tokens(col(textCol))
    val maxFreqUdf = udf { (ts: Seq[String]) =>
      if (ts == null || ts.isEmpty) 0L
      else {
        val m = new java.util.HashMap[String, Long]()
        var best = 0L
        ts.foreach { t =>
          val c = m.merge(t, 1L, (a, b) => a + b)
          if (c > best) best = c
        }
        best
      }
    }
    val maxFreq = maxFreqUdf(toks)
    docs.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      maxFreq.as("max_tok_freq"),
      when(size(toks) === 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
        .as("rep_ratio"))
  }

  /** Composite quality score per document (heuristic; no SQL oracle). */
  def qualityScores(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TF.qualityScore(col(textCol)).as("quality_score"))

  /** Language identification (function-word voting). */
  def languageId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TF.langId(col(textCol)).as("lang_pred"))

  /** Per-doc 64-bit SimHash via explode + 64 bit-vote sum aggregates: one
    * pass over (id, token) rows with map-side partial aggregation — the
    * scale shape. (The Column-level `TF.simHash` re-evaluates its term
    * array per bit × per element: 64× quadratic, only fit for ad-hoc use.)
    * Docs with no tokens get simhash 0 (no votes). */
  def simHashes(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), explode(array_distinct(TF.tokens(col(textCol)))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1)).as(s"v$j")
    }
    val bits = (0 until 64).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }
    val agg = toks.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
    docs.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** PII scrubbing: email / IPv4 / long-digit-run (phone-ish) redaction
    * with per-class match counts — the standard pre-training privacy
    * pass. Pure per-row regexp work (scan-local, shuffle-free at any
    * scale); patterns stay in the RE2-compatible subset so the same
    * regexes run in the DuckDB oracle. */
  def piiScrub(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      TF.piiScrubText(col(textCol)).as("scrubbed"),
      regexp_count(col(textCol), lit(TF.EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(TF.Ipv4Re)).as("n_ips"))

  /** Fixed-size character chunking with overlap (context-window prep):
    * one row per chunk, `chunk_id` 0-based, stride = size − overlap.
    * Position-explode keeps the substring codegen'd (one pass per doc,
    * no interpreted lambdas); empty docs yield no chunks. */
  def chunk(docs: DataFrame, size: Int, overlap: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0")
    val stride = size - overlap
    docs.select(col(idCol), col(textCol))
      .where(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0),
          greatest(ceil((length(col(textCol)) - lit(overlap)).cast("double") / stride)
            .cast("int") - 1, lit(0)))).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col(textCol).substr(col("chunk_id") * stride + 1, lit(size)).as("chunk"))
  }

  /** 64-bit content fingerprints: SimHash + rolling-hash min-shingle,
    * both computed via explode/groupBy single passes. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sim = simHashes(docs, idCol, textCol)
    val fp = docs.select(col(idCol).as("id"), TF.normText(col(textCol)).as("nt"))
      .select(col("id"), col("nt"), explode(TF.seq1(length(col("nt")) - 7)).as("pos"))
      .select(col("id"), xxhash64(col("nt").substr(col("pos"), lit(8))).as("h"))
      .groupBy("id").agg(min(col("h")).as("fingerprint"))
    docs.select(col(idCol), TF.normText(col(textCol)).as("__nt"))
      .join(sim, Seq(idCol), "left")
      .join(fp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("simhash"),
        coalesce(col("fingerprint"), xxhash64(col("__nt"))).as("fingerprint"))
  }
}

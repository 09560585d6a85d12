package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Trained byte-pair-encoding tokenizer over a corpus (Sennrich et al.
  * 2016, the subword-nmt algorithm): learn `numMerges` merges from
  * word frequencies, then encode documents with the learned table.
  * Symbols start as single characters (no end-of-word marker), words
  * never merge across whitespace — the pre-tokenization is exactly
  * [[TF.tokens]], so the trained tokenizer shares the corpus's token
  * stream with every other text operator here.
  *
  * Scale shape (100 TB): training reduces the corpus to a WORD
  * FREQUENCY table (one partial-aggregated shuffle), truncates it to
  * the `maxWords` most frequent words via `orderBy.limit`
  * (TakeOrderedAndProject — per-partition heaps, no global sort), and
  * runs the merge loop on the driver over that bounded table — the
  * standard practice (tokenizers train on a vocabulary sample, not the
  * raw stream). Optionally pre-sample documents deterministically
  * ([[Sampling.deterministicSample]]) before counting. Encoding is
  * map-only: the merge table ships as a broadcast, each task encodes
  * its rows with a per-row word memo — no shuffle at any corpus size.
  */
object Bpe {

  /** One learned merge: adjacent symbols `lhs`+`rhs` fuse, in rank order. */
  final case class Merge(rank: Int, lhs: String, rhs: String)

  /** Replace every adjacent (lhs, rhs) pair, scanning left to right
    * without overlap — the application order the original BPE uses
    * (and the semantics of a single-pass string `replace`, which is
    * what the DuckDB oracle twin leans on). */
  private[operators] def mergeAll(syms: Array[String], lhs: String, rhs: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
        out += (lhs + rhs); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Driver-side merge loop over a word-frequency table. Pair counts
    * are overlapping (a word `aaa` counts (a,a) twice) and weighted by
    * word frequency; ties break to the lexicographically smallest
    * (lhs, rhs) so training is fully deterministic. Stops early when
    * no pair is left (every word fused to one symbol). */
  /** Seed symbols = Unicode CODE POINTS, not UTF-16 code units: a
    * non-BMP character (emoji, rare CJK) is one symbol, never a pair of
    * lone surrogate halves — matching byte/char-level BPE conventions
    * and the code-point semantics of the SQL oracles' substring/length. */
  private def codePointSyms(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  def trainOnVocab(vocab: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      vocab.iterator.map { case (w, f) => (codePointSyms(w), f) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          counts.merge((syms(i), syms(i + 1)), f, (a, b) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
            (c == best._2 && (p._1 < best._1._1 ||
              (p._1 == best._1._1 && p._2 < best._1._2)))) best = (p, c)
        }
        val (lhs, rhs) = best._1
        merges += Merge(rank, lhs, rhs)
        words = words.map { case (syms, f) => (mergeAll(syms, lhs, rhs), f) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Train on a corpus: token stream → word counts → top-`maxWords`
    * vocabulary (deterministic truncation: count desc, word asc) →
    * driver merge loop. */
  def train(docs: DataFrame, numMerges: Int, maxWords: Int = 100000,
            textCol: String = "text"): Seq[Merge] = {
    val vocab = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainOnVocab(vocab, numMerges)
  }

  /** The learned merge table as a frame (rank, lhs, rhs). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "lhs", "rhs").select(
      col("rank").cast("long").as("rank"), col("lhs"), col("rhs"))
  }

  /** Persist a trained merge table as parquet (the tokenizer artifact a
    * pipeline trains once and ships to every job that encodes). */
  def saveMerges(spark: SparkSession, merges: Seq[Merge], path: String): Unit =
    mergesDf(spark, merges).write.mode("overwrite").parquet(path)

  /** Load a merge table, restoring rank order. */
  def loadMerges(spark: SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path).orderBy("rank").collect()
      .map(r => Merge(r.getLong(0).toInt, r.getString(1), r.getString(2))).toSeq

  /** Encode one word: repeatedly fuse the present pair with the LOWEST
    * rank (all its occurrences, left to right) until none of the
    * adjacent pairs is in the table — the canonical BPE inference
    * loop, which reproduces the training-time segmentation for any
    * word the training corpus contained. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = codePointSyms(word)
    var go = syms.length > 1
    while (go) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0) go = false
      else syms = mergeAll(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  /** Per-document BPE subword pieces, in order — the actual tokenizer
    * output a downstream embedding/packing stage consumes. Same map-only
    * broadcast shape as [[tokenCounts]]. */
  def tokenize(docs: DataFrame, merges: Seq[Merge],
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val bc = docs.sparkSession.sparkContext.broadcast(ranks)
    val tokUdf = udf { (ws: Seq[String]) =>
      if (ws == null) Seq.empty[String]
      else {
        val tbl = bc.value
        val memo = new java.util.HashMap[String, Array[String]]()
        ws.flatMap(w => memo.computeIfAbsent(w, encodeWord(_, tbl)))
      }
    }
    docs.select(col(idCol), tokUdf(TF.tokens(col(textCol))).as("bpe_tokens"))
  }

  /** Per-document BPE token counts under a trained merge table:
    * (idCol, n_bpe_tokens). Map-only — merges broadcast once, each
    * row's words encode against a per-row memo (documents repeat
    * words heavily; each distinct word encodes once per row). */
  def tokenCounts(docs: DataFrame, merges: Seq[Merge],
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val bc = docs.sparkSession.sparkContext.broadcast(ranks)
    val countUdf = udf { (ws: Seq[String]) =>
      if (ws == null) 0L
      else {
        val tbl = bc.value
        val memo = new java.util.HashMap[String, Integer]()
        var n = 0L
        ws.foreach { w =>
          n += memo.computeIfAbsent(w, w2 => encodeWord(w2, tbl).length).toLong
        }
        n
      }
    }
    docs.select(col(idCol), countUdf(TF.tokens(col(textCol))).as("n_bpe_tokens"))
  }

  // ─────────────────────────────────────────────────────────────────────
  // DuckDB replication of the FULL multi-merge training loop — one
  // (pair-count → argmax → merge-apply) CTE triple per merge, chained.
  // Each stage is AS MATERIALIZED: DuckDB would otherwise inline every
  // seg_{k-1} reference (two per stage) and the plan doubles per merge.
  // The merge application replays [[mergeAll]]'s left-to-right
  // non-overlapping scan as a list_reduce fold over the symbol list
  // with a chr(1)-joined string accumulator: merge the accumulator's
  // LAST symbol with the current one iff they equal (lhs, rhs) — a
  // merged symbol can never itself equal lhs (lhs·rhs = lhs needs an
  // empty rhs), so the fold fuses exactly the pairs the scan does.
  // Tie-breaks compare VARCHARs in DuckDB's binary UTF-8 order vs the
  // JVM's UTF-16 — identical on the BMP (the operator's documented
  // contract). Early exhaustion agrees too: an empty pair table makes
  // bt_k empty, which empties every later stage and drops ranks ≥ k
  // from the output, exactly as the driver loop stops.
  // ─────────────────────────────────────────────────────────────────────
  private def segSqlPrefix(numMerges: Int, maxWords: Int): String = {
    val stages = (1 to numMerges).map { k =>
      s"""pc$k AS MATERIALIZED (SELECT s.syms[i] AS l, s.syms[i+1] AS r, SUM(s.freq) AS c
         |  FROM seg${k - 1} s, unnest(generate_series(1, len(s.syms)-1)) u(i) GROUP BY 1, 2),
         |bt$k AS MATERIALIZED (SELECT l, r FROM pc$k ORDER BY c DESC, l, r LIMIT 1),
         |seg$k AS MATERIALIZED (SELECT s.word, s.freq,
         |  string_split(list_reduce(list_prepend('', s.syms), (acc, x) ->
         |    CASE WHEN acc = '' THEN x
         |         WHEN (CASE WHEN strpos(reverse(acc), chr(1)) > 0
         |               THEN substr(acc, length(acc) - strpos(reverse(acc), chr(1)) + 2)
         |               ELSE acc END) = b.l AND x = b.r
         |         THEN substr(acc, 1, length(acc) -
         |              length(CASE WHEN strpos(reverse(acc), chr(1)) > 0
         |                     THEN substr(acc, length(acc) - strpos(reverse(acc), chr(1)) + 2)
         |                     ELSE acc END)) || b.l || b.r
         |         ELSE acc || chr(1) || x END), chr(1)) AS syms
         |  FROM seg${k - 1} s, bt$k b)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS MATERIALIZED (SELECT doc_id, CASE WHEN LEN(TRIM(text)) = 0 THEN []::VARCHAR[]
       |  ELSE regexp_split_to_array(TRIM(text), '\\s+') END AS ws FROM documents),
       |tok AS (SELECT unnest(ws) AS word FROM d),
       |v AS MATERIALIZED (SELECT word, COUNT(*) AS freq FROM tok
       |  GROUP BY word ORDER BY freq DESC, word LIMIT $maxWords),
       |seg0 AS MATERIALIZED (SELECT word, freq,
       |  list_transform(generate_series(1, length(word)), i -> word[i]) AS syms FROM v),
       |$stages""".stripMargin
  }

  /** Exact oracle for [[train]]+[[mergesDf]]: the whole learned merge
    * table, (rank, lhs, rhs). */
  def trainOracleSql(numMerges: Int, maxWords: Int = 100000): String = {
    val finals = (1 to numMerges)
      .map(k => s"SELECT CAST(${k - 1} AS BIGINT) AS rank, l AS lhs, r AS rhs FROM bt$k")
      .mkString("\nUNION ALL ")
    s"${segSqlPrefix(numMerges, maxWords)}\n$finals"
  }

  /** Exact oracle for [[tokenCounts]]: per-doc Σ of the TRAINING
    * segmentation length of each word. Licensed by the subword-nmt
    * property that the lowest-rank-first inference loop reproduces the
    * training-time segmentation for every word the trainer saw — which
    * is every corpus word whenever the vocabulary is untruncated
    * (maxWords ≥ distinct words, true at oracle scale; BpeSpec pins the
    * property itself). */
  def tokenCountsOracleSql(numMerges: Int, maxWords: Int = 100000): String =
    s"""${segSqlPrefix(numMerges, maxWords)},
       |wl AS (SELECT word, len(syms) AS nseg FROM seg$numMerges),
       |tokd AS (SELECT d.doc_id, unnest(d.ws) AS word FROM d)
       |SELECT doc.doc_id, CAST(COALESCE(s.n, 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents doc LEFT JOIN (
       |  SELECT t.doc_id, SUM(w.nseg) AS n FROM tokd t JOIN wl w USING (word)
       |  GROUP BY t.doc_id) s
       |USING (doc_id)""".stripMargin
}

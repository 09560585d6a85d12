package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF, LshFunctions => LF}

/** Document deduplication operators for training-data pipelines.
  *
  * Scale design notes (the point of each shape):
  *  - Exact dedup groups on a 128-bit content hash, never on the text
  *    itself — the shuffle carries 16-byte keys + ids, not documents.
  *  - MinHash/SimHash candidate generation explodes per-doc band keys and
  *    self-joins ONLY (bucket-key, id, signature) triples; full documents
  *    stay in the scan stage. At 100 TB the candidate join is the only
  *    shuffle and its payload is O(docs × bands × 16B).
  *  - Verification (exact Jaccard / signature agreement) happens on the
  *    candidate pairs, which are a tiny fraction of the cross product.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct text.
    * groupBy(md5) = map-side partial agg + 16-byte shuffle keys. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Exact-dedup survivors: the kept rows themselves. */
  def exactSurvivors(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val reps = exact(docs, idCol, textCol).select(col(idCol))
    docs.join(reps, Seq(idCol), "left_semi")
  }

  /** MinHash signatures via explode + k min-aggregates: the shingle array
    * is computed ONCE per doc (explode), each shingle hashed k ways, and
    * the k minima reduce map-side before the (tiny) per-id shuffle.
    * This is both the 100 TB shape AND avoids the expression-inlining
    * trap where an `array(k × array_min(transform(shingles…)))` tree
    * recomputes the shingling k times per row (observed 200s at sf0.001).
    * Docs with no shingles (shorter than shingleN) drop out — they have
    * no content to near-match on. */
  def minHashSignatures(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                        shingleN: Int = 5, k: Int = 64,
                        wordShingles: Boolean = false): DataFrame = {
    val sh = if (wordShingles) TF.wordShingles(col(textCol), shingleN)
             else TF.charShingles(col(textCol), shingleN)
    val shingled = docs.select(col(idCol).as("id"), explode(sh).as("sh"))
    val aggs = (0 until k).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    shingled.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash + banded-LSH near-duplicate PAIRS (id_a < id_b) with their
    * estimated Jaccard, verified against `threshold`.
    *
    * shingleN-char shingles → k-component signature → bands buckets →
    * self-join within (band,bucket) → estimate Jaccard from signatures.
    */
  def minHashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   shingleN: Int = 5, k: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5,
                   wordShingles: Boolean = false): DataFrame = {
    val rowsPerBand = k / bands
    val sigs = minHashSignatures(docs, idCol, textCol, shingleN, k, wordShingles)
      .localCheckpoint(true) // one signature pass feeds both join sides
    // Bucket join carries ONLY (band, bucket, id) — signatures join back
    // after the pair-distinct, so the Jaccard estimate is computed once
    // per candidate pair, not once per shared bucket (up to `bands`×).
    val banded = sigs
      .select(col("id"), explode(TF.minHashBands(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candPairs = a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    candPairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TF.minHashJaccardEstimate(col("sig_a"), col("sig_b")).as("jaccard_est"))
      .where(col("jaccard_est") >= threshold)
  }

  /** MinHash dedup survivors: connected-components-lite — drop any doc that
    * has a near-dup with a smaller id (correct for pair-dedup; full CC runs
    * in the fixpoint engine if transitive grouping is needed). */
  def minHashSurvivors(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                       shingleN: Int = 5, k: Int = 64, bands: Int = 16,
                       threshold: Double = 0.5): DataFrame = {
    val dropIds = minHashPairs(docs, idCol, textCol, shingleN, k, bands, threshold)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(dropIds, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, candidates = equal
    * 16-bit fingerprint slices (4 tables ⇒ catches all pairs within
    * Hamming distance 3), verified by exact Hamming ≤ maxHamming. */
  def simHashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   maxHamming: Int = 3): DataFrame = {
    val fps = docs.select(col(idCol).as("id"), TF.simHash(TF.tokens(col(textCol))).as("fp"))
    val sliced = fps.select(col("id"), col("fp"),
      explode(array((0 until 4).map { s =>
        struct(lit(s).as("slice"), shiftright(col("fp"), s * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("sk"))
      .select(col("id"), col("fp"), col("sk.slice").as("slice"), col("sk.key").as("key"))
    val a = sliced.select(col("slice"), col("key"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = sliced.select(col("slice"), col("key"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("slice", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), VF.hammingInt64(col("fp_a"), col("fp_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b")).agg(min(col("hamming")).as("hamming"))
  }

  /** Exact n-gram Jaccard over candidate pairs (candidates from MinHash
    * bands so the exact verification never sees the cross product). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                        shingleN: Int = 3, threshold: Double = 0.4,
                        k: Int = 32, bands: Int = 16): DataFrame = {
    // Candidates come from WORD-shingle MinHash — the same shingling the
    // exact verification uses. (Char-2-grams over natural text are nearly
    // universal — every doc contains most frequent bigrams — so char-level
    // signatures at n=2 would make ALL pairs candidates.)
    val cand = minHashPairs(docs, idCol, textCol, shingleN, k, bands,
        threshold * 0.5, wordShingles = true)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    // Only candidate docs pay the O(len²) word-shingling: semi-join the
    // doc table down to ids that appear in a pair first.
    val candIds = cand.select(col("id_a").as(idCol))
      .union(cand.select(col("id_b").as(idCol))).distinct()
    val sh = docs.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol).as("id"),
        array_distinct(TF.wordShingles(col(textCol), shingleN)).as("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), TF.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding near-dup pairs via hyperplane-LSH bucketing + exact cosine
    * verification. Multi-table OR-amplification; candidates join on
    * (table, bucket) so the shuffle carries ids + vectors once. */
  def embeddingCosinePairs(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
                           dim: Int, minCosine: Double = 0.95,
                           nTables: Int = 4, nPlanes: Int = 12): DataFrame = {
    // Bucket join carries only ids; vectors join back after pair-distinct
    // so each candidate pair computes cosine exactly once and the bucket
    // shuffle payload is (table, bucket, id), not the embeddings.
    val bucketed = emb.select(col(idCol).as("id"),
      explode(LF.lshMultiProbe(col(vecCol), dim, nTables, nPlanes)).as("tb"))
      .select(col("id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val a = bucketed.select(col("table"), col("bucket"), col("id").as("id_a"))
    val b = bucketed.select(col("table"), col("bucket"), col("id").as("id_b"))
    val candPairs = a.join(b, Seq("table", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val vs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    candPairs
      .join(vs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), VF.cosineSimilarity(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}

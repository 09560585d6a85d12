package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, MinHash signatures, SimHash fingerprints,
  * quality features, language-ID. All built from native Spark
  * expressions (split / transform / xxhash64 / regexp) so they run
  * inside codegen with no UDF serialization — on 100 TB of documents
  * these are scan-local, shuffle-free per-row transforms.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword-regex token count: word pieces, numbers, and
    * individual punctuation marks counted separately (a cheap,
    * deterministic proxy for a real BPE tokenizer's token count). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** 1..count as an array; empty when count < 1 (Spark's `sequence(1, 0)`
    * yields a DESCENDING [1,0], not an empty array). */
  def seq1(count: Column): Column =
    when(count < 1, array().cast("array<int>"))
      .otherwise(sequence(lit(1), count))

  /** Whitespace-normalized lowercase text (the shingling domain). */
  def normText(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Character n-gram shingles of the whitespace-normalized text.
    *
    * The normalized text is bound through a single-element `array` +
    * outer `transform`, so the inner lambda captures a LAMBDA VARIABLE
    * (evaluated once) rather than the normText expression — HOF lambdas
    * re-evaluate captured expressions per element, which would make this
    * O(len²) in regexp passes per document. */
  def charShingles(text: Column, n: Int): Column =
    flatten(transform(array(normText(text)), nm =>
      transform(seq1(length(nm) - lit(n - 1)), i => nm.substr(i, lit(n)))))

  /** Word n-gram shingles over a PRE-PROJECTED token-array column (the
    * lambda then only references an attribute — no per-element re-split). */
  def wordShinglesOf(toks: Column, n: Int): Column =
    transform(seq1(size(toks) - lit(n - 1)),
      i => array_join(slice(toks, i, lit(n)), " "))

  /** Word n-gram shingles (arrays of n consecutive tokens joined by space).
    * Same per-element-reevaluation caveat as [[charShingles]] — prefer
    * projecting [[tokens]] first and calling [[wordShinglesOf]]. */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesOf(tokens(text), n)

  /** xxhash64 of each word n-gram WITHOUT materializing the shingle
    * string: each shingle hashes its n token strings directly (multi-arg
    * xxhash64 is length-aware per field, so ("ab","c") ≠ ("a","bc")).
    * Callers treat shingles as opaque 64-bit values, so this replaces
    * hash(array_join(slice(...))) — skipping the per-shingle slice +
    * join allocations and one full extra pass over every character.
    * `toks` must be a BOUND column (project [[tokens]] first): HOF
    * lambdas re-evaluate captured expressions per element. */
  def wordShingleHashes(toks: Column, n: Int): Column =
    transform(seq1(size(toks) - lit(n - 1)),
      i => xxhash64((0 until n).map(k => element_at(toks, i + lit(k))): _*))

  /** [[wordShingleHashes]] straight from the text column, safe to
    * consume as an ARRAY (no explode): the token array binds through a
    * single-element `array` + outer `transform`, so the inner lambda
    * captures a LAMBDA VARIABLE — evaluated once per row. Without this
    * ([[charShingles]]'s trick), CollapseProject inlines the projected
    * tokens() into the lambda and the regexp split re-runs PER SHINGLE:
    * O(len²) per document — measured 8.6 s vs 0.5 s on the sf0.1 corpus
    * for the Bloom-decontamination probe. (Explode consumers don't need
    * this: the Generate boundary keeps the projection.) */
  def wordShingleHashesOfText(text: Column, n: Int): Column =
    flatten(transform(array(tokens(text)), tk =>
      transform(seq1(size(tk) - lit(n - 1)),
        i => xxhash64((0 until n).map(k => element_at(tk, i + lit(k))): _*))))

  // ---------------------------------------------------------------------
  // MinHash: k independent hash functions realized as xxhash64(shingle, k)
  // (seeding via an extra literal column mixes k into the hash). The
  // signature is an array<long> of per-function minima; band buckets hash
  // contiguous signature slices. Everything is per-row and codegen-native:
  // dedup at 100 TB = scan → signature → explode bands → shuffle ONLY the
  // (band, bucket, id) triples, never the documents.
  // ---------------------------------------------------------------------

  /** MinHash signature (array<long> of length k) over a shingle array. */
  def minHashSignature(shingles: Column, k: Int): Column = {
    val sig = (0 until k).map { i =>
      array_min(transform(shingles, s => xxhash64(s, lit(i))))
    }
    array(sig: _*)
  }

  // ---------------------------------------------------------------------
  // Whole-signature MinHash in ONE pass per document. The expression
  // shapes above pay 64 hash evaluations PER SHINGLE ROW through codegen
  // (k × explode-row work — measured 6.8 s for 5k docs × ~300 shingles at
  // sf0.1); these UDFs run ONCE PER DOCUMENT with a tight JIT'd loop:
  // polynomial base hash per shingle + splitmix64 finalization per
  // component (~9 ops), no explode, no 64-aggregate shuffle. The UDF
  // boundary costs one String/array box per DOC — negligible at any
  // scale, and the operator stays scan-local (map-only, shuffle-free),
  // which is the property that matters at 100 TB.
  // ---------------------------------------------------------------------

  /** splitmix64 finalizer — the standard 64-bit mixer (public domain,
    * Steele et al.); statistically independent streams per component. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-component seeds, deterministic (reproducible across executors;
    * `private[graft]` so [[graft.operators.Dedup.minHashOracleSql]] can
    * embed the same constants in the DuckDB replication). */
  private[graft] def compSeeds(k: Int): Array[Long] =
    Array.tabulate(k)(i => mix64(0x5851F42D4C957F2DL * (i + 1)))

  private def sigOfHashes(update: (Array[Long], Array[Long]) => Unit,
                          seeds: Array[Long]): Array[Long] = {
    val mins = Array.fill(seeds.length)(Long.MaxValue)
    update(mins, seeds)
    if (mins(0) == Long.MaxValue) null else mins
  }

  @inline private def updateMins(mins: Array[Long], seeds: Array[Long], h: Long): Unit = {
    var i = 0
    while (i < seeds.length) {
      val c = mix64(h ^ seeds(i))
      if (c < mins(i)) mins(i) = c
      i += 1
    }
  }

  // FNV-1a 64 constants — the xor-then-multiply structure avoids the
  // base-31 polynomial's systematic 2-char collisions (31·d1 = −d2, e.g.
  // "b!" vs "a@"), which would inflate MinHash estimates
  private final val FnvBasis = 0xCBF29CE484222325L
  private final val FnvPrime = 0x100000001B3L

  /** FNV-1a 64 over the string's UTF-8 bytes + splitmix64 finalizer, as
    * a codegen'd Catalyst expression. This is the fingerprint family's
    * string hash: unlike xxhash64 it is replicable in the DuckDB oracle
    * with plain HUGEINT arithmetic (and for ASCII text, bytes ≡
    * codepoints, which the SQL replication iterates over). Same hash
    * family as the MinHash signature UDFs' per-shingle hash. */
  final case class FnvMix64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "fnv_mix64"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $other")
    }
    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var h = FnvBasis
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xFF)) * FnvPrime; i += 1 }
      mix64(h)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val b = ctx.freshName("b")
        val i = ctx.freshName("i")
        val z = ctx.freshName("z")
        s"""byte[] $b = ($c).getBytes();
           |long $z = ${FnvBasis}L;
           |for (int $i = 0; $i < $b.length; $i++) {
           |  $z = ($z ^ ($b[$i] & 0xFF)) * ${FnvPrime}L;
           |}
           |$z = $z + ${0x9E3779B97F4A7C15L}L;
           |$z = ($z ^ ($z >>> 30)) * ${0xBF58476D1CE4E5B9L}L;
           |$z = ($z ^ ($z >>> 27)) * ${0x94D049BB133111EBL}L;
           |${ev.value} = $z ^ ($z >>> 31);""".stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): FnvMix64Expr =
      copy(child = newChild)
  }

  /** [[FnvMix64Expr]] as a Column function. */
  def fnvMix64(s: Column): Column =
    ColumnGlue.column(FnvMix64Expr(ColumnGlue.expression(s)))

  /** One-pass hashed-feature bucketing for the DSIR / quality-classifier
    * family: for a token array t of length n, the buckets
    * `pmod(fnvMix64(f), buckets)` of all n unigrams followed by all n−1
    * space-joined bigrams, as one array&lt;long&gt; per row.
    * Semantically identical to
    * `explode(concat(t, wordShinglesOf(t, 2))) → pmod(fnvMix64(f), B)`
    * — FNV-1a is byte-sequential, so each bigram's hash continues the
    * first token's raw FNV state through the 0x20 separator and the
    * second token's bytes with NO shingle-string allocation (the old
    * path built every bigram via slice + array_join: one string copy
    * plus a re-hash per bigram — the dominant cost of the classifier's
    * feature build). TextAnalysisSpec pins kernel == explode+hash
    * equality. CodegenFallback: one eval per document row. */
  final case class FnvFeatureBuckets(child: Expression, buckets: Long)
    extends UnaryExpression with CodegenFallback {
    require(buckets > 0, "need buckets > 0")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "fnv_feature_buckets"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<string>, got $other")
    }
    @inline private def pmodB(h: Long): Long = {
      val m = h % buckets
      if (m < 0) m + buckets else m
    }
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      val byteArrs = new Array[Array[Byte]](n)
      val rawFnv = new Array[Long](n) // FNV state BEFORE the splitmix finalizer
      val out = new Array[Long](if (n >= 2) 2 * n - 1 else n)
      var i = 0
      while (i < n) {
        // token arrays come from tokens()/split — never null elements in
        // practice; fail LOUDLY (named kernel + index) instead of the
        // latent NPE if a future caller feeds one
        require(!arr.isNullAt(i),
          s"$prettyName: null token at index $i (callers must pass null-free token arrays)")
        val b = arr.getUTF8String(i).getBytes
        byteArrs(i) = b
        var h = FnvBasis
        var j = 0
        while (j < b.length) { h = (h ^ (b(j) & 0xFF)) * FnvPrime; j += 1 }
        rawFnv(i) = h
        out(i) = pmodB(mix64(h))
        i += 1
      }
      i = 0
      while (i < n - 1) {
        var h = (rawFnv(i) ^ 0x20L) * FnvPrime // the joining space byte
        val b = byteArrs(i + 1)
        var j = 0
        while (j < b.length) { h = (h ^ (b(j) & 0xFF)) * FnvPrime; j += 1 }
        out(n + i) = pmodB(mix64(h))
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): FnvFeatureBuckets =
      copy(child = newChild)
  }

  /** [[FnvFeatureBuckets]] as a Column function. */
  def fnvFeatureBuckets(toks: Column, buckets: Long): Column =
    ColumnGlue.column(FnvFeatureBuckets(ColumnGlue.expression(toks), buckets))

  /** One-pass winnowing kernel: the DISTINCT sliding-window-min
    * fingerprints of a document's k-codepoint grams, as one
    * array&lt;long&gt; per row. Semantically identical to
    * `explode(positions) → fnvMix64(substr(nt, p, k)) → window min →
    * distinct`, but computed in a single tight byte-level loop — no
    * per-gram String/UTF8String allocation (the 3M-gram corpus's
    * dominant cost) and no doc-partition window shuffle. Grams are k
    * CODE POINTS (Substring semantics) hashed over their UTF-8 bytes
    * (FnvMix64Expr semantics), so the DuckDB oracle replication is
    * unchanged. Fewer than w windows → empty array (explode drops the
    * doc, matching the length guard of the operator form).
    * CodegenFallback: one eval per DOCUMENT row is off the hot path by
    * construction. */
  final case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fps"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $other")
    }
    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      // code-point start byte offsets (+ end sentinel)
      val starts = new Array[Int](bytes.length + 1)
      var n = 0
      var off = 0
      while (off < bytes.length) {
        starts(n) = off
        n += 1
        off += UTF8String.numBytesForFirstByte(bytes(off))
      }
      starts(n) = bytes.length
      val nGrams = n - k + 1
      val nWin = nGrams - w + 1
      if (nWin <= 0) return new GenericArrayData(Array.empty[Long])
      val hs = new Array[Long](nGrams)
      var i = 0
      while (i < nGrams) {
        var h = FnvBasis
        var b = starts(i)
        val end = starts(i + k)
        while (b < end) { h = (h ^ (bytes(b) & 0xFF)) * FnvPrime; b += 1 }
        hs(i) = mix64(h)
        i += 1
      }
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var j = 0
      while (j < nWin) {
        var m = hs(j)
        var t = 1
        while (t < w) { if (hs(j + t) < m) m = hs(j + t); t += 1 }
        seen.add(m)
        j += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
      copy(child = newChild)
  }

  /** [[WinnowFpsExpr]] as a Column function. */
  def winnowFps(s: Column, k: Int, w: Int): Column =
    ColumnGlue.column(WinnowFpsExpr(ColumnGlue.expression(s), k, w))

  /** One-pass k-gram hash kernel: the FNV+splitmix hash of EVERY
    * k-codepoint gram, in position order (element i = gram starting at
    * 1-based codepoint position i+1). The un-winnowed sibling of
    * [[WinnowFpsExpr]] — duplicate-SPAN detection needs every gram with
    * its position, not the window minima — sharing its semantics: grams
    * are k CODE POINTS hashed over their UTF-8 bytes, so gram equality ≡
    * substring equality (up to 2⁻⁶⁴ hash collisions) and the DuckDB
    * oracle can compare raw substrings with no hash replication at all.
    * Shorter than k codepoints → empty array. One eval per document row
    * (CodegenFallback is off the hot path by construction), no per-gram
    * String allocation. */
  final case class KgramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
    require(k >= 1, "need k >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "kgram_hashes"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $other")
    }
    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val starts = new Array[Int](bytes.length + 1)
      var n = 0
      var off = 0
      while (off < bytes.length) {
        starts(n) = off
        n += 1
        off += UTF8String.numBytesForFirstByte(bytes(off))
      }
      starts(n) = bytes.length
      val nGrams = n - k + 1
      if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])
      val hs = new Array[Long](nGrams)
      var i = 0
      while (i < nGrams) {
        var h = FnvBasis
        var b = starts(i)
        val end = starts(i + k)
        while (b < end) { h = (h ^ (bytes(b) & 0xFF)) * FnvPrime; b += 1 }
        hs(i) = mix64(h)
        i += 1
      }
      new GenericArrayData(hs)
    }
    override protected def withNewChildInternal(newChild: Expression): KgramHashesExpr =
      copy(child = newChild)
  }

  /** [[KgramHashesExpr]] as a Column function. */
  def kgramHashes(s: Column, k: Int): Column =
    ColumnGlue.column(KgramHashesExpr(ColumnGlue.expression(s), k))

  /** k-component signature over character n-gram shingles of
    * pre-normalized text (pair with [[normText]]); null when the text is
    * shorter than one shingle (no content to near-match on). */
  def minHashSigChars(norm: Column, n: Int, k: Int): Column = {
    val seeds = compSeeds(k)
    val f = udf { (s: String) =>
      if (s == null || s.length < n) null
      else sigOfHashes((mins, sd) => {
        var p = 0
        val last = s.length - n
        while (p <= last) {
          var h = FnvBasis
          var j = p
          val end = p + n
          while (j < end) { h = (h ^ s.charAt(j)) * FnvPrime; j += 1 }
          updateMins(mins, sd, mix64(h))
          p += 1
        }
      }, seeds)
    }
    f(norm)
  }

  /** k-component signature over word n-gram shingles of a pre-projected
    * token array (pair with [[tokens]]); null when fewer than n tokens. */
  def minHashSigWords(toks: Column, n: Int, k: Int): Column = {
    val seeds = compSeeds(k)
    val f = udf { (ts: Seq[String]) =>
      if (ts == null || ts.length < n) null
      else {
        // 64-bit FNV-1a over chars (same loop as the char-shingle path):
        // String.hashCode is 32-bit, and at ~1M-token vocabularies its
        // birthday collisions conflate distinct tokens across ALL k
        // components at once, biasing Jaccard estimates upward
        val m = ts.length
        val th = new Array[Long](m)
        var i = 0
        while (i < m) {
          val t = ts(i)
          var h = FnvBasis
          var j = 0
          while (j < t.length) { h = (h ^ t.charAt(j)) * FnvPrime; j += 1 }
          th(i) = mix64(h)
          i += 1
        }
        sigOfHashes((mins, sd) => {
          var p = 0
          val last = th.length - n
          while (p <= last) {
            var h = FnvBasis
            var j = p
            val end = p + n
            while (j < end) { h = (h ^ th(j)) * FnvPrime; j += 1 }
            updateMins(mins, sd, mix64(h))
            p += 1
          }
        }, seeds)
      }
    }
    f(toks)
  }

  /** Band buckets for LSH: split the signature into `bands` rows of
    * `rowsPerBand`, hash each band → array of (band, bucket) structs.
    * Bucket = xxhash64 of the band's components as longs (two docs share
    * a bucket iff the slice values are equal — same grouping a string
    * key would give, without materializing strings). */
  def minHashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val comps = (0 until rowsPerBand).map(i => element_at(sig, b * rowsPerBand + i + 1))
      struct(lit(b).as("band"), xxhash64(comps :+ lit(b): _*).as("bucket"))
    }: _*)

  /** Jaccard of two ALREADY-DISTINCT, SORTED-ASCENDING arrays with a
    * size-ratio short-circuit: |A∩B| ≤ min(|A|,|B|), so J ≥ t is
    * impossible when min(|A|,|B|) < t·max(|A|,|B|) — those pairs skip the
    * intersection entirely (CaseWhen branches evaluate lazily per row).
    * The intersection is a codegen'd merge scan
    * ([[VectorKernels.sortedInterCount]]) — zero per-pair allocation vs
    * `array_intersect`'s hash set; producers sort once per document. */
  def jaccardDistinct(a: Column, b: Column, minJ: Double): Column = {
    val sa = size(a).cast("double")
    val sb = size(b).cast("double")
    val inter = VectorKernels.sortedInterCount(a, b)
    when(greatest(sa, sb) === 0.0, lit(0.0))
      .when(least(sa, sb) < greatest(sa, sb) * lit(minJ), lit(0.0))
      .otherwise(inter / (sa + sb - inter))
  }

  /** Exact Jaccard similarity of two shingle arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val union = size(array_union(da, db)).cast("double")
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Estimated Jaccard from two MinHash signatures (fraction of agreeing
    * components) — codegen'd exact-equality count over the shared prefix
    * ([[VectorKernels.eqCount]]; long components compare as longs). */
  def minHashJaccardEstimate(sigA: Column, sigB: Column): Column =
    VectorKernels.eqCount(sigA, sigB) / size(sigA).cast("double")

  // ---------------------------------------------------------------------
  // SimHash: 64-bit fingerprint; bit j of the fingerprint is the sign of
  // sum over tokens of (bit j of xxhash64(token) ? +1 : -1). Near-dups
  // have small Hamming distance between fingerprints.
  // Implemented as 64 native aggregate() passes folded into one per-row
  // expression tree (wide but shuffle-free and UDF-free).
  // ---------------------------------------------------------------------

  /** 64-bit SimHash over a token/shingle array, as LongType. */
  def simHash(terms: Column): Column = {
    val hashes = transform(array_distinct(terms), t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      // vote_j = sum(+1/-1 per term hash bit j); bit set iff vote > 0
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Rolling-hash document fingerprint: min of the shingle hashes
    * (winnowing-style representative), stable under whitespace changes. */
  def docFingerprint(text: Column, n: Int = 8): Column =
    coalesce(array_min(transform(charShingles(text, n), s => fnvMix64(s))),
      fnvMix64(lower(trim(text))))

  // ---------------------------------------------------------------------
  // PII patterns (RE2-compatible subset — same regexes run in DuckDB)
  // ---------------------------------------------------------------------

  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private[graft] val PhoneRe = "\\b\\d{7,15}\\b"

  /** Email → [EMAIL], IPv4 → [IP], 7-15-digit runs → [PHONE]. */
  def piiScrubText(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailRe, "[EMAIL]"), Ipv4Re, "[IP]"), PhoneRe, "[PHONE]")

  // ---------------------------------------------------------------------
  // Quality features
  // ---------------------------------------------------------------------

  private val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on", "at",
    "for", "with", "is", "are", "was", "were", "be", "it", "this", "that",
    "as", "by", "from", "not", "no", "he", "she", "they", "we", "you", "i")

  /** Fraction of tokens that are (lowercased) English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    val sw = typedLit(StopwordsEn)
    when(size(ts) === 0, lit(0.0)).otherwise(
      size(filter(ts, t => array_contains(sw, lower(t)))).cast("double") / size(ts).cast("double"))
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text).cast("double"))

  /** Fraction of alphabetic characters that are upper-case. */
  def upperRatio(text: Column): Column = {
    val alpha = length(regexp_replace(text, "[^A-Za-z]", ""))
    when(alpha === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^A-Z]", "")).cast("double") / alpha.cast("double"))
  }

  /** Mean token length in characters (0 for empty). */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts).cast("double"))
  }

  /** Composite [0,1] quality score: rewards stopword presence, sane mean
    * token length, and low punctuation — the classic cheap-heuristic
    * pre-filter for web-scale corpora (Gopher/C4-style rules). */
  def qualityScore(text: Column): Column = {
    val swOk = least(stopwordRatio(text) / 0.2, lit(1.0))
    val lenOk = lit(1.0) - least(abs(meanTokenLength(text) - 5.0) / 5.0, lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(text) / 0.2, lit(1.0))
    val nonEmpty = when(tokenCount(text) >= 5, 1.0).otherwise(0.0)
    round((swOk * 0.4 + lenOk * 0.3 + punctOk * 0.3) * nonEmpty, 6)
  }

  // ---------------------------------------------------------------------
  // Language ID: stopword-hit-count heuristic over a handful of languages
  // (the standard cheap n-gram/function-word trick). Returns the language
  // whose marker set hits the most tokens, 'und' when nothing hits.
  // ---------------------------------------------------------------------

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "are", "this"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que", "qui", "pas"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "en", "por", "para", "con", "del"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "una", "per", "con", "del", "sono", "non"))

  /** Best-guess ISO-639-1 code by function-word voting. */
  def langId(text: Column): Column = {
    val ts = transform(tokens(text), lower(_))
    val scored = LangMarkers.map { case (lang, markers) =>
      val m = typedLit(markers)
      struct(size(filter(ts, t => array_contains(m, t))).as("hits"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }
}

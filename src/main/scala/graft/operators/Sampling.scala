package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Deterministic sampling and shuffling for training-data pipelines.
  *
  * Everything here is REPRODUCIBLE and map-only where possible: sampling
  * decisions are pure arithmetic over the row id (a splitmix64-style
  * hash, not `rand()`), so a re-run, a retried task, or a different
  * cluster produces the identical sample — the property training
  * pipelines need for data lineage, and the reason these are exactly
  * oracle-checkable in DuckDB (`rand()`-based sampling is not).
  *
  * The hash mixes the FULL 64-bit id (three xorshift-multiply rounds),
  * so no residue ring correlates distinct ids — the earlier 16-bit
  * MINSTD ring (`mod 65537`) made ids differing by 65537 sample and
  * sort in perfect lock-step on any corpus past 65k docs. The returned
  * position is the hash's top 31 bits: non-negative in Spark's signed
  * longs and identical to the DuckDB oracle's `HUGEINT mod 2^64`
  * replication (see [[Sampling.posOracleSql]]) without any
  * signed/unsigned gymnastics.
  */
object Sampling {

  // splitmix64 constants (Steele/Lea/Flood, public domain), as signed longs
  private val Phi  = 0x9E3779B97F4A7C15L // golden-ratio increment
  private val Mix1 = 0xBF58476D1CE4E5B9L
  private val Mix2 = 0x94D049BB133111EBL

  /** Reference implementation of the per-id position: splitmix64 over
    * `id + (salt+1)·φ`, top 31 bits. The salt perturbs the SEED before
    * full mixing, so distinct salts give independent orderings (an
    * additive-only salt on an unmixed value merely rotates orderings —
    * caught by SamplingSpec). */
  def posOf(id: Long, salt: Long): Long = {
    var z = id + Phi * (salt + 1L)
    z = (z ^ (z >>> 30)) * Mix1
    z = (z ^ (z >>> 27)) * Mix2
    (z ^ (z >>> 31)) >>> 33
  }

  /** [[posOf]] as a codegen'd Catalyst expression. Column-algebra
    * `*`/`+` can't express it: Spark 4 runs ANSI mode by default, where
    * long overflow throws — splitmix needs wrapping arithmetic, which
    * plain Java gives regardless of ANSI. */
  final case class SplitmixPos(child: Expression, salt: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "splitmix_pos"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an integral id, got $other")
    }
    override def nullSafeEval(v: Any): Any = posOf(v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }, salt)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val z = ctx.freshName("z")
        s"""long $z = (long)($c) + ${Phi * (salt + 1L)}L;
           |$z = ($z ^ ($z >>> 30)) * ${Mix1}L;
           |$z = ($z ^ ($z >>> 27)) * ${Mix2}L;
           |${ev.value} = ($z ^ ($z >>> 31)) >>> 33;""".stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): SplitmixPos =
      copy(child = newChild)
  }

  /** Pseudo-random position of an id in [0, 2³¹), reproducible with
    * plain integer arithmetic in any engine. */
  def lcgPos(id: Column, salt: Long): Column =
    ColumnGlue.column(SplitmixPos(ColumnGlue.expression(id), salt))

  /** DuckDB replication of [[lcgPos]] over SQL expression `idExpr`:
    * HUGEINT arithmetic mod 2^64, with each 64×64 multiply split at 32
    * bits so no intermediate exceeds INT128. Oracle SQL builders use
    * this so the two sides can never drift. */
  def posOracleSql(idExpr: String, salt: Long): String = {
    val two64 = "18446744073709551616"
    def mulmod(a: String, b: String): String =
      s"(((($a) >> 32) * $b) % $two64 * 4294967296 + (($a) % 4294967296) * $b) % $two64"
    def u(v: Long): String = java.lang.Long.toUnsignedString(v)
    val x0 = s"((CAST($idExpr AS HUGEINT) + ${u(Phi * (salt + 1L))}) % $two64)"
    val z1 = s"(${mulmod(s"xor($x0, $x0 >> 30)", u(Mix1))})"
    val z2 = s"(${mulmod(s"xor($z1, $z1 >> 27)", u(Mix2))})"
    s"CAST(xor($z2, $z2 >> 31) >> 33 AS BIGINT)"
  }

  /** Keep ~`num`/`den` of rows, decided per row from the id alone —
    * no shuffle, no state, identical across runs and engines. */
  def deterministicSample(df: DataFrame, idCol: String,
                          num: Int, den: Int, salt: Long = 7L): DataFrame =
    df.where(pmod(lcgPos(col(idCol), salt), lit(den.toLong)) < num)

  /** Per-source document cap (the per-domain cap crawl pipelines apply
    * before mixing, so no single domain dominates the corpus): keep at
    * most `cap` docs per value of `sourceCol`, chosen DETERMINISTICALLY —
    * the cap admits the docs with the smallest splitmix position (ties
    * by id), so reruns, retries, and independent engines agree on the
    * exact kept set, not just its size. Plan shape at scale: one
    * shuffle on the source key and a WindowGroupLimit (rank ≤ cap cuts
    * inside the sort — no full per-group sort materializes, per-task
    * state is `cap` rows however hot the domain). */
  def perSourceCap(df: DataFrame, idCol: String, sourceCol: Column,
                   cap: Int, salt: Long = 7L): DataFrame = {
    require(cap > 0, "need cap > 0")
    val w = Window.partitionBy(sourceCol)
      .orderBy(lcgPos(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap).drop("__rn")
  }

  /** Per-stratum sampling rates (domain mixing / quality-band
    * reweighting): `fractions` maps each value of `stratumCol` to a
    * (num, den) keep-rate; strata not listed are dropped. Still
    * map-only — the stratum column is an ordinary expression, so this
    * composes with any derived stratum (language, quality band, …). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: Column,
                       fractions: Seq[(Any, (Int, Int))],
                       salt: Long = 7L): DataFrame = {
    val keep = fractions.foldLeft(lit(false)) { case (acc, (v, (num, den))) =>
      acc || (stratumCol === lit(v) &&
        pmod(lcgPos(col(idCol), salt), lit(den.toLong)) < num)
    }
    df.where(keep)
  }

  /** Probability-proportional-to-size sampling: row i is kept with
    * P = min(1, wᵢ·num/den) — the inclusion rule that makes a corpus
    * sample uniform over TOKENS rather than documents (weight = token
    * or char count), or over any other per-row mass. The decision is
    * `pos(id)·den < w·num·2³¹` in exact integer arithmetic — no
    * doubles anywhere, so the DuckDB oracle replicates it exactly and
    * a rerun/retry keeps the identical rows. Map-only. Rows with
    * w·num/den ≥ 1 are always kept (the min(1,·) cap falls out of the
    * comparison). Caller keeps w·num < 2³² (ANSI overflow guards the
    * rest). */
  def ppsSample(df: DataFrame, idCol: String, weight: Column,
                num: Int, den: Int, salt: Long = 7L): DataFrame = {
    require(num > 0 && den > 0, "need num > 0, den > 0")
    df.where(lcgPos(col(idCol), salt) * lit(den.toLong) <
      weight.cast("long") * lit(num.toLong) * lit(1L << 31))
  }

  /** Source-weighted corpus mixing WITH upsampling — the "data mixture"
    * step of a training pipeline (e.g. weight a curated source 3×, a
    * crawl 0.25×): each row whose `stratumCol` has weight `num/den`
    * is emitted `⌊num/den⌋` times, plus once more when its hash
    * position falls in the fractional band (`pos mod den < num mod
    * den`). Strata not listed are dropped. Copies carry `repCol`
    * (0-based epoch index) so a downstream [[epochShuffle]] keyed on
    * (id, rep) decorrelates repeats across the training order.
    *
    * Deterministic (same mixture every run/engine — the fractional
    * band reuses [[lcgPos]], so the DuckDB oracle reproduces the exact
    * row multiset) and map-only: the weight table is a literal CASE
    * expression, the copies come from one `explode(sequence)` — no
    * shuffle, no state, linear at any corpus size. */
  def mixWeights(df: DataFrame, idCol: String, stratumCol: Column,
                 weights: Seq[(Any, (Int, Int))], salt: Long = 7L,
                 repCol: String = "rep"): DataFrame = {
    require(weights.forall { case (_, (num, den)) => den > 0 && num >= 0 },
      "weights need den > 0, num >= 0")
    val copies = weights.foldLeft(lit(0L)) { case (acc, (v, (num, den))) =>
      when(stratumCol === lit(v),
        lit((num / den).toLong) +
          when(pmod(lcgPos(col(idCol), salt), lit(den.toLong)) < lit((num % den).toLong),
            lit(1L)).otherwise(lit(0L)))
        .otherwise(acc)
    }
    df.withColumn("__copies", copies)
      .where(col("__copies") > 0L)
      .withColumn(repCol, explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }

  /** Global running sum of `value` in `sortKeys` order WITHOUT a
    * single-partition window: an unpartitioned `Window.orderBy(...)`
    * funnels the entire input through one task (Spark's own
    * `WindowExec: No Partition Defined` warning), which at corpus scale
    * does not complete. Here the total order comes from a
    * range-partitioned sort (scales across executors), and the prefix
    * sum decomposes into (a) one small job collecting per-partition
    * totals — the partitions' shuffle files are computed once and the
    * second pass reuses them (same RDD lineage → skipped stages) — and
    * (b) a per-partition running sum seeded with the scanLeft of those
    * totals. mapPartitions is justified here (SURVEY §4 last resort):
    * a running total is inherently sequential per partition, and the
    * hot loop is a long add per row.
    *
    * Appends `outCol` (LongType, running total INCLUDING the row; null
    * `value` adds 0). Row order of the result is the global sort order. */
  private def globalRunningSum(df: DataFrame, sortKeys: Seq[Column],
                               value: Column, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.withColumn("__rv", value.cast(LongType))
      .repartitionByRange(sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
    val rdd = sorted.rdd // ONE RDD: both jobs below share its shuffle
    val vIdx = sorted.columns.length - 1
    val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach { r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx) }
      Iterator.single(pid -> s)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(out,
        StructType(sorted.schema.fields :+ StructField(outCol, LongType, nullable = false)))
      .drop("__rv")
  }

  /** Deterministic SHARD ASSIGNMENT — the final write stage of a
    * training-data pipeline: every document gets a shard (splitmix hash
    * of its id — layout- and run-independent, uniform across shards)
    * and a stable sequence number within the shard (ordered by the
    * SAME splitmix position then id, so intra-shard order is itself a
    * shuffled order — the property an epoch reader wants — and a rerun,
    * a retry, or another engine reproduces the exact shard files).
    * Returns (idCol, shard, seq, n_tokens); the shard manifest is one
    * groupBy away and the physical write is
    * `.write.partitionBy("shard")`. Scale shape: one shard-keyed
    * shuffle; the per-shard row_number is a shard-partitioned window
    * (corpus/nShards rows each), never a global sort. */
  def shardAssignment(docs: DataFrame, nShards: Int, salt: Long = 11L,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nShards >= 1)
    val w = Window.partitionBy("shard").orderBy(col("__pos"), col(idCol))
    docs
      .select(col(idCol), lcgPos(col(idCol), salt).as("__pos"),
        graft.functions.TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("shard", pmod(col("__pos"), lit(nShards.toLong)))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("seq"), col("n_tokens"))
  }

  /** DuckDB replication of [[shardAssignment]]. */
  def shardAssignmentOracleSql(nShards: Int, salt: Long = 11L): String =
    s"""WITH p AS (SELECT doc_id,
       |    ${posOracleSql("doc_id", salt)} AS pos,
       |    CASE WHEN LEN(TRIM(text)) = 0 THEN 0
       |      ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens
       |  FROM documents)
       |SELECT doc_id, pos % $nShards AS shard,
       |  CAST(row_number() OVER (PARTITION BY pos % $nShards
       |    ORDER BY pos, doc_id) AS BIGINT) AS seq,
       |  CAST(n_tokens AS BIGINT) AS n_tokens
       |FROM p""".stripMargin

  /** Deterministic epoch shuffle: a global pseudo-random permutation of
    * the corpus, different per `epoch`, reproducible everywhere. At
    * scale this is ONE range-partitioned total-order sort by (hash, id)
    * — the legitimate way to get stable global shuffling
    * (`orderBy(rand())` is neither reproducible nor retry-safe) — plus
    * [[globalRunningSum]]'s two-pass dense numbering, so no partition
    * ever holds more than its share of the corpus. Returns the input
    * plus a dense 1-based `pos` column. Positions are independent of
    * where the range boundaries land: any range partitioning of a total
    * order followed by per-partition sort and sequential numbering
    * yields the identical global permutation. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Long): DataFrame =
    // hash materialized as a column: computed once per row at shuffle
    // write, not re-evaluated again by the partitioner and the sort
    globalRunningSum(df.withColumn("__h", lcgPos(col(idCol), epoch)),
      Seq(col("__h").asc, col(idCol).asc), lit(1L), "pos").drop("__h")

  /** Token-budget selection: rank the corpus by `score` (descending,
    * id tiebreak) and keep documents while the running token total
    * stays within `budget` — "take the best docs until the training
    * budget is full", the standard data-mixing step after quality
    * scoring. Adds `cum_tokens` (the running total INCLUDING the row).
    *
    * One total-order sort + prefix-sum window; pass `shardCol` for an
    * independent budget per shard (the per-shard window shape a 100 TB
    * corpus wants, exactly like [[packSequences]]). Deterministic given
    * a deterministic score — with [[graft.functions.TextFunctions
    * .qualityScore]] (rounded, IEEE-exact ops) the DuckDB oracle
    * reproduces the identical selection. */
  def selectByBudget(df: DataFrame, budget: Long, score: Column,
                     idCol: String = "doc_id", tokenCount: Column = null,
                     shardCol: Column = null): DataFrame = {
    val toks = Option(tokenCount)
      .getOrElse(graft.functions.TextFunctions.tokenCount(col("text")))
    Option(shardCol) match {
      case Some(sc) =>
        // per-shard budget: a PARTITIONED window — one window task per
        // shard partition, the shape a sharded corpus wants
        val w = Window.partitionBy(sc).orderBy(score.desc, col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("cum_tokens", sum(toks).over(w))
          .where(col("cum_tokens") <= budget)
      case None =>
        // global budget: two-pass range-sorted prefix sum — never a
        // single-partition window (see [[globalRunningSum]]). The score
        // (often regex-heavy quality features) is materialized as a
        // column so it evaluates once per row, not per sort comparison
        // site.
        globalRunningSum(df.withColumn("__score", score),
            Seq(col("__score").desc, col(idCol).asc), toks, "cum_tokens")
          .drop("__score")
          .where(col("cum_tokens") <= budget)
    }
  }

  /** Sequence packing for training-context assembly
    * (concatenate-then-chunk): documents concatenate in `idCol` order
    * and the stream is cut every `capacity` tokens; each document gets
    * the bin holding its first token (`bin`) and its offset within that
    * bin (`bin_off`). One running prefix sum over a window — the
    * deterministic, retry-safe formulation (true first-fit bin state is
    * inherently sequential and neither).
    *
    * Scale note: pass `shardCol` to pack independently within shards
    * (`Window.partitionBy(shard)`) — one window per shard partition,
    * the shape a 100 TB corpus wants (bins are per-shard, as training
    * shards are in practice). The global default uses
    * [[globalRunningSum]]'s two-pass range-sorted prefix sum, never a
    * single-partition window. */
  def packSequences(df: DataFrame, capacity: Long, idCol: String = "doc_id",
                    tokenCount: Column = null,
                    shardCol: Column = null): DataFrame = {
    val toks = Option(tokenCount)
      .getOrElse(graft.functions.TextFunctions.tokenCount(col("text")))
    val cum = Option(shardCol) match {
      case Some(sc) =>
        val w = Window.partitionBy(sc).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("__toks", toks).withColumn("__cum", sum(col("__toks")).over(w))
      case None =>
        globalRunningSum(df.withColumn("__toks", toks),
          Seq(col(idCol).asc), col("__toks"), "__cum")
    }
    cum
      .withColumn("__start", col("__cum") - col("__toks"))
      .withColumn("bin", floor(col("__start") / lit(capacity)))
      .withColumn("bin_off", col("__start") % lit(capacity))
      .drop("__toks", "__cum", "__start")
  }

  /** Assembled training examples from [[packSequences]]: each bin's
    * documents concatenate (in `idCol` order, `sep`-joined) into one
    * example row with its document count and token total. This is the
    * step that actually moves text — one shuffle keyed by bin, which is
    * the unavoidable output materialization of packing; everything
    * upstream shuffled ids and counts only.
    *
    * With `shardCol`, bins restart per shard (that is packSequences'
    * contract), so the example key is (shard, bin) — grouping by bin
    * alone would concatenate bin N of EVERY shard into one bogus
    * example. The shard lands in the output as a `shard` column. */
  def packedExamples(df: DataFrame, capacity: Long, idCol: String = "doc_id",
                     textCol: String = "text", sep: String = "\n",
                     shardCol: Column = null): DataFrame = {
    val packed = packSequences(df, capacity, idCol, shardCol = shardCol)
    val (keyed, keys) = Option(shardCol) match {
      case Some(sc) => (packed.withColumn("shard", sc), Seq(col("shard"), col("bin")))
      case None => (packed, Seq(col("bin")))
    }
    keyed.groupBy(keys: _*)
      .agg(
        // array_sort on (id, text) structs orders by id first — the
        // deterministic assembly order regardless of shuffle arrival
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol)), sep).as("example_text"),
        count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFunctions.tokenCount(col(textCol))).as("n_tokens"))
  }

  /** Temperature-scaled source rebalancing (the multinomial-sampling
    * exponent of multilingual/multi-source training mixes, α = 0.5):
    * upsample each stratum by f = √(n_max / n_stratum), flattening the
    * source distribution halfway toward uniform. The factors
    * rationalize to num/`scale` on the driver (the per-stratum count
    * table is strata-bounded), then every per-row copy decision is
    * [[mixWeights]]'s exact integer arithmetic. √ is EXACTLY rounded
    * under IEEE-754 and max is order-independent, so an independent
    * engine recomputing the factors from the same counts lands on the
    * identical integers — which is what makes this oracle-exact where
    * a Σ-normalized temperature weight (order-dependent float sum)
    * would not be. */
  def temperatureMix(df: DataFrame, idCol: String, stratumCol: String,
                     scale: Int = 1000, salt: Long = 7L): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0), r.getLong(1)))
    require(counts.nonEmpty, "temperatureMix over an empty frame")
    val nMax = counts.map(_._2).max
    val weights: Seq[(Any, (Int, Int))] = counts.toSeq.map { case (v, n) =>
      v -> ((math.round(math.sqrt(nMax.toDouble / n) * scale).toInt, scale))
    }
    mixWeights(df, idCol, col(stratumCol), weights, salt)
  }

  /** DuckDB replication of [[temperatureMix]] over the documents table:
    * same counts → same exactly-rounded √ factors → same integer copy
    * decisions (DuckDB round() is half-away-from-zero, Scala
    * math.round half-up — identical for positive inputs). */
  def temperatureMixOracleSql(stratum: String = "lang", scale: Int = 1000,
                              salt: Long = 7L): String =
    s"""WITH n AS (SELECT $stratum, COUNT(*) AS n FROM documents GROUP BY $stratum),
       |mx AS (SELECT MAX(n) AS m FROM n),
       |w AS (SELECT $stratum,
       |      CAST(round(sqrt(CAST(m AS DOUBLE) / n) * $scale) AS BIGINT) AS num
       |      FROM n, mx),
       |d AS (SELECT doc_id, $stratum, ${posOracleSql("doc_id", salt)} AS pos
       |      FROM documents),
       |c AS (SELECT d.doc_id, d.$stratum,
       |      (w.num // $scale) +
       |      (CASE WHEN d.pos % $scale < (w.num % $scale) THEN 1 ELSE 0 END) AS copies
       |      FROM d JOIN w USING ($stratum))
       |SELECT doc_id, $stratum, unnest(generate_series(0, CAST(copies AS BIGINT) - 1)) AS rep
       |FROM c WHERE copies > 0""".stripMargin

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each RAW
    * document by the log-likelihood ratio of its hashed n-gram features
    * under an add-α-smoothed bag-of-buckets model of the TARGET slice
    * vs the raw corpus, and keep the top `n` — the cheap distribution-
    * matching selector. (The paper resamples with Gumbel noise; the
    * deterministic top-n variant keeps the operator exactly
    * oracle-checkable — the same trade [[ppsSample]] makes vs `rand()`.)
    *
    * Features are unigrams + word bigrams hashed into `buckets` buckets
    * via [[graft.functions.TextFunctions.fnvMix64]] (SQL-replicable).
    * The two bucket-count tables are B rows BY CONSTRUCTION, so they
    * collect to the driver (B-bounded, corpus-size-independent) and the
    * λ_b = ln p_target(b) − ln p_raw(b) weight vector bakes into the
    * scoring plan as a literal — scoring is then a MAP-ONLY second scan
    * of the raw corpus plus one per-doc partial-aggregated sum; no
    * corpus-sized join anywhere. Per-doc scores sum in DECIMAL(38,30)
    * (order-independent) and round to 6 dp — the one-shot engine-parity
    * stance of the mean-pool operator; rounded-grid ties break by id.
    * Docs with zero features (no tokens) have no likelihood under
    * either model and drop out. */
  def dsirSelect(raw: DataFrame, target: DataFrame, n: Int, buckets: Int = 1024,
                 alpha: Double = 1.0, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    def feats(df: DataFrame) = df
      .select(col(idCol).as("id"), TF.tokens(col(textCol)).as("t"))
      // r15: one-pass bucket kernel — identical to the old
      // explode(concat(t, shingles₂)) → pmod(fnvMix64(f), B) chain
      // (TextAnalysisSpec pins equality), no per-bigram string build
      .select(col("id"),
        explode(TF.fnvFeatureBuckets(col("t"), buckets.toLong)).as("b"))
    val rawF = feats(raw).localCheckpoint(true) // counts AND scoring read it
    def bucketCounts(f: DataFrame): Map[Long, Long] =
      f.groupBy("b").agg(count(lit(1)).as("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ct = bucketCounts(feats(target))
    val cr = bucketCounts(rawF)
    val (nT, nR) = (ct.values.sum, cr.values.sum)
    val lam = Array.tabulate(buckets) { b =>
      math.log((ct.getOrElse(b.toLong, 0L) + alpha) / (nT + alpha * buckets)) -
        math.log((cr.getOrElse(b.toLong, 0L) + alpha) / (nR + alpha * buckets))
    }
    rawF
      .select(col("id"), element_at(typedLit(lam.toSeq), col("b").cast("int") + 1).as("lam"))
      .groupBy("id")
      .agg(round(sum(col("lam").cast("decimal(38,30)")).cast("double"), 6).as("dsir_score"))
      .orderBy(col("dsir_score").desc, col("id").asc)
      .limit(n)
      .select(col("id").as(idCol), col("dsir_score"))
  }

  /** DuckDB replication of [[dsirSelect]]: identical FNV+splitmix
    * bucket hashing (distinct features hash once), the same smoothed
    * count ratios (integer counts → IEEE double division → ln, both
    * engines from identical inputs), decimal score sums, 6-dp round.
    * `rawPred`/`targetPred` are SQL predicates over `documents`
    * selecting the two slices. */
  def dsirOracleSql(rawPred: String, targetPred: String, n: Int,
                    buckets: Int = 1024, alpha: Double = 1.0): String =
    s"""WITH rdoc AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS t
       |  FROM documents WHERE ($rawPred) AND LEN(TRIM(text)) > 0),
       |tdoc AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS t
       |  FROM documents WHERE ($targetPred) AND LEN(TRIM(text)) > 0),
       |rf0 AS (SELECT doc_id, unnest(t || list_transform(generate_series(1, LEN(t)-1),
       |  i -> t[i] || ' ' || t[i+1])) AS k FROM rdoc),
       |tf0 AS (SELECT doc_id, unnest(t || list_transform(generate_series(1, LEN(t)-1),
       |  i -> t[i] || ' ' || t[i+1])) AS k FROM tdoc),
       |uk AS (SELECT DISTINCT k FROM (SELECT k FROM rf0 UNION ALL SELECT k FROM tf0)),
       |${TextAnalysis.foldMixSql("uk", "ukh")},
       |hb AS (SELECT k, ((${TextAnalysis.toSignedSql("hm")} % $buckets) + $buckets) % $buckets AS b
       |       FROM ukh),
       |rfeat AS (SELECT f.doc_id, h.b FROM rf0 f JOIN hb h USING (k)),
       |tfeat AS (SELECT f.doc_id, h.b FROM tf0 f JOIN hb h USING (k)),
       |crt AS (SELECT b, count(*) AS c FROM rfeat GROUP BY b),
       |ctt AS (SELECT b, count(*) AS c FROM tfeat GROUP BY b),
       |tots AS (SELECT (SELECT count(*) FROM rfeat) AS nr, (SELECT count(*) FROM tfeat) AS nt),
       |lam AS (SELECT g.b,
       |  ln((coalesce(ctt.c, 0) + $alpha) / (tots.nt + $alpha * $buckets)) -
       |  ln((coalesce(crt.c, 0) + $alpha) / (tots.nr + $alpha * $buckets)) AS lam
       |  FROM (SELECT unnest(generate_series(0, ${buckets - 1})) AS b) g
       |  CROSS JOIN tots LEFT JOIN ctt ON g.b = ctt.b LEFT JOIN crt ON g.b = crt.b),
       |sc AS (SELECT f.doc_id,
       |  ROUND(CAST(SUM(CAST(l.lam AS DECIMAL(38,30))) AS DOUBLE), 6) AS dsir_score
       |  FROM rfeat f JOIN lam l USING (b) GROUP BY f.doc_id)
       |SELECT doc_id, dsir_score FROM sc
       |ORDER BY dsir_score DESC, doc_id ASC LIMIT $n""".stripMargin
}

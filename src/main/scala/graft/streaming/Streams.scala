package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming realizations of the reference's incremental
  * semantics (reference: DD-based incremental view maintenance,
  * `src/incremental.rs`, `src/derived_relations.rs`). The reference has
  * no event-time windows or watermarks — its "time" is a transaction
  * counter — so the mapping is:
  *
  *  - persistent-rule incremental aggregation → `groupBy().agg()` in
  *    update output mode (Spark maintains the running state);
  *  - change-notification streams → the streaming query's result stream;
  *  - plus genuinely event-time operators (windows, watermarks, late
  *    data) that a 100 TB training-data pipeline needs and the
  *    reference lacks.
  *
  * All functions accept either batch or streaming DataFrames — the plan
  * is identical; only the sink differs.
  */
object Streams {

  /** Continuously-maintained per-key aggregate (the reference's
    * incremental `dept_total(Dept, sum<Salary>)` benchmark shape —
    * `BENCHMARKS.md:91-93`). Run with outputMode("update"). */
  def incrementalAgg(events: DataFrame, keyCol: String, valueCol: String): DataFrame =
    events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("total"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Tumbling event-time window counts with a watermark bounding state
    * (and defining late-data drop). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowDur: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("total"))

  /** Streaming exact dedup: first occurrence wins, state bounded by the
    * watermark (the streaming analogue of Dedup.exact). */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String,
                     watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("content_hash")

  /** Streaming decontamination: drop stream documents sharing any word
    * `shingleN`-gram with the benchmark corpus (the live-ingest form of
    * [[graft.operators.Dedup.decontaminate]]). The benchmark's shingle
    * hashes collect ONCE to the driver — benchmarks are small by
    * construction — and ship as a literal set, so the stream side is a
    * stateless per-row filter: no streaming join, no watermark, no
    * state store, works in any output mode. (A benchmark too large to
    * collect belongs in a foreachBatch batch-decontaminate instead.)
    * Tokens project before the shingle expression — a tokens() captured
    * inside the shingle lambda would re-split per element, O(len²). */
  def decontaminateStream(docs: DataFrame, benchmark: DataFrame,
                          shingleN: Int = 3, textCol: String = "text"): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val benchHashes = benchmark
      .select(explode(array_distinct(
        TF.wordShingleHashes(TF.tokens(col(textCol)), shingleN))).as("sh"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    // coalesce: tokens(null-text) is null → arrays_overlap is null → a
    // bare WHERE would silently DROP null-text docs; the batch twin
    // (Dedup.decontaminate, explode + left_anti) keeps them, so must we
    docs.withColumn("__toks", TF.tokens(col(textCol)))
      .where(!coalesce(arrays_overlap(
        TF.wordShingleHashes(col("__toks"), shingleN),
        typedLit(benchHashes)), lit(false)))
      .drop("__toks")
  }

  /** Streaming NEAR-duplicate candidates: banded MinHash over the live
    * feed with per-bucket keyed state (the streaming analogue of
    * [[graft.operators.Dedup.minHashPairs]]'s candidate stage). Each
    * document's signature computes map-side (the same one-pass UDF as
    * batch), explodes to (band, bucket) keys, and
    * `flatMapGroupsWithState` keeps the ids seen per bucket — a new
    * arrival emits a candidate pair against every remembered member,
    * ACROSS micro-batches. State per bucket caps at `maxPerBucket`
    * (newest kept) and evicts on a processing-time TTL when `ttl` is
    * set, so state stays bounded on an unbounded feed. (`ttl = None`
    * disables eviction — needed under `processAllAvailable`-style
    * tests, where the continuous empty timeout batches would never let
    * the query go idle.) Pairs may repeat across bands; consumers
    * dedup (exactly like the batch candidate stage before
    * verification). */
  def streamingNearDupCandidates(docs: DataFrame, shingleN: Int = 5,
                                 k: Int = 64, bands: Int = 16,
                                 maxPerBucket: Int = 64,
                                 ttl: Option[String] = Some("1 hour"),
                                 idCol: String = "doc_id",
                                 textCol: String = "text"): Dataset[(Long, Long)] = {
    import graft.functions.{TextFunctions => TF}
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = k / bands
    val banded = docs
      .select(col(idCol).cast("long").as("id"),
        TF.minHashSigChars(TF.normText(col(textCol)), shingleN, k).as("sig"))
      .where(col("sig").isNotNull)
      .select(col("id"),
        explode(TF.minHashBands(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("id"))
      .as[(Int, Long, Long)]
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey { case (band, bucket, _) => (band, bucket) }
      .flatMapGroupsWithState[List[Long], (Long, Long)](
        OutputMode.Append, timeout) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val seen = state.getOption.getOrElse(Nil)
            val fresh = rows.map(_._3).toSeq.distinct.filterNot(seen.contains)
            val out = Seq.newBuilder[(Long, Long)]
            var acc = seen
            fresh.foreach { n =>
              acc.foreach(s => out += (if (s < n) (s, n) else (n, s)))
              acc = n :: acc
            }
            state.update(acc.take(maxPerBucket))
            ttl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming BOILERPLATE DISCOVERY — the live form of the batch
    * segment-dedup decision ([[graft.operators.Dedup.lineDedup]]):
    * segments keyed by content accumulate the DISTINCT documents that
    * carried them; the moment a segment's document frequency reaches
    * `minDocFreq` it emits (segment, df) ONCE. Downstream, the emitted
    * stream IS the common-segment table the batch operators anti-join
    * against — an ingest pipeline learns its boilerplate as it streams
    * instead of re-scanning the corpus.
    *
    * State per segment is capped by construction: at most `minDocFreq`
    * doc ids (distinctness only matters up to the threshold), collapsed
    * to an emitted-tombstone afterwards so a segment never re-emits;
    * `ttl` evicts segments that stop recurring. */
  def streamingCommonSegments(docs: DataFrame, minDocFreq: Int,
                              splitPattern: String = "\n",
                              ttl: Option[String] = Some("1 hour"),
                              idCol: String = "doc_id",
                              textCol: String = "text"): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val segs = docs
      .select(col(idCol).cast("long").as("id"),
        explode(split(col(textCol), splitPattern)).as("seg"))
      .as[(Long, String)]
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    segs
      .groupByKey(_._2)
      .flatMapGroupsWithState[(List[Long], Boolean), (String, Long)](
        OutputMode.Append, timeout) {
        case (seg, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (seen, emitted) = state.getOption.getOrElse((Nil, false))
            val out =
              if (emitted) Iterator.empty
              else {
                val ids = (seen ++ rows.map(_._1)).distinct.take(minDocFreq)
                if (ids.length >= minDocFreq) {
                  state.update((Nil, true)) // tombstone: never re-emit
                  Iterator.single((seg, ids.length.toLong))
                } else {
                  state.update((ids, false))
                  Iterator.empty
                }
              }
            ttl.foreach(state.setTimeoutDuration)
            out
          }
      }
  }

  /** Stream-stream equi-join with an event-time interval bound (the
    * attribution/enrichment join a live training-data pipeline runs
    * between two feeds, e.g. documents ⋈ late-arriving annotations).
    * Both sides carry watermarks and the predicate bounds right-side
    * event time relative to the left, so Spark evicts buffered rows the
    * moment they can no longer match — join state stays bounded at any
    * stream volume. (An unbounded stream-stream join would buffer both
    * sides forever; this is the scale-safe shape.) */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   within: String = "10 minutes",
                   watermark: String = "20 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.alias("l").join(r.alias("r"),
      expr(s"l.$key = r.$key AND r.$rightTs >= l.$leftTs AND " +
        s"r.$rightTs <= l.$leftTs + interval $within"))
  }

  /** Custom keyed state via mapGroupsWithState: running event count +
    * exponentially-decayed activity score per user — the kind of
    * incrementally-maintained derived state the reference keeps in DD
    * arrangements. */
  /** Feed a STREAMING DataFrame into an IQL catalog relation: each
    * micro-batch appends its rows via [[graft.iql.Catalog.appendDf]]
    * (set semantics, one change-log entry per batch), so persistent
    * rules over the relation are INCREMENTALLY MAINTAINED as the stream
    * advances — the Spark realization of the reference's "every insert
    * is a `(data, time, +1)` update into derived views" model
    * (`src/incremental.rs`): Structured Streaming supplies the change
    * stream, `Engine.tryMaintain` does the delta propagation, and a
    * re-query between batches touches only the new tuples' derivations.
    * Returns the started query; caller owns its lifecycle. */
  def iqlSink(stream: DataFrame, catalog: graft.iql.Catalog, relation: String,
              checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // foreachBatch runs on the driver; the catalog append is a
        // metadata operation over the batch's (already distributed)
        // frame. Compacting afterwards keeps the relation's plan depth
        // constant across batches (union/distinct would otherwise nest
        // one layer per micro-batch).
        catalog.appendDf(relation, batch.localCheckpoint(true))
        catalog.compact(relation)
      }
      .start()

  /** Retraction-aware [[iqlSink]]: the stream's `diffCol` carries the
    * reference's update-stream sign (`(tuple, time, diff)` with negative
    * diffs for retractions — `src/incremental.rs:34-44`). Per micro-batch,
    * `diff >= 0` rows append (monotone delta propagation) and `diff < 0`
    * rows retract through [[graft.iql.Catalog.deleteDf]] — the SAME
    * change-log shape batch deletes produce, so materialized recursive
    * views downstream prune retracted derivations via the engine's DRed
    * path on the next re-query. Time collapses to batch granularity:
    * within one batch inserts apply before deletes, so a same-batch
    * insert+retract of a tuple nets to absent, matching diff summation.
    * foreachBatch is at-least-once under failure; a replayed batch is
    * harmless because both halves are idempotent under set semantics
    * (re-append dedups, re-delete anti-joins nothing). */
  def iqlSinkWithRetractions(stream: DataFrame, catalog: graft.iql.Catalog,
                             relation: String, checkpointDir: String,
                             diffCol: String = "diff")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint(true)
        // null diff = un-annotated row = insert (a bare WHERE >= 0 would
        // silently drop it from BOTH halves)
        val ins = b.where(coalesce(col(diffCol) >= 0, lit(true))).drop(diffCol)
        val del = b.where(col(diffCol) < 0).drop(diffCol)
        if (!ins.isEmpty) catalog.appendDf(relation, ins)
        if (!del.isEmpty) catalog.deleteDf(relation, del)
        catalog.compact(relation)
      }
      .start()

  /** Compile an IQL rule DIRECTLY over streaming sources: the rule body
    * (joins on shared variables, computed bindings, filters) becomes a
    * streaming plan via the same [[graft.iql.RuleCompiler]] the batch
    * engine uses — DataFrame ops are source-agnostic, so `readStream`
    * relations work wherever Structured Streaming supports the shape
    * (stream⋈static joins, per-row compute/filter; stream⋈stream needs
    * watermarks on both sides; recursion and negation are batch-only —
    * use [[iqlSink]] + persistent rules for those).
    *
    * `ruleSrc` is one IQL rule, e.g.
    * `alert(Id, V) <- events(Id, V), V > 100.0`; `relations` maps body
    * relation names to (streaming or static) DataFrames. Returns the
    * head-projected streaming DataFrame, ready for `writeStream`. */
  def ruleStream(ruleSrc: String, relations: Map[String, DataFrame]): DataFrame = {
    import graft.iql.{Ast, Parser, RuleCompiler}
    val stmts = Parser.parseProgram(ruleSrc).statements
    val rule = stmts.collectFirst { case Ast.RuleDef(r) => r }.getOrElse(
      throw new IllegalArgumentException(s"not a rule: $ruleSrc"))
    require(!rule.body.exists { case Ast.Neg(_) => true; case _ => false },
      "streaming rules cannot use negation (unbounded state) — use iqlSink + persistent rules")
    require(rule.head.args.forall(a => !a.isInstanceOf[Ast.Agg]),
      "aggregate heads: use windowedCounts/incrementalAgg with a watermark instead")
    val resolver: RuleCompiler.Resolver = (name, _) =>
      relations.getOrElse(name,
        throw new IllegalArgumentException(s"unknown relation $name in streaming rule"))
    val body = RuleCompiler.compileBody(rule.body, resolver)
    body.select(rule.head.args.zipWithIndex.map {
      case (Ast.Var(v), _) => col(v)
      case (t, i) => RuleCompiler.term(t, body).as(s"c$i")
    }: _*)
  }

  final case class Event(userId: Long, tsMs: Long, value: Double)
  final case class UserState(count: Long, score: Double, lastTsMs: Long)

  def decayedActivity(events: Dataset[Event], halfLifeMs: Long = 3600000L)
                     (implicit enc1: org.apache.spark.sql.Encoder[UserState],
                      enc2: org.apache.spark.sql.Encoder[(Long, UserState)]): Dataset[(Long, UserState)] =
    events.groupByKey(_.userId)(org.apache.spark.sql.Encoders.scalaLong)
      .mapGroupsWithState[UserState, (Long, UserState)] {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, 0L))
          val updated = batch.foldLeft(prev) { (s, e) =>
            val dt = math.max(0L, e.tsMs - s.lastTsMs)
            val decayed = if (s.count == 0L) 0.0
              else s.score * math.pow(0.5, dt.toDouble / halfLifeMs)
            UserState(s.count + 1, decayed + e.value, math.max(s.lastTsMs, e.tsMs))
          }
          state.update(updated)
          (userId, updated)
      }
}

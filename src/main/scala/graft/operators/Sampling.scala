package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and shuffling for training-data pipelines.
  *
  * Everything here is REPRODUCIBLE and map-only where possible: sampling
  * decisions are pure arithmetic over the row id (a multiplicative LCG,
  * not `rand()`), so a re-run, a retried task, or a different cluster
  * produces the identical sample — the property training pipelines need
  * for data lineage, and the reason these are exactly oracle-checkable
  * in DuckDB (`rand()`-based sampling is not). The LCG constants are
  * MINSTD (48271 mod 65537), the same generator the bench graph uses.
  */
object Sampling {

  /** LCG position of an id: `(id * mult(salt) + salt) mod 65537`, a
    * fixed pseudo-random value in [0, 65537) that any engine reproduces
    * with plain integer arithmetic. The salt feeds the MULTIPLIER, not
    * just an additive offset: an additive-only salt merely rotates the
    * residue ring, which leaves orderings unchanged and keeps
    * `mod den` membership identical whenever the shift divides den
    * (caught by SamplingSpec). 65537 is prime, so every nonzero
    * multiplier is a bijection of the ring. */
  def lcgMult(salt: Long): Long = {
    val m = Math.floorMod(48271L + salt * 101L, 65537L)
    if (m == 0L) 48271L else m
  }
  def lcgPos(id: Column, salt: Long): Column =
    pmod(id * lit(lcgMult(salt)) + lit(salt), lit(65537L))

  /** Keep ~`num`/`den` of rows, decided per row from the id alone —
    * no shuffle, no state, identical across runs and engines. */
  def deterministicSample(df: DataFrame, idCol: String,
                          num: Int, den: Int, salt: Long = 7L): DataFrame =
    df.where(pmod(lcgPos(col(idCol), salt), lit(den.toLong)) < num)

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

  /** Deterministic epoch shuffle: a global pseudo-random permutation of
    * the corpus, different per `epoch`, reproducible everywhere. At
    * scale this is ONE total-order sort by (hash, id) — the legitimate
    * way to get stable global shuffling (`orderBy(rand())` is neither
    * reproducible nor retry-safe). Returns the input plus a dense
    * 1-based `pos` column. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Long): DataFrame =
    df.withColumn("pos", row_number().over(
      Window.orderBy(lcgPos(col(idCol), epoch), col(idCol))))

  /** Sequence packing for training-context assembly
    * (concatenate-then-chunk): documents concatenate in `idCol` order
    * and the stream is cut every `capacity` tokens; each document gets
    * the bin holding its first token (`bin`) and its offset within that
    * bin (`bin_off`). One running prefix sum over a window — the
    * deterministic, retry-safe formulation (true first-fit bin state is
    * inherently sequential and neither).
    *
    * Scale note: a global ORDER BY window funnels through one partition
    * at the sort boundary; pass `shardCol` to pack independently within
    * shards (`Window.partitionBy(shard)`) — the planner then runs one
    * window per shard partition, which is the shape a 100 TB corpus
    * needs (bins are per-shard, as training shards are in practice). */
  def packSequences(df: DataFrame, capacity: Long, idCol: String = "doc_id",
                    tokenCount: Column = null,
                    shardCol: Column = null): DataFrame = {
    val toks = Option(tokenCount)
      .getOrElse(graft.functions.TextFunctions.tokenCount(col("text")))
    val w0 = Option(shardCol).map(Window.partitionBy(_)).getOrElse(Window.partitionBy())
    val w = w0.orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__toks", toks)
      .withColumn("__start", sum(col("__toks")).over(w) - col("__toks"))
      .withColumn("bin", floor(col("__start") / lit(capacity)))
      .withColumn("bin_off", col("__start") % lit(capacity))
      .drop("__toks", "__start")
  }

  /** Assembled training examples from [[packSequences]]: each bin's
    * documents concatenate (in `idCol` order, `sep`-joined) into one
    * example row with its document count and token total. This is the
    * step that actually moves text — one shuffle keyed by bin, which is
    * the unavoidable output materialization of packing; everything
    * upstream shuffled ids and counts only. */
  def packedExamples(df: DataFrame, capacity: Long, idCol: String = "doc_id",
                     textCol: String = "text", sep: String = "\n",
                     shardCol: Column = null): DataFrame = {
    val packed = packSequences(df, capacity, idCol, shardCol = shardCol)
    packed.groupBy(col("bin"))
      .agg(
        // array_sort on (id, text) structs orders by id first — the
        // deterministic assembly order regardless of shuffle arrival
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol)), sep).as("example_text"),
        count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFunctions.tokenCount(col(textCol))).as("n_tokens"))
  }
}

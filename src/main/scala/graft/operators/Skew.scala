package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for shuffles whose key distribution has
  * hot keys (the 100 TB failure mode: one reducer gets the celebrity
  * key's rows and the stage never finishes).
  *
  * AQE's skew-join handling rebalances SORT-MERGE join partitions at
  * runtime; these operators cover what it does not: aggregation skew
  * (a hot GROUP BY key) and joins forced down other paths. Results are
  * IDENTICAL to the unsalted plan — the salt only spreads rows — which
  * is what the oracle twins check.
  */
object Skew {

  /** Equi-join with a salted key: each big-side row gets one of
    * `salts` salt values (any per-row spread works — the salt never
    * reaches the output), the small side replicates `salts`×, and the
    * join key becomes (key, salt) — a hot key's rows land on `salts`
    * reducers instead of one. Costs a `salts`× blowup of the SMALL
    * side, so salts stays tens, not thousands.
    *
    * The salt derives from row CONTENT (xxhash64 over all columns), not
    * `monotonically_increasing_id`: a partition-layout-dependent salt
    * would make correctness under shuffle-fetch failure lean on Spark's
    * indeterminate-stage rollback and make reruns lay out differently
    * for no benefit; a content hash is retry-safe by construction.
    * (Exact-duplicate rows share a salt — they'd co-locate under any
    * keying, the spread target is the hot KEY's distinct rows.) */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "need salts > 0")
    val b = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted sum/count: partial-aggregate on (keys, salt) —
    * the hot key's rows split across `salts` reducers — then merge the
    * per-salt partials on the keys alone (a `salts`-row-per-key
    * shuffle, trivially balanced). The inner sums run in exact
    * DECIMAL(18,2) arithmetic (values round to 2 dp on entry, like the
    * suite's other money-typed sums), so the two-phase result is
    * IDENTICAL to the direct aggregation under the same cast,
    * regardless of how the salt split the rows. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: Column,
                     salts: Int, sumCol: String = "sum",
                     cntCol: String = "cnt"): DataFrame = {
    require(salts > 0, "need salts > 0")
    val keyCols = keys.map(col)
    // content-derived salt for the same retry-safety as [[saltedJoin]]
    df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(value.cast("decimal(18,2)")).as("__ps"), count(lit(1)).as("__pc"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__ps")).cast("double").as(sumCol),
        sum(col("__pc")).as(cntCol))
  }
}

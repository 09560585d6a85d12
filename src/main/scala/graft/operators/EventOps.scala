package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational operators for timestamped log/telemetry
  * tables: as-of join, interval (range) join, and gap sessionization.
  * The reference's temporal builtins (`src/temporal_ops.rs:14-230`)
  * cover point arithmetic (`time_before`, `intervals_overlap`, ...);
  * these operators lift the same domain to whole-relation form, which
  * a training-data pipeline needs to align event streams (impressions
  * vs conversions, doc fetch vs robots snapshot) without a theta join.
  *
  * Scale notes, since every shape here has a naive O(n·m) spelling
  * Spark would happily execute as a broadcast-nested-loop join:
  *   - as-of join = union + running `last_value` — ONE shuffle on the
  *     key, no per-key collect, no range theta join;
  *   - range join = bin the time axis at the window width, equi-join
  *     on (key, bin) with the left side exploded to the two covering
  *     bins, exact range predicate as a post-filter — each right row
  *     joins at most two left copies instead of every same-key row;
  *   - sessionization = lag + running sum over one keyed window.
  */
object EventOps {

  /** As-of join: for each left row, the most recent right row with
    * `right(timeCol) <= left(timeCol)` and the same `keyCol`, or no
    * row (dropped — inner as-of) when none precedes it.
    *
    * Both sides are tagged and unioned, then a running
    * `last(_, ignoreNulls)` over (key, time, side) carries the latest
    * right payload forward into each left row: one shuffle on the key,
    * never a per-key materialization. Right rows order before left
    * rows at equal timestamps (`<=` semantics). The right side must be
    * unique per (key, time) — equal-time right ties have no defined
    * winner (the reference's total-order guarantee on `Value` rows,
    * `src/value/mod.rs:528-547`, makes the same assumption).
    *
    * Output: every left column plus `asof_<v>` for each requested
    * right value column.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
    val r = right.select(
      col(keyCol), col(timeCol),
      lit(0).as("__side"),
      struct(rightVals.map(col): _*).as("__rv"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1 && col("__asof").isNotNull)
      .select(leftCols.map(col) ++
        rightVals.map(v => col("__asof").getField(v).as(s"asof_$v")): _*)
  }

  /** Interval-count join: for each left row, how many right rows with
    * the same key fall in `(leftTime, leftTime + windowSpan]`. Left
    * rows with zero matches are kept (count 0).
    *
    * The time axis is binned at the window width, so a right row at
    * time t can only match left rows in bin(t) or bin(t)-1 — the left
    * side explodes to exactly those two covering bins and the join is
    * a plain equi-join on (key, bin) with the exact range predicate as
    * a residual filter. Shuffle volume is 2× the left row count of
    * (id, key, time) triples — never a per-key cross product. The bin
    * arithmetic is integral (`DIV`): ns-since-epoch exceeds double's
    * 53-bit mantissa, so `floor(x / b)` computed through doubles would
    * misbin boundary rows.
    */
  def rangeCountJoin(left: DataFrame, right: DataFrame, keyCol: String,
                     timeCol: String, windowSpan: Long,
                     leftId: String): DataFrame = {
    val l = left.select(col(leftId), col(keyCol), col(timeCol),
      explode(array(expr(s"$timeCol DIV $windowSpan"),
        expr(s"$timeCol DIV $windowSpan") + 1)).as("__bin"))
    val r = right.select(col(keyCol).as("__rk"), col(timeCol).as("__rt"),
      expr(s"$timeCol DIV $windowSpan").as("__rbin"))
    l.join(r,
        col(keyCol) === col("__rk") && col("__bin") === col("__rbin") &&
          col("__rt") > col(timeCol) &&
          col("__rt") <= col(timeCol) + windowSpan,
        "left_outer")
      .groupBy(col(leftId))
      .agg(count(col("__rt")).as("n_in_window"))
  }

  /** Gap-based sessionization: a new session starts when the gap to
    * the key's previous event exceeds `gapSpan`. Returns one row per
    * session: key, session index (1-based, per key, in time order),
    * event count, start/end times. Equal-time events within a key
    * tie-break on `idCol` for a deterministic scan order; session
    * ASSIGNMENT is tie-order independent (a zero gap never opens a
    * session), so the summary is deterministic regardless.
    *
    * One keyed window (lag + running sum of session-start flags), one
    * aggregation — two shuffles on the key, both carrying only
    * (key, time, id).
    */
  def sessionize(events: DataFrame, keyCol: String, timeCol: String,
                 idCol: String, gapSpan: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col(idCol))
    val prev = lag(col(timeCol), 1).over(w)
    events
      .withColumn("__new",
        when(prev.isNull || col(timeCol) - prev > gapSpan, 1L).otherwise(0L))
      .withColumn("__sess",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__sess").as("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as("start_t"),
        max(col(timeCol)).as("end_t"))
  }
}

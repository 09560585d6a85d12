package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal scalar functions over Unix-millisecond int64 timestamps.
  *
  * The reference's temporal builtins (reference: `src/temporal_ops.rs:14-230`)
  * all operate on ms-since-epoch longs; its `Timestamp` value IS an i64
  * (`src/value/mod.rs:62-64`). We keep the same convention: every function
  * here takes/returns `LongType` milliseconds. `fromTimestamp` converts a
  * Spark native timestamp column into that domain.
  *
  * All pure Column arithmetic — fully codegen'd, no UDFs.
  */
object TemporalFunctions {

  /** Spark TimestampType → epoch milliseconds (LongType). */
  def fromTimestamp(ts: Column): Column = unix_millis(ts)

  /** Epoch milliseconds → Spark TimestampType. */
  def toTimestamp(ms: Column): Column = timestamp_millis(ms)

  /** Current wall-clock as epoch ms (evaluated at plan time — deterministic
    * within a query, like the reference's per-query `time_now`). */
  def timeNow(): Column = unix_millis(current_timestamp())

  def timeDiff(a: Column, b: Column): Column = a - b
  def timeAdd(t: Column, deltaMs: Column): Column = t + deltaMs
  def timeSub(t: Column, deltaMs: Column): Column = t - deltaMs

  /** Exponential decay with half-life: 0.5 ^ (age / halfLifeMs), clamped
    * to 1.0 for future timestamps. */
  def timeDecay(t: Column, now: Column, halfLifeMs: Column): Column = {
    val age = greatest(lit(0L), now - t).cast("double")
    pow(lit(0.5), age / halfLifeMs.cast("double"))
  }

  /** Linear decay to 0 at maxAgeMs: max(0, 1 - age/maxAge), clamped at 1. */
  def timeDecayLinear(t: Column, now: Column, maxAgeMs: Column): Column = {
    val age = greatest(lit(0L), now - t).cast("double")
    greatest(lit(0.0), lit(1.0) - age / maxAgeMs.cast("double"))
  }

  def timeBefore(a: Column, b: Column): Column = a < b
  def timeAfter(a: Column, b: Column): Column = a > b

  /** start <= t <= end (inclusive both ends). */
  def timeBetween(t: Column, start: Column, end: Column): Column =
    t >= start && t <= end

  /** now - windowMs <= t <= now. */
  def withinLast(t: Column, now: Column, windowMs: Column): Column =
    t >= (now - windowMs) && t <= now

  /** Half-open interval overlap: [s1,e1) ∩ [s2,e2) non-empty. */
  def intervalsOverlap(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 < e2 && s2 < e1

  /** [sOuter,eOuter] fully contains [sInner,eInner]. */
  def intervalContains(sOuter: Column, eOuter: Column, sInner: Column, eInner: Column): Column =
    sOuter <= sInner && eInner <= eOuter

  def intervalDuration(s: Column, e: Column): Column = e - s

  /** s <= t < e (half-open, point-in-interval). */
  def pointInInterval(t: Column, s: Column, e: Column): Column =
    t >= s && t < e
}

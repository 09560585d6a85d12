package graft.plans

/** Grace-period GRAVEYARD for retired localCheckpoint blocks — the one
  * safe way to release a checkpoint that a consumer may still hold a
  * lazy plan over. A locally-checkpointed frame has its lineage
  * truncated, so unpersisting it under a live reader fails that read
  * with a lost-block error instead of a recompute; and the engine HANDS
  * OUT lazy frames routinely (query results from `Engine.run`, wire
  * responses, cached views), so "no one reads this anymore" is rarely
  * provable at release time. Retired checkpoints therefore age here:
  * reclaimed only after a grace period long enough to outlive any
  * plausible in-flight reader, with a bounded buffer so churn can't
  * pile blocks up for the session (overflow trims the oldest, but
  * never below a 1-minute floor — the trim must not re-open the race
  * it exists to close).
  *
  * Shared by the dedup signature cache (evicted tables), TextAnalysis
  * scratch retirement (LM gram counts, classifier features), and the
  * IQL engine's displaced aggregate-support tables — whose projections
  * ARE served query results, the class that forced the move here from
  * the dedup module. Frames provably private to one call (seeds,
  * binding scratch, loop deltas) skip the graveyard and release
  * eagerly. */
object Graveyard {
  // grace override for A/B drag measurement (seconds); default 10 min
  private val GraceNanos = sys.props.get("graft.graveyard.graceSec")
    .orElse(sys.env.get("GRAFT_GRAVEYARD_GRACE_SEC"))
    .map(_.toLong).getOrElse(600L) * 1000L * 1000 * 1000
  private val MinGraceNanos = 60L * 1000 * 1000 * 1000L // 1 min floor
  private val Max = 32
  private val buf =
    scala.collection.mutable.ArrayBuffer.empty[(Long, org.apache.spark.rdd.RDD[_])]

  /** Add `evicted` (if any) and reclaim everything past its grace. An
    * RDD whose context has stopped is dropped without an unpersist
    * call — the block manager died with the context. */
  def buryAndDrain(evicted: Option[org.apache.spark.rdd.RDD[_]]): Unit =
    buf.synchronized {
      val now = System.nanoTime()
      evicted.foreach(r => buf += ((now, r)))
      def reclaim(entry: (Long, org.apache.spark.rdd.RDD[_])): Unit =
        try { if (!entry._2.sparkContext.isStopped) entry._2.unpersist(false) }
        catch { case _: Throwable => () }
      val (expired, fresh) = buf.partition { case (t, _) =>
        now - t > GraceNanos }
      expired.foreach(reclaim)
      val overflowCount = math.max(0, fresh.length - Max)
      val (overflowEntries, rest) = fresh.splitAt(overflowCount) // oldest first
      val (trim, kept) = overflowEntries.partition { case (t, _) =>
        now - t > MinGraceNanos }
      trim.foreach(reclaim)
      buf.clear()
      buf ++= kept
      buf ++= rest
    }
}

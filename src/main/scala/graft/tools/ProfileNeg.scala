package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling harness for the negated-derived-dependency maintenance
  * round (the `neg_retract_requery` ScaleCheck shape): prints per-round
  * mutate/requery wall time plus the engine's path counters, so a
  * regression in round cost is attributable to a PATH change (DRed vs
  * link-restricted recompute) rather than guessed at.
  *
  * NOTE: the scenario (base schema, rules, sentinel arithmetic) MIRRORS
  * ScaleCheck's `negProbe` by intent — if you tune the probe there,
  * tune this to match, or the profiler stops explaining the probe. */
object ProfileNeg {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(600000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = new graft.iql.Engine(new graft.iql.Catalog(spark))
    e.catalog.register("mbase", spark.range(n).select(
      col("id"), pmod(col("id"), lit(100L)).as("dept"),
      pmod(col("id") * 48271L, lit(500L)).as("sal")).localCheckpoint(true))
    e.run("+nhigh(D) <- mbase(I, D, S), S >= 600\n" +
      "+nview(I, D) <- mbase(I, D, S), !nhigh(D), I % 997 = 0")
    e.run("?nview(I, D)").last.count()
    var i = 0
    def round(): Unit = {
      val prev = s"-mbase(${9100000 + i - 1}, ${(i + 99) % 100}, 600)\n"
      val stmt = (if (i == 0) "" else prev) +
        s"+mbase[(${9100000 + i}, ${i % 100}, 600)]"
      val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      e.run(stmt)
      val t1 = System.nanoTime()
      val rows = e.run("?nview(I, D)").last.count()
      val t2 = System.nanoTime()
      val jobs1 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      println(f"round $i: mutate=${(t1 - t0) / 1e9}%.3f requery=${(t2 - t1) / 1e9}%.3f " +
        f"rows=$rows jobs=${jobs1 - jobs0} link=${e.linkMaintains} " +
        f"maintained=${e.maintainedCount} retire=${e.viewRetirements}")
      i += 1
    }
    (0 until rounds).foreach(_ => round())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase times + job counts for the over-cap aggregate-lower
  * stacked maintenance round (the ScaleCheck `stacked_agg_lower_requery`
  * scenario): a 600k-group aggregate lower view whose support table
  * exceeds the driver-resident cap feeds an ungrouped top_k upper view;
  * each riding round deletes 20 base tuples and re-queries the upper. */
object ProfileStackedAgg {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 600000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-stacked-agg")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def phase[A](name: String)(body: => A): A = {
      val tracker = spark.sparkContext.statusTracker
      val j0 = tracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime
      val r = body
      val sec = (System.nanoTime - t0) / 1e9
      val dj = tracker.getJobIdsForGroup(null).length - j0
      println(f"[profile] $name%-34s ${sec}%8.3f s  jobs +$dj")
      r
    }
    (1 to 2).foreach { round =>
      println(s"=== run $round (n=$n) ===")
      val e = new graft.iql.Engine(new graft.iql.Catalog(spark))
      e.catalog.register("pbase", spark.range(n).select(
        col("id"), pmod(col("id"), lit(100L)).as("dept"),
        pmod(col("id") * 48271L, lit(500L)).as("sal")).localCheckpoint(true))
      phase("rules + materialize")(e.run(
        "+plow(I, sum<S>, count<S>) <- pbase(I, D, S)\n" +
        "+pup(top_k<5, I, T:desc>) <- plow(I, T, C)\n" +
        "?plow(I, T, C)\n?pup(I, T)\n").last.count())
      def batch(lo: Long): String = (lo until lo + 20L)
        .map(i => s"($i, ${i % 100}, ${(i * 48271) % 500})").mkString(",")
      phase("round1 delete (seeds)")(e.run(s"-pbase[${batch(0L)}]"))
      phase("round1 query")(e.run("?pup(I, T)").last.count())
      Seq(100L, 200L, 300L).zipWithIndex.foreach { case (lo, i) =>
        phase(s"round${i + 2} delete (riding)")(e.run(s"-pbase[${batch(lo)}]"))
        phase(s"round${i + 2} query")(e.run("?pup(I, T)").last.count())
      }
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudicator for the stacked_agg_lower_requery_100x ratio: runs the
  * exact ScaleCheck probe shape (over-cap agg lower + top_k upper,
  * riding rounds on the carrier) at 60k and 6M groups THREE times each
  * and prints every riding round's seconds plus the round's job count —
  * separating a real 100x slope term (job counts or every-round time
  * grows) from capture jitter (one slow sample skewing a median). */
object ProfileStackedAgg100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tracker = spark.sparkContext.statusTracker
    def maxJob: Int = {
      val ids = tracker.getJobIdsForGroup(null)
      if (ids.isEmpty) 0 else ids.max
    }
    def probe(n: Long): Seq[(Double, Int)] = {
      val e = new graft.iql.Engine(new graft.iql.Catalog(spark))
      val p = s"/tmp/graft_scale_mbase_$n.parquet"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        spark.range(n).select(
          col("id"), pmod(col("id"), lit(100L)).as("dept"),
          pmod(col("id") * 48271L, lit(500L)).as("sal"))
          .write.mode("overwrite").parquet(p)
      e.catalog.register("pbase", spark.read.parquet(p))
      e.run("+plow(I, sum<S>, count<S>) <- pbase(I, D, S)\n" +
        "+pup(top_k<5, I, T:desc>) <- plow(I, T, C)")
      e.run("?plow(I, T, C)").last.count()
      e.run("?pup(I, T)").last.count()
      def batch(lo: Long): String = (lo until lo + 20L)
        .map(i => s"($i, ${i % 100}, ${(i * 48271) % 500})").mkString(",")
      e.run(s"-pbase[${batch(0L)}]")
      e.run("?pup(I, T)").last.count()
      e.run(s"-pbase[${batch(50L)}]")
      e.run("?pup(I, T)").last.count()
      Seq(100L, 200L, 300L, 400L, 500L).map { lo =>
        val j0 = maxJob
        val t0 = System.nanoTime()
        e.run(s"-pbase[${batch(lo)}]")
        e.run("?pup(I, T)").last.count()
        ((System.nanoTime() - t0) / 1e9, maxJob - j0)
      }
    }
    probe(60000L) // warm
    (1 to 3).foreach { rep =>
      val s1 = probe(60000L)
      val s100 = probe(6000000L)
      def fmt(xs: Seq[(Double, Int)]): String =
        xs.map { case (t, j) => f"$t%.3f/$j" }.mkString(" ")
      println(f"[rep $rep]  60k: ${fmt(s1)}")
      println(f"[rep $rep]   6M: ${fmt(s100)}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where the `topk_retract_requery` ScaleCheck round spends
  * its time at 60k vs 600k base — splits the riding round into the
  * delete statement and the re-query, with Spark job counts per phase
  * (round-11 residual: 1.74x at 10x base where the agg probe is 1.21x). */
object ProfileTopk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-topk")
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

    def run(n: Long, rule: String, query: String, label: String): Unit = {
      println(s"=== $label n=$n ===")
      val e = new graft.iql.Engine(new graft.iql.Catalog(spark))
      e.catalog.register("mbase", spark.range(n).select(
        col("id"), pmod(col("id"), lit(100L)).as("dept"),
        pmod(col("id") * 48271L, lit(500L)).as("sal")).localCheckpoint(true))
      e.run(rule)
      phase("materialize (untimed in SC)")(e.run(query).last.count())
      def batch(lo: Long): String = (lo until lo + 20L)
        .map(i => s"($i, ${i % 100}, ${(i * 48271) % 500})").mkString(",")
      phase("seed round delete")(e.run(s"-mbase[${batch(0L)}]"))
      phase("seed round query")(e.run(query).last.count())
      Seq(100L, 200L, 300L).foreach { lo =>
        phase(s"ride delete lo=$lo")(e.run(s"-mbase[${batch(lo)}]"))
        phase(s"ride query  lo=$lo")(e.run(query).last.count())
        println(s"  counters: rankDec=${e.rankDecrementCount} rankSeeds=${e.rankBufferSeeds} aggDec=${e.aggDecrementCount}")
      }
    }

    val tk = ("+mtk(D, top_k<3, I, S:desc>) <- mbase(I, D, S)", "?mtk(D, I, S)")
    val ag = ("+mtot(D, sum<S>, count<S>, avg<S>) <- mbase(I, D, S)", "?mtot(D, S, C, A)")
    // warm both shapes once (codegen/first-plan costs), then measure
    run(60000L, tk._1, tk._2, "warmup topk")
    run(60000L, tk._1, tk._2, "topk 1x")
    run(60000L, ag._1, ag._2, "agg 1x")
    spark.stop()
  }
}

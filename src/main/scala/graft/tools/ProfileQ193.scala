package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase times + job counts for the q193 agg-under-negation
  * retraction scenario (block a dept -> group death; unblock -> revive)
  * — splits mutation statements from re-queries per round, to compare
  * job counts across commits (r13 watch item: 0.75 -> 1.17 s). */
object ProfileQ193 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-q193")
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
      println(s"=== run $round ===")
      val e = new graft.iql.Engine(new graft.iql.Catalog(spark))
      e.catalog.register("bemp2", graft.sources.Tables.load(spark, dir, "orders").select(
        col("o_orderkey").as("id"),
        pmod(col("o_custkey"), lit(50L)).as("dept"),
        floor(col("o_totalprice")).cast("long").as("sal")))
      phase("rule + first query")(e.run(
        """+bblk[(7)]
          |+bv(D, sum<S>, count<S>) <- bemp2(I, D, S), !bblk(D)
          |?bv(D, S, C)
          |""".stripMargin).last.count())
      phase("round1 insert (block 11)")(e.run("+bblk[(11)]"))
      phase("round1 query (death)")(e.run("?bv(D, S, C)").last.count())
      phase("round2 delete (unblock 7)")(e.run("-bblk[(7)]"))
      phase("round2 query (revive)")(e.run("?bv(D, S, C)").last.count())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase wall time + job counts for the q195 global-agg
  * conditional-delete rounds (round-13: the literal-tombstone path's
  * cost on 15k-row matching sets). */
object ProfileQ195 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val interesting = js.stageInfos.flatMap(_.details.linesIterator)
          .filter(l => l.contains("graft.") || l.contains("localCheckpoint") ||
            l.contains("collect") || l.contains("count"))
          .take(3).mkString(" <- ")
        println(s"[job ${js.jobId}] ${js.stageInfos.headOption.map(_.name).getOrElse("?")} | $interesting")
      }
    })
    def phase[A](name: String)(body: => A): A = {
      val j0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime
      val r = body
      val sec = (System.nanoTime - t0) / 1e9
      val dj = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - j0
      println(f"[profile] $name%-28s ${sec}%8.3f s  jobs +$dj")
      r
    }
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    orders.count()
    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val cat = new graft.iql.Catalog(spark)
      val e = new graft.iql.Engine(cat)
      phase("register")(cat.register("gemp4", orders.select(
        col("o_orderkey").as("id"),
        floor(col("o_totalprice")).cast("long").as("sal"))))
      phase("rule + first ?gtot")(e.run(
        "+gtot(sum<S>, count<S>) <- gemp4(I, S)\n?gtot(S, C)").last.count())
      phase("cond delete 1 (S>400000)")(
        e.run("-gemp4(I, S) <- gemp4(I, S), S > 400000"))
      phase("re-query 1")(e.run("?gtot(S, C)").last.count())
      phase("cond delete 2 (I%7=0)")(
        e.run("-gemp4(I, S) <- gemp4(I, S), I % 7 = 0"))
      phase("re-query 2")(e.run("?gtot(S, C)").last.count())
    }
    spark.stop()
  }
}

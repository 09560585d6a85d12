package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase-by-phase wall time + Spark job counts for the q68
  * conditional-delete round (VERDICT round 12, "What's wrong #2": the
  * 25-row scenario regressed 0.19 → 0.65 s between rounds — pure fixed
  * overhead on the delete path, not a scale term). */
object ProfileQ68 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-q68")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val verbose = sys.env.contains("PROFILE_VERBOSE")
    if (verbose)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val interesting = js.stageInfos.flatMap(_.details.linesIterator)
            .filter(l => l.contains("graft.") || l.contains("localCheckpoint") ||
              l.contains("collect") || l.contains("count"))
            .take(4).mkString(" <- ")
          val nm = js.stageInfos.headOption.map(_.name).getOrElse("?")
          val desc = Option(js.properties)
            .map(p => Option(p.getProperty("spark.job.description")).getOrElse("") +
              " grp=" + Option(p.getProperty("spark.jobGroup.id")).getOrElse(""))
            .getOrElse("")
          println(s"[job ${js.jobId}] $nm | ${desc.take(160)} | $interesting")
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
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val region = spark.read.parquet(s"$dir/region.parquet")
    nation.count(); region.count() // warm footers

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val cat = new graft.iql.Catalog(spark)
      val e = new graft.iql.Engine(cat)
      phase("register") {
        cat.register("nat", nation.select(
          col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long")))
        cat.register("reg", region.select(
          col("r_regionkey").cast("long"), col("r_name")))
      }
      phase("rules + first ?big") {
        e.run(
          """+big(N, R) <- nat(NK, N, RK), reg(RK, R)
            |+big(N, "extra") <- nat(NK, N, RK), NK > 20
            |?big(N, R)
            |""".stripMargin).last.count()
      }
      phase("conditional delete")(
        e.run("-nat(NK, N, RK) <- nat(NK, N, RK), RK = 2"))
      phase("re-query ?big")(e.run("?big(N, R)").last.count())
      println(s"maintained=${e.maintainedCount}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase-by-phase wall time + Spark job counts for the q53
  * incremental re-query path (see VERDICT round 3, "What's wrong #1"). */
object ProfileQ53 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("profile-q53")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val det = js.stageInfos.headOption.map(_.details).getOrElse("")
        val interesting = det.linesIterator
          .filter(l => l.contains("graft.") || l.contains("localCheckpoint") ||
            l.contains("collect") || l.contains("count"))
          .take(4).mkString(" <- ")
        val nm = js.stageInfos.headOption.map(_.name).getOrElse("?")
        println(s"[job ${js.jobId}] $nm | $interesting")
      }
    })
    val tracker = spark.sparkContext.statusTracker
    def jobs(): Int = tracker.getJobIdsForGroup(null).length

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
    val edges = {
      val n = nation.select(col("n_nationkey").cast("int").as("k"))
      n.where(col("k") < 24).select(col("k").as("src"), (col("k") + 1).as("dst"))
        .union(n.where(col("k") + 5 <= 24).select(col("k").as("src"), (col("k") + 5).as("dst")))
    }
    // warm the session (parquet footer reads, codegen)
    edges.count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val cat = new graft.iql.Catalog(spark)
      val e = new graft.iql.Engine(cat)
      phase("register+rules") {
        cat.register("edge", edges)
        e.run("+reach(X, Y) <- edge(X, Y)\n+reach(X, Z) <- reach(X, Y), edge(Y, Z)")
      }
      val r1 = phase("first ?reach")(e.run("?reach(X, Y)").last)
      phase("first collect")(r1.collect())
      phase("+2 edges")(e.run("+edge[(0, 10), (5, 20)]"))
      val r2 = phase("re-query ?reach")(e.run("?reach(X, Y)").last)
      phase("re-collect")(r2.collect())
      println(s"maintained=${e.maintainedCount} totalJobs=${jobs()}")
    }
    spark.stop()
  }
}

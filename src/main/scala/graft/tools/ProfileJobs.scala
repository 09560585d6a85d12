package graft.tools
import org.apache.spark.sql.SparkSession

/** Generic per-query job-count adjudicator: runs each named SparkEntry
  * query twice (run 1 pays codegen; read run 2) and prints the Spark
  * job count plus wall seconds of the second run. Cross-commit usage
  * (the pattern that settled the r13 q191/q193 regressions): run the
  * same names in a worktree at the old commit and at HEAD in one
  * session — equal job counts mean the delta is ambient, a job-count
  * change names the added action. */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileJobs <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tracker = spark.sparkContext.statusTracker
    def maxJob: Int = {
      val ids = tracker.getJobIdsForGroup(null)
      if (ids.isEmpty) 0 else ids.max
    }
    try graft.SparkEntry.warmFixtures(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[profile] warmFixtures: $e") }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        fn(spark, sfDir).count() // run 1: codegen + footer reads
        val j0 = maxJob
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"query":"$name","jobs":${maxJob - j0},"sec":$sec%.3f,"rows":$n}""")
      } catch { case e: Throwable =>
        println(s"""{"query":"$name","error":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}

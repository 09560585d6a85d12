package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: per-job wall time for the minhash-pairs pipeline (q30). */
object ProfileDedupJobs {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-dedup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobTimes = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val det = js.stageInfos.headOption.map(_.details).getOrElse("")
        val site = det.linesIterator.filter(_.contains("graft.")).take(1).mkString
        jobTimes.put(js.jobId, (System.nanoTime, site))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobTimes.get(je.jobId)).foreach { case (t0, site) =>
          println(f"[job ${je.jobId}%3d] ${(System.nanoTime - t0) / 1e9}%7.3f s  $site")
        }
      }
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val t0 = System.nanoTime
      val n = graft.operators.Dedup.minHashPairs(docs).count()
      println(f"minHashPairs total ${(System.nanoTime - t0) / 1e9}%.3f s ($n pairs)")
    }
    spark.stop()
  }
}

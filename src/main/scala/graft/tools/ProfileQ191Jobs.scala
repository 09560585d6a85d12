package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-JOB attribution for q191's delete/re-query rounds —
  * prints each job's first-stage name so added actions are attributable
  * across commits (the ProfileQ191 phase totals can't name the job that
  * appeared). */
object ProfileQ191Jobs {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-q191-jobs")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tracker = spark.sparkContext.statusTracker
    def phase[A](name: String)(body: => A): A = {
      val j0 = tracker.getJobIdsForGroup(null).toSet
      val t0 = System.nanoTime
      val r = body
      val sec = (System.nanoTime - t0) / 1e9
      val jn = tracker.getJobIdsForGroup(null).toSet -- j0
      println(f"[profile] $name%-30s ${sec}%8.3f s  jobs +${jn.size}")
      jn.toSeq.sorted.foreach { jid =>
        tracker.getJobInfo(jid).foreach { ji =>
          val stages = ji.stageIds().flatMap(sid =>
            tracker.getStageInfo(sid).map(si =>
              s"${si.name().takeWhile(_ != '(').trim}:${si.numTasks()}"))
          println(s"    job $jid: ${stages.mkString(" | ")}")
        }
      }
      r
    }
    (1 to 2).foreach { round =>
      println(s"=== run $round ===")
      val e = new graft.iql.Engine(new graft.iql.Catalog(spark))
      e.catalog.register("remp", graft.sources.Tables.load(spark, dir, "orders").select(
        col("o_orderkey").as("id"),
        pmod(col("o_custkey"), lit(50L)).as("dept"),
        pmod(floor(col("o_totalprice")).cast("long"), lit(100000L)).as("sal")))
      phase("rule + first query")(e.run(
        """+rbest(D, top_k<3, I, S:desc>) <- remp(I, D, S)
          |?rbest(D, I, S)
          |""".stripMargin))
      phase("round1 delete (death)")(e.run("-remp(I, D, S) <- remp(I, D, S), D = 7"))
      phase("round1 query (seeds)")(e.run("?rbest(D, I, S)").last.count())
      phase("round2 delete (trim)")(e.run("-remp(I, D, S) <- remp(I, D, S), D = 11, S > 97000"))
      phase("round2 query (slack)")(e.run("?rbest(D, I, S)").last.count())
      phase("round3 delete (deep)")(e.run("-remp(I, D, S) <- remp(I, D, S), D = 13, S > 60000"))
      phase("round3 query (refill)")(e.run("?rbest(D, I, S)").last.count())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: wall time + job counts/descriptions for the q60
  * magic-sets same-generation bench path (VERDICT round 3 next #3). */
object ProfileQ60 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("profile-q60")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val nm = js.stageInfos.headOption.map(_.name).getOrElse("?")
        val det = js.stageInfos.headOption.map(_.details).getOrElse("")
        val interesting = det.linesIterator
          .filter(_.contains("graft.")).take(3).mkString(" <- ")
        println(s"[job ${js.jobId}] $nm | $interesting")
      }
    })
    def phase[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime
      val r = body
      println(f"[profile] $name%-24s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    nation.count()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val cat = new graft.iql.Catalog(spark)
      val e = new graft.iql.Engine(cat)
      val n = nation.select(col("n_nationkey").cast("long").as("k"))
      phase("register") {
        cat.register("person", n.select(col("k")))
        val up = n.where(col("k") >= 1)
          .select(col("k").as("c"), floor((col("k") - 1) / 2).cast("long").as("p"))
        cat.register("up", up)
        cat.register("down", up.select(col("p"), col("c")))
      }
      val df = phase("run ?- sg(1, Y)") {
        e.run(
          """sg(X, X) <- person(X)
            |sg(X, Y) <- up(X, Z1), sg(Z1, Z2), down(Z2, Y)
            |?- sg(1, Y)
            |""".stripMargin).last
      }
      phase("collect")(df.collect())
      println(s"magicRewrites=${e.magicRewrites}")
    }
    spark.stop()
  }
}

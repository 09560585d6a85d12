package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-statement job/time breakdown of the IQL maintenance bench
  * queries (q143-shaped): prints one line per engine statement with the
  * Spark jobs and wall seconds it cost, after an untimed warm run of
  * the same scenario in a fresh engine (codegen/JIT paid). */
object ProfileIqlStatements {
  def main(args: Array[String]): Unit = {
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
    def scenario(label: String, timed: Boolean): Unit = {
      val e = new graft.iql.Engine(new graft.iql.Catalog(spark))
      e.catalog.register("cemp", graft.sources.Tables.load(spark, sfDir, "orders").select(
        col("o_orderkey").as("id"),
        pmod(col("o_custkey"), lit(100L)).as("dept"),
        pmod(floor(col("o_totalprice")).cast("long"), lit(500L)).as("sal")))
      val stmts = Seq(
        "def+query" -> "+cdm(D, count_distinct<S>, sum<S>, count<S>) <- cemp(I, D, S)\n?cdm(D, C, S, N)",
        "ins1" -> "+cemp[(900000001, 0, 77), (900000002, 0, 77), (900000003, 1, 78)]",
        "requery1" -> "?cdm(D, C, S, N)",
        "ins2" -> "+cemp[(900000004, 0, 78), (900000005, 200, 1)]",
        "requery2" -> "?cdm(D, C, S, N)")
      stmts.foreach { case (name, s) =>
        val j0 = maxJob
        val t0 = System.nanoTime()
        val out = e.run(s)
        out.lastOption.foreach(df => if (s.contains("?")) df.count() else ())
        val sec = (System.nanoTime() - t0) / 1e9
        if (timed) println(f"[stmt] $label/$name%-12s jobs=${maxJob - j0}%3d  $sec%6.2f s")
      }
    }
    scenario("warm", timed = false)
    scenario("run", timed = true)
    spark.stop()
  }
}

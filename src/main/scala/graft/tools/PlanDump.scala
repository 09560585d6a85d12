package graft.tools
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` of named SparkEntry queries to files —
  * the optimization-round evidence artifact (`plans/rNN/<q>_<tag>.txt`).
  * Usage: PlanDump <outDir> <tag> <queryName>...
  * Fixtures are warmed first so index-backed queries plan against the
  * same stored layouts the bench sees. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <queryName>...")
    val outDir = args(0); val tag = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    try graft.SparkEntry.warmFixtures(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[plandump] warmFixtures: $e") }
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $name ($tag)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}

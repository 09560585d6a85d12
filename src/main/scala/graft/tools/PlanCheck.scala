package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan-quality audit: prints, for each named query, whether the scan
  * shows pushed filters / pruned columns and which join strategies the
  * optimizer picked. Run:
  *   sbt "runMain graft.tools.PlanCheck q01_filter_project q04_join3_arith"
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).toSeq
        .filterNot(_.contains("[]"))
      val reads = "ReadSchema: [^,\n]+".r.findAllIn(plan).toSeq
      val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct")
        .map(j => j -> j.r.findAllIn(plan).length).filter(_._2 > 0)
      // SimpleMode marks codegen stages as `*(n)` prefixes
    val codegen = ("WholeStageCodegen".r.findAllIn(plan).length +
      "\\*\\(\\d+\\)".r.findAllIn(plan).toSeq.distinct.length)
      println(s"== $name")
      pushed.foreach(p => println(s"   $p"))
      reads.foreach(r => println(s"   $r"))
      joins.foreach { case (j, n) => println(s"   $j x$n") }
      println(s"   WholeStageCodegen spans: $codegen")
    }
    spark.stop()
  }
}

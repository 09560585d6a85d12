package graft.server

import org.apache.spark.sql.SparkSession

/** Standalone server entry point (reference `src/main.rs` serves on
  * port 8080 by default, `src/protocol/mod.rs:44`). Usage:
  * `runMain graft.server.ServerMain [port]`. */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8080)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new WireServer(spark, port)
    println(s"graft wire server listening on port ${server.actualPort} " +
      "(GET /health, GET /metrics, POST /query, WS /ws)")
    Thread.currentThread().join() // serve until killed
  }
}

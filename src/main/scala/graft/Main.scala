package graft

import org.apache.spark.sql.SparkSession
import graft.iql.{Repl, Session}

/** Interactive REPL over the IQL engine (reference: the inputlayer CLI —
  * dot commands + IQL statements, results as tables). Reads statements
  * from stdin, one per line; multi-line programs end with an empty line.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val session = new Session(spark)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    print("iql> "); Console.flush()
    var line = in.readLine()
    // .exit is the reference CLI's alias for .quit (`src/main.rs:50`)
    while (line != null && line.trim != ".quit" && line.trim != ".exit") {
      if (line.trim.nonEmpty) {
        try session.execute(line).foreach {
          case Repl.Text(lines) => lines.foreach(println)
          case Repl.Table(df) =>
            val rows = df.limit(1000).collect()
            println(df.columns.mkString("(", ", ", ")"))
            rows.foreach { r =>
              val cells = r.toSeq.map {
                // dynamic (AnyValue) cells print their plain value
                case ar: org.apache.spark.sql.Row if graft.iql.AnyValue.isAnyRow(ar) =>
                  graft.iql.AnyValue.decode(ar)
                case other => other
              }
              println(cells.mkString("(", ", ", ")"))
            }
            println(s"${rows.length} row(s)")
        } catch {
          case e: Exception => println(s"error: ${e.getMessage}")
        }
      }
      print("iql> "); Console.flush()
      line = in.readLine()
    }
    spark.stop()
  }
}

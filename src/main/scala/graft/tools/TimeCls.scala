package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimeCls {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (it <- Seq(0, 0, 8, 8)) {
      val t0 = System.nanoTime()
      val out = graft.operators.TextAnalysis.qualityClassifierScores(docs,
        col("lang") === "en", iters = it)
      out.count()
      println(f"[t] iters=$it total=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}

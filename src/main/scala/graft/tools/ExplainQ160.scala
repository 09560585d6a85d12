package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainQ160 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val out = graft.operators.TextAnalysis.qualityClassifierScores(docs,
      org.apache.spark.sql.functions.col("lang") === "en")
    println(s"[t] build+train: ${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime()
    out.count()
    println(s"[t] score: ${(System.nanoTime()-t1)/1e9}")
    out.explain("formatted")
    spark.stop()
  }
}

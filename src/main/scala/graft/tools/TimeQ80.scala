package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.operators.TextAnalysis

/** Stage breakdown for q80/q167 (cluster dedup): candidate pairs
  * (MinHash banded), exact-verify jaccard, connected components, and
  * the full queries — warm second round printed. */
object TimeQ80 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      def t(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        if (round == 2) println(f"[t] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      t("pairs") { noop(Dedup.ngramJaccardPairs(docs, shingleN = 2, threshold = 0.3)) }
      t("cc+anti(q80)") {
        val pairs = Dedup.ngramJaccardPairs(docs, shingleN = 2, threshold = 0.3)
        Dedup.clusterSurvivors(docs, pairs).select(col("doc_id")).count()
      }
      t("q167") {
        val pairs = Dedup.ngramJaccardPairs(docs, shingleN = 2, threshold = 0.3)
        val rank = TextAnalysis.tokenCounts(docs).select(col("doc_id"), col("n_tokens"))
        Dedup.clusterSurvivorsBest(docs, pairs, rank).select(col("doc_id")).count()
      }
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Stage breakdown for the margin-mining family (q181): times the pair
  * cosine scan alone, one ranked window branch, and the full miner —
  * warm (2nd round printed). */
object TimeMargin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val a = emb.where(pmod(col("vec_id"), lit(2L)) === 0)
    val b = emb.where(pmod(col("vec_id"), lit(2L)) === 1)
    val pa = a.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val pb = b.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    def pairs = pa.crossJoin(broadcast(pb))
      .select(col("a_id"), col("b_id"),
        VF.cosineSimilarity(col("av"), col("bv")).as("cos"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val wa = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id").asc)
    def rankedA = pairs.withColumn("ra", row_number().over(wa)).where(col("ra") <= 4)
    def full = graft.operators.Similarity.marginMining(a, b, k = 4, tau = 1.0)
    for (round <- 1 to 2) {
      def t(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        if (round == 2) println(f"[t] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      t("pairs-noop") { noop(pairs) }
      t("rankedA") { noop(rankedA) }
      t("rankedA-agg") { noop(rankedA.groupBy("a_id").agg(avg("cos").as("da"))) }
      t("full") { full.count() }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Dev probe: duplicateSpans stage costs at sf0.1. */
object ProfileSpans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    val k = 20
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      def gramsPlan = docs
        .select(col("doc_id").as("id"),
          posexplode(TF.kgramHashes(TF.normText(col("text")), k)).as(Seq("pos0", "h")))
        .select(col("id"), (col("pos0") + 1).cast("long").as("pos"), col("h"))
      time("gram count")(println(gramsPlan.count()))
      val ck = time("mat grams")(gramsPlan.localCheckpoint(true))
      time("common from ck") {
        println(ck.groupBy("h").agg(count_distinct(col("id")).as("df"))
          .where(col("df") >= 2).count())
      }
      time("full spans WITH mat") {
        val grams = gramsPlan.localCheckpoint(true)
        val common = grams.groupBy("h").agg(count_distinct(col("id")).as("df"))
          .where(col("df") >= 2).select("h")
        val dup = grams.join(common, Seq("h"), "left_semi")
        val w = Window.partitionBy("id").orderBy("pos")
        println(dup
          .withColumn("__nb", when(coalesce(col("pos") - lag(col("pos"), 1).over(w),
            lit(Long.MaxValue)) > k, 1).otherwise(0))
          .withColumn("__island", sum(col("__nb")).over(w))
          .groupBy(col("id"), col("__island"))
          .agg(min(col("pos")), max(col("pos")), count(lit(1))).count())
      }
      time("full spans NO mat") {
        val grams = gramsPlan
        val common = grams.groupBy("h").agg(count_distinct(col("id")).as("df"))
          .where(col("df") >= 2).select("h")
        val dup = grams.join(common, Seq("h"), "left_semi")
        val w = Window.partitionBy("id").orderBy("pos")
        println(dup
          .withColumn("__nb", when(coalesce(col("pos") - lag(col("pos"), 1).over(w),
            lit(Long.MaxValue)) > k, 1).otherwise(0))
          .withColumn("__island", sum(col("__nb")).over(w))
          .groupBy(col("id"), col("__island"))
          .agg(min(col("pos")), max(col("pos")), count(lit(1))).count())
      }
    }
    spark.stop()
  }
}

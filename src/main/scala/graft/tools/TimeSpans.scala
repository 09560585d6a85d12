package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** A/B harness for duplicateSpans shapes (q134/q150): current
  * (mat + groupBy + semi-join), no-mat (recompute grams per consumer),
  * window-based (single consumption, min/max over h-window). Prints
  * warm seconds + result checksum so variants prove equal. */
object TimeSpans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val k = 20
    def gramsOf(d: DataFrame): DataFrame = d
      .select(col("doc_id").as("id"),
        posexplode(TF.kgramHashes(TF.normText(col("text")), k)).as(Seq("pos0", "h")))
      .select(col("id"), (col("pos0") + 1).cast("long").as("pos"), col("h"))
    def islands(dup: DataFrame): DataFrame = {
      val w = Window.partitionBy("id").orderBy("pos")
      dup
        .withColumn("__nb",
          when(coalesce(col("pos") - lag(col("pos"), 1).over(w), lit(Long.MaxValue)) > k, 1)
            .otherwise(0))
        .withColumn("__island", sum(col("__nb")).over(w))
        .groupBy(col("id"), col("__island"))
        .agg(min(col("pos")).as("span_start"),
          (max(col("pos")) + lit(k - 1)).as("span_end"),
          count(lit(1)).as("n_grams"))
        .select(col("id"), col("span_start"), col("span_end"), col("n_grams"))
    }
    def current(): DataFrame = graft.operators.Dedup.duplicateSpans(docs)
    def noMat(): DataFrame = {
      val grams = gramsOf(docs)
      val common = grams.groupBy("h").agg(min(col("id")).as("__a"), max(col("id")).as("__b"))
        .where(col("__a") < col("__b")).select("h")
      islands(grams.join(common, Seq("h"), "left_semi"))
    }
    def windowed(): DataFrame = {
      val grams = gramsOf(docs)
      val wh = Window.partitionBy("h")
      islands(grams
        .withColumn("__a", min(col("id")).over(wh))
        .withColumn("__b", max(col("id")).over(wh))
        .where(col("__a") < col("__b"))
        .select(col("id"), col("pos"), col("h")))
    }
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("span_end") - col("span_start") + col("n_grams"))).head()
      (r.getLong(0), r.getLong(1))
    }
    Seq("current" -> (() => current()), "noMat" -> (() => noMat()),
        "windowed" -> (() => windowed()), "current2" -> (() => current()),
        "noMat2" -> (() => noMat()), "windowed2" -> (() => windowed())).foreach {
      case (name, f) =>
        val t0 = System.nanoTime()
        val s = sig(f())
        println(f"[t] $name%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s  sig=$s")
    }
    // stage breakdown of the current shape (r16): where do the ~2.5 s go?
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      def t(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        if (round == 2) println(f"[t] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      t("grams-noop") { noop(gramsOf(docs)) }
      t("grams-mat") {
        val ck = gramsOf(docs).localCheckpoint(true); ck.rdd.count(); ()
      }
      val ck = gramsOf(docs).localCheckpoint(true)
      t("agg-common") {
        noop(ck.groupBy("h").agg(min(col("id")).as("__a"), max(col("id")).as("__b"))
          .where(col("__a") < col("__b")).select("h"))
      }
      val common = ck.groupBy("h").agg(min(col("id")).as("__a"), max(col("id")).as("__b"))
        .where(col("__a") < col("__b")).select("h")
      t("semi-join") { noop(ck.join(common, Seq("h"), "left_semi")) }
      t("islands") { noop(islands(ck.join(common, Seq("h"), "left_semi"))) }
    }
    spark.stop()
  }
}

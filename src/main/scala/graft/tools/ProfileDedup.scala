package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{TextFunctions => TF}

/** Stage-by-stage timing of the MinHash dedup pipeline (dev tool). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val (shingleN, k, bands) = (5, 64, 16)
    val rowsPerBand = k / bands

    val sigsPlan = graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text", shingleN, k)
    val sigs = time("signatures materialize")(sigsPlan.localCheckpoint(true))
    val banded = sigs.select(col("id"),
        explode(TF.minHashBands(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .localCheckpoint(true)
    time("banding")(println(banded.count()))
    // bucket size distribution
    val sizes = banded.groupBy("band", "bucket").count()
    time("bucket histogram")(sizes.select(sum(col("count") * (col("count") - 1) / 2)).show())
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candPairs = a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct().localCheckpoint(true)
    time("candidate pairs")(println(candPairs.count()))
    val withSigs = candPairs
      .join(broadcast(sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))), Seq("id_a"))
      .join(broadcast(sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TF.minHashJaccardEstimate(col("sig_a"), col("sig_b")).as("jaccard_est"))
      .where(col("jaccard_est") >= 0.35)
    time("estimate + filter")(println(withSigs.count()))
    spark.stop()
  }
}

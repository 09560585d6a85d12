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

    // embedding-cosine pipeline (q36 shape)
    val emb = Tables.load(spark, sfDir, "embeddings").localCheckpoint(true)
    println("embeddings=" + emb.count())
    time("q36 cold")(println(graft.operators.Dedup.embeddingCosinePairs(
      emb, dim = 64, minCosine = 0.8).count()))
    time("q36 warm")(println(graft.operators.Dedup.embeddingCosinePairs(
      emb, dim = 64, minCosine = 0.8).count()))
    val bucketed = emb.select(col("vec_id").as("id"),
      explode(graft.functions.LshFunctions.lshMultiProbe(col("embedding"), 64, 4, 12)).as("tb"))
      .select(col("id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
      .localCheckpoint(true)
    time("q36 bucketing alone")(println(bucketed.count()))
    val ea = bucketed.select(col("table"), col("bucket"), col("id").as("id_a"))
    val eb = bucketed.select(col("table"), col("bucket"), col("id").as("id_b"))
    val pairs = ea.join(eb, Seq("table", "bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct().localCheckpoint(true)
    time("q36 pair join alone")(println("pairs=" + pairs.count()))
    // verify stage in isolation: unit vectors + 2 joins + dot + filter
    import graft.functions.{VectorKernels => VK}
    val t0 = System.nanoTime()
    val vs = emb.select(col("vec_id").as("id"),
      VK.unit(col("embedding")).as("v")).localCheckpoint(true)
    println(f"q36 unitVectors: ${(System.nanoTime() - t0) / 1e9}%.2f s (${vs.count()})")
    time("q36 verify joins+dot")(println(pairs
      .join(broadcast(vs.select(col("id").as("id_a"), col("v").as("v_a"))), Seq("id_a"))
      .join(broadcast(vs.select(col("id").as("id_b"), col("v").as("v_b"))), Seq("id_b"))
      .select(VK.dot(col("v_a"), col("v_b")).as("c")).where(col("c") >= 0.8).count()))
    // planning vs execution split for the full pipeline
    val full = graft.operators.Dedup.embeddingCosinePairs(emb, dim = 64, minCosine = 0.8)
    time("q36 planning only")(full.queryExecution.executedPlan)
    time("q36 execute after planning")(println(full.count()))
    time("q36 execute SAME df again")(println(full.count()))
    val full2 = graft.operators.Dedup.embeddingCosinePairs(emb, dim = 64, minCosine = 0.8)
    time("q36 fresh df third time")(println(full2.count()))
    val planStr = full2.queryExecution.executedPlan.toString()
    Seq("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
      "CartesianProduct", "Exchange", "Generate").foreach(k =>
      println(s"q36 plan $k x" + k.r.findAllIn(planStr).length))
    spark.stop()
  }
}

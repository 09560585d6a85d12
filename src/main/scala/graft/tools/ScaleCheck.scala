package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup

/** Scale-up probe: times MinHash near-dup pairs on 1× and 10× document
  * volumes (ids offset per copy, so every doc gains 9 exact copies —
  * duplicate CLIQUES whose pair count grows quadratically; the worst
  * case for candidate volume). Measured at sf0.1 on local[32] with the
  * one-pass FNV-1a signature UDF + codegen'd agreement kernel:
  *   1×  (5k docs):     2,740 pairs in 2.0 s
  *   10× (50k docs):  499,000 pairs in 5.0 s
  * (round-2 explode/aggregate pipeline: 4.5 s / 80 s on the same data)
  * → 182× more output pairs for 2.5× more wall time: the pipeline is
  * OUTPUT-SENSITIVE (cost tracks docs + emitted pairs, not docs²),
  * which is the scaling property that matters at 100 TB — shuffle and
  * signature costs amortize while the candidate join only pays for
  * buckets that actually collide. */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents").localCheckpoint(true)
    val n = docs.count()
    val docs10 = (0 until 10).map(i => docs.select(
      (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _).repartition(32).localCheckpoint(true)
    println(s"docs=1x:$n 10x:${docs10.count()}")
    // warm both plans once, then measure
    Dedup.minHashPairs(docs, threshold = 0.35).count()
    time("minhash 1x (5k docs)")(
      println("pairs=" + Dedup.minHashPairs(docs, threshold = 0.35).count()))
    time("minhash 10x (50k docs)")(
      println("pairs=" + Dedup.minHashPairs(docs10, threshold = 0.35).count()))
    // cluster dedup at 10×: 499k pairs → ~1M undirected edges, under
    // the CC-specific local cap (union-find memory is input-linear, no
    // TC-style output blowup), so components solve on the driver; the
    // measured time is dominated by re-executing the lazy pair plan
    // (~3.7 s each for the two consumers). Forcing the old 200k cap
    // here cost 24 s in the distributed min-label loop — per-iteration
    // fixed costs that only amortize at real data volume.
    time("cluster dedup 10x") {
      val pairs = Dedup.minHashPairs(docs10, threshold = 0.35)
        .select(col("id_a"), col("id_b"))
      println("survivors=" + Dedup.clusterSurvivors(docs10, pairs).count())
    }
    // round-7 corpus stats at 10×: per-group percentile state is a
    // bounded value→count map, so cost should track rows, not groups²
    val docsLang = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val docsLang10 = (0 until 10).map(i => docsLang.select(
      (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"), col("lang")))
      .reduce(_ union _).repartition(32).localCheckpoint(true)
    graft.operators.TextAnalysis.lengthDistribution(docsLang).count() // warm
    time("quantiles 1x")(
      graft.operators.TextAnalysis.lengthDistribution(docsLang).count())
    time("quantiles 10x")(
      graft.operators.TextAnalysis.lengthDistribution(docsLang10).count())
    time("vocab sketch 10x")(
      graft.operators.TextAnalysis.vocabularyApprox(docsLang10).count())
    spark.stop()
  }
}

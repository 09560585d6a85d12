package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Dev probe: where does decontaminateBloom's time go at sf0.1? */
object ProfileBloom {
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
    val benchmark = docs.where(pmod(col("doc_id"), lit(20L)) === 0)
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val benchHashes = benchmark
        .select(TF.tokens(col("text")).as("__toks"))
        .select(explode(array_distinct(TF.wordShingleHashes(col("__toks"), 3))).as("sh"))
        .distinct()
      val n = time("bench count")(math.max(1L, benchHashes.count()))
      val bf = time("bf build")(benchHashes.stat.bloomFilter("sh", n, 1e-12))
      println(s"  n=$n bitSize=${bf.bitSize()}")
      val bcast = spark.sparkContext.broadcast(bf)
      val anyHit = udf { (hs: Seq[Long]) =>
        hs != null && hs.exists(bcast.value.mightContainLong) }
      time("probe withColumn chain") {
        docs.withColumn("__toks", TF.tokens(col("text")))
          .withColumn("__hit", anyHit(TF.wordShingleHashes(col("__toks"), 3)))
          .where(!col("__hit")).count()
      }
      time("probe staged selects") {
        docs.select(col("doc_id"), TF.tokens(col("text")).as("__toks"))
          .select(col("doc_id"), TF.wordShingleHashes(col("__toks"), 3).as("__sh"))
          .select(col("doc_id"), anyHit(col("__sh")).as("__hit"))
          .where(!col("__hit")).count()
      }
      time("no-udf shingle size only") {
        docs.select(col("doc_id"), TF.tokens(col("text")).as("__toks"))
          .select(col("doc_id"), size(TF.wordShingleHashes(col("__toks"), 3)).as("__n"))
          .where(col("__n") >= 0).count()
      }
      val noop = udf { (hs: Seq[Long]) => hs != null && hs.nonEmpty }
      time("noop udf over shingles") {
        docs.select(col("doc_id"), TF.tokens(col("text")).as("__toks"))
          .select(col("doc_id"), noop(TF.wordShingleHashes(col("__toks"), 3)).as("__hit"))
          .where(col("__hit")).count()
      }
      val anyHitArr = udf { (hs: Array[Long]) =>
        hs != null && { var i = 0; var hit = false
          while (!hit && i < hs.length) { hit = bcast.value.mightContainLong(hs(i)); i += 1 }
          hit } }
      time("probe Array[Long] udf") {
        docs.select(col("doc_id"), TF.tokens(col("text")).as("__toks"))
          .select(col("doc_id"), anyHitArr(TF.wordShingleHashes(col("__toks"), 3)).as("__hit"))
          .where(!col("__hit")).count()
      }
      time("probe array-bound shingles (the fix)") {
        docs.withColumn("__hit",
            anyHit(TF.wordShingleHashesOfText(col("text"), 3)))
          .where(!col("__hit")).count()
      }
      time("probe via exploded anti-join shape but udf filter") {
        val withSh = docs.select(col("doc_id"), TF.tokens(col("text")).as("__toks"))
          .select(col("doc_id"),
            explode(array_distinct(TF.wordShingleHashes(col("__toks"), 3))).as("sh"))
        val hitOne = udf { (h: Long) => bcast.value.mightContainLong(h) }
        val contaminated = withSh.where(hitOne(col("sh"))).select(col("doc_id")).distinct()
        docs.join(contaminated, Seq("doc_id"), "left_anti").count()
      }
    }
    spark.stop()
  }
}

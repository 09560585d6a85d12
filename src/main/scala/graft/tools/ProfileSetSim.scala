package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Stage-by-stage timing of the exact set-similarity self-join on the
  * documents table — which phase of the PPJoin pipeline dominates. */
object ProfileSetSim {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm: parquet footers + codegen
    docs.count()
    val tk = time("tokenize+checkpoint") {
      val t = docs
        .select(col("doc_id").as("id"), array_distinct(TF.tokens(col("text"))).as("tk"))
        .where(size(col("tk")) > 0)
        .select(col("id"), transform(col("tk"), t => xxhash64(t)).as("th"))
        .localCheckpoint(true)
      t.count(); t
    }
    val toks = tk.select(col("id"), explode(col("th")).as("h"))
    val num = 1; val den = 2
    def floorDivC(x: org.apache.spark.sql.Column, d: Int) =
      ((x - pmod(x, lit(d.toLong))) / d).cast("long")
    val ranked = time("rank table") {
      val dfTab = toks.groupBy("h").agg(count(lit(1)).as("df"))
      val rankRdd = dfTab.orderBy("df", "h").select(col("h")).rdd
        .zipWithIndex.map { case (row, idx) => org.apache.spark.sql.Row(row.getLong(0), idx) }
      val r = spark.createDataFrame(rankRdd,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("r", org.apache.spark.sql.types.LongType))))
        .localCheckpoint(true)
      r.count(); r
    }
    val sets = time("sets table") {
      val s = toks.join(ranked, Seq("h"))
        .groupBy("id").agg(sort_array(collect_list(col("r"))).as("ra"))
        .select(col("id"), col("ra"), size(col("ra")).cast("long").as("len"))
        .withColumn("pl",
          col("len") - floorDivC(col("len") * num + (den - 1), den) + 1)
        .localCheckpoint(true)
      s.count(); s
    }
    val prefix = sets
      .select(col("id"), col("len"), posexplode(slice(col("ra"), lit(1), col("pl"))))
      .select(col("id"), col("len"),
        (col("pos") + 1).cast("long").as("rn"), col("col").as("r"))
    val ubPos =
      least(col("a.rn"), col("b.rn")) - 1 +
        least(col("a.len") - col("a.rn"), col("b.len") - col("b.rn")) + 1
    val lenSum = col("a.len") + col("b.len")
    val cand = prefix.as("a").join(prefix.as("b"),
      col("a.r") === col("b.r") && col("a.id") < col("b.id") &&
        col("a.len") * num <= col("b.len") * den &&
        col("b.len") * num <= col("a.len") * den &&
        ubPos * (num + den) >= lenSum * num)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.r").as("r"))
    time("join-only count") { println(s"[prof] join rows: ${cand.count()}") }
    val out = cand
      .join(broadcast(sets.select(col("id").as("id_a"), col("ra").as("ra_a"),
        col("len").as("la"))), Seq("id_a"))
      .join(broadcast(sets.select(col("id").as("id_b"), col("ra").as("ra_b"),
        col("len").as("lb"))), Seq("id_b"))
      .withColumn("inter", graft.functions.VectorKernels.setSimCanonInter(
        col("ra_a"), col("ra_b"), col("r"), num, den))
      .where(col("inter") >= 0L)
      .withColumn("uni", col("la") + col("lb") - col("inter"))
      .where(col("inter") * den >= col("uni") * num)
    time("join+verify count") { println(s"[prof] qualifying: ${out.count()}") }
    time("join+verify again") { println(s"[prof] qualifying: ${out.count()}") }
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Parquet table loader for the synthetic star schema (TESTDATA.md).
  * One method so every query names tables uniformly; Catalyst handles
  * column pruning + filter pushdown into these scans.
  */
object Tables {
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** CSV with header + type inference (reference `src/storage/csv.rs`:
    * header row, i64/f64/bool/string inference). */
  def loadCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def saveCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // testdata events.parquet carries TIMESTAMP(NANOS) which Spark's
    // vectorized reader rejects; read nanos as long, then rebuild a real
    // TimestampType column with exact integer arithmetic (`div`, not
    // double division — ns-since-epoch exceeds double's 53-bit mantissa).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // keep the raw nanos column too: range predicates on ts_ns push down
      // to the parquet scan (a filter on the computed timestamp cannot)
      df.withColumn("ts_ns", col("ts"))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once physical layouts that remove shuffles from LATER queries —
  * the 100 TB counterpart of an index build. The IVF/LSH embedding
  * layouts (`partitionBy` over cell/bucket, [[graft.operators.Similarity]])
  * prune SCANS; the bucketed layouts here remove JOIN exchanges: two
  * tables written `bucketBy(n, key)` on the same key with the same
  * bucket count sort-merge-join with ZERO shuffle on either side —
  * Spark's bucketing metadata proves each bucket i of the left only
  * needs bucket i of the right. For a fact table joined on the same key
  * by every query of a workload (orders⋈customer on custkey, events
  * sessionization on user_id), pre-bucketing converts every one of
  * those per-query full-table shuffles into local sorted merges — at
  * 100 TB the single biggest recurring cost in the plan.
  *
  * `sortBy(key)` within buckets additionally lets the merge skip its
  * sort when Spark can use the file ordering. Bucketed tables must go
  * through `saveAsTable` (the bucketing lives in catalog metadata, not
  * the parquet files); `path` makes them EXTERNAL so the data location
  * stays explicit.
  */
object Layouts {

  /** Write `df` as a bucketed external parquet table. Re-running
    * overwrites (layout builds are idempotent). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: String): Unit = {
    val spark = df.sparkSession
    // overwrite of an external table with a changed path can leave a
    // stale catalog entry — drop first, write clean
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  /** The bucketed table as a frame (reads through the catalog so the
    * bucketing metadata reaches the planner — reading the parquet path
    * directly would silently lose it and reintroduce the shuffle). */
  def bucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

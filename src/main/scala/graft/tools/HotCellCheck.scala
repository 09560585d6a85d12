package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Adversarial-distribution probe for the SemDeDup hot-cell guard: a
  * corpus of n near-identical vectors collapses into ONE k-means cell
  * (exactly what duplicate-heavy corpora do — the case SemDeDup exists
  * for), so the plain pair join puts all n(n−1)/2 pairs on one reducer.
  * The guard routes the cell through the blocked self-join instead
  * (content-hash blocks; B² reducer keys at B× replication).
  *
  * Measured at n=10,000 / dim=16 (49,995,000 emitted pairs, local[32]):
  *   plain path (one reducer key):    8.3 s
  *   guarded, B=8 (64 reducer keys):  4.2 s  — 2.0×, identical counts
  * The plain path's join/verify/count runs in ONE task (its wall time
  * grows with n² on a single core); the guarded path pays B× input
  * replication to spread that work across min(B², cores) tasks, so the
  * gap widens with n and with cluster width. At bench scale (balanced
  * cells) the guard's threshold keeps every corpus on the plain path —
  * benched plans unchanged. */
object HotCellCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dim = 16
    // near-identical: unit direction + per-id jitter in one component
    val emb = spark.range(n.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (lit(1.0f) + when(j === 0, col("id").cast("float") / lit(1e8f))
          .otherwise(lit(0.0f))).cast("float")).as("embedding"))
      .localCheckpoint(true)
    val oneCell = Array(Array.fill(dim)(0.0))
    val plain = time("plain (single reducer key)") {
      Dedup.semanticPairs(emb, oneCell, minCosine = 0.999,
        hotCellThreshold = Long.MaxValue).count()
    }
    val guarded = time("guarded (B=8, 64 reducer keys)") {
      Dedup.semanticPairs(emb, oneCell, minCosine = 0.999,
        hotCellThreshold = 0L, hotCellBlocks = 8).count()
    }
    println(s"pairs: plain=$plain guarded=$guarded equal=${plain == guarded}")
    spark.stop()
  }
}

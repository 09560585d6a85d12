package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Trained-IVF similarity search: deterministic k-means coarse
  * quantizer, brute-force equality when probing all cells, recall vs
  * scan-cut tradeoff at partial nprobe, and the partitionBy(cell)
  * layout round-trip (the 100 TB partition-pruning shape). */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    .localCheckpoint(true)
  private lazy val query = emb.where(col("vec_id") === 0)
    .select(col("embedding")).head().getSeq[Float](0)

  test("k-means centroids are deterministic and improve over iterations") {
    val c1 = Similarity.kmeansCentroids(emb, k = 8, iters = 2)
    val c2 = Similarity.kmeansCentroids(emb, k = 8, iters = 2)
    assert(c1.length == 8 && c1(0).length == 64)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) }, "not deterministic")
    // training moves centroids off the initial sample
    val c0 = Similarity.kmeansCentroids(emb, k = 8, iters = 0)
    assert(!c1.zip(c0).forall { case (a, b) => a.sameElements(b) })
  }

  test("all-cells trained-IVF probe equals brute force exactly") {
    val cent = Similarity.kmeansCentroids(emb, k = 8, iters = 2)
    val bf = rows(Similarity.bruteForceTopK(emb, query, 10).select(col("vec_id")))
    val ivf = rows(Similarity.ivfTopKTrained(emb, query, 10, cent,
      nprobe = cent.length).select(col("vec_id")))
    assert(ivf == bf)
  }

  test("partial probe keeps high recall at a fraction of the scan") {
    val cent = Similarity.kmeansCentroids(emb, k = 8, iters = 3)
    val bf = rows(Similarity.bruteForceTopK(emb, query, 10).select(col("vec_id")))
      .map(_.head)
    val ivf = rows(Similarity.ivfTopKTrained(emb, query, 10, cent, nprobe = 3)
      .select(col("vec_id"))).map(_.head)
    val recall = ivf.count(bf).toDouble / bf.size
    assert(recall >= 0.5, s"nprobe=3/8 recall $recall") // coarse but useful
    // pruning is real: the 3 probed cells hold strictly fewer rows than
    // the table (and at least the k candidates returned)
    val assigned = Similarity.ivfAssign(emb, cent).localCheckpoint(true)
    val perCell = assigned.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probedRows = perCell.toSeq.sortBy(_._1).map(_._2)
    assert(perCell.values.sum == emb.count())
    val top3 = perCell.values.toSeq.sorted.takeRight(3).sum
    assert(top3 < emb.count(), s"no pruning: cell sizes $probedRows")
  }

  test("partitionBy(cell) layout round-trips and prunes") {
    val cent = Similarity.kmeansCentroids(emb, k = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf_layout").toString
    Similarity.ivfAssign(emb, cent).write.mode("overwrite")
      .partitionBy("cell").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == emb.count())
    assert(back.select("cell").distinct().count() <= 4)
    // a single-cell read scans only that partition's files
    val oneCell = back.where(col("cell") === 0)
    assert(oneCell.count() < emb.count())
  }
}

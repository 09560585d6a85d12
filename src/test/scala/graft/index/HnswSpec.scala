package graft.index

import graft.SparkSpec

class HnswSpec extends SparkSpec {

  private def mkVecs(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    (0L until n.toLong).map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  private def bruteTopK(vs: Seq[(Long, Array[Float])], idx: Hnsw,
                        q: Array[Float], k: Int): Seq[Long] =
    vs.map { case (id, v) => (id, idx.distance(q, v)) }
      .sortBy(_._2).take(k).map(_._1)

  test("exact on small sets, high recall on larger ones") {
    val vs = mkVecs(500, 32)
    val idx = new Hnsw(32, "cosine")
    vs.foreach { case (id, v) => idx.insert(id, v) }
    val queries = mkVecs(20, 32).map(_._2)
    val recalls = queries.map { q =>
      val exact = bruteTopK(vs, idx, q, 10).toSet
      val approx = idx.search(q, 10, efSearch = 128).map(_._1).toSet
      (exact intersect approx).size.toDouble / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.95, s"mean recall $mean < 0.95")
  }

  test("euclidean metric orders by L2") {
    val idx = new Hnsw(2, "euclidean")
    idx.insert(1L, Array(0f, 0f))
    idx.insert(2L, Array(1f, 0f))
    idx.insert(3L, Array(5f, 5f))
    val r = idx.search(Array(0.1f, 0f), 3).map(_._1)
    assert(r == Seq(1L, 2L, 3L))
  }

  test("deterministic rebuild: same data, same results") {
    val vs = mkVecs(200, 16)
    def build() = {
      val i = new Hnsw(16); vs.foreach { case (id, v) => i.insert(id, v) }; i
    }
    val q = Array.fill(16)(0.3f)
    assert(build().search(q, 5).map(_._1) == build().search(q, 5).map(_._1))
  }

  test("tombstone delete hides ids; save/load round-trips") {
    val vs = mkVecs(100, 8)
    val idx = new Hnsw(8)
    vs.foreach { case (id, v) => idx.insert(id, v) }
    val q = vs(7)._2
    assert(idx.search(q, 1).head._1 == 7L)
    idx.remove(7L)
    assert(idx.search(q, 1).head._1 != 7L)
    val f = java.nio.file.Files.createTempFile("hnsw", ".bin").toString
    idx.save(f)
    val loaded = Hnsw.load(f)
    assert(loaded.size == idx.size)
    assert(loaded.search(q, 3).map(_._1) == idx.search(q, 3).map(_._1))
  }

  test("catalog index lifecycle via meta commands") {
    import spark.implicits._
    val s = new graft.iql.Session(spark)
    val vs = mkVecs(50, 8).map { case (id, v) => (id, v.toSeq) }
    s.catalog.register("emb", vs.toDF("vec_id", "embedding"))
    s.execute(".index create emb vec_id embedding")
    val lines = s.execute(".index list").head.asInstanceOf[graft.iql.Repl.Text].lines
    assert(lines == Seq("emb(embedding)"))
    val probe = s.catalog.hnswSearch("emb", "embedding", vs.head._2.toArray, 5)
    assert(probe.count() == 5)
    assert(probe.head().getLong(0) == 0L) // nearest to itself
    s.execute(".index drop emb embedding")
    assertThrows[IllegalArgumentException](
      s.catalog.hnswSearch("emb", "embedding", vs.head._2.toArray, 5))
  }
}

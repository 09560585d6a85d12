package graft.tools

/** Microbench for driver-held HNSW insert/search throughput — the
  * reference's BENCHMARKS.md:161-162 rows (17,800 vec/s insert at 1k
  * vectors, 1.05 ms search; 7.36 ms at 10k) measured on the same shape:
  * 128-dim cosine, incremental single-vector inserts. */
object HnswThroughput {
  def main(a: Array[String]): Unit = {
    def insertRate(n: Int): Double = {
      val h = new graft.index.Hnsw(128)
      val rnd = new java.util.Random(42)
      val vecs = Array.fill(n)(Array.fill(128)(rnd.nextFloat()))
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { h.insert(i.toLong, vecs(i)); i += 1 }
      n / ((System.nanoTime() - t0) / 1e9)
    }
    def searchMs(n: Int): Double = {
      val h = new graft.index.Hnsw(128)
      val rnd = new java.util.Random(42)
      (0 until n).foreach(i => h.insert(i.toLong, Array.fill(128)(rnd.nextFloat())))
      val qs = Array.fill(200)(Array.fill(128)(rnd.nextFloat()))
      qs.foreach(q => h.search(q, 10)) // warm
      val t0 = System.nanoTime()
      qs.foreach(q => h.search(q, 10))
      (System.nanoTime() - t0) / 1e6 / qs.length
    }
    insertRate(1000) // warm (JIT)
    println(f"insert_1k: ${insertRate(1000)}%.0f vec/s (ref 17,800)")
    println(f"insert_10k: ${insertRate(10000)}%.0f vec/s")
    println(f"search_1k: ${searchMs(1000)}%.3f ms (ref 1.05)")
    println(f"search_10k: ${searchMs(10000)}%.3f ms (ref 7.36)")
  }
}

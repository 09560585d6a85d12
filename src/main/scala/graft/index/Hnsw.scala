package graft.index

import scala.collection.mutable

/** Hierarchical Navigable Small World index over float vectors —
  * independent implementation of the algorithm (Malkov & Yashunin 2016)
  * matching the reference's feature surface (`src/hnsw_index.rs`:
  * metric/m/ef_construction/ef_search options, driver-held index,
  * serialized beside the data).
  *
  * Like the reference, the graph lives in one process (the driver): HNSW
  * is a pointer-chasing structure, the wrong shape to distribute. It
  * serves low-latency point probes over up to ~10M vectors; beyond that
  * the engine's distributed IVF/LSH paths (graft.operators.Similarity)
  * are the 100 TB answer, and a probe can seed a distributed refinement.
  *
  * Determinism: level assignment hashes the insertion id (no RNG state),
  * so rebuilding from the same data yields the same graph everywhere.
  */
final class Hnsw(val dim: Int, val metric: String = "cosine",
                 val m: Int = 16, val efConstruction: Int = 200)
  extends Serializable {

  require(metric == "cosine" || metric == "euclidean" || metric == "dot",
    s"unknown metric $metric")

  private val mMax0 = 2 * m
  private val levelMult = 1.0 / math.log(m.toDouble)

  // node storage: ids, vectors, per-level adjacency
  private val ids = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val levels = mutable.ArrayBuffer.empty[Int]
  /** neighbors(node)(level) = ArrayBuffer[nodeIdx] */
  private val neighbors = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entryPoint: Int = -1
  private var maxLevel: Int = -1
  private val deleted = mutable.HashSet.empty[Int]
  /** id → node index (O(1) removal; re-inserted ids point at the newest
    * node, so removing after a re-insert tombstones the live one). */
  private val idToIdx = mutable.HashMap.empty[Long, Int]

  def size: Int = synchronized { ids.length - deleted.size }

  /** Distance (lower = closer) under the configured metric. */
  def distance(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var l2 = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      val d = x - y; l2 += d * d
      i += 1
    }
    metric match {
      case "euclidean" => math.sqrt(l2)
      case "dot" => -dot
      case _ =>
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den == 0.0) 1.0 else 1.0 - dot / den
    }
  }

  /** Cosine fast path: stored vectors are L2-normalized at [[insert]],
    * so the metric reduces to `1 - dot` and per-hop distance calls skip
    * both norm computations and the sqrt (~3× fewer flops on the build's
    * hot path). Zero vectors stay zero → dot 0 → distance 1, matching
    * the raw-metric den==0 rule. */
  private val isCosine = metric == "cosine"
  private def prep(v: Array[Float]): Array[Float] =
    if (!isCosine) v
    else {
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
      if (n == 0.0 || n == 1.0) v
      else {
        val inv = 1.0 / math.sqrt(n)
        val out = new Array[Float](v.length)
        i = 0
        while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
        out
      }
    }
  /** Distance from a PREPPED query to a stored (prepped) node. */
  private def dist(q: Array[Float], node: Int): Double = {
    val b = vecs(node)
    if (isCosine) {
      var dot = 0.0; var i = 0
      while (i < q.length) { dot += q(i).toDouble * b(i).toDouble; i += 1 }
      1.0 - dot
    } else distance(q, b)
  }

  /** Deterministic level from the id (reference rebuilds reproduce the
    * same index; we get that by hashing instead of RNG). */
  private def levelFor(id: Long): Int = {
    var h = id * -7046029254386353131L + 0x9E3779B97F4A7C15L
    h ^= h >>> 33; h *= -49064778989728563L; h ^= h >>> 33
    val u = ((h >>> 11).toDouble / (1L << 53).toDouble) max 1e-12
    (-math.log(u) * levelMult).toInt
  }

  def insert(id: Long, v0: Array[Float]): Unit = synchronized {
    require(v0.length == dim, s"vector dim ${v0.length} != index dim $dim")
    val v = prep(v0)
    val idx = ids.length
    val lvl = levelFor(id)
    ids += id; vecs += v; levels += lvl; idToIdx(id) = idx
    neighbors += Array.fill(lvl + 1)(mutable.ArrayBuffer.empty[Int])
    if (entryPoint < 0) { entryPoint = idx; maxLevel = lvl; return }

    var ep = entryPoint
    // greedy descent through layers above the new node's level
    var l = maxLevel
    while (l > lvl) { ep = greedyClosest(v, ep, l); l -= 1 }
    // insert at each level from min(lvl, maxLevel) down to 0
    l = math.min(lvl, maxLevel)
    while (l >= 0) {
      val cands = searchLayer(v, ep, efConstruction, l)
      val mAtL = if (l == 0) mMax0 else m
      val selected = cands.take(mAtL)
      selected.foreach { case (_, c) =>
        neighbors(idx)(l) += c
        neighbors(c)(l) += idx
        if (neighbors(c)(l).length > mAtL) shrink(c, l, mAtL)
      }
      ep = cands.head._2
      l -= 1
    }
    if (lvl > maxLevel) { maxLevel = lvl; entryPoint = idx }
  }

  /** Keep the mBound closest neighbors of node at level l. */
  private def shrink(node: Int, l: Int, mBound: Int): Unit = {
    val v = vecs(node)
    val kept = neighbors(node)(l).distinct
      .sortBy(n => dist(v, n)).take(mBound)
    neighbors(node)(l).clear()
    neighbors(node)(l) ++= kept
  }

  private def greedyClosest(q: Array[Float], start: Int, l: Int): Int = {
    var cur = start
    var curDist = dist(q, cur)
    var improved = true
    while (improved) {
      improved = false
      neighbors(cur)(l).foreach { n =>
        val d = dist(q, n)
        if (d < curDist) { cur = n; curDist = d; improved = true }
      }
    }
    cur
  }

  /** Beam search over one layer; returns (dist, node) ascending.
    * `admit` gates RESULT membership only
    * — the frontier always explores through non-admissible nodes, which
    * is what lets [[searchFiltered]] survive selective predicates; the
    * default admits everything, reproducing the classic loop exactly
    * (with admit-all, `res` is seeded and never empty, so every guard
    * degenerates to the textbook condition). */
  private def searchLayer(q: Array[Float], ep: Int, ef: Int, l: Int,
                          admit: Int => Boolean = _ => true): Seq[(Double, Int)] = {
    val visited = mutable.HashSet(ep)
    val epDist = dist(q, ep)
    // candidates: min-heap by dist; results: max-heap (worst first out)
    val cand = mutable.PriorityQueue((-epDist, ep))(Ordering.by(_._1))
    val res = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(_._1))
    if (admit(ep)) res.enqueue((epDist, ep))
    while (cand.nonEmpty) {
      val (negD, c) = cand.dequeue()
      if (res.size >= ef && -negD > res.head._1) cand.clear()
      else neighbors(c)(l).foreach { n =>
        if (visited.add(n)) {
          val d = dist(q, n)
          if (res.size < ef || d < res.head._1) {
            cand.enqueue((-d, n))
            if (admit(n)) {
              res.enqueue((d, n))
              if (res.size > ef) res.dequeue()
            }
          }
        }
      }
    }
    res.toSeq.sortBy(_._1)
  }

  /** k nearest (id, distance) pairs; efSearch ≥ k controls recall.
    * Synchronized with the mutation path: catalog maintenance now
    * inserts/tombstones concurrently with wire-server probes, and an
    * unlocked read of the adjacency buffers during an insert could see
    * torn state. Probes are sub-ms and driver-local, so one lock
    * suffices; a read-write lock is the upgrade path if parallel probe
    * throughput ever matters. */
  def search(q0: Array[Float], k: Int, efSearch: Int = 64): Seq[(Long, Double)] = synchronized {
    if (entryPoint < 0) return Seq.empty
    val q = prep(q0)
    var ep = entryPoint
    var l = maxLevel
    while (l > 0) { ep = greedyClosest(q, ep, l); l -= 1 }
    searchLayer(q, ep, math.max(efSearch, k), 0)
      .filterNot { case (_, n) => deleted(n) }
      .take(k).map { case (d, n) => (ids(n), d) }
  }

  /** FILTERED k-NN: top-k among vectors whose id passes `pred` — the
    * metadata-restricted vector search every production vector store
    * exposes. Traversal explores the graph THROUGH non-matching nodes
    * (post-filtering the plain search would starve under selective
    * predicates: a 1%-selective filter leaves ~0.01·ef admissible rows
    * in the frontier); only matching, live nodes are ADMITTED to the
    * result heap, so `efSearch` budgets MATCHING candidates. With
    * `efSearch` ≥ the index size the layer-0 sweep visits every
    * reachable node and the result EQUALS the filtered brute force —
    * the same exhaustive-twin anchor argument the unfiltered probes
    * use. */
  def searchFiltered(q0: Array[Float], k: Int, efSearch: Int,
                     pred: Long => Boolean): Seq[(Long, Double)] = synchronized {
    if (entryPoint < 0) return Seq.empty
    val q = prep(q0)
    var ep = entryPoint
    var l = maxLevel
    while (l > 0) { ep = greedyClosest(q, ep, l); l -= 1 }
    searchLayer(q, ep, math.max(efSearch, k), 0,
      n => !deleted(n) && pred(ids(n)))
      .sortBy { case (d, n) => (d, ids(n)) }
      .take(k).map { case (d, n) => (ids(n), d) }
  }

  /** Tombstone delete (reference `hnsw_index.rs:33-36`); graph edges stay
    * as navigation waypoints until a rebuild. */
  def remove(id: Long): Boolean = synchronized {
    idToIdx.get(id) match {
      case Some(idx) => deleted.add(idx)
      case None => false
    }
  }

  /** Insert-or-update for catalog-driven maintenance (reference
    * `src/index_manager.rs:84-126` updates indexes when the base relation
    * changes). Same id + same vector → no-op (relation inserts are set
    * semantics, so re-inserting a present tuple must not duplicate the
    * node); same id + different vector → tombstone the old node, insert
    * the new one. */
  def upsert(id: Long, v0: Array[Float]): Unit = synchronized {
    val v = prep(v0)
    idToIdx.get(id).filterNot(deleted) match {
      case Some(old) if java.util.Arrays.equals(vecs(old), v) => ()
      case other =>
        other.foreach(deleted.add)
        insert(id, v0)
    }
  }

  /** Tombstone `id` only when its live stored vector equals `v0` — an
    * exact-tuple delete whose id matches but whose vector does not must
    * leave the index untouched (the relation kept its tuple). */
  def removeMatching(id: Long, v0: Array[Float]): Boolean = synchronized {
    val v = prep(v0)
    idToIdx.get(id).filterNot(deleted) match {
      case Some(idx) if java.util.Arrays.equals(vecs(idx), v) =>
        deleted.add(idx); true
      case _ => false
    }
  }

  /** Fraction of nodes tombstoned — past a threshold the catalog
    * auto-rebuilds (tombstones degrade recall: search draws efSearch
    * candidates BEFORE filtering them). */
  def tombstoneRatio: Double = synchronized {
    if (ids.isEmpty) 0.0 else deleted.size.toDouble / ids.length
  }

  def stats: Map[String, Any] = synchronized { Map(
    "size" -> size, "dim" -> dim, "metric" -> metric, "m" -> m,
    "maxLevel" -> maxLevel, "tombstones" -> deleted.size,
    "tombstoneRatio" -> tombstoneRatio) }

  def save(path: String): Unit = synchronized {
    val oos = new java.io.ObjectOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try oos.writeObject(this) finally oos.close()
  }
}

object Hnsw {
  def load(path: String): Hnsw = {
    val ois = new java.io.ObjectInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(path)))
    try ois.readObject().asInstanceOf[Hnsw] finally ois.close()
  }

  /** The documented capacity of the driver-held graph (scaladoc above:
    * "up to ~10M vectors"). [[build]]/[[buildOpt]] ENFORCE it — past
    * this the collect itself is the OOM, so the guard must fire before
    * the driver holds the data, not after. */
  val DefaultMaxVectors: Long = 10L * 1000 * 1000

  /** Typed refusal for relations past the capacity guard, so callers
    * (the catalog's `createIndex`) can DEGRADE to the distributed ANN
    * layouts instead of pattern-matching on a message string. */
  final class CapacityExceeded(msg: String) extends IllegalArgumentException(msg)

  /** Build from a DataFrame's (id, vector) columns — collected to the
    * driver like the reference's index build (`src/index_manager.rs`).
    * Refuses relations above `maxVectors` (default [[DefaultMaxVectors]])
    * with an error naming the distributed alternatives. */
  def build(df: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
            metric: String = "cosine", m: Int = 16, efConstruction: Int = 200,
            maxVectors: Long = DefaultMaxVectors): Hnsw =
    buildOpt(df, idCol, vecCol, metric, m, efConstruction, maxVectors).getOrElse(
      throw new IllegalArgumentException(
        "cannot build an HNSW index over an empty relation"))

  /** [[build]] that yields None on an empty frame — the auto-rebuild path
    * after deletes may legitimately see an emptied relation. */
  def buildOpt(df: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
               metric: String = "cosine", m: Int = 16,
               efConstruction: Int = 200,
               maxVectors: Long = DefaultMaxVectors): Option[Hnsw] = {
    require(maxVectors > 0, "maxVectors must be positive")
    // capped collect: limit(cap+1) bounds driver memory DURING the
    // fetch (a post-hoc count after an uncapped collect would be the
    // OOM it exists to prevent); cap+1 rows back == the relation is
    // over capacity, and fewer means limit returned everything
    val capProbe = math.min(maxVectors, Int.MaxValue - 2L).toInt + 1
    val rows = df.select(idCol, vecCol).limit(capProbe).collect()
    if (rows.length >= capProbe)
      throw new CapacityExceeded(
        s"HNSW index build refused: relation exceeds $maxVectors vectors. " +
        "The driver-held HNSW graph serves low-latency probes up to ~10M " +
        "vectors; at this scale use the distributed ANN paths instead " +
        "(graft.operators.Similarity: IVF annIvf/annIvfPq, LSH annLsh, " +
        "or knnJoin), or raise maxVectors explicitly if the driver heap " +
        "is provisioned for it.")
    if (rows.isEmpty) None
    else {
      val dim = rows.head.getSeq[Float](1).length
      val idx = new Hnsw(dim, metric, m, efConstruction)
      rows.foreach { r =>
        idx.insert(r.getLong(0), r.getSeq[Float](1).toArray)
      }
      Some(idx)
    }
  }
}

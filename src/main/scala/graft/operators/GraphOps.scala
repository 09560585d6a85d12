package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.Fixpoint

private[operators] final case class RankBarrier(
    df: DataFrame, owned: Option[org.apache.spark.rdd.RDD[_]]) {
  def unpersist(): Unit = owned.foreach(_.unpersist(false))
}

/** Iterative numeric graph algorithms over an edge frame — the
  * power-iteration family (PageRank here; the boolean/min-plus
  * fixpoints live in [[Fixpoint]] and the IQL recursive-aggregate
  * semiring evaluator).
  */
object GraphOps {

  /** One eager checkpoint, re-wrapped with FRESH attribute ids
    * (createDataFrame) so later joins against the same table never
    * become same-exprId self-joins; no count job. */
  private def barrier(df: DataFrame): RankBarrier = {
    val ck = df.localCheckpoint(true)
    RankBarrier(
      ck.sparkSession.createDataFrame(ck.rdd, ck.schema),
      Fixpoint.checkpointRddOf(ck))
  }

  /** LAZY variant: the checkpoint materializes on its consumer's FIRST
    * action instead of spending a dedicated job. Right when the caller
    * immediately runs a cheap scalar action anyway (HITS collects the
    * max of each half-step's sums — that one job now computes, persists,
    * AND reduces), wrong when the first consumer is another barrier's
    * big join (the eager form keeps plan compilation flat there). */
  private def lazyBarrier(df: DataFrame): RankBarrier = {
    val ck = df.localCheckpoint(false)
    RankBarrier(
      ck.sparkSession.createDataFrame(ck.rdd, ck.schema),
      Fixpoint.checkpointRddOf(ck))
  }

  // ───────────────────────────────────────────────────────────────────
  // Driver-local fast path for the power-iteration family — the same
  // size-gated pattern as [[Fixpoint.LocalEdgeRows]] (TC/CC): an
  // iteration of the distributed loop costs 7-9 Spark jobs of pure
  // fixed overhead under AQE (exchange materializations, barrier
  // checkpoints, scalar collects — ProfileJobs r15: q140_hits 56 jobs,
  // q107_pagerank 45 jobs for a 2,000-edge graph), three orders of
  // magnitude more than computing the fixpoint in-process. Below the
  // edge cap we collect the edge list once, replay the IDENTICAL
  // arithmetic driver-side (same decimal(38,30) conversions via
  // Spark's own Decimal class, same value-sorted sequential double
  // folds, same HALF_UP rounding java.math.BigDecimal semantics), and
  // parallelize the result back; above the cap the distributed loop is
  // untouched — that is the 100 TB path, probed by ScaleCheck's
  // pagerank/hits entries at above-gate sizes. GraphOpsSpec pins
  // local == distributed BIT-FOR-BIT (doubleToRawLongBits) on both sum
  // modes, and q107/q140's DuckDB oracle hashes pin the absolute
  // values.
  // ───────────────────────────────────────────────────────────────────

  /** Collects (src, dst) under `cap` rows, or None (over cap / null
    * endpoint — both take the distributed path). The probe is a
    * limit(cap+1), never a full count. */
  private def edgesUnder(e: DataFrame, cap: Long): Option[Array[(Long, Long)]] = {
    if (cap <= 0L) return None
    val rows = e.limit(math.min(cap + 1, Int.MaxValue.toLong).toInt).collect()
    if (rows.length > cap || rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) None
    else Some(rows.map(r => (r.getLong(0), r.getLong(1))))
  }

  /** Replays Spark's `sum(cast(c as decimal(38,30))).cast("double")`:
    * each double converts through [[org.apache.spark.sql.types.Decimal]]
    * (the identical shortest-string BigDecimal conversion + HALF_UP
    * changePrecision the Cast expression runs), sums exactly (same-scale
    * decimal addition is exact and order-independent at these
    * magnitudes), and the final BigDecimal→double is the same
    * correctly-rounded `doubleValue`. */
  private def decimalSum(vals: java.util.ArrayList[Double]): Double = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < vals.size()) {
      val d = org.apache.spark.sql.types.Decimal(vals.get(i))
      // changePrecision returning false is Spark's Cast-to-null case
      // (>= 1e8 integral digits): unreachable for PageRank/HITS values
      // (all bounded by node count), but fail LOUDLY if a future caller
      // exceeds it — silently keeping the unrounded Decimal would
      // diverge from the distributed loop's null-absorbing sum
      require(d.changePrecision(38, 30),
        s"decimalSum contribution ${vals.get(i)} does not fit decimal(38,30)")
      acc = acc.add(d.toJavaBigDecimal)
      i += 1
    }
    acc.doubleValue()
  }

  /** Replays Spark's exactSum aggregate:
    * `aggregate(sort_array(collect_list(c)), 0.0, acc + x)` — ascending
    * IEEE-total-order sort (java.util.Arrays.sort matches Spark's double
    * ordering), then a sequential double fold from 0.0. */
  private def exactSortedSum(vals: java.util.ArrayList[Double]): Double = {
    val arr = new Array[Double](vals.size())
    var i = 0
    while (i < arr.length) { arr(i) = vals.get(i); i += 1 }
    java.util.Arrays.sort(arr)
    var s = 0.0
    i = 0
    while (i < arr.length) { s += arr(i); i += 1 }
    s
  }

  /** Replays Spark's `round(x, 10)` on DoubleType: codegen calls
    * java.math.BigDecimal.valueOf(x).setScale(10, HALF_UP).doubleValue(). */
  private def round10(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(10, java.math.RoundingMode.HALF_UP).doubleValue()

  private def rankSchema(cols: String*): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(cols.head,
        org.apache.spark.sql.types.LongType, nullable = false) +:
      cols.tail.map(c => org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.DoubleType, nullable = false)))

  private def localPageRank(spark: org.apache.spark.sql.SparkSession,
                            edges: Array[(Long, Long)], iters: Int,
                            damping: Double, exactSum: Boolean): DataFrame = {
    val nodeSet = new java.util.LinkedHashSet[Long]()
    edges.foreach { case (u, v) => nodeSet.add(u); nodeSet.add(v) }
    val nodes = new Array[Long](nodeSet.size())
    locally { var i = 0; val it = nodeSet.iterator(); while (it.hasNext) { nodes(i) = it.next(); i += 1 } }
    val n = nodes.length.toLong
    val odeg = new java.util.HashMap[Long, Long]()
    edges.foreach { case (u, _) => odeg.merge(u, 1L, _ + _) }
    val base = (1.0 - damping) / n
    var pr = new java.util.HashMap[Long, Double]()
    nodes.foreach(pr.put(_, 1.0 / n))
    var it0 = 0
    while (it0 < iters) {
      val contribs = new java.util.HashMap[Long, java.util.ArrayList[Double]]()
      edges.foreach { case (u, v) =>
        // identical expression shape to the distributed `pr / odeg`
        // (long promotes to double, one IEEE division per edge row)
        val c = pr.get(u) / odeg.get(u).toDouble
        contribs.computeIfAbsent(v, _ => new java.util.ArrayList[Double]()).add(c)
      }
      val next = new java.util.HashMap[Long, Double]()
      nodes.foreach { v =>
        val lst = contribs.get(v)
        val s =
          if (lst == null) 0.0
          else if (exactSum) exactSortedSum(lst)
          else decimalSum(lst)
        val x = base + damping * s
        next.put(v, if (exactSum) x else round10(x))
      }
      pr = next
      it0 += 1
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(nodes.map(v =>
        org.apache.spark.sql.Row(v, pr.get(v).doubleValue())): _*)
    spark.createDataFrame(rows, rankSchema("node", "pr"))
  }

  private def localHits(spark: org.apache.spark.sql.SparkSession,
                        edges: Array[(Long, Long)], iters: Int,
                        exactSum: Boolean): DataFrame = {
    val nodeSet = new java.util.LinkedHashSet[Long]()
    edges.foreach { case (u, v) => nodeSet.add(u); nodeSet.add(v) }
    val nodes = new Array[Long](nodeSet.size())
    locally { var i = 0; val it = nodeSet.iterator(); while (it.hasNext) { nodes(i) = it.next(); i += 1 } }
    def summed(contribOf: ((Long, Long)) => (Long, Double)): java.util.HashMap[Long, Double] = {
      val m = new java.util.HashMap[Long, java.util.ArrayList[Double]]()
      edges.foreach { e =>
        val (node, c) = contribOf(e)
        m.computeIfAbsent(node, _ => new java.util.ArrayList[Double]()).add(c)
      }
      val out = new java.util.HashMap[Long, Double]()
      nodes.foreach { v =>
        val lst = m.get(v)
        out.put(v,
          if (lst == null) 0.0
          else if (exactSum) exactSortedSum(lst)
          else decimalSum(lst))
      }
      out
    }
    def normalized(raw: java.util.HashMap[Long, Double]): java.util.HashMap[Long, Double] = {
      var mx = java.lang.Double.NEGATIVE_INFINITY
      nodes.foreach { v => val x = raw.get(v); if (x > mx) mx = x }
      val out = new java.util.HashMap[Long, Double]()
      nodes.foreach { v =>
        val norm = if (mx == 0.0) 0.0 else raw.get(v) / mx
        out.put(v, if (exactSum) norm else round10(norm))
      }
      out
    }
    var hNorm = new java.util.HashMap[Long, Double]()
    nodes.foreach(hNorm.put(_, 1.0))
    var aNorm: java.util.HashMap[Long, Double] = null
    var it0 = 0
    while (it0 < iters) {
      val hCur = hNorm
      aNorm = normalized(summed { case (u, v) => (v, hCur.get(u)) })
      val aCur = aNorm
      hNorm = normalized(summed { case (u, v) => (u, aCur.get(v)) })
      it0 += 1
    }
    val hFin = hNorm; val aFin = aNorm
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(nodes.map(v =>
        org.apache.spark.sql.Row(v, hFin.get(v).doubleValue(),
          aFin.get(v).doubleValue())): _*)
    spark.createDataFrame(rows, rankSchema("node", "hub", "authority"))
  }

  /** Fixed-iteration PageRank: PR₀ = 1/N;
    * PRₜ₊₁(v) = (1−d)/N + d·Σ_{(u,v)∈E} PRₜ(u)/outdeg(u).
    * Parallel (duplicate) edges contribute once each; dangling-node
    * mass is dropped (the simplified variant — ranks then sum to < 1,
    * identically on every engine).
    *
    * DETERMINISTIC by construction — two sum modes, one knob:
    *   - default (`exactSum = false`, the 100 TB shape): the per-node Σ
    *     goes through DECIMAL(38,30) — order-independent and
    *     partial-aggregated, so reruns and repartitionings cannot move
    *     the result, with per-double state however hot the node.
    *   - `exactSum = true` (the oracle shape): the per-node Σ is a
    *     SEQUENTIAL fold over the VALUE-SORTED contribution list. Every
    *     double op then has a defined operand order, so an independent
    *     engine (the DuckDB oracle's `list_reduce(list_sort(...))`)
    *     reproduces the fixpoint bit-for-bit with no rounding anywhere.
    *     (Rounding cannot save the decimal mode across engines: clean
    *     decimal inputs land exactly on round-half boundaries where
    *     shortest-string and exact-binary rounding disagree.) State per
    *     node is its in-degree, so this mode is for anchors and
    *     moderate graphs, not power-law hubs.
    *
    * Scale shape: each iteration is one join edges⋈ranks on `src` (both
    * sides hash-partitioned on the same key — AQE reuses the exchange)
    * + one aggregated shuffle on `dst`. Each iteration ends at an eager
    * checkpoint barrier so the plan stays flat (no 5-deep lineage
    * recompiled per action), and each superseded rank table unpersists
    * as soon as the next exists. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst",
               exactSum: Boolean = false,
               localCap: Long = Fixpoint.LocalEdgeRows): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    edgesUnder(e, localCap) match {
      case Some(arr) if arr.nonEmpty =>
        return localPageRank(edges.sparkSession, arr, iters, damping, exactSum)
      case _ => ()
    }
    val nodesM = barrier(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val nodes = nodesM.df
    val n = nodes.count()
    // (src, dst, odeg) is static across iterations — join it once
    // behind the barrier instead of re-shuffling the outdeg aggregate
    // every round. Measured: count-gated broadcasts of the rank side
    // LOSE here (3.5 s vs 2.4 s at 1000 nodes) — per-iteration
    // broadcast build jobs cost more than the small sort-merges they
    // replace, and at big-graph scale the rank table must shuffle-join
    // anyway
    val eod = barrier(e.join(
      e.groupBy("src").agg(count(lit(1)).as("odeg")), Seq("src")))
    val base = lit((1.0 - damping) / n)
    var pr = barrier(nodes.withColumn("pr", lit(1.0 / n)))
    var it = 0
    while (it < iters) {
      val grouped = eod.df
        .join(pr.df.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("pr") / col("odeg")).as("c"))
        .groupBy("node")
      val contrib =
        if (exactSum)
          grouped.agg(aggregate(sort_array(collect_list(col("c"))),
            lit(0.0), (acc, x) => acc + x).as("s"))
        else
          grouped.agg(sum(col("c").cast("decimal(38,30)")).cast("double").as("s"))
      val prNext = base + lit(damping) * coalesce(col("s"), lit(0.0))
      val next = barrier(
        nodes.join(contrib, Seq("node"), "left")
          // the decimal mode pins each iteration to a 10-dp grid so
          // reruns hash identically; the exact mode needs no rounding —
          // every double op already has a defined operand order
          .select(col("node"),
            (if (exactSum) prNext else round(prNext, 10)).as("pr")))
      pr.unpersist()
      pr = next
      it += 1
    }
    val out = pr.df
    eod.unpersist()
    nodesM.unpersist()
    out
  }

  /** Fixed-iteration HITS (Kleinberg): authority aₜ(v) = Σ_{(u,v)∈E}
    * hₜ₋₁(u), hub hₜ(u) = Σ_{(u,v)∈E} aₜ(v), each normalized by its MAX
    * after every half-step. Max normalization instead of the textbook
    * L2: the max of identical doubles is order-independent and needs no
    * global fold — with `exactSum` the whole fixpoint is then
    * bit-reproducible across engines (value-sorted sequential per-node
    * sums + one exactly-rounded division; an L2 norm would need a
    * globally ordered Σx² fold — per-GRAPH driver state). Returns
    * (node, hub, authority).
    *
    * Same two sum modes as [[pageRank]] and the same scale shape: per
    * iteration, two join+aggregated-shuffle pairs (src then dst), each
    * behind a lazy checkpoint barrier whose materializing action IS the
    * per-half-step 1-row max collect (a single aggregated scalar — fine
    * at any graph size), superseded tables unpersisted eagerly.
    * Parallel edges contribute once each; nodes with
    * no in-edges (resp. out-edges) hold authority (resp. hub) 0. */
  def hits(edges: DataFrame, iters: Int, srcCol: String = "src",
           dstCol: String = "dst", exactSum: Boolean = false,
           localCap: Long = Fixpoint.LocalEdgeRows): DataFrame = {
    require(iters >= 1, "need iters >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    edgesUnder(e, localCap) match {
      case Some(arr) if arr.nonEmpty =>
        return localHits(edges.sparkSession, arr, iters, exactSum)
      case _ => ()
    }
    val nodesM = barrier(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val nodes = nodesM.df
    val eM = barrier(e)
    val ed = eM.df
    def summed(contrib: DataFrame, out: String): DataFrame = {
      val g = contrib.groupBy("node")
      val s =
        if (exactSum)
          g.agg(aggregate(sort_array(collect_list(col("c"))),
            lit(0.0), (acc, x) => acc + x).as("s"))
        else
          g.agg(sum(col("c").cast("decimal(38,30)")).cast("double").as("s"))
      nodes.join(s, Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as(out))
    }
    // The max is COLLECTED as a scalar from the just-materialized barrier
    // (one aggregated scan of the checkpoint — a single number, fine at
    // any graph size) and applied as a literal: normalization then costs
    // zero extra jobs at each consumer. The earlier broadcast-crossJoin
    // form re-ran a broadcast-build job (checkpoint scan + agg) at EVERY
    // consumer of the normalized frame — next half-step join AND final
    // output — doubling the per-iteration job count for pure fixed
    // overhead. Division by the collected literal is the identical double
    // op, so both sum modes (and the bit-exact oracle) are unchanged.
    def normalized(raw: DataFrame, valCol: String): DataFrame = {
      val mx = raw.agg(max(col(valCol))).collect()(0)
      val mxV = if (mx.isNullAt(0)) 0.0 else mx.getDouble(0)
      val norm = if (mxV == 0.0) lit(0.0) else col(valCol) / lit(mxV)
      raw.select(col("node"),
        (if (exactSum) norm else round(norm, 10)).as(valCol))
    }
    // the RAW sums materialize (they cost a join + aggregated shuffle);
    // normalization stays LAZY over the checkpoint — one cheap 1-row max
    // scan per half-step, then literal arithmetic at every consumer
    var hRaw: RankBarrier = null
    var aRaw: RankBarrier = null
    var hNorm: DataFrame = nodes.withColumn("h", lit(1.0))
    var aNorm: DataFrame = null
    var it = 0
    while (it < iters) {
      // lazy barrier: normalized()'s max-collect is the materializing
      // job, so each half-step costs ONE job (was barrier + max = two)
      val aM = lazyBarrier(summed(
        ed.join(hNorm.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), col("h").as("c")), "a"))
      if (aRaw != null) aRaw.unpersist()
      aRaw = aM
      aNorm = normalized(aRaw.df, "a")
      val hM = lazyBarrier(summed(
        ed.join(aNorm.withColumnRenamed("node", "dst"), Seq("dst"))
          .select(col("src").as("node"), col("a").as("c")), "h"))
      if (hRaw != null) hRaw.unpersist()
      hRaw = hM
      hNorm = normalized(hRaw.df, "h")
      it += 1
    }
    val out = hNorm.join(aNorm, Seq("node"))
      .select(col("node"), col("h").as("hub"), col("a").as("authority"))
    eM.unpersist()
    nodesM.unpersist()
    out
  }

  /** Per-node triangle counts via DEGREE ORIENTATION — the shape that
    * survives power-law graphs: orient each undirected edge from its
    * (degree, node)-smaller endpoint to the larger, enumerate wedges at
    * each orientation source (pairs of out-neighbors — bounded by the
    * ORIENTED out-degree, O(√m) on any graph, instead of the raw degree
    * a hub would contribute), and close them with a semi-join back into
    * the edge set. The (deg, node) total order makes the orientation
    * acyclic, so every triangle has exactly one vertex with two
    * in-triangle out-edges and is counted exactly once. Shuffles carry
    * only node-id pairs/triples. Self-loops drop; parallel edges count
    * once. Returns (node, n_triangles), nodes in ≥ 1 triangle. */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d"))
    val undM = barrier(e.where(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b")).distinct())
    val und = undM.df
    val deg = und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // a < b in canonical edges, so (deg,node) ties orient a → b
    val orientedM = barrier(und
      .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
      .select(when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v")))
    val o = orientedM.df
    val wedges = o.select(col("u"), col("v").as("v1"))
      .join(o.select(col("u"), col("v").as("v2")), Seq("u"))
      .where(col("v1") < col("v2"))
    val tri = wedges.join(
      und.select(col("a").as("v1"), col("b").as("v2")), Seq("v1", "v2"), "left_semi")
    val out = tri
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .localCheckpoint(true) // materialize, then free the input barriers
    orientedM.unpersist()
    undM.unpersist()
    out
  }

  /** k-CORE membership via synchronous peeling (Matula–Beck / the
    * BSP-style distributed form): `rounds` rounds of "drop every node
    * whose degree in the CURRENT subgraph is < k" over the undirected
    * simple graph, then report survivors whose final degree still
    * clears k with that degree. Each round is a pure function of the
    * previous edge set, so a fixed-round replay is deterministic and
    * exactly reproducible by a chained-CTE oracle; when a round removes
    * nothing the peel has converged and the output IS the k-core
    * (callers pin convergence by checking rounds vs rounds+1).
    *
    * Scale shape: per round one partial-aggregated degree count plus
    * two id-keyed semi-joins — shuffles carry node ids only, and each
    * round ends at an eager checkpoint barrier (flat plans, superseded
    * edge sets unpersist immediately). Peel rounds needed in practice
    * are O(log n) for real graphs; a 1000-executor run does the same
    * rounds with bigger shuffles. */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
            srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d"))
    var cur = barrier(e.where(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b")).distinct())
    // peeling only removes edges, so an unchanged count means the peel
    // has CONVERGED — every further round is a no-op, and skipping them
    // keeps the output identical to the fixed-round unrolled oracle while
    // dropping the per-round barrier + two semi-join jobs. The count is a
    // cheap scan of the just-materialized checkpoint.
    var curCount = cur.df.count()
    var r = 0
    while (r < rounds && curCount > 0) {
      val deg = cur.df.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k)
      val next = barrier(cur.df
        .join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("n").as("b")), Seq("b"), "left_semi"))
      val nextCount = next.df.count()
      cur.unpersist()
      cur = next
      r = if (nextCount == curCount) rounds else r + 1
      curCount = nextCount
    }
    val out = cur.df.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .where(col("degree") >= k)
      .localCheckpoint(true)
    cur.unpersist()
    out
  }

  /** DuckDB replication of [[kCore]]: the same peel unrolled as chained
    * CTEs over `baseSql`'s (src, dst) rows. */
  def kCoreOracleSql(baseSql: String, k: Int, rounds: Int): String = {
    // MATERIALIZED: each round references the previous edge set three
    // times — inlined CTEs would re-expand the whole chain 3^rounds ways
    val peels = (0 until rounds).map { r =>
      s"""k$r AS MATERIALIZED (SELECT n FROM
         |  (SELECT n, count(*) AS deg FROM
         |    (SELECT a AS n FROM e$r UNION ALL SELECT b AS n FROM e$r) GROUP BY n)
         |  WHERE deg >= $k),
         |e${r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e$r e
         |  JOIN k$r ka ON e.a = ka.n JOIN k$r kb ON e.b = kb.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS ($baseSql),
       |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |       FROM raw WHERE src <> dst),
       |$peels
       |SELECT node, count(*) AS degree FROM
       |  (SELECT a AS node FROM e$rounds UNION ALL SELECT b AS node FROM e$rounds)
       |GROUP BY node HAVING count(*) >= $k""".stripMargin
  }
}

package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Semi-naive fixpoint evaluation — the Spark realization of the
  * reference's recursive Datalog strata (reference: semi-naive DD loop
  * `src/code_generator/mod.rs:1033-1250`, specialized transitive-closure
  * path `:424-1002`).
  *
  * Spark has no recursive operator, so recursion is a driver loop over
  * DataFrames. The loop is engineered for scale:
  *  - SEMI-NAIVE: each iteration joins only the delta (new tuples) against
  *    the static relations — never the full accumulator.
  *  - LINEAGE CUT: `localCheckpoint(eager)` per iteration; otherwise the
  *    plan tree grows linearly with graph diameter and planning cost
  *    explodes (the classic iterative-Spark failure mode).
  *  - ONE JOB per iteration: delta count is piggybacked on the checkpoint.
  *  - The accumulator is unioned ONCE per iteration and checkpointed, so
  *    the `except` (anti-join) sees a flat two-table plan, not a
  *    union-of-N; AQE picks broadcast for small deltas at runtime.
  */
object Fixpoint {

  /** Materialize + plan-identity barrier: eager localCheckpoint cuts the
    * lineage (iterative-plan growth), and rebuilding from the RDD gives
    * the result fresh exprIds/dataset identity so iteration-over-the-same
    * -relation self-joins never trip Spark's ambiguity detection. */
  private def materialize(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Transitive closure of an edge relation with columns (src, dst).
    * `reach(x,y) <- edge(x,y); reach(x,z) <- reach(x,y), edge(y,z)`.
    * Right-linear: delta ⋈ edges each iteration; edges are the static
    * side (broadcast when small, shuffle-hash otherwise via AQE). */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 0): DataFrame = {
    val e = materialize(edges.toDF("src", "dst").distinct())
    iterateKeyed(e, delta => {
      val d = delta.toDF("p_src", "p_dst")
      d.join(e, d("p_dst") === e("src"))
        .select(d("p_src").as("src"), e("dst").as("dst"))
    }, maxIter)
  }

  /** Reachable (src, dst) pairs from the given seed nodes only — the
    * magic-sets-restricted variant of [[transitiveClosure]] (reference:
    * bound-query rewrite `src/magic_sets/mod.rs`, `?reach(1,Y)`): the
    * fixpoint explores only the demanded subgraph, which is what turns
    * an O(V·E) closure into a BFS from the seeds. */
  def boundReachability(edges: DataFrame, seeds: DataFrame, maxIter: Int = 0): DataFrame = {
    val e = materialize(edges.toDF("src", "dst").distinct())
    val s = seeds.toDF("src").distinct()
    val base = s.join(e, "src").select(col("src"), col("dst"))
    iterateKeyed(base, delta => {
      val d = delta.toDF("p_src", "p_dst")
      d.join(e, d("p_dst") === e("src"))
        .select(d("p_src").as("src"), e("dst").as("dst"))
    }, maxIter)
  }

  /** Connected components over an undirected edge list: returns
    * (id, component) with component = min reachable id. Large-star /
    * small-star style alternation collapsed to min-propagation. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 0): DataFrame = {
    val sym = edges.toDF("a", "b")
    val und = sym.union(sym.select(col("b"), col("a"))).distinct()
    var labels = materialize(und.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")))
    var changed = true
    var i = 0
    while (changed && (maxIter <= 0 || i < maxIter)) {
      i += 1
      val prop = und.join(labels, und("b") === labels("id"))
        .select(und("a").as("id"), col("comp"))
      val next = materialize(labels.select(col("id"), col("comp")).union(prop)
        .groupBy("id").agg(min("comp").as("comp")))
      changed = !next.as("n").join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.comp") =!= col("o.comp")).isEmpty
      labels = next
    }
    labels
  }

  /** Core semi-naive loop for relations with plain equality-comparable
    * columns. `step` sees only the last delta. */
  def iterateKeyed(base: DataFrame, step: DataFrame => DataFrame, maxIter: Int = 0): DataFrame = {
    val cols = base.columns.toSeq
    var acc = materialize(base.distinct())
    var delta = acc
    var i = 0
    while (!delta.isEmpty && (maxIter <= 0 || i < maxIter)) {
      i += 1
      val candidates = step(delta).toDF(cols: _*).distinct()
      val next = materialize(candidates.join(acc, cols, "left_anti"))
      if (!next.isEmpty) {
        acc = materialize(acc.union(next))
      }
      delta = next
    }
    acc
  }
}

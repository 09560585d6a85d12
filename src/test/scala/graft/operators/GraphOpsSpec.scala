package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("pr")).toMap

  test("pagerank fixes the symmetric cycle and conserves mass without dangling nodes") {
    import spark.implicits._
    val cycle = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = ranks(GraphOps.pageRank(cycle, iters = 7))
    assert(pr == Map(1L -> 0.5, 2L -> 0.5))
    // a 3-cycle (no dangling nodes): total mass stays 1 at every length
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val total = ranks(GraphOps.pageRank(tri, iters = 5)).values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass drifted: $total")
  }

  test("pagerank ranks a hub above its spokes and is deterministic across partitionings") {
    import spark.implicits._
    // star: everyone points at 9, 9 points at 0
    val star = ((0L until 9L).map(i => (i, 9L)) :+ ((9L, 0L))).toDF("src", "dst")
    val pr = ranks(GraphOps.pageRank(star, iters = 10))
    // 9 and 0 trade the bulk of the mass each iteration (9's sole
    // out-edge feeds 0, which feeds it back), so compare each against a
    // plain spoke, not against each other
    assert(pr(9L) > pr(1L) && pr(0L) > pr(1L))
    assert((1L until 9L).forall(i => pr(i) == pr(1L)), "symmetric spokes must tie")
    val repart = ranks(GraphOps.pageRank(star.repartition(7), iters = 10))
    assert(repart == pr, "partitioning changed the decimal-mode fixpoint")
  }

  test("decimal-sum and exact-sum modes agree to float tolerance") {
    import spark.implicits._
    val edges = (0 until 200).map { i =>
      ((i.toLong * 48271 % 65537) % 50, ((i.toLong * 69621 + 12345) % 65537) % 50)
    }.toDF("src", "dst")
    val dec = ranks(GraphOps.pageRank(edges, iters = 5))
    val exa = ranks(GraphOps.pageRank(edges, iters = 5, exactSum = true))
    assert(dec.keySet == exa.keySet)
    dec.foreach { case (n, v) =>
      assert(math.abs(v - exa(n)) < 1e-9, s"node $n: $v vs ${exa(n)}")
    }
    // exact mode is itself reproducible (the oracle contract)
    assert(exa == ranks(GraphOps.pageRank(edges.repartition(5), iters = 5, exactSum = true)))
  }
}

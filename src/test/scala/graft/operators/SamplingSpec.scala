package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Deterministic sampling/shuffle + decontamination: reproducibility is
  * the contract (LCG decisions, not rand()), so every assertion here is
  * exact. The DuckDB oracles (q72-q75) check the same operators against
  * independent SQL. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    .localCheckpoint(true)

  test("deterministic sample is stable across runs and disjoint by salt") {
    val a = rows(Sampling.deterministicSample(docs, "doc_id", 1, 4).select(col("doc_id")))
    val b = rows(Sampling.deterministicSample(docs, "doc_id", 1, 4).select(col("doc_id")))
    assert(a == b, "not reproducible")
    assert(a.nonEmpty && a.size < docs.count(), s"${a.size} of ${docs.count()}")
    val other = rows(Sampling.deterministicSample(docs, "doc_id", 1, 4, salt = 99L)
      .select(col("doc_id")))
    assert(other != a, "salt has no effect")
  }

  test("stratified sample respects per-stratum rates") {
    val stratum = pmod(col("doc_id"), lit(2L))
    val kept = Sampling.stratifiedSample(docs, "doc_id", stratum,
      Seq(0L -> (1, 1), 1L -> (0, 1))) // keep all evens, no odds
    assert(rows(kept.select(col("doc_id"))).forall(_.head.asInstanceOf[Long] % 2 == 0))
    assert(kept.count() == docs.where(pmod(col("doc_id"), lit(2L)) === 0).count())
  }

  test("epoch shuffle is a permutation that changes with the epoch") {
    val e1 = Sampling.epochShuffle(docs, "doc_id", 1L).select("doc_id", "pos")
    val n = docs.count()
    val ps = rows(e1.select(col("pos"))).map(_.head.asInstanceOf[Int])
    assert(ps == (1 to n.toInt).map(i => i).toSet.map((x: Int) => x), "pos not a dense permutation")
    val m1 = rows(e1).map(r => r.head -> r.last).toMap
    val m2 = rows(Sampling.epochShuffle(docs, "doc_id", 2L).select("doc_id", "pos"))
      .map(r => r.head -> r.last).toMap
    assert(m1 != m2, "epoch has no effect")
  }

  test("decontaminate removes exactly the docs sharing a benchmark shingle") {
    val bench = docs.where(col("doc_id") < 5)
    val surviving = Dedup.decontaminate(docs, bench)
    // no survivor shares any word 3-gram with the benchmark (exact check
    // via the string shingles themselves)
    import graft.functions.{TextFunctions => TF}
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(
      explode(TF.wordShinglesOf(TF.tokens(col("text")), 3)).as("g"))
    val overlap = grams(surviving).join(grams(bench), Seq("g")).count()
    assert(overlap == 0, s"$overlap shared shingles survived")
    // benchmark docs themselves are removed (they share their own shingles)
    assert(surviving.join(bench, Seq("doc_id"), "left_semi").count() == 0)
  }

  test("sequence packing assigns prefix-sum bins and per-shard packing resets offsets") {
    import spark.implicits._
    // tokens: 3, 4, 2, 5 → starts 0, 3, 7, 9 → capacity 5: bins 0,0,1,1
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "d e f g", "s1"),
      (3L, "h i", "s1"), (4L, "j k l m n", "s1")).toDF("doc_id", "text", "source")
    val packed = Sampling.packSequences(docs, capacity = 5)
      .select("doc_id", "bin", "bin_off").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 3L), (3L, 1L, 2L), (4L, 1L, 4L)))
    // sharded: each shard packs independently from offset 0
    val sharded = Seq((1L, "a b c", "s1"), (2L, "d e", "s2")).toDF("doc_id", "text", "source")
    val out = Sampling.packSequences(sharded, capacity = 5, shardCol = col("source"))
      .select("doc_id", "bin", "bin_off").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 0L)))
  }
}

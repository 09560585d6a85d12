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

  test("per-source cap keeps at most cap docs per source, deterministically") {
    val capped = Sampling.perSourceCap(docs, "doc_id", col("source"), cap = 5)
    val bySource = capped.groupBy("source").count().collect()
    assert(bySource.forall(_.getLong(1) <= 5), "a source exceeded the cap")
    assert(capped.count() < docs.count(), "cap never cut")
    // deterministic: identical kept set across runs and repartitionings
    val a = rows(capped.select(col("doc_id")))
    val b = rows(Sampling.perSourceCap(docs.repartition(7), "doc_id",
      col("source"), cap = 5).select(col("doc_id")))
    assert(a == b, "kept set depends on layout")
    // the cap admits the smallest splitmix positions within each source
    val posOf = docs.select(col("doc_id"), col("source"),
      Sampling.lcgPos(col("doc_id"), 7L).as("p")).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val keptIds = a.map(_.head.asInstanceOf[Long]).toSet
    posOf.groupBy(_._2._1).foreach { case (_, members) =>
      val expect = members.toSeq.sortBy { case (id, (_, p)) => (p, id) }
        .take(5).map(_._1).toSet
      val got = members.keySet.intersect(keptIds)
      assert(got == expect, s"cap admitted $got, expected $expect")
    }
  }

  test("stratified sample respects per-stratum rates") {
    val stratum = pmod(col("doc_id"), lit(2L))
    val kept = Sampling.stratifiedSample(docs, "doc_id", stratum,
      Seq(0L -> (1, 1), 1L -> (0, 1))) // keep all evens, no odds
    assert(rows(kept.select(col("doc_id"))).forall(_.head.asInstanceOf[Long] % 2 == 0))
    assert(kept.count() == docs.where(pmod(col("doc_id"), lit(2L)) === 0).count())
  }

  test("sampling family fuzz: Spark decisions equal the reference scalar at random params") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val base = (0L until 400L).map(i => (i, 1L + (i * 31 % 97))).toDF("id", "w")
    val rows0 = (0L until 400L).map(i => i -> (1L + (i * 31 % 97))).toMap
    (1 to 8).foreach { _ =>
      val salt = rnd.nextLong()
      val (num, den) = (1 + rnd.nextInt(9), 1 + rnd.nextInt(9))
      // deterministicSample ≡ posOf(id) % den < num
      val ks = Sampling.deterministicSample(base, "id", num, den, salt)
        .select("id").as[Long].collect().toSet
      assert(ks == rows0.keySet.filter(id =>
        Sampling.posOf(id, salt) % den < num), s"detSample salt=$salt $num/$den")
      // ppsSample ≡ posOf(id)·den < w·num·2³¹ (num bounded so w·num < 2³²)
      val ps = Sampling.ppsSample(base, "id", col("w"), num, den * 50, salt)
        .select("id").as[Long].collect().toSet
      assert(ps == rows0.keySet.filter(id =>
        Sampling.posOf(id, salt) * (den * 50L) < rows0(id) * num * (1L << 31)),
        s"pps salt=$salt $num/${den * 50}")
      // mixWeights ≡ num/den copies with the posOf fractional band
      val mx = Sampling.mixWeights(base, "id", pmod(col("id"), lit(3L)),
        Seq(0L -> ((num, den)), 1L -> ((den, num))), salt)
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      rows0.keySet.foreach { id =>
        val (n, d) = (id % 3) match {
          case 0 => (num.toLong, den.toLong)
          case 1 => (den.toLong, num.toLong)
          case _ => (0L, 1L)
        }
        val want = n / d + (if (Sampling.posOf(id, salt) % d < n % d) 1L else 0L)
        assert(mx.getOrElse(id, 0L) == want, s"mix id=$id salt=$salt $n/$d")
      }
    }
  }

  test("pps sampling keeps exactly the rows whose hash clears the weight threshold") {
    val kept = rows(Sampling.ppsSample(docs, "doc_id", col("n_chars"), 1, 5000, salt = 19L)
      .select(col("doc_id"))).map(_.head.asInstanceOf[Long])
    val all = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = all.filter { case (id, w) =>
      Sampling.posOf(id, 19L) * 5000L < w * (1L << 31)
    }.map(_._1).toSet
    assert(kept == expect)
    assert(kept.nonEmpty && kept.size < all.length, s"degenerate sample ${kept.size}/${all.length}")
    // inclusion is proportional to weight: the long half of the corpus
    // must be sampled at a strictly higher rate than the short half
    val sorted = all.sortBy(_._2).map(_._1)
    val (short, long) = sorted.splitAt(sorted.length / 2)
    def rate(ids: Seq[Long]) = ids.count(kept).toDouble / ids.length
    assert(rate(long) > rate(short),
      s"long-doc rate ${rate(long)} not above short-doc rate ${rate(short)}")
  }

  test("weighted mixing emits floor copies plus the deterministic fractional band") {
    val mixed = Sampling.mixWeights(
      docs.select(col("doc_id"), col("source")), "doc_id", col("source"),
      Seq("src0" -> ((5, 2)), "src1" -> ((3, 1)), "src2" -> ((1, 3))),
      salt = 11L)
    val got = mixed.collect()
      .groupBy(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("rep")).sorted.toSeq }
    // unlisted sources are dropped entirely
    assert(got.keys.forall { case (_, s) => Set("src0", "src1", "src2")(s) })
    val bySource = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    got.foreach { case ((id, src), reps) =>
      val expected = src match {
        case "src0" => 2L + (if (Sampling.posOf(id, 11L) % 2 < 1) 1L else 0L)
        case "src1" => 3L
        case "src2" => if (Sampling.posOf(id, 11L) % 3 < 1) 1L else 0L
      }
      assert(reps == (0L until expected), s"doc $id in $src got $reps")
    }
    // every src1 doc appears (weight 3 has no fractional drop), and the
    // fractional sources actually split (some kept, some not at 1/3)
    val src1Ids = bySource.collect { case (id, "src1") => id }.toSet
    assert(got.keys.collect { case (id, "src1") => id }.toSet == src1Ids)
    val src2Ids = bySource.collect { case (id, "src2") => id }.toSet
    val src2Kept = got.keys.collect { case (id, "src2") => id }.toSet
    assert(src2Kept.nonEmpty && src2Kept.size < src2Ids.size)
    // reproducible: the same call yields the identical row multiset
    assert(rows(mixed) == rows(Sampling.mixWeights(
      docs.select(col("doc_id"), col("source")), "doc_id", col("source"),
      Seq("src0" -> ((5, 2)), "src1" -> ((3, 1)), "src2" -> ((1, 3))),
      salt = 11L)))
  }

  test("epoch shuffle is a permutation that changes with the epoch") {
    val e1 = Sampling.epochShuffle(docs, "doc_id", 1L).select("doc_id", "pos")
    val n = docs.count()
    val ps = rows(e1.select(col("pos"))).map(_.head.asInstanceOf[Long])
    assert(ps == (1L to n).toSet, "pos not a dense permutation")
    val m1 = rows(e1).map(r => r.head -> r.last).toMap
    val m2 = rows(Sampling.epochShuffle(docs, "doc_id", 2L).select("doc_id", "pos"))
      .map(r => r.head -> r.last).toMap
    assert(m1 != m2, "epoch has no effect")
    // the permutation is EXACTLY row_number over (posOf(id, epoch), id) —
    // pins the two-pass range-sorted numbering (per-partition offsets
    // included) to the reference scalar, on a many-partition input
    val ids = rows(docs.select(col("doc_id"))).map(_.head.asInstanceOf[Long]).toSeq
    val expected = ids.sortBy(id => (Sampling.posOf(id, 1L), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val manyParts = rows(Sampling.epochShuffle(docs.repartition(7), "doc_id", 1L)
      .select("doc_id", "pos")).map(r => r.head -> r.last).toMap
    assert(m1 == expected.map { case (k, v) => (k: Any) -> (v: Any) })
    assert(manyParts == m1, "partitioning must not change the permutation")
  }

  test("position hash matches the reference scalar and breaks the 65537 ring") {
    import spark.implicits._
    // column expression ≡ posOf (the DuckDB oracle replicates posOf via
    // Sampling.posOracleSql, so this pins all three implementations)
    val ids = Seq(0L, 1L, 7L, 65537L, 65538L, 1234567890123L, -5L)
    val got = ids.toDF("id").select(Sampling.lcgPos(col("id"), 7L))
      .as[Long].collect().toSeq
    assert(got == ids.map(Sampling.posOf(_, 7L)), "column/scalar drift")
    assert(got.forall(p => p >= 0 && p < (1L << 31)), "position out of range")
    // the old 16-bit MINSTD ring gave ids differing by 65537 IDENTICAL
    // positions (perfectly correlated sampling); full-width mixing must not
    val pairs = (0L until 1000L).map(i => (Sampling.posOf(i, 7L), Sampling.posOf(i + 65537L, 7L)))
    assert(pairs.count { case (a, b) => a == b } == 0, "65537-ring correlation survives")
    // and a 64-bit corpus has no observed collisions at this scale
    assert((0L until 10000L).map(Sampling.posOf(_, 3L)).distinct.size > 9950)
  }

  test("packed examples key on (shard, bin) so bins never merge across shards") {
    import spark.implicits._
    // two shards, each with two docs in bin 0: grouping by bin alone
    // would concatenate all four texts into one example
    val docs = Seq(
      (1L, "a b", "s1"), (2L, "c", "s1"),
      (3L, "d e", "s2"), (4L, "f", "s2")).toDF("doc_id", "text", "source")
    val out = Sampling.packedExamples(docs, capacity = 5, shardCol = col("source"))
      .select("shard", "bin", "example_text", "n_docs")
      .as[(String, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(("s1", 0L, "a b\nc", 2L), ("s2", 0L, "d e\nf", 2L)))
  }

  test("temperature mix upsamples small strata by the sqrt factor, uniform is identity") {
    import spark.implicits._
    // 64 "big" docs, 4 "small" docs → f_small = sqrt(16) = 4 exactly
    val d = ((0L until 64L).map(i => (i, "big")) ++
      (100L until 104L).map(i => (i, "small"))).toDF("doc_id", "lang")
    val m = Sampling.temperatureMix(d, "doc_id", "lang")
    val perStratum = m.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum("big") == 64L, "max stratum never changes")
    assert(perStratum("small") == 16L, s"sqrt(16)=4 copies each: $perStratum")
    // uniform strata → exact identity
    val u = ((0L until 10L).map(i => (i, "a")) ++ (10L until 20L).map(i => (i, "b")))
      .toDF("doc_id", "lang")
    assert(Sampling.temperatureMix(u, "doc_id", "lang").count() == 20L)
    // deterministic across runs
    assert(rows(m) == rows(Sampling.temperatureMix(d, "doc_id", "lang")))
  }

  test("dsir selection ranks target-like docs first, deterministically") {
    import spark.implicits._
    // target talks about cats; raw has 3 cat-like docs among dog docs
    val target = Seq(
      (100L, "cat purr whiskers cat nap purr"),
      (101L, "whiskers cat purr cat")).toDF("doc_id", "text")
    val raw = (1L to 3L).map(i => (i, "cat purr whiskers nap")) ++
      (4L to 9L).map(i => (i, "dog bark fetch bone growl"))
    val rawDf = raw.toDF("doc_id", "text")
    val top3 = Sampling.dsirSelect(rawDf, target, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(top3 == Set(1L, 2L, 3L), s"expected the cat-like docs, got $top3")
    // scores of identical docs are identical; rerun is bit-identical
    val again = Sampling.dsirSelect(rawDf, target, n = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val first = Sampling.dsirSelect(rawDf, target, n = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(again == first)
    assert(again.map(_._2).size == 1, "identical docs must score identically")
  }

  test("token-budget selection keeps the best-scored prefix within budget") {
    import spark.implicits._
    // scores: doc 3 best, then 1, then 2; tokens 3 each → budget 7 keeps 3,1
    val docs = Seq((1L, "b b b", 2.0), (2L, "c c c", 1.0), (3L, "a a a", 3.0))
      .toDF("doc_id", "text", "s")
    val kept = Sampling.selectByBudget(docs, budget = 7L, score = col("s"))
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(kept == Map(3L -> 3L, 1L -> 6L))
    // ties break by id: equal scores keep the smaller ids first
    val tied = Seq((5L, "x x", 1.0), (4L, "y y", 1.0), (6L, "z z", 1.0))
      .toDF("doc_id", "text", "s")
    val keptTied = Sampling.selectByBudget(tied, budget = 4L, score = col("s"))
      .select("doc_id").as[Long].collect().toSet
    assert(keptTied == Set(4L, 5L))
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

  test("shard assignment is deterministic, covers all docs, and numbers shards contiguously") {
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, s"some text for doc $i")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.shardAssignment(df, nShards = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(docs)
    assert(a.map(_._1).size == 200, "every doc assigned exactly once")
    // layout independence
    assert(run(docs.repartition(7)) == a)
    // per-shard sequence numbers are 1..count with no gaps
    a.groupBy(_._2).foreach { case (shard, rows) =>
      val seqs = rows.map(_._3).toSeq.sorted
      assert(seqs == (1L to rows.size.toLong), s"shard $shard seqs: $seqs")
    }
    // splitmix spreads: no shard holds more than half the corpus
    assert(a.groupBy(_._2).values.map(_.size).max < 100)
  }

}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf = Seq(
    (1L, Seq(3.0f, 4.0f), Seq(3.0f, 4.0f)),
    (2L, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
    (3L, Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("vector distances match hand computation") {
    val r = vecDf.select($"id",
      VectorFunctions.dot($"a", $"b").as("dot"),
      VectorFunctions.norm($"a").as("norm"),
      VectorFunctions.cosineSimilarity($"a", $"b").as("cos"),
      VectorFunctions.euclidean($"a", $"b").as("euc"),
      VectorFunctions.manhattan($"a", $"b").as("man"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(r(1).getDouble(1) == 25.0)        // 3*3+4*4
    assert(r(1).getDouble(2) == 5.0)         // |(3,4)|
    assert(math.abs(r(1).getDouble(3) - 1.0) < 1e-12)  // parallel
    assert(math.abs(r(2).getDouble(3)) < 1e-12)        // orthogonal
    assert(r(2).getDouble(4) == math.sqrt(2.0))
    assert(r(2).getDouble(5) == 2.0)
    assert(r(3).getDouble(3) == 0.0)         // zero vector → 0 by convention
  }

  test("normalize and vec ops") {
    val r = vecDf.where($"id" === 1).select(
      VectorFunctions.normalize($"a").as("n"),
      VectorFunctions.vecAdd($"a", $"b").as("s"),
      VectorFunctions.vecScale($"a", lit(2.0)).as("x2"),
      VectorFunctions.vecDim($"a").as("d")).head()
    assert(r.getSeq[Float](0).map(f => math.round(f * 100f) / 100f) == Seq(0.6f, 0.8f))
    assert(r.getSeq[Float](1) == Seq(6.0f, 8.0f))
    assert(r.getSeq[Float](2) == Seq(6.0f, 8.0f))
    assert(r.getLong(3) == 2L)
  }

  test("symmetric quantization round-trips within scale") {
    val df = Seq((Seq(0.5f, -1.27f, 1.27f))).toDF("v")
    val r = df.select(
      VectorFunctions.quantizeSymmetric($"v").as("q"),
      VectorFunctions.symmetricScale($"v").as("s")).head()
    val q = r.getSeq[Byte](0)
    val s = r.getDouble(1)
    assert(q(1) == -127 && q(2) == 127)
    val back = q.map(_ * s)
    Seq(0.5, -1.27, 1.27).zip(back).foreach { case (orig, b) =>
      assert(math.abs(orig - b) <= s / 2 + 1e-9)
    }
  }

  test("hamming on int64 bit patterns") {
    val r = Seq((0xFFL, 0x0FL)).toDF("a", "b")
      .select(VectorFunctions.hammingInt64($"a", $"b")).head().getLong(0)
    assert(r == 4L)
  }

  test("lsh buckets are deterministic and within range") {
    val df = Seq(Seq.fill(8)(0.5f), Seq.fill(8)(-0.5f)).toDF("v")
    val b1 = df.select(LshFunctions.lshBucket($"v", 8, table = 0, nPlanes = 6)).collect().map(_.getInt(0))
    val b2 = df.select(LshFunctions.lshBucket($"v", 8, table = 0, nPlanes = 6)).collect().map(_.getInt(0))
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 64))
    // antipodal vectors land in complementary buckets
    assert(b1(0) == (~b1(1) & 0x3F))
  }

  test("text tokenization and quality features") {
    val df = Seq((1L, "The quick brown fox."), (2L, ""), (3L, "   ")).toDF("id", "t")
    val r = df.select($"id",
      TextFunctions.tokenCount($"t").as("n"),
      TextFunctions.stopwordRatio($"t").as("sw"),
      TextFunctions.punctRatio($"t").as("p"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1).getLong(1) == 4L)
    assert(r(1).getDouble(2) == 0.25) // "The"
    assert(r(1).getDouble(3) == 1.0 / 20.0)
    assert(r(2).getLong(1) == 0L && r(3).getLong(1) == 0L)
  }

  test("language id picks the dominant function-word language") {
    val df = Seq(
      (1L, "the cat and the dog went to the park and it was good"),
      (2L, "der hund und die katze sind nicht in der stadt"),
      (3L, "xyzzy plugh")).toDF("id", "t")
    val r = df.select($"id", TextFunctions.langId($"t")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1) == "en" && r(2) == "de" && r(3) == "und")
  }

  test("temporal decay and windows") {
    val now = 1000000L
    val df = Seq((now - 100L, now), (now - 1000L, now), (now + 50L, now)).toDF("t", "now")
    val r = df.select(
      TemporalFunctions.timeDecayLinear($"t", $"now", lit(1000L)).as("lin"),
      TemporalFunctions.timeDecay($"t", $"now", lit(100L)).as("exp"),
      TemporalFunctions.withinLast($"t", $"now", lit(500L)).as("w")).collect()
    assert(r(0).getDouble(0) == 0.9)
    assert(r(1).getDouble(0) == 0.0)
    assert(math.abs(r(0).getDouble(1) - 0.5) < 1e-12) // one half-life
    assert(r(2).getDouble(1) == 1.0)                   // future clamps to 1
    assert(r(0).getBoolean(2) && !r(1).getBoolean(2))
  }

  test("minhash jaccard estimate is exact for identical signatures") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L)),
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 9L, 9L))).toDF("a", "b")
    val r = df.select(TextFunctions.minHashJaccardEstimate($"a", $"b")).collect()
    assert(r(0).getDouble(0) == 1.0)
    assert(r(1).getDouble(0) == 0.5)
  }

  test("vector kernels match HOF semantics on edge cases") {
    import org.apache.spark.sql.functions.{aggregate, lit, zip_with}
    // codegen'd kernels vs the reference HOF composition, incl. the null
    // contract: mismatched lengths -> null, empty -> 0.0
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    val k = df.select(VectorKernels.dot($"a", $"b"),
      VectorKernels.normSq($"a"),
      VectorKernels.sqDiffSum($"a", $"b"),
      VectorKernels.absDiffSum($"a", $"b")).collect()
    val h = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).collect()
    assert(k(0).getDouble(0) == 32.0 && k(0).getDouble(0) == h(0).getDouble(0))
    assert(k(0).getDouble(1) == 14.0)
    assert(k(0).getDouble(2) == 27.0)
    assert(k(0).getDouble(3) == 9.0)
    assert(k(1).toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    // length mismatch -> null (zip_with pads with null and the sum absorbs it)
    val mm = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
      .select(VectorKernels.dot($"a", $"b")).collect()
    assert(mm(0).isNullAt(0))
    // int8 arrays go through the same kernels
    val i8 = Seq((Seq(1.toByte, 2.toByte), Seq(3.toByte, 4.toByte))).toDF("a", "b")
      .select(VectorKernels.dot($"a", $"b")).collect()
    assert(i8(0).getDouble(0) == 11.0)
  }

  test("sorted intersection count is exact and duplicate-safe") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)),          // {3,5}
      (Seq(1L, 1L, 2L, 2L), Seq(1L, 2L, 2L, 3L)),          // dup runs: {1,2}
      (Seq.empty[Long], Seq(1L, 2L)),                       // empty -> 0
      (Seq(Long.MaxValue - 1, Long.MaxValue), Seq(Long.MaxValue))) // exact longs
      .toDF("a", "b")
    val r = df.select(VectorKernels.sortedInterCount($"a", $"b")).collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(2.0, 2.0, 0.0, 1.0))
    // agrees with array_intersect on distinct sorted inputs
    val x = df.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.array_intersect($"a", $"b"))).collect()
    assert(r(0).getDouble(0) == x(0).getInt(0).toDouble)
  }
}

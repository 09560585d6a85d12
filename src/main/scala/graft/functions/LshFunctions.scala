package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for cosine similarity.
  *
  * Mirrors the reference's LSH builtins (`lsh_bucket`, `lsh_probes`,
  * `lsh_multi_probe` — reference `src/vector_ops.rs:690-1260`): a
  * deterministic, seeded hyperplane family so buckets are reproducible
  * across processes. Key semantic to preserve: same (seed, table, dim,
  * nPlanes) → same hyperplanes everywhere.
  *
  * Scale design: hyperplanes are generated ONCE on the driver from the
  * deterministic seed and embedded into the plan as literal arrays, so
  * every executor evaluates the same planes with zero shuffle and zero
  * closure-serialization — the projection `dot(v, plane) > 0` compiles to
  * native `zip_with`/`aggregate` expressions. nPlanes ≤ 30 keeps the
  * bucket id in an int.
  */
object LshFunctions {

  /** Deterministic Gaussian hyperplanes via a seeded PRNG (xorshift-free:
    * we use java.util.Random's gaussian, seeded from (seed, table, plane)). */
  def hyperplanes(dim: Int, nPlanes: Int, table: Int, seed: Long = 0x5EEDL): Array[Array[Double]] = {
    Array.tabulate(nPlanes) { p =>
      val rng = new java.util.Random(seed * 1000003L + table.toLong * 7919L + p.toLong)
      Array.fill(dim)(rng.nextGaussian())
    }
  }

  private def projSign(v: Column, plane: Array[Double]): Column = {
    // codegen'd dot kernel — identical math/null contract to the HOF
    // form, without nPlanes × nTables interpreted lambdas per row
    val dp = VectorKernels.dot(v, typedLit(plane.toSeq))
    when(dp > 0.0, lit(1)).otherwise(lit(0))
  }

  /** Bucket id in [0, 2^nPlanes): bit p set iff dot(v, plane_p) > 0. */
  def lshBucket(v: Column, dim: Int, table: Int, nPlanes: Int, seed: Long = 0x5EEDL): Column = {
    require(nPlanes <= 30, s"nPlanes=$nPlanes would overflow int bucket ids")
    hyperplanes(dim, nPlanes, table, seed).zipWithIndex
      .map { case (plane, p) => projSign(v, plane) * lit(1 << p) }
      .reduce(_ + _)
  }

  /** Multi-probe: the home bucket plus the nPlanes buckets at Hamming
    * distance 1 (each single bit flipped) — an array column, to be
    * `explode`d into a candidate-bucket join. */
  def lshProbes(v: Column, dim: Int, table: Int, nPlanes: Int, seed: Long = 0x5EEDL): Column = {
    val home = lshBucket(v, dim, table, nPlanes, seed)
    array((home +: (0 until nPlanes).map(p => home.bitwiseXOR(lit(1 << p)))): _*)
  }

  /** Buckets across several independent tables (OR-amplification):
    * array of (table, bucket) structs for explode-and-join. */
  def lshMultiProbe(v: Column, dim: Int, nTables: Int, nPlanes: Int, seed: Long = 0x5EEDL): Column =
    array((0 until nTables).map { t =>
      struct(lit(t).as("table"), lshBucket(v, dim, t, nPlanes, seed).as("bucket"))
    }: _*)

  // ------------------------------------------------------------------
  // Reference-exact LSH for the IQL builtin surface. The reference
  // derives hyperplane components from SipHash-1-3 with zero keys
  // (Rust's DefaultHasher) over seed = table·1000000007 + plane·31337 +
  // dim_idx, mapped to [-1, 1) f32 (`src/vector_ops.rs:891-927`), and
  // computes the dot in f32 (`:991-1003`). Replicating the exact PRNG
  // makes our bucket VALUES equal to the reference's — its own snapshot
  // corpus (31_lsh) asserts them. SipHash-1-3 below is implemented from
  // the published algorithm (Aumasson & Bernstein, 2012), c=1
  // compression round, d=3 finalization rounds, zero key.
  // ------------------------------------------------------------------

  object RefLsh {
    private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

    /** SipHash-1-3 of one u64 written as 8 LE bytes, keys (0, 0) —
      * byte-for-byte what `DefaultHasher::new().hash(seed)` computes. */
    def sipHash13U64(m: Long): Long = {
      var v0 = 0x736f6d6570736575L
      var v1 = 0x646f72616e646f6dL
      var v2 = 0x6c7967656e657261L
      var v3 = 0x7465646279746573L
      @inline def round(): Unit = {
        v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
        v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
        v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
        v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
      }
      // one full 8-byte block
      v3 ^= m; round(); v0 ^= m
      // final block: length (8) in the top byte, no tail bytes
      val b = 8L << 56
      v3 ^= b; round(); v0 ^= b
      v2 ^= 0xff
      round(); round(); round()
      v0 ^ v1 ^ v2 ^ v3
    }

    /** Reference `random_f32_from_seed`: low 32 hash bits → [-1, 1). */
    def componentFromSeed(seed: Long): Float = {
      val bits = sipHash13U64(seed) & 0xFFFFFFFFL
      (bits.toDouble / 0xFFFFFFFFL.toDouble * 2.0 - 1.0).toFloat
    }

    private val planeCache =
      scala.collection.concurrent.TrieMap.empty[(Long, Int, Int), Array[Array[Float]]]

    /** hyperplanes(h)(d), cached per (table, bits, dim) like the
      * reference's LRU cache (values, not policy, are the contract). */
    def hyperplanes(table: Long, nBits: Int, dim: Int): Array[Array[Float]] =
      planeCache.getOrElseUpdate((table, nBits, dim),
        Array.tabulate(nBits, dim) { (h, d) =>
          val seed = table * 1000000007L + h.toLong * 31337L + d.toLong
          componentFromSeed(seed)
        })

    /** Reference `lsh_bucket`: f32 dot accumulation, bit h set iff > 0. */
    def bucket(v: Seq[Float], table: Long, nPlanes: Int): Long = {
      if (v == null || v.isEmpty || nPlanes <= 0) return 0L
      val nBits = math.min(nPlanes, 62)
      val planes = hyperplanes(table, nBits, v.length)
      var out = 0L
      var h = 0
      while (h < nBits) {
        val hp = planes(h)
        var dot = 0.0f
        var d = 0
        while (d < v.length) { dot += v(d) * hp(d); d += 1 }
        if (dot > 0.0f) out |= 1L << h
        h += 1
      }
      out
    }

    /** Reference `lsh_probes`: home bucket + single-bit flips, truncated. */
    def probes(bucket: Long, nPlanes: Int, nProbes: Int): Seq[Float] = {
      if (nProbes <= 0) return Seq.empty
      val nBits = math.min(math.max(nPlanes, 0), 62)
      val out = Seq.newBuilder[Float]
      out += bucket.toFloat
      var n = 1
      var bit = 0
      while (bit < nBits && n < nProbes) {
        out += (bucket ^ (1L << bit)).toFloat
        n += 1; bit += 1
      }
      out.result()
    }

    /** Reference `lsh_bucket_with_distances`: f64 dots, |dot| per plane. */
    def bucketWithDistances(v: Seq[Float], table: Long, nPlanes: Int): (Long, Array[Double]) = {
      if (v == null || v.isEmpty || nPlanes <= 0) return (0L, Array.empty)
      val nBits = math.min(nPlanes, 62)
      val planes = hyperplanes(table, nBits, v.length)
      var out = 0L
      val dists = new Array[Double](nBits)
      var h = 0
      while (h < nBits) {
        val hp = planes(h)
        var dot = 0.0
        var d = 0
        while (d < v.length) { dot += v(d).toDouble * hp(d).toDouble; d += 1 }
        if (dot > 0.0) out |= 1L << h
        dists(h) = math.abs(dot)
        h += 1
      }
      (out, dists)
    }

    /** Reference `lsh_multi_probe` = distance-ranked probes: single-bit
      * flips nearest-boundary-first, then 2-bit, then 3-bit combos. */
    def multiProbe(v: Seq[Float], table: Long, nPlanes: Int, nProbes: Int): Seq[Float] = {
      if (nProbes <= 0) return Seq.empty
      val (bucket, dists) = bucketWithDistances(v, table, nPlanes)
      if (dists.isEmpty) return Seq(bucket.toFloat)
      val sortedIdx = dists.zipWithIndex.sortBy(_._1).map(_._2)
      val out = Seq.newBuilder[Float]
      var n = 0
      def push(b: Long): Boolean = { out += b.toFloat; n += 1; n >= nProbes }
      if (push(bucket)) return out.result()
      for (i <- sortedIdx)
        if (n < nProbes) { if (push(bucket ^ (1L << i))) return out.result() }
      for (i <- sortedIdx.indices; j <- i + 1 until sortedIdx.length)
        if (n < nProbes) {
          if (push(bucket ^ (1L << sortedIdx(i)) ^ (1L << sortedIdx(j))))
            return out.result()
        }
      for (i <- sortedIdx.indices; j <- i + 1 until sortedIdx.length;
           k <- j + 1 until sortedIdx.length)
        if (n < nProbes) {
          if (push(bucket ^ (1L << sortedIdx(i)) ^ (1L << sortedIdx(j)) ^ (1L << sortedIdx(k))))
            return out.result()
        }
      out.result()
    }
  }



  /** `lsh_bucket(v, table, nPlanes)` → Int64 bucket; bit p is the sign
    * of the projection onto pseudo-random hyperplane p. */
  def lshBucketDyn(v: Column, table: Column, nPlanes: Column): Column = {
    val nBits = least(nPlanes.cast("int"), lit(62))
    // NOTE sequence(0, -1) is DESCENDING in Spark, not empty — guard ≤0
    when(nBits <= 0 || size(v) <= 0, lit(0L)).otherwise(
      aggregate(sequence(lit(0), nBits - 1), lit(0L), (acc, p) => {
        val dp = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, d) =>
            x.cast("double") * when(
              pmod(xxhash64(table.cast("long"), p, d), lit(2)) === 0, lit(1.0))
              .otherwise(lit(-1.0))),
          lit(0.0), (a2, x) => a2 + x)
        acc + when(dp > 0.0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
      }))
  }

  /** `lsh_probes(bucket, nPlanes, nProbes)` → home bucket + Hamming-1
    * flips, truncated to nProbes, as a float vector (the reference
    * returns Vector(f32) — its only array value type). */
  def lshProbesDyn(bucket: Column, nPlanes: Column, nProbes: Column): Column = {
    val b = bucket.cast("long")
    val nBits = least(nPlanes.cast("int"), lit(62))
    val all = when(nBits <= 0, array(b)).otherwise(
      concat(array(b), transform(sequence(lit(0), nBits - 1),
        p => b.bitwiseXOR(pow(lit(2.0), p).cast("long")))))
    slice(all, lit(1), greatest(nProbes.cast("int"), lit(0))).cast("array<float>")
  }

  /** `lsh_multi_probe(v, table, nPlanes, nProbes)` → probes of the
    * bucket of `v` in `table` (reference `src/vector_ops.rs:1392`). */
  def lshMultiProbeDyn(v: Column, table: Column, nPlanes: Column, nProbes: Column): Column =
    lshProbesDyn(lshBucketDyn(v, table, nPlanes), nPlanes, nProbes)
}

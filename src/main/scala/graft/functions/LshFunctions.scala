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
    val planeCol = typedLit(plane.toSeq)
    val dp = aggregate(zip_with(v, planeCol, (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)
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
}

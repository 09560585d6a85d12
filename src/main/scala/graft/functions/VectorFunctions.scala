package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) scalar functions.
  *
  * Semantics follow the reference's vector builtins (reference:
  * `src/vector_ops.rs:87-194` distances, `:381-416` vector ops,
  * `:450-547` quantization, `:232` hamming). All are composed from
  * native Spark higher-order functions (`zip_with` / `aggregate` /
  * `transform`) rather than Scala UDFs, so they stay inside Catalyst,
  * need no serialization, and distribute trivially: at 100 TB the
  * per-row cost is a tight loop over the array with no JVM<->closure
  * boundary crossing.
  *
  * Vectors are `ArrayType(FloatType)` (the reference's `Vector`) or
  * `ArrayType(ByteType)` (its int8-quantized `VectorInt8`); every
  * function accepts either because elements are cast to double inside
  * the lambda.
  */
object VectorFunctions {

  @inline private def d(c: Column): Column = c.cast("double")

  /** Sum of element-wise products; 0.0 for empty vectors. Codegen'd
    * kernel ([[VectorKernels]]) — same semantics as the HOF form
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` without the interpreted
    * per-element lambda cost. */
  def dot(a: Column, b: Column): Column = VectorKernels.dot(a, b)

  /** L2 norm (codegen'd Σx² kernel). */
  def norm(a: Column): Column = sqrt(VectorKernels.normSq(a))

  /** Cosine similarity in [-1, 1]; null-safe via division (0-norm → null). */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den === 0.0, lit(0.0)).otherwise(dot(a, b) / den)
  }

  /** Cosine distance = 1 - similarity; a zero vector is at distance 0
    * from everything (reference `vector_ops.rs:118-140` — its corpus
    * expects cosine distance 0 between zero vectors and any vector). */
  def cosineDistance(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den === 0.0, lit(0.0)).otherwise(lit(1.0) - dot(a, b) / den)
  }

  /** Euclidean (L2) distance (codegen'd Σ(x−y)² kernel). */
  def euclidean(a: Column, b: Column): Column =
    sqrt(VectorKernels.sqDiffSum(a, b))

  /** Manhattan (L1) distance (codegen'd Σ|x−y| kernel). */
  def manhattan(a: Column, b: Column): Column =
    VectorKernels.absDiffSum(a, b)

  /** Hamming distance between two int64 bit patterns (reference
    * `vector_ops.rs:232` operates on i64, not on vectors). */
  def hammingInt64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Element-wise sum; result keeps float elements. */
  def vecAdd(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => (d(x) + d(y)).cast("float"))

  /** Scalar multiply. */
  def vecScale(a: Column, s: Column): Column =
    transform(a, x => (d(x) * s.cast("double")).cast("float"))

  /** Unit-normalize to float elements; zero vector stays zero (values
    * float-cast — the old `when(n===0, a)` branch coerced to
    * array<float> too). Codegen'd single pass; the HOF form re-evaluated
    * the norm aggregate per element (O(dim²) interpreted). */
  def normalize(a: Column): Column = VectorKernels.unitF(a)

  /** Vector dimensionality. */
  def vecDim(a: Column): Column = size(a).cast("long")

  // ---------------------------------------------------------------------
  // Quantization (reference `src/vector_ops.rs:450-547`): int8 storage at
  // 75% memory savings. Linear (asymmetric, given scale+zero-point) and
  // symmetric (scale only) schemes, plus the inverses.
  // ---------------------------------------------------------------------

  private def clampI8(c: Column): Column =
    greatest(lit(-128.0), least(lit(127.0), c))

  /** q = clamp(round(x / scale) + zeroPoint, -128, 127) as int8. */
  def quantizeLinear(v: Column, scale: Column, zeroPoint: Column): Column =
    transform(v, x => clampI8(round(d(x) / scale.cast("double")) + zeroPoint.cast("double")).cast("tinyint"))

  /** Symmetric int8 quantization with scale = maxAbs / 127 — one
    * codegen'd two-pass kernel, not the interpreted aggregate+transform
    * HOF pair (same values: [[VectorKernels.roundClampI8]] replicates
    * Spark's `round`). */
  def quantizeSymmetric(v: Column): Column = VectorKernels.quantizeSym(v)

  /** Scale used by [[quantizeSymmetric]]; needed to dequantize. */
  def symmetricScale(v: Column): Column = {
    val maxAbs = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(d(x))))
    when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
  }

  /** Per-vector min/max affine quantization to int8 (reference
    * `quantize_linear(v)`: q = round((x-min)/(max-min)*255) - 128; an
    * all-equal vector quantizes to zeros). */
  def quantizeLinearAuto(v: Column): Column = VectorKernels.quantizeLinAuto(v)

  /** Reference `dequantize(q)`: int8 → float cast (scale 1.0). */
  def dequantizeCast(q: Column): Column = transform(q, x => d(x).cast("float"))

  /** x = (q - zeroPoint) * scale as float vector. */
  def dequantize(q: Column, scale: Column, zeroPoint: Column): Column =
    transform(q, x => ((d(x) - zeroPoint.cast("double")) * scale.cast("double")).cast("float"))

  /** Symmetric dequantize: x = q * scale. */
  def dequantizeScaled(q: Column, scale: Column): Column =
    transform(q, x => (d(x) * scale.cast("double")).cast("float"))
}

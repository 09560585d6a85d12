package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.{ColumnGlue => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the hot vector loops.
  *
  * The higher-order-function compositions in [[VectorFunctions]]
  * (`aggregate(zip_with(...))`) are semantically right but evaluate the
  * lambda INTERPRETED, one invocation per element — on an all-pairs
  * cosine verify that is pairs × dim × ~100 ns of expression-tree
  * walking. These expressions generate straight-line Java inside
  * whole-stage codegen (and a matching interpreted `eval`), turning the
  * same loops into `double` arithmetic over `ArrayData` with no per-
  * element allocation. Semantics are IDENTICAL to the HOF forms,
  * including the null contract: null array → null, null element → null,
  * mismatched lengths → null (zip_with pads with null and the sum
  * absorbs it), empty arrays → 0.0.
  *
  * Operator kinds: dot = Σ aᵢ·bᵢ; normsq = Σ aᵢ²; sqdiff = Σ (aᵢ−bᵢ)²;
  * absdiff = Σ |aᵢ−bᵢ|; eqcount = #{i : aᵢ = bᵢ over the shared prefix,
  * as a double}. Element types: any numeric array (float embeddings,
  * double unit-vectors, int8 quantized, long signatures).
  */
object VectorKernels {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => et match {
      case FloatType | DoubleType | ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    case _ => false
  }

  private def getElem(et: DataType, arr: String, i: String): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  private def readElem(et: DataType, arr: ArrayData, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case ByteType => arr.getByte(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  private def isIntegral(et: DataType): Boolean = et match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def readLong(et: DataType, arr: ArrayData, i: Int): Long = et match {
    case ByteType => arr.getByte(i).toLong
    case ShortType => arr.getShort(i).toLong
    case IntegerType => arr.getInt(i).toLong
    case LongType => arr.getLong(i)
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  private def getLongElem(et: DataType, arr: String, i: String): String = et match {
    case ByteType => s"(long) $arr.getByte($i)"
    case ShortType => s"(long) $arr.getShort($i)"
    case IntegerType => s"(long) $arr.getInt($i)"
    case LongType => s"$arr.getLong($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  /** Binary Σ-over-elements kernel; `op`: "dot" | "sqdiff" | "absdiff" |
    * "eqcount" | "intercount" (sorted-ascending set-intersection size —
    * duplicate-safe merge scan, zero per-row allocation vs
    * `array_intersect`'s hash set; inputs MUST be sorted, a null element
    * yields null). */
  final case class VecFold(left: Expression, right: Expression, op: String)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = s"vec_$op"

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs numeric array inputs, got ${left.dataType} / ${right.dataType}")

    private def lt = left.dataType.asInstanceOf[ArrayType].elementType
    private def rt = right.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = x.numElements()
      if (op == "eqcount") {
        val m = math.min(n, y.numElements())
        val integral = isIntegral(lt) && isIntegral(rt)
        var c = 0.0
        var i = 0
        while (i < m) {
          if (!x.isNullAt(i) && !y.isNullAt(i) && (
            // integral pairs compare exactly (a double route would fold
            // distinct longs beyond 2^53 together)
            if (integral) readLong(lt, x, i) == readLong(rt, y, i)
            else readElem(lt, x, i) == readElem(rt, y, i))) c += 1.0
          i += 1
        }
        c
      } else if (op == "intercount") {
        // all comparisons (ordering AND run-skip) go through
        // Long.compare / Double.compare so NaN terminates (compare-equal
        // run-skip advances past it; `==` would spin forever) and
        // -0.0 vs 0.0 behaves identically in interpreted and generated
        // code (compare-distinct in both)
        val m = y.numElements()
        var (i, j) = (0, 0)
        var c = 0.0
        val integral = isIntegral(lt) && isIntegral(rt)
        while (i < n && j < m) {
          if (x.isNullAt(i) || y.isNullAt(j)) return null
          val cmp =
            if (integral) java.lang.Long.compare(readLong(lt, x, i), readLong(rt, y, j))
            else java.lang.Double.compare(readElem(lt, x, i), readElem(rt, y, j))
          if (cmp < 0) i += 1
          else if (cmp > 0) j += 1
          else { // equal: count once, skip the whole run on both sides
            c += 1.0
            if (integral) {
              val v = readLong(lt, x, i)
              while (i < n && !x.isNullAt(i) && readLong(lt, x, i) == v) i += 1
              while (j < m && !y.isNullAt(j) && readLong(rt, y, j) == v) j += 1
            } else {
              val v = readElem(lt, x, i)
              while (i < n && !x.isNullAt(i) &&
                java.lang.Double.compare(readElem(lt, x, i), v) == 0) i += 1
              while (j < m && !y.isNullAt(j) &&
                java.lang.Double.compare(readElem(rt, y, j), v) == 0) j += 1
            }
          }
        }
        c
      } else {
        if (n != y.numElements()) return null
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) return null
          val xv = readElem(lt, x, i)
          val yv = readElem(rt, y, i)
          acc += (op match {
            case "dot" => xv * yv
            case "sqdiff" => val d = xv - yv; d * d
            case "absdiff" => math.abs(xv - yv)
          })
          i += 1
        }
        acc
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        if (op == "eqcount") {
          val cmp =
            if (isIntegral(lt) && isIntegral(rt))
              s"${getLongElem(lt, x, i)} == ${getLongElem(rt, y, i)}"
            else s"${getElem(lt, x, i)} == ${getElem(rt, y, i)}"
          s"""
             |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  if (!$x.isNullAt($i) && !$y.isNullAt($i) && $cmp) $acc += 1.0;
             |}
             |${ev.value} = $acc;
           """.stripMargin
        }
        else if (op == "intercount") {
          // mirror of nullSafeEval: compare-based ordering and run-skip
          // (NaN-terminating, -0.0-consistent across eval modes)
          val integral = isIntegral(lt) && isIntegral(rt)
          val jt = if (integral) "long" else "double"
          val cmpFn = if (integral) "java.lang.Long.compare" else "java.lang.Double.compare"
          val j = ctx.freshName("j")
          val cv = ctx.freshName("cmp")
          val (gx, gy) =
            if (integral) (getLongElem(lt, x, i), getLongElem(rt, y, j))
            else (getElem(lt, x, i), getElem(rt, y, j))
          val m = ctx.freshName("m")
          s"""
             |int $n = $x.numElements();
             |int $m = $y.numElements();
             |int $i = 0; int $j = 0;
             |double $acc = 0.0;
             |while ($i < $n && $j < $m) {
             |  if ($x.isNullAt($i) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }
             |  $jt $xv = $gx;
             |  $jt $yv = $gy;
             |  int $cv = $cmpFn($xv, $yv);
             |  if ($cv < 0) { $i++; }
             |  else if ($cv > 0) { $j++; }
             |  else {
             |    $acc += 1.0;
             |    while ($i < $n && !$x.isNullAt($i) && $cmpFn($gx, $xv) == 0) $i++;
             |    while ($j < $m && !$y.isNullAt($j) && $cmpFn($gy, $xv) == 0) $j++;
             |  }
             |}
             |if (!${ev.isNull}) ${ev.value} = $acc;
           """.stripMargin
        }
        else {
          val dv = ctx.freshName("d")
          val body = op match {
            case "dot" => s"$acc += $xv * $yv;"
            case "sqdiff" => s"double $dv = $xv - $yv; $acc += $dv * $dv;"
            case "absdiff" => s"$acc += java.lang.Math.abs($xv - $yv);"
          }
          s"""
             |int $n = $x.numElements();
             |if ($n != $y.numElements()) {
             |  ${ev.isNull} = true;
             |} else {
             |  double $acc = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
             |    double $xv = ${getElem(lt, x, i)};
             |    double $yv = ${getElem(rt, y, i)};
             |    $body
             |  }
             |  if (!${ev.isNull}) ${ev.value} = $acc;
             |}
           """.stripMargin
        }
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Unary Σ aᵢ² kernel (squared L2 norm). */
  final case class VecNormSq(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "vec_normsq"

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a numeric array input, got ${child.dataType}")

    private def et = child.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = readElem(et, x, i)
        acc += v * v
        i += 1
      }
      acc
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |int $n = $x.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $v = ${getElem(et, x, i)};
           |  $acc += $v * $v;
           |}
           |if (!${ev.isNull}) ${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** IVF cell assignment: argmax over a driver-resident centroid
    * matrix of `v·cᵢ − ‖cᵢ‖²/2` (= argmin ‖v−cᵢ‖², valid Lloyd
    * assignment on unnormalized embeddings), ties to the LOWEST cell.
    * `cents` is the matrix flattened row-major; it rides the generated
    * class as a REFERENCE OBJECT, so the plan tree is O(1) in the cell
    * count — the previous greatest-of-structs form built `cells` dot
    * kernels each embedding its own typedLit array (O(cells·dim) tree
    * nodes), and at 64 trained cells every degraded-ANN probe paid
    * ~0.5 s of re-analysis/codegen on that tree. A Vector (structural
    * equality) keys the codegen cache, so repeated probes of the same
    * index compile once. Per-value semantics match the struct form
    * bit-for-bit: dot summed in index order, then the precomputed
    * half-norm subtracted; a wrong-length vector or null element nulls
    * the result. */
  final case class BestCell(child: Expression, cents: Vector[Double], dim: Int)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "best_cell"

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a numeric array input, got ${child.dataType}")

    private def et = child.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val flat: Array[Double] = cents.toArray
    @transient private lazy val halves: Array[Double] = {
      val n = cents.length / dim
      Array.tabulate(n) { c =>
        var s = 0.0; var i = 0
        while (i < dim) { val x = flat(c * dim + i); s += x * x; i += 1 }
        s / 2.0
      }
    }

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      if (x.numElements() != dim) return null
      val nCells = flat.length / dim
      var best = 0
      var bestS = Double.NegativeInfinity
      var c = 0
      while (c < nCells) {
        var s = 0.0
        var i = 0
        while (i < dim) {
          if (x.isNullAt(i)) return null
          s += flat(c * dim + i) * readElem(et, x, i)
          i += 1
        }
        s -= halves(c)
        if (s > bestS) { bestS = s; best = c } // strict >: ties → lowest
        c += 1
      }
      best
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val cRef = ctx.addReferenceObj("bestCellCents", flat, "double[]")
        val hRef = ctx.addReferenceObj("bestCellHalves", halves, "double[]")
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val best = ctx.freshName("best")
        val bestS = ctx.freshName("bestS")
        val off = ctx.freshName("off")
        s"""
           |if ($x.numElements() != $dim) { ${ev.isNull} = true; }
           |else {
           |  int $best = 0;
           |  double $bestS = Double.NEGATIVE_INFINITY;
           |  int ${c}n = $cRef.length / $dim;
           |  for (int $c = 0; $c < ${c}n && !${ev.isNull}; $c++) {
           |    double $s = 0.0;
           |    int $off = $c * $dim;
           |    for (int $i = 0; $i < $dim; $i++) {
           |      if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
           |      $s += $cRef[$off + $i] * ${getElem(et, x, i)};
           |    }
           |    $s -= $hRef[$c];
           |    if (!${ev.isNull} && $s > $bestS) { $bestS = $s; $best = $c; }
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $best;
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unit-normalized copy of a numeric array as array<double> (or
    * array<float> with `asFloat`, for the dialect's f32 `normalize`
    * builtin); a zero vector stays zero. One pass computes the norm, a
    * second divides — inside a single codegen'd expression, so no
    * checkpoint barrier is needed to stop CollapseProject from inlining
    * the norm into a per-element lambda (the O(dim²) trap the HOF form
    * has). A null element nulls the whole result (the HOF form yields an
    * all-null array; both are dropped by any downstream distance
    * filter). */
  final case class VecUnit(child: Expression, asFloat: Boolean = false)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(if (asFloat) FloatType else DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "vec_unit"

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a numeric array input, got ${child.dataType}")

    private def et = child.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      val out = new Array[Double](n)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = readElem(et, x, i)
        out(i) = v
        acc += v * v
        i += 1
      }
      val nrm = math.sqrt(acc)
      if (nrm != 0.0) {
        i = 0
        while (i < n) { out(i) /= nrm; i += 1 }
      }
      if (asFloat) {
        val fo = new Array[Float](n)
        i = 0
        while (i < n) { fo(i) = out(i).toFloat; i += 1 }
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(fo)
      } else
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val out = ctx.freshName("out")
        val nrm = ctx.freshName("nrm")
        val v = ctx.freshName("v")
        s"""
           |int $n = $x.numElements();
           |double[] $out = new double[$n];
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $v = ${getElem(et, x, i)};
           |  $out[$i] = $v;
           |  $acc += $v * $v;
           |}
           |if (!${ev.isNull}) {
           |  double $nrm = java.lang.Math.sqrt($acc);
           |  if ($nrm != 0.0) for (int $i = 0; $i < $n; $i++) $out[$i] /= $nrm;
           |  ${if (asFloat) {
                val fo = ctx.freshName("fo")
                s"""float[] $fo = new float[$n];
                   |  for (int $i = 0; $i < $n; $i++) $fo[$i] = (float) $out[$i];
                   |  ${ev.value} =
                   |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($fo);""".stripMargin
              } else
                s"""${ev.value} =
                   |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);""".stripMargin}
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Int8 quantization of a numeric array in ONE codegen'd expression
    * (two passes over the element buffer: the vector statistic, then the
    * per-element map) — replaces the interpreted `aggregate`+`transform`
    * HOF pair. `mode`: "sym" = symmetric (scale maxAbs/127, reference
    * `quantize_symmetric`), "linauto" = per-vector affine min/max
    * (reference `quantize_linear(v)`). Rounding replicates Spark's
    * `round` (BigDecimal HALF_UP over the shortest decimal repr) so
    * results are bit-identical to the HOF form it replaces. A null
    * element nulls the whole result (VecUnit's contract). */
  final case class VecQuantize(child: Expression, mode: String)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = s"vec_quant_$mode"

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a numeric array input, got ${child.dataType}")

    private def et = child.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      val vals = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        vals(i) = readElem(et, x, i)
        i += 1
      }
      val out = new Array[Byte](n)
      if (mode == "sym") {
        var maxAbs = 0.0
        i = 0
        while (i < n) { val v = math.abs(vals(i)); if (v > maxAbs) maxAbs = v; i += 1 }
        val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
        i = 0
        while (i < n) { out(i) = VectorKernels.roundClampI8(vals(i) / scale); i += 1 }
      } else {
        var mn = Double.MaxValue
        var mx = Double.MinValue
        i = 0
        while (i < n) { val v = vals(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
        val range = mx - mn
        i = 0
        while (i < n) {
          out(i) = if (range == 0.0) 0.toByte
            else VectorKernels.roundClampI8((vals(i) - mn) / range * 255.0 - 128.0)
          i += 1
        }
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val vals = ctx.freshName("vals")
        val out = ctx.freshName("out")
        val k = "graft.functions.VectorKernels"
        val stat = if (mode == "sym") {
          val maxAbs = ctx.freshName("maxAbs")
          val scale = ctx.freshName("scale")
          s"""double $maxAbs = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    double __v = java.lang.Math.abs($vals[$i]);
             |    if (__v > $maxAbs) $maxAbs = __v;
             |  }
             |  double $scale = $maxAbs == 0.0 ? 1.0 : $maxAbs / 127.0;
             |  for (int $i = 0; $i < $n; $i++)
             |    $out[$i] = $k.roundClampI8($vals[$i] / $scale);""".stripMargin
        } else {
          val mn = ctx.freshName("mn")
          val mx = ctx.freshName("mx")
          val rg = ctx.freshName("rg")
          s"""double $mn = Double.MAX_VALUE; double $mx = -Double.MAX_VALUE;
             |  for (int $i = 0; $i < $n; $i++) {
             |    if ($vals[$i] < $mn) $mn = $vals[$i];
             |    if ($vals[$i] > $mx) $mx = $vals[$i];
             |  }
             |  double $rg = $mx - $mn;
             |  for (int $i = 0; $i < $n; $i++)
             |    $out[$i] = $rg == 0.0 ? (byte) 0
             |      : $k.roundClampI8(($vals[$i] - $mn) / $rg * 255.0 - 128.0);""".stripMargin
        }
        s"""
           |int $n = $x.numElements();
           |double[] $vals = new double[$n];
           |byte[] $out = new byte[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $vals[$i] = ${getElem(et, x, i)};
           |}
           |if (!${ev.isNull}) {
           |  $stat
           |  ${ev.value} =
           |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Spark-`round`-exact HALF_UP on the shortest decimal repr, clamped
    * to int8 — called from both the interpreted and generated paths. */
  def roundClampI8(v: Double): Byte = {
    val r = new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    val c = if (r < -128.0) -128.0 else if (r > 127.0) 127.0 else r
    c.toByte
  }

  def quantizeSym(a: Column): Column =
    ExpressionUtils.column(VecQuantize(ExpressionUtils.expression(a), "sym"))
  def quantizeLinAuto(a: Column): Column =
    ExpressionUtils.column(VecQuantize(ExpressionUtils.expression(a), "linauto"))

  def unit(a: Column): Column =
    ExpressionUtils.column(VecUnit(ExpressionUtils.expression(a)))
  def unitF(a: Column): Column =
    ExpressionUtils.column(VecUnit(ExpressionUtils.expression(a), asFloat = true))

  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecFold(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b), "dot"))
  def bestCell(v: Column, centroids: Array[Array[Double]]): Column =
    ExpressionUtils.column(BestCell(ExpressionUtils.expression(v),
      centroids.flatten.toVector, centroids(0).length))
  def sqDiffSum(a: Column, b: Column): Column =
    ExpressionUtils.column(VecFold(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b), "sqdiff"))
  def absDiffSum(a: Column, b: Column): Column =
    ExpressionUtils.column(VecFold(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b), "absdiff"))
  def eqCount(a: Column, b: Column): Column =
    ExpressionUtils.column(VecFold(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b), "eqcount"))
  /** Canonical-generator verify kernel for the EXACT set-similarity
    * self-join ([[graft.operators.Dedup.setSimilarityJoin]]). Inputs:
    * two documents' token-RANK arrays (ascending, distinct, long — ranks
    * assigned by global (df, hash) order, so each array's first
    * `pl = len − ⌈num·len/den⌉ + 1` elements ARE its rarest-first
    * prefix), plus the rank `r` the prefix join matched this row on.
    * Returns the exact intersection size IFF `r` is the pair's FIRST
    * shared prefix rank, else −1.
    *
    * This is what replaces the pair-dedup shuffle: a candidate pair is
    * generated once per shared prefix token (up to prefix-length times),
    * and the kernel elects exactly ONE of those rows — the one matched
    * on the smallest shared prefix rank — as the pair's sole
    * representative, deciding it locally from the two arrays in the same
    * merge scan that verifies the overlap. Every other row short-
    * circuits at its first shared-prefix match (≤ prefix-length steps)
    * and returns −1, so a `WHERE ≥ 0` dedups with ZERO shuffle.
    * Measured at sf0.1: the groupBy-pair dedup this replaces was 79 s of
    * the operator's 90 — the 105M candidate rows never leave the map
    * side now. */
  final case class SetSimCanonInter(first: Expression, second: Expression,
                                    third: Expression, num: Int, den: Int)
      extends TernaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "setsim_canon_inter"

    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (array<long>, array<long>, long), got $other")
      }

    private def prefLen(n: Int): Int =
      n - (((n.toLong * num + den - 1) / den).toInt) + 1

    override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val r = c.asInstanceOf[Long]
      val n = x.numElements(); val m = y.numElements()
      val plA = prefLen(n); val plB = prefLen(m)
      var i = 0; var j = 0
      var cnt = 0L
      var found = false
      while (i < n && j < m) {
        // past either prefix without a shared prefix rank → no match can
        // set `found` anymore; this row cannot be canonical
        if (!found && (i >= plA || j >= plB)) return -1L
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (yv < xv) j += 1
        else {
          if (!found && i < plA && j < plB) {
            found = true
            if (xv != r) return -1L
          }
          cnt += 1L; i += 1; j += 1
        }
      }
      if (found) cnt else -1L
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y, r) => {
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val plA = ctx.freshName("plA"); val plB = ctx.freshName("plB")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val cnt = ctx.freshName("cnt")
        val found = ctx.freshName("found"); val skip = ctx.freshName("skip")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = $x.numElements();
           |int $m = $y.numElements();
           |int $plA = $n - (int)(((long)$n * $num + ${den - 1}) / $den) + 1;
           |int $plB = $m - (int)(((long)$m * $num + ${den - 1}) / $den) + 1;
           |int $i = 0; int $j = 0;
           |long $cnt = 0L;
           |boolean $found = false; boolean $skip = false;
           |while ($i < $n && $j < $m) {
           |  if (!$found && ($i >= $plA || $j >= $plB)) { $skip = true; break; }
           |  long $xv = $x.getLong($i);
           |  long $yv = $y.getLong($j);
           |  if ($xv < $yv) { $i++; }
           |  else if ($yv < $xv) { $j++; }
           |  else {
           |    if (!$found && $i < $plA && $j < $plB) {
           |      $found = true;
           |      if ($xv != $r) { $skip = true; break; }
           |    }
           |    $cnt++; $i++; $j++;
           |  }
           |}
           |${ev.value} = ($skip || !$found) ? -1L : $cnt;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  def setSimCanonInter(ra: Column, rb: Column, r: Column, num: Int, den: Int): Column =
    ExpressionUtils.column(SetSimCanonInter(ExpressionUtils.expression(ra),
      ExpressionUtils.expression(rb), ExpressionUtils.expression(r), num, den))

  def sortedInterCount(a: Column, b: Column): Column =
    ExpressionUtils.column(VecFold(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b), "intercount"))
  def normSq(a: Column): Column =
    ExpressionUtils.column(VecNormSq(ExpressionUtils.expression(a)))

  /** Exact decimal(38,30) margin fold for the trained quality
    * classifier: per row, Σ over the (b: long, v: double) feature
    * structs of weights(b)·v, where every double product converts
    * through arithmetic IDENTICAL to `cast(x as decimal(38,30))` —
    * java.math.BigDecimal.valueOf (the same shortest-string conversion
    * scala's BigDecimal(double) performs) then setScale(30, HALF_UP)
    * (what changePrecision does below the 38-digit bound) — and the
    * exact decimal total converts back with the same correctly-rounded
    * `doubleValue` as the decimal→double Cast. Same-scale decimal
    * addition is exact, so the loop's running total equals the old
    * `aggregate(..., (acc, s) => (acc + product).cast(...))` fold
    * bit-for-bit while running as ONE compiled evaluation per row
    * instead of ~|fs| interpreted expression-tree walks
    * (TextAnalysisSpec pins kernel == HOF-fold equality; measured 3.4×
    * on the q160 training loop). CodegenFallback: one eval per
    * DOCUMENT row, loop compiled inside. */
  final case class DecimalMarginFold(child: Expression, weights: Vector[Double])
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "decimal_margin_fold"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields(0).dataType == LongType &&
          fields(1).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<struct<long, double>>, got $other")
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var acc = java.math.BigDecimal.ZERO
      var i = 0
      while (i < n) {
        val s = arr.getStruct(i, 2)
        val b = s.getLong(0).toInt
        val v = s.getDouble(1)
        // Add(decimal(38,30), decimal(38,30)) resolves to decimal(38,29)
        // under Spark's precision-loss rule (39 digits don't fit, one
        // scale digit is dropped, HALF_UP), and the fold's outer
        // .cast(decimal(38,30)) only pads it back — so the running sum
        // rounds to scale 29 at EVERY step. Replicated exactly.
        val p = java.math.BigDecimal.valueOf(weights(b) * v)
          .setScale(30, java.math.RoundingMode.HALF_UP)
        // mirror CheckOverflow's null-on-overflow (a product needing
        // >= 1e8 integral digits, a sum >= 1e9): the replaced fold's
        // Cast/Add would null the whole margin there, and null poisons
        // the rest of the fold — unreachable for classifier magnitudes,
        // guarded so the kernel can never silently diverge
        if (p.precision > 38) return null
        acc = acc.add(p).setScale(29, java.math.RoundingMode.HALF_UP)
        if (acc.precision > 38) return null
        i += 1
      }
      acc.doubleValue()
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def decimalMarginFold(fs: Column, weights: Array[Double]): Column =
    ExpressionUtils.column(DecimalMarginFold(
      ExpressionUtils.expression(fs), weights.toVector))

  /** [[DecimalMarginFold]]'s map-only twin for the STREAMING scorer
    * ([[graft.operators.TextAnalysis.scoreQualityWith]]): per row,
    * Σ over the doc's hashed feature-bucket OCCURRENCES of
    * weights(b)·invn — the same per-step arithmetic as the replaced
    * higher-order fold: the double product converts through
    * `cast(x as decimal(38,30))` (shortest-string BigDecimal + HALF_UP
    * setScale(30)), the running sum rounds to scale 29 each step (the
    * Add precision-loss rule), overflow mirrors CheckOverflow's null,
    * and the total converts back with the correctly-rounded
    * `doubleValue`. One compiled evaluation per document row instead of
    * ~2n interpreted expression-tree walks. */
  final case class DecimalOccFold(left: Expression, right: Expression,
                                  weights: Vector[Double])
      extends BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "decimal_occ_fold"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (array<long>, double), got $other")
      }

    override def nullSafeEval(bs: Any, inv: Any): Any = {
      val arr = bs.asInstanceOf[ArrayData]
      val invn = inv.asInstanceOf[Double]
      val n = arr.numElements()
      var acc = java.math.BigDecimal.ZERO
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        val b = arr.getLong(i).toInt
        val p = java.math.BigDecimal.valueOf(weights(b) * invn)
          .setScale(30, java.math.RoundingMode.HALF_UP)
        if (p.precision > 38) return null
        acc = acc.add(p).setScale(29, java.math.RoundingMode.HALF_UP)
        if (acc.precision > 38) return null
        i += 1
      }
      acc.doubleValue()
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def decimalOccFold(buckets: Column, invn: Column, weights: Array[Double]): Column =
    ExpressionUtils.column(DecimalOccFold(ExpressionUtils.expression(buckets),
      ExpressionUtils.expression(invn), weights.toVector))
}

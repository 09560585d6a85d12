package graft.iql

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dynamically-typed value encoding for `any` columns and mixed-type
  * inferred columns.
  *
  * The reference's `Value` enum carries a CROSS-TYPE TOTAL ORDER that is
  * purely categorical — `Null < Bool < Int < Float < Timestamp < String <
  * Vector` (`src/value/mod.rs:528-547`): an `Int64(100)` sorts BELOW a
  * `Float64(0.5)` because the type slots order, not the numeric values.
  * Sorting, `min<>`/`max<>`, and comparisons over a dynamically-typed
  * column are all defined through this order.
  *
  * Spark columns are statically typed, so a mixed column is stored as a
  * tag-major struct whose FIELD ORDER makes Spark's native struct
  * ordering (field-by-field, interpreted+codegen) coincide with the
  * reference's order:
  *
  *   {tag TINYINT, b BOOLEAN, i LONG, d DOUBLE, s STRING,
  *    vl INT, vb ARRAY<INT>, v ARRAY<FLOAT>}
  *
  * Exactly the field for the value's tag is set (other fields null), so
  * two rows with equal tags compare on their payload field and rows with
  * different tags resolve on `tag` alone. NULL is encoded as a tag-0
  * struct (never a SQL NULL struct) so `min<>` returns Null when one is
  * present, exactly like the reference — SQL `min` would skip it.
  *
  * Vector order replicates the reference bit-for-bit: length first, then
  * element-wise by raw IEEE-754 bits compared as UNSIGNED u32
  * (`src/value/mod.rs:500-514`) — hence `vl` (length) sorts before `vb`
  * (bits with the sign bit flipped: signed compare of `bits ^ 0x80000000`
  * equals unsigned compare of `bits`). The `v` field carries the actual
  * floats for decoding and never differs when `vb` is equal.
  *
  * Divergences (documented, outside the test corpus): the engine unifies
  * Int32/Int64 as i64 and stores timestamps as i64 ms, so the reference's
  * Int32 < Int64 and Timestamp slots collapse into the int tag.
  */
object AnyValue {
  val TagNull: Byte = 0
  val TagBool: Byte = 1
  val TagInt: Byte = 2
  val TagFloat: Byte = 3
  val TagString: Byte = 4
  val TagVector: Byte = 5

  private val fieldNames = Seq("tag", "b", "i", "d", "s", "vl", "vb", "v")

  val schema: StructType = StructType(Seq(
    StructField("tag", ByteType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("i", LongType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("vl", IntegerType, nullable = true),
    StructField("vb", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("v", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Structural check (nullability-insensitive): is `dt` the AnyValue
    * encoding? */
  def isAny(dt: DataType): Boolean = dt match {
    case st: StructType => st.fieldNames.toSeq == fieldNames
    case _ => false
  }

  /** Unsigned-u32 order as a signed int: flip the sign bit. */
  private def sortableBits(f: Float): Int =
    java.lang.Float.floatToIntBits(f) ^ Int.MinValue

  /** Driver-side encode of a Scala fact value → struct Row. */
  def encode(v: Any): Row = v match {
    case null => Row(TagNull, null, null, null, null, null, null, null)
    case b: Boolean => Row(TagBool, b, null, null, null, null, null, null)
    case i: Int => Row(TagInt, null, i.toLong, null, null, null, null, null)
    case l: Long => Row(TagInt, null, l, null, null, null, null, null)
    case d: Double => Row(TagFloat, null, null, d, null, null, null, null)
    case f: Float => Row(TagFloat, null, null, f.toDouble, null, null, null, null)
    case s: String => Row(TagString, null, null, null, s, null, null, null)
    case xs: Seq[_] =>
      val fs = xs.map {
        case f: Float => f
        case d: Double => d.toFloat
        case n: Long => n.toFloat
        case n: Int => n.toFloat
        case other => throw new IllegalArgumentException(
          s"vector element must be numeric, got $other")
      }
      Row(TagVector, null, null, null, null, fs.length,
        fs.map(sortableBits), fs)
    case other => throw new IllegalArgumentException(
      s"cannot store $other (${other.getClass.getSimpleName}) in an any column")
  }

  /** Decode a struct Row back to the plain Scala value (result boundary:
    * wire serialization, tests). */
  def decode(r: Row): Any = {
    if (r == null) return null
    r.getByte(0) match {
      case TagNull => null
      case TagBool => r.getBoolean(1)
      case TagInt => r.getLong(2)
      case TagFloat => r.getDouble(3)
      case TagString => r.getString(4)
      case TagVector => r.getSeq[Float](7)
      case t => throw new IllegalStateException(s"unknown AnyValue tag $t")
    }
  }

  def isAnyRow(v: Any): Boolean = v match {
    case r: Row => r.schema != null && isAny(r.schema)
    case _ => false
  }

  private def nullAs(dt: DataType): Column = lit(null).cast(dt)

  private def mk(tag: Column, b: Column, i: Column, d: Column, s: Column,
                 vl: Column, vb: Column, v: Column): Column =
    struct(tag.cast(ByteType).as("tag"), b.as("b"), i.as("i"), d.as("d"),
      s.as("s"), vl.as("vl"), vb.as("vb"), v.as("v"))

  /** Literal constant → tagged struct Column (filter/compare an any
    * column against an IQL literal). */
  def litOf(v: Any): Column = {
    val r = encode(v)
    mk(lit(r.get(0)), lit(r.get(1)).cast(BooleanType), lit(r.get(2)).cast(LongType),
      lit(r.get(3)).cast(DoubleType), lit(r.get(4)).cast(StringType),
      lit(r.get(5)).cast(IntegerType),
      if (r.get(6) == null) nullAs(schema("vb").dataType)
      else lit(r.getSeq[Int](6).toArray),
      if (r.get(7) == null) nullAs(schema("v").dataType)
      else lit(r.getSeq[Float](7).toArray))
  }

  private val bitsUdf = udf((xs: Seq[Float]) =>
    if (xs == null) null else xs.map(sortableBits))

  /** Wrap a STATICALLY typed column into the AnyValue encoding (join /
    * comparison harmonization when the other side is dynamic). SQL NULLs
    * become tag-0 structs so the cross-type order sees them. */
  def encodeCol(c: Column, dt: DataType): Column = {
    def tagged(tag: Byte, b: Column = nullAs(BooleanType),
               i: Column = nullAs(LongType), d: Column = nullAs(DoubleType),
               s: Column = nullAs(StringType)): Column =
      mk(when(c.isNull, lit(TagNull)).otherwise(lit(tag)),
        b, i, d, s, nullAs(IntegerType),
        nullAs(schema("vb").dataType), nullAs(schema("v").dataType))
    dt match {
      case dt2 if isAny(dt2) => c
      case BooleanType => tagged(TagBool, b = c)
      case ByteType | ShortType | IntegerType | LongType =>
        tagged(TagInt, i = c.cast(LongType))
      case FloatType | DoubleType | _: DecimalType =>
        tagged(TagFloat, d = c.cast(DoubleType))
      case StringType => tagged(TagString, s = c)
      case ArrayType(et, _) if et == FloatType || et == DoubleType =>
        val fc = if (et == FloatType) c else c.cast(ArrayType(FloatType))
        mk(when(c.isNull, lit(TagNull)).otherwise(lit(TagVector)),
          nullAs(BooleanType), nullAs(LongType), nullAs(DoubleType),
          nullAs(StringType), size(fc).cast(IntegerType), bitsUdf(fc), fc)
      // registered external tables can carry Spark types the IQL value
      // surface doesn't have. Timestamps/dates collapse into the int tag
      // as ms-since-epoch (the reference's Timestamp IS an i64-ms value,
      // and the catalog's own `timestamp` columns are LongType ms, so a
      // declared-timestamp fact and a parquet TimestampType cell agree);
      // anything else degrades to its string form rather than failing
      // the whole query plan. DATE and NTZ anchor to UTC explicitly —
      // a session-timezone-dependent encoding would make the same stored
      // cell compare differently across sessions.
      case TimestampType => tagged(TagInt, i = unix_millis(c))
      case TimestampNTZType =>
        // NTZ wall time read as a UTC instant, independent of session TZ:
        // cast renders the wall time as an instant in the session zone,
        // to_utc_timestamp re-anchors that same wall time to UTC
        tagged(TagInt, i = unix_millis(
          to_utc_timestamp(c.cast(TimestampType), expr("current_timezone()"))))
      case DateType =>
        tagged(TagInt, i = unix_date(c).cast(LongType) * lit(86400000L))
      case _ => tagged(TagString, s = c.cast(StringType))
    }
  }

  /** Reference `to_i64` (`src/value/mod.rs:352-366`): non-numeric → 0,
    * bool → 0/1, floats truncate. */
  def asLong(c: Column): Column =
    when(c("tag") === TagInt, c("i"))
      .when(c("tag") === TagFloat,
        when(c("d").isNaN || c("d") === Double.PositiveInfinity ||
          c("d") === Double.NegativeInfinity, lit(0L))
          .otherwise(c("d").cast(LongType)))
      .when(c("tag") === TagBool, c("b").cast(LongType))
      .otherwise(lit(0L))

  /** Reference `to_f64` (`src/value/mod.rs:368-380`). */
  def asDouble(c: Column): Column =
    when(c("tag") === TagInt, c("i").cast(DoubleType))
      .when(c("tag") === TagFloat, c("d"))
      .when(c("tag") === TagBool, c("b").cast(DoubleType))
      .otherwise(lit(0.0))
}

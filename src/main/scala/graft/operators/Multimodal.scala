package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `BinaryType` columns + typed metadata, the layout
  * used by web-scale multimodal corpora (and Spark's own `binaryFile`
  * source). Decode / resize / frame-sample run per-partition so each
  * task amortizes codec setup; the actual codec calls are STUBBED with
  * a deterministic fake (this container has no image/audio libraries —
  * see the builder brief) while schema, batching and partitioning are
  * real. Swap `decodeStub` for a JNI/javacv call in production.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),   // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),    // opaque bytes
    StructField("width", IntegerType, nullable = true),      // image/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))  // audio/video

  /** Deterministic synthetic asset table derived from the documents table
    * (payload = utf8 bytes of the text — a stand-in for real media). */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(typedLit(Seq("image", "audio", "video")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      when(pmod(col("doc_id"), lit(3)) === 0, (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int")).as("width"),
      when(pmod(col("doc_id"), lit(3)) === 0, (pmod(col("doc_id"), lit(48)) * 16 + 64).cast("int")).as("height"),
      when(pmod(col("doc_id"), lit(3)) =!= 0, pmod(col("doc_id"), lit(300)) * 1000 + 1000).as("duration_ms"))

  /** STUB decode: deterministic pseudo-"pixels" from payload bytes.
    * Stands in for a real image decode; real impl would decode `payload`
    * per `mime`. Deterministic so tests can oracle it. */
  private def decodeStub(payload: Array[Byte], n: Int): Array[Float] = {
    val out = new Array[Float](n)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    i = 0
    while (i < n) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(i) = ((h & 0xffff).toFloat / 65535.0f); i += 1
    }
    out
  }

  private val featureSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Decode + feature-extract: per-partition batch processing (the Scala
    * analogue of `mapInPandas` — one codec context per task, rows stream
    * through in Arrow-sized batches, output schema fixed up front). */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "modality", "payload").rdd.mapPartitions { it =>
      // (real impl: initialize codec ONCE here, per task)
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"),
          decodeStub(payload, dim).toSeq, payload.length.toLong)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame-sample stub: for video assets, emit one row per sampled frame
    * (every `everyMs` ms of duration) with a deterministic frame feature.
    * Pure-native row expansion: `sequence` + `explode` keeps the fan-out
    * inside codegen; only the (tiny) per-frame features materialize. */
  def sampleFrames(assets: DataFrame, everyMs: Long = 10000L): DataFrame =
    assets.where(col("modality") === "video")
      .select(col("asset_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("frame_ts_ms"))
      .select(col("asset_id"), col("frame_ts_ms"),
        xxhash64(col("asset_id"), col("frame_ts_ms")).as("frame_fingerprint"))

  /** Resize stub for images: records the plumbing (old/new dims + scale
    * factor) without a codec; deterministic and fully native. */
  def resizePlan(assets: DataFrame, targetW: Int, targetH: Int): DataFrame =
    assets.where(col("modality") === "image")
      .select(col("asset_id"), col("width"), col("height"),
        lit(targetW).as("target_w"), lit(targetH).as("target_h"),
        round(least(lit(targetW).cast("double") / col("width"),
          lit(targetH).cast("double") / col("height")), 6).as("scale"))
}

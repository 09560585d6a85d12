package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `BinaryType` columns + typed metadata, the layout
  * used by web-scale multimodal corpora (and Spark's own `binaryFile`
  * source). Decode / resize / frame-sample run per-partition so each
  * task amortizes codec setup. Uncompressed formats decode for REAL
  * with pure-JVM codecs ([[decodeBmp24]], [[decodeWavPcm16]]) —
  * byte-level header parses with no external library, oracle-checked
  * end-to-end. Compressed codecs (PNG/JPEG/MP3) are STUBBED with a
  * deterministic fake (this container has no media libraries — see the
  * builder brief); swap `decodeStub` for a JNI/javacv call in
  * production.
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

  // ------------------------------------------------------------------
  // REAL pure-JVM codecs: 24-bit uncompressed BMP and 16-bit PCM WAV.
  // No external media library needed — these are byte-level header
  // parses + pixel/sample reads, so the decode path (schema, batching,
  // per-partition execution) runs against genuine binary payloads and
  // is oracle-checked end-to-end (q70/q71). Compressed formats (PNG/
  // JPEG/MP3) stay stubbed: the container has no codec libraries.
  // ------------------------------------------------------------------

  /** Encode a solid-color 24-bit bottom-up BMP (54-byte header + BGR
    * rows padded to 4 bytes — the classic BITMAPINFOHEADER layout). */
  def encodeBmp24(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val size = 54 + rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = w * 3
      while (p < rowBytes) { buf.put(0.toByte); p += 1 }
      y += 1
    }
    buf.array()
  }

  /** Decode a 24-bit uncompressed BMP: header-parsed dims + per-channel
    * pixel sums (padding bytes skipped via the row stride). Returns
    * (width, height, sumR, sumG, sumB). */
  def decodeBmp24(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && buf.get(0) == 'B' && buf.get(1) == 'M', "not a BMP")
    val pixelOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0, s"unsupported BMP: bpp=$bpp comp=$compression")
    val rowBytes = (w * 3 + 3) / 4 * 4
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      val base = pixelOffset + y * rowBytes
      var x = 0
      while (x < w) {
        sb += bytes(base + x * 3) & 0xff
        sg += bytes(base + x * 3 + 1) & 0xff
        sr += bytes(base + x * 3 + 2) & 0xff
        x += 1
      }
      y += 1
    }
    (w, h, sr, sg, sb)
  }

  /** Encode 16-bit mono PCM samples as a RIFF/WAVE file. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    buf.putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a PCM-16 WAV: chunk-scans for `fmt ` and `data` (robust to
    * extra chunks like LIST/INFO), returns (sampleRate, nSamples,
    * sumAmplitude). */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Int, Long) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 44 && new String(bytes, 0, 4) == "RIFF" &&
      new String(bytes, 8, 4) == "WAVE", "not a WAV")
    var pos = 12
    var sampleRate = -1
    var nSamples = 0
    var sum = 0L
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4)
      val len = buf.getInt(pos + 4)
      id match {
        case "fmt " =>
          require(buf.getShort(pos + 8) == 1 && buf.getShort(pos + 22) == 16,
            "unsupported WAV: not PCM16")
          sampleRate = buf.getInt(pos + 12)
        case "data" =>
          nSamples = len / 2
          var i = 0
          while (i < nSamples) { sum += buf.getShort(pos + 8 + i * 2); i += 1 }
        case _ => () // skip unknown chunks (LIST/INFO/fact)
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "WAV: missing fmt chunk")
    (sampleRate, nSamples, sum)
  }

  /** Synthetic REAL-BMP asset table: one solid-color BMP per document,
    * dimensions and color pure arithmetic over doc_id — so an oracle
    * can predict the decoded stats in closed form. */
  def syntheticBmpAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (id % 16).toInt + 1
        val h = (id % 8).toInt + 1
        Row(id, encodeBmp24(w, h, (id % 256).toInt,
          (id * 7 % 256).toInt, (id * 13 % 256).toInt))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Synthetic REAL-WAV asset table (constant-amplitude PCM16 mono). */
  def syntheticWavAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = ((id % 50).toInt + 1) * 100
        val v = ((id % 30000) - 15000).toShort
        Row(id, encodeWavPcm16(16000, Array.fill(n)(v)))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Decode BMP payloads per partition → header dims + mean channel
    * values in [0,1] (sum/nPixels/255, exact doubles for the oracle). */
  def decodeBmpStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val (w, h, sr, sg, sb) = decodeBmp24(r.getAs[Array[Byte]]("payload"))
        val n = w.toLong * h
        Row(r.getLong(0), w, h,
          sr.toDouble / n / 255.0, sg.toDouble / n / 255.0, sb.toDouble / n / 255.0)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Decode WAV payloads per partition → rate, sample count, mean
    * amplitude in [-1,1] (sum/n/32768, exact doubles for the oracle). */
  def decodeWavStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("mean_amp", DoubleType, nullable = false)))
    val rdd = assets.select("asset_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val (rate, n, sum) = decodeWavPcm16(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), rate, n, sum.toDouble / n / 32768.0)
      }
    }
    spark.createDataFrame(rdd, schema)
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

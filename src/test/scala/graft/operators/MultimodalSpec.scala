package graft.operators

import graft.SparkSpec

/** Pure-JVM codec round-trips: 24-bit BMP (incl. row padding for widths
  * not divisible by 4) and PCM-16 WAV (incl. chunk scanning past extra
  * RIFF chunks). The Spark-side decode pipelines are oracle-checked by
  * q70/q71; these pin the byte-level parsers. */
class MultimodalSpec extends SparkSpec {

  test("bmp24 encode/decode round-trips dims and channel sums") {
    // width 3 → row stride 12 with 3 padding bytes: a decoder that
    // misreads padding as pixels gets the sums wrong
    for ((w, h) <- Seq((1, 1), (3, 2), (4, 4), (5, 3), (16, 8))) {
      val (r, g, b) = (200, 100, 50)
      val bytes = Multimodal.encodeBmp24(w, h, r, g, b)
      val (dw, dh, sr, sg, sb) = Multimodal.decodeBmp24(bytes)
      assert((dw, dh) == (w, h))
      val n = w.toLong * h
      assert((sr, sg, sb) == (n * r, n * g, n * b), s"at ${(w, h)}")
    }
  }

  test("bmp decoder rejects non-BMP and compressed payloads") {
    intercept[IllegalArgumentException](Multimodal.decodeBmp24("nope".getBytes))
    val ok = Multimodal.encodeBmp24(2, 2, 1, 2, 3)
    ok(30) = 1 // compression = BI_RLE8
    intercept[IllegalArgumentException](Multimodal.decodeBmp24(ok))
  }

  test("wav pcm16 encode/decode round-trips rate, count and sum") {
    val samples = Array[Short](100, -200, 300, -400, 500)
    val bytes = Multimodal.encodeWavPcm16(22050, samples)
    val (rate, n, sum) = Multimodal.decodeWavPcm16(bytes)
    assert(rate == 22050 && n == 5 && sum == 300L)
  }

  test("wav decoder scans past extra RIFF chunks") {
    val base = Multimodal.encodeWavPcm16(16000, Array[Short](7, 7, 7))
    // splice a LIST chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val list = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    list.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
    val spliced = base.take(fmtEnd) ++ list.array() ++ base.drop(fmtEnd)
    // fix the RIFF size field
    val buf = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(4, spliced.length - 8)
    val (rate, n, sum) = Multimodal.decodeWavPcm16(spliced)
    assert(rate == 16000 && n == 3 && sum == 21L)
  }

  test("spark decode pipelines agree with the closed-form prediction") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bmp = Multimodal.decodeBmpStats(Multimodal.syntheticBmpAssets(docs)).collect()
    bmp.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 16).toInt + 1 && r.getInt(2) == (id % 8).toInt + 1)
      assert(r.getDouble(3) == (id % 256).toDouble / 255.0)
    }
    val wav = Multimodal.decodeWavStats(Multimodal.syntheticWavAssets(docs)).collect()
    wav.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == ((id % 50).toInt + 1) * 100)
      assert(r.getDouble(3) == ((id % 30000) - 15000).toDouble / 32768.0)
    }
  }

  test("dHash: encode->decode->hash matches direct pixels; one-pixel twin within 1 bit") {
    // luma grid read back from the BMP equals the generator exactly
    // (bottom-up stride + integer luma both verified by this)
    val bytes = Multimodal.encodeBmp24Gray(9, 8, (x, y) => Multimodal.gradientGray(42L, x, y))
    val (w, h, luma) = Multimodal.decodeBmp24Luma(bytes)
    assert(w == 9 && h == 8)
    for (y <- 0 until 8; x <- 0 until 9)
      assert(luma(y * 9 + x) == Multimodal.gradientGray(42L, x, y), s"pixel ($x,$y)")
    // a twin differing in pixel (0,0) is within Hamming 1 — never more
    val base = Multimodal.dHash64(9, 8, luma)
    val twin = Multimodal.encodeBmp24Gray(9, 8, (x, y) =>
      if (x == 0 && y == 0) (Multimodal.gradientGray(42L, 0, 0) + 1) % 256
      else Multimodal.gradientGray(42L, x, y))
    val (_, _, tl) = Multimodal.decodeBmp24Luma(twin)
    assert(java.lang.Long.bitCount(base ^ Multimodal.dHash64(9, 8, tl)) <= 1)
    // box pooling: a 2x-upscaled image pools back to the same hash
    val big = Multimodal.encodeBmp24Gray(18, 16, (x, y) =>
      Multimodal.gradientGray(42L, x / 2, y / 2))
    val (bw, bh, bl) = Multimodal.decodeBmp24Luma(big)
    assert(Multimodal.dHash64(bw, bh, bl) == base, "pooled hash drifted")
    // unrelated images are FAR apart (the discriminative property)
    val other = Multimodal.encodeBmp24Gray(9, 8, (x, y) => Multimodal.gradientGray(43L, x, y))
    val (_, _, ol) = Multimodal.decodeBmp24Luma(other)
    assert(java.lang.Long.bitCount(base ^ Multimodal.dHash64(9, 8, ol)) > 8)
  }

  test("audio envelope hash: decode matches generator; planted twin within 1 bit") {
    val bytes = Multimodal.envWavBytes(42L, tweak = false)
    val samples = Multimodal.decodeWavSamples(bytes)
    assert(samples.length == 65 * ((42 % 4) + 2))
    val base = Multimodal.audioEnvHash64(samples)
    val twin = Multimodal.audioEnvHash64(
      Multimodal.decodeWavSamples(Multimodal.envWavBytes(42L, tweak = true)))
    assert(java.lang.Long.bitCount(base ^ twin) <= 1)
    // unrelated audio is far apart; sub-envelope clips hash to 0
    val other = Multimodal.audioEnvHash64(
      Multimodal.decodeWavSamples(Multimodal.envWavBytes(43L, tweak = false)))
    assert(java.lang.Long.bitCount(base ^ other) > 8)
    assert(Multimodal.audioEnvHash64(Array.fill(10)(5.toShort)) == 0L)
  }

  test("image near-dup pairs find exactly the planted one-pixel twins at Hamming <= 1") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val hashes = Multimodal.imageDHashes(Multimodal.syntheticGradientBmpAssets(docs))
    val pairs = Dedup.hammingPairs64(hashes, "asset_id", "dhash", maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(_ % 10 == 0).map(id => (id, id + 1000000L)).toSet
    assert(planted.subsetOf(pairs), s"missed ${planted -- pairs}")
  }
}

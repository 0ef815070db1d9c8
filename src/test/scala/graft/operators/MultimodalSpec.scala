package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("synthetic media table carries binary content + typed metadata") {
    val m = Multimodal.syntheticMediaFromDocs(spark, graft.SparkTestSession.sfDir)
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    assert(m.count() > 0)
  }

  test("feature extraction: partition-wise batched, stable output schema") {
    val m = Multimodal.syntheticMediaFromDocs(spark, graft.SparkTestSession.sfDir)
    val f = Multimodal.extractFeatures(m, dim = 8, batchSize = 16)
    assert(f.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "sha_prefix", "decode_status",
        "features"))
    val rows = f.orderBy("media_id").limit(3).collect()
    assert(rows.forall(_.getAs[Seq[Float]]("features").length == 8))
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(m, dim = 8, batchSize = 4)
      .orderBy("media_id").limit(3).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("extracted features feed similarity search end-to-end") {
    val m = Multimodal.syntheticMediaFromDocs(spark, graft.SparkTestSession.sfDir)
    val f = Multimodal.extractFeatures(m, dim = 8).withColumnRenamed("media_id", "vec_id")
    val knn = SimilaritySearch.bruteForceTopK(
      f.where($"vec_id" < 3), f, "vec_id", "features", k = 2)
    assert(knn.count() == 6) // 3 queries x k=2
  }

  test("frame sampling emits frame references for videos only") {
    val m = Multimodal.syntheticMediaFromDocs(spark, graft.SparkTestSession.sfDir)
    val frames = Multimodal.sampleFrames(m, everyNth = 10)
    assert(frames.count() > 0)
    val kinds = frames.join(m, Seq("media_id")).select("kind").distinct()
      .as[String].collect().toSeq
    assert(kinds == Seq("video"))
  }

  /** A real 8x6 PNG: left half black, right half white. */
  private def tinyPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A real 1-channel 16-bit PCM WAV: 8000 Hz, quarter-second, constant
    * half-amplitude square wave (RMS = 0.5 in every bucket). */
  private def tinyWav(): Array[Byte] = {
    val n = 2000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = if (i % 16 < 8) 16384 else -16384
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("REAL image decode: JDK codec yields true dims + luminance buckets") {
    val Some((w, h, feats)) = Multimodal.decodeImage(tinyPng(), dim = 2)
    assert((w, h) == (8, 6))
    // raster-order buckets: first half rows dark+light mix; exact split
    // per row is half black half white -> both buckets average ~0.5
    assert(feats.length == 2)
    assert(feats.forall(f => f > 0.4f && f < 0.6f), feats.toSeq.toString)
    // undecodable bytes fall back to the deterministic stub
    val stub = Multimodal.decodeFeatures("image", "not an image".getBytes, 4)
    assert(stub.toSeq == Multimodal.decodeStub("not an image".getBytes, 4).toSeq)
  }

  test("REAL audio decode: JDK codec yields sample rate, duration, RMS") {
    val Some((rate, durMs, feats)) = Multimodal.decodeAudio(tinyWav(), dim = 4)
    assert(rate == 8000)
    assert(durMs == 250) // 2000 samples / 8000 Hz
    assert(feats.forall(f => f > 0.45f && f < 0.55f), feats.toSeq.toString)
  }

  test("audio decode handles 8-bit UNSIGNED PCM; exotic encodings fall back") {
    // digital silence in 8-bit unsigned PCM is 0x80 — it must decode to
    // RMS ~0, not full-scale (the signed misread this regression pins)
    val silent = Array.fill(1000)(0x80.toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(silent), fmt, 1000L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((_, _, feats)) = Multimodal.decodeAudio(bos.toByteArray, dim = 2)
    assert(feats.forall(_ < 0.01f), feats.toSeq.toString)
    // a float-PCM or otherwise uninterpreted format must return None
    // (the caller then falls back to the deterministic stub)
    val f32 = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT, 8000f, 32, 1, 4, 8000f, false)
    val fais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](400)), f32, 100L)
    val fbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(fais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, fbos)
    assert(Multimodal.decodeAudio(fbos.toByteArray, dim = 2).isEmpty)
  }

  test("REAL resize: decodable image is rescaled; opaque bytes pass through") {
    val resized = Multimodal.resize(tinyPng(), 4, 3)
    val Some((w, h, _)) = Multimodal.decodeImage(resized, dim = 2)
    assert((w, h) == (4, 3))
    val opaque = Array[Byte](1, 2, 3)
    assert(Multimodal.resize(opaque, 4, 3).toSeq == opaque.toSeq)
  }

  test("extractFeatures routes real media through the real codecs") {
    val rows = Seq(
      (1L, "image", tinyPng()),
      (2L, "audio", tinyWav()),
      (3L, "video", "fake-bytes".getBytes),
      (4L, "video", tinyGif(Seq(0, 255)))).toDF("media_id", "kind", "content")
    val f = Multimodal.extractFeatures(rows, dim = 4, batchSize = 2)
      .orderBy("media_id").collect()
    def feats(r: org.apache.spark.sql.Row) =
      r.getAs[scala.collection.Seq[Float]]("features")
    def status(r: org.apache.spark.sql.Row) = r.getAs[String]("decode_status")
    // image features = real luminance means (dim=4 buckets span 1.5 of
    // the half-black/half-white rows, so values alternate ~1/3 and ~2/3
    // and average 0.5) — nothing like the byte-hash stub
    val imgFeats = feats(f(0))
    assert(math.abs(imgFeats.sum / 4 - 0.5f) < 0.01f, imgFeats.toString)
    assert(imgFeats.forall(v => v > 0.2f && v < 0.8f), imgFeats.toString)
    val audFeats = feats(f(1))
    assert(audFeats.forall(v => v > 0.45f && v < 0.55f), audFeats.toString)
    // UNDECODABLE video payloads fall back to the deterministic stub —
    // and SAY so via the typed status, never a silent stub vector
    assert(feats(f(2)).toSeq ==
      Multimodal.decodeStub("fake-bytes".getBytes, 4).toSeq)
    assert(status(f(2)) == "stub")
    // a real animated GIF goes through the REAL sequence decoder: two
    // frames (black, white) land in temporal buckets 0 and 2 exactly
    assert(feats(f(3)).toSeq == Seq(0.0f, 0.0f, 1.0f, 0.0f))
    // both status branches pinned: real codecs report "decoded"
    assert(Seq(f(0), f(1), f(3)).map(status) ==
      Seq("decoded", "decoded", "decoded"))
  }

  /** A real multi-frame animated GIF: 4x4 solid-gray frames. A solid
    * frame's mean luminance is exactly g/255 (the integer luminance
    * formula is exact on r=g=b), which makes round-trip assertions
    * float-safe. */
  private def tinyGif(grays: Seq[Int]): Array[Byte] = {
    val frames = grays.map { g =>
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, rgb)
      img
    }
    Multimodal.encodeGif(frames)
  }

  test("REAL video decode: encodeGif → decodeGifFrames round-trips frames + luminance") {
    val grays = Seq(0, 64, 128, 255)
    val Some(lums) = Multimodal.decodeGifFrames(tinyGif(grays))
    assert(lums.length == 4)
    lums.zip(grays).foreach { case (l, g) =>
      assert(math.abs(l - g / 255.0f) < 1e-6f, s"g=$g decoded lum=$l")
    }
    // decodeVideo folds the frame luminances into temporal buckets
    val Some((n, feats)) = Multimodal.decodeVideo(tinyGif(grays), dim = 2)
    assert(n == 4)
    assert(math.abs(feats(0) - (0 + 64) / 2.0f / 255.0f) < 1e-6f, feats.toSeq.toString)
    assert(math.abs(feats(1) - (128 + 255) / 2.0f / 255.0f) < 1e-6f, feats.toSeq.toString)
    // bytes no ImageIO reader claims -> None (caller falls back to stub)
    assert(Multimodal.decodeGifFrames("not a gif".getBytes).isEmpty)
  }

  test("sampleFrames yields GENUINE decoded frames for real GIFs, synthetic refs otherwise") {
    val media = Seq(
      (1L, "video", tinyGif(Seq(10, 20, 30, 40, 50)), 3000L),
      (2L, "video", "fake-bytes".getBytes, 3000L))
      .toDF("media_id", "kind", "content", "dur")
      .withColumn("meta", struct(lit("image/gif").as("mime"), lit(4).as("width"),
        lit(4).as("height"), col("dur").as("duration_ms")))
      .drop("dur")
    val out = Multimodal.sampleFrames(media, everyNth = 2)
      .orderBy("media_id", "frame_no").collect()
    // real GIF: every 2nd of its 5 ACTUAL frames, decoded=true, with the
    // decoded frame's true luminance (frame 2 is solid gray 30)
    val real = out.filter(_.getLong(0) == 1L)
    assert(real.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(real.forall(_.getBoolean(2)))
    assert(math.abs(real(1).getFloat(3) - 30 / 255.0f) < 1e-6f)
    // undecodable payload: duration-based synthetic refs, decoded=false
    val fake = out.filter(_.getLong(0) == 2L)
    assert(fake.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(fake.forall(r => !r.getBoolean(2) && r.isNullAt(3)))
  }

  /** A real WxH PNG from a seeded smooth gradient + noise pattern. */
  private def patternPng(w: Int, h: Int, seed: Int,
      brighten: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    val noise = Array.fill(8, 9)(rnd.nextInt(120))
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 120 / w) + noise(y * 8 / h)(x * 9 / w)
      val v = math.min(base + brighten, 255)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash: resize- and brightness-robust, discriminative, honest on stubs") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val orig = patternPng(90, 80, seed = 5)
    val Some(h0) = Multimodal.dHashKernel(orig)
    // a bilinear downscale of the SAME image stays within a few bits
    val Some(hScaled) = Multimodal.dHashKernel(Multimodal.resize(orig, 45, 40))
    assert(hamming(h0, hScaled) <= 8,
      s"resize moved dHash ${hamming(h0, hScaled)} bits")
    // a global brightness shift preserves every adjacent comparison
    val Some(hBright) = Multimodal.dHashKernel(patternPng(90, 80, 5, brighten = 20))
    assert(hamming(h0, hBright) <= 4,
      s"brightness moved dHash ${hamming(h0, hBright)} bits")
    // a DIFFERENT pattern is far away
    val Some(hOther) = Multimodal.dHashKernel(patternPng(90, 80, seed = 99))
    assert(hamming(h0, hOther) >= 16,
      s"different images only ${hamming(h0, hOther)} bits apart")
    // operator surface: decoded vs stub status, and the near-dup
    // composition with the multi-index Hamming join finds exactly the
    // perturbed copies of the original
    val media = Seq(
      (1L, orig), (2L, Multimodal.resize(orig, 45, 40)),
      (3L, patternPng(90, 80, 5, brighten = 20)),
      (4L, patternPng(90, 80, seed = 99)),
      (5L, "not an image".getBytes))
      .toDF("media_id", "content")
    val hashed = Multimodal.dHash(media)
    val status = hashed.select("media_id", "decode_status")
      .as[(Long, String)].collect().toMap
    assert(status == Map(1L -> "decoded", 2L -> "decoded", 3L -> "decoded",
      4L -> "decoded", 5L -> "stub"))
    val pairs = graft.operators.Dedup.hammingNearDupPairs(
        hashed.where(org.apache.spark.sql.functions.col("decode_status") === "decoded"),
        "media_id", "dhash", 64, 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }
}

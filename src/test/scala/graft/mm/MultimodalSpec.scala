package graft.mm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = {
    val rows = Seq(
      Row(1L, "image", "image/png", 64, 64, null, 100L, Array.tabulate(100)(i => i.toByte)),
      Row(2L, "video", "video/mp4", 640, 480, 2500L, 1000L, Array.tabulate(50)(i => (i * 2).toByte)),
      Row(3L, "audio", "audio/wav", null, null, 800L, 64L, Array.emptyByteArray))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r.toSeq: _*))),
      Multimodal.mediaSchema)
  }

  test("feature extraction runs per-partition with the stub kernel, fixed dim") {
    val out = Multimodal.extractFeatures(media, new Multimodal.StubKernel(8))
      .orderBy("asset_id").collect()
    assert(out.length == 3)
    val f1 = out(0).getSeq[Float](2)
    assert(f1.length == 8)
    assert(f1.exists(_ != 0f)) // non-trivial features for non-empty payload
    assert(out(2).getSeq[Float](2).forall(_ == 0f)) // empty payload
    // determinism
    val again = Multimodal.extractFeatures(media, new Multimodal.StubKernel(8))
      .orderBy("asset_id").collect()
    assert(out.map(_.getSeq[Float](2).toList).toSeq ==
      again.map(_.getSeq[Float](2).toList).toSeq)
  }

  test("metadata-only parquet scans prune the payload column (ReadSchema)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select("asset_id", "kind", "n_bytes")
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse(plan)
    assert(!readSchema.contains("payload"), s"payload not pruned: $readSchema")
  }

  test("resize plan computes aspect-preserving dims from metadata only") {
    val out = Multimodal.resizePlan(media, maxDim = 32).collect()
    // only the image row (64x64) qualifies; 64x64 → 32x32, needs resize
    assert(out.length == 1)
    assert(out(0).getAs[Long]("out_w") == 32L && out(0).getAs[Long]("out_h") == 32L)
    assert(out(0).getAs[Boolean]("needs_resize"))
    // already within budget → no-op flagged, dims unchanged
    val noop = Multimodal.resizePlan(media, maxDim = 100).collect()
    assert(noop(0).getAs[Long]("out_w") == 64L && !noop(0).getAs[Boolean]("needs_resize"))
    // unknown dimensions: the image is kept and flagged, never dropped
    val unknown = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, "image", "image/png", null, null, null, 10L,
        Array.tabulate(10)(_.toByte)))),
      Multimodal.mediaSchema)
    val probed = Multimodal.resizePlan(unknown, maxDim = 32).collect()
    assert(probed.length == 1 && probed(0).getAs[Boolean]("needs_resize"))
    assert(probed(0).isNullAt(probed(0).fieldIndex("out_w")))
  }

  test("corrupt 0x0 dimensions are treated as unknown: flagged, never dropped") {
    val degenerate = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(7L, "image", "image/png", 0, 0, null, 10L, Array.tabulate(10)(_.toByte)),
        Row(8L, "image", "image/png", 64, 0, null, 10L, Array.tabulate(10)(_.toByte)))),
      Multimodal.mediaSchema)
    val out = Multimodal.resizePlan(degenerate, maxDim = 32)
    // needs_resize must be TRUE (not NULL): a filter(needs_resize) keeps both
    assert(out.filter(col("needs_resize")).count() == 2)
    assert(out.collect().forall(r => r.isNullAt(r.fieldIndex("out_w"))))
  }

  test("media fixture is deterministic, typed, and partition arithmetic matches the query") {
    val docs = spark.range(1, 200).selectExpr("id AS doc_id",
      "repeat('x', CAST(id % 50 + 1 AS INT)) AS text")
    val fixture = Multimodal.mediaFromDocuments(docs)
    assert(fixture.schema("width").dataType.typeName == "integer")
    assert(fixture.schema("n_bytes").dataType.typeName == "long")
    // every kind present; zero-dim and null-dim rows exist
    assert(fixture.select("kind").distinct().count() == 3)
    assert(fixture.filter(col("width") === 0).count() > 0)
    assert(fixture.filter(col("kind") =!= "audio" && col("width").isNull).count() > 0)
    // the mm_byte_budget arithmetic IS repartitionByByteBudget's partition count
    val total = fixture.agg(sum(col("n_bytes"))).collect()(0).getLong(0)
    val expected = math.max(1, (total / 4096L).toInt)
    assert(Multimodal.repartitionByByteBudget(fixture, 4096L).rdd.getNumPartitions == expected)
  }

  test("frame sampling fans a video row out to per-frame work items without decode") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    assert(frames.map(_.getLong(1)).toSeq.sorted == Seq(0L, 1000L, 2000L))
    assert(frames.forall(_.getLong(0) == 2L))
  }

  test("byte-budget repartitioning bounds per-task payload") {
    val out = Multimodal.repartitionByByteBudget(media, bytesPerTask = 500L)
    assert(out.rdd.getNumPartitions >= 2) // 1164 bytes / 500 → ≥2 tasks
    assert(out.count() == 3)
  }

  // ---- real image decode via javax.imageio ----

  /** In-test PNG: solid color block of the given size. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def imageMedia = {
    val rows = Seq(
      Row(1L, "image", "image/png", 10, 10, null, 100L, png(10, 10, 0xff0000)), // red
      Row(2L, "image", "image/png", 200, 100, null, 100L, png(200, 100, 0x00ff00)), // green, too big
      Row(3L, "image", "image/png", null, null, null, 100L, png(80, 40, 0x0000ff)), // dims unknown
      Row(4L, "image", "image/png", 100, 100, null, 10L, Array.tabulate(10)(_.toByte)), // corrupt bytes
      Row(5L, "audio", "audio/wav", null, null, 800L, 50L, Array.tabulate(50)(_.toByte)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r.toSeq: _*))),
      Multimodal.mediaSchema)
  }

  test("ImageIoKernel decodes real pixels; non-images fall back to the stub") {
    val out = Multimodal.extractFeatures(imageMedia, new Multimodal.ImageIoKernel())
      .orderBy("asset_id").collect()
    val red = out(0).getSeq[Float](2)
    assert(red(0) == 10f && red(1) == 10f && red(2) == 1f) // probed w, h, aspect
    assert(math.abs(red(3) - 1f) < 0.01 && red(4) < 0.01 && red(5) < 0.01) // meanRGB
    assert(red(7) < 0.01) // solid color → zero luma spread
    val green = out(1).getSeq[Float](2)
    assert(green(0) == 200f && green(1) == 100f && math.abs(green(4) - 1f) < 0.01)
    // corrupt payload falls back to byte statistics, never throws
    val corrupt = out(3).getSeq[Float](2)
    assert(corrupt == new Multimodal.StubKernel(8)
      .features("image", Array.tabulate(10)(_.toByte)).toSeq)
    // audio kind routes straight to the fallback stub
    val audio = out(4).getSeq[Float](2)
    assert(audio == new Multimodal.StubKernel(8)
      .features("audio", Array.tabulate(50)(_.toByte)).toSeq)
  }

  test("needs_resize rows flow through a real pixel resize") {
    val planned = Multimodal.resizePlan(imageMedia, maxDim = 64)
      .filter(col("needs_resize"))
    // 200x100 (too big), unknown-dims 80x40 (probe), corrupt 50x50
    assert(planned.count() == 3)
    val out = Multimodal.resizeImages(planned, maxDim = 64)
      .orderBy("asset_id").collect()
    // 200x100 → 64x32, re-encoded: verify by decoding the output bytes
    val big = out(0)
    assert(big.getInt(1) == 64 && big.getInt(2) == 32 && big.getBoolean(4))
    val reDecoded = Multimodal.decodeImage(big.getAs[Array[Byte]]("payload")).get
    assert(reDecoded.getWidth == 64 && reDecoded.getHeight == 32)
    assert((reDecoded.getRGB(10, 10) & 0xffffff) == 0x00ff00) // still green
    // unknown dims probed from payload: 80x40 → 64x32
    val probed = out(1)
    assert(probed.getInt(1) == 64 && probed.getInt(2) == 32 && probed.getBoolean(4))
    // corrupt payload: passed through unchanged, never dropped
    val corrupt = out(2)
    assert(!corrupt.getBoolean(4) && corrupt.isNullAt(1))
    assert(corrupt.getAs[Array[Byte]]("payload").toSeq ==
      Array.tabulate(10)(_.toByte).toSeq)
    // already-fitting probe (needs_resize via unknown dims, but small):
    // resizeToFit reports dims without re-encoding
    val fit = Multimodal.resizeToFit(png(20, 20, 0xffffff), maxDim = 64).get
    assert(fit._2 == 20 && fit._3 == 20 && !fit._4)
  }

  // ---- real audio decode via javax.sound.sampled ----

  /** In-test WAV: 16-bit mono PCM sine at `freqHz`, amplitude in [0,1]. */
  private def wav(sampleRate: Float, seconds: Double, freqHz: Double,
      amplitude: Double): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate) * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("AudioWavKernel decodes real PCM: rate, duration, rms, zero-cross rate") {
    val sine = wav(sampleRate = 8000f, seconds = 0.5, freqHz = 440, amplitude = 0.6)
    val rows = Seq(
      Row(1L, "audio", "audio/wav", null, null, 500L, sine.length.toLong, sine),
      Row(2L, "audio", "audio/wav", null, null, 100L, 20L, Array.tabulate(20)(_.toByte)), // corrupt
      Row(3L, "image", "image/png", 10, 10, null, 100L, png(10, 10, 0xff0000))) // routes to imageio
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r.toSeq: _*))),
      Multimodal.mediaSchema)
    val out = Multimodal.extractFeatures(media, new Multimodal.AudioWavKernel())
      .orderBy("asset_id").collect()
    val f = out(0).getSeq[Float](2)
    assert(f(0) == 8000f && f(1) == 1f) // sample rate, channels
    assert(math.abs(f(2) - 0.5f) < 1e-3) // duration
    assert(math.abs(f(3) - 0.6 / math.sqrt(2)) < 0.01) // sine rms = A/√2
    assert(math.abs(f(4) - 0.6f) < 0.01) // peak = A
    // a 440 Hz sine crosses zero 2·440 times/sec → rate 2·440/8000 = 0.11
    assert(math.abs(f(5) - 2 * 440 / 8000.0) < 0.005)
    // corrupt payload falls back to byte statistics, never throws
    assert(out(1).getSeq[Float](2) == new Multimodal.StubKernel(8)
      .features("audio", Array.tabulate(20)(_.toByte)).toSeq)
    // image kind chains through the real image kernel
    val red = out(2).getSeq[Float](2)
    assert(red(0) == 10f && math.abs(red(3) - 1f) < 0.01)
  }

  test("decodeAudioStats handles stereo and big-endian AIFF") {
    // stereo: left = sine, right = silence → mono mix halves the amplitude
    val sr = 4000f; val n = 2000
    val pcm = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val v = (0.8 * math.sin(2 * math.Pi * 200 * i / sr) * 32767).toInt
      pcm(4 * i) = ((v >> 8) & 0xff).toByte // big-endian left
      pcm(4 * i + 1) = (v & 0xff).toByte
      pcm(4 * i + 2) = 0; pcm(4 * i + 3) = 0 // silent right
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 2, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, baos)
    val a = Multimodal.decodeAudioStats(baos.toByteArray).get
    assert(a.channels == 2 && a.sampleRate == 4000f)
    assert(math.abs(a.durationSec - 0.5f) < 1e-3)
    assert(math.abs(a.peak - 0.4) < 0.01) // mono mix of (0.8, 0)
    assert(math.abs(a.rms - 0.4 / math.sqrt(2)) < 0.01)
  }

  // ---- real video decode: MJPEG-in-AVI built in-test ----

  /** Solid-gray JPEG frame. */
  private def jpegFrame(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Minimal RIFF/AVI container around MJPEG frames: hdrl(avih) + movi. */
  private def buildAvi(
      frames: Seq[Array[Byte]], w: Int, h: Int, usPerFrame: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, usPerFrame)
      b.putInt(16, frames.length)
      b.putInt(32, w)
      b.putInt(36, h)
      b.array()
    }
    val hdrlSize = 4 + 8 + avih.length
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    cc("RIFF"); u32(riffSize); cc("AVI ")
    cc("LIST"); u32(hdrlSize); cc("hdrl")
    cc("avih"); u32(avih.length); out.write(avih)
    cc("LIST"); u32(moviSize); cc("movi")
    frames.foreach { f =>
      cc("00dc"); u32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0)
    }
    out.toByteArray
  }

  test("truncated avih header falls back to decoded-frame dims, no -1 leak") {
    // movi list FIRST, then an hdrl whose avih claims 56 bytes but the
    // file ends 12 bytes in — the guard must reject the short header
    // (never emit u32's -1 sentinel as width/height/fps) and let the
    // decoded JPEG supply the dimensions
    val out = new java.io.ByteArrayOutputStream()
    def cc(x: String): Unit = out.write(x.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    val f = jpegFrame(32, 24, 128)
    val moviSize = 4 + 8 + f.length + (f.length & 1)
    cc("RIFF"); u32(4 + 8 + moviSize + 8 + 4 + 8 + 56); cc("AVI ")
    cc("LIST"); u32(moviSize); cc("movi")
    cc("00dc"); u32(f.length); out.write(f)
    if ((f.length & 1) == 1) out.write(0)
    cc("LIST"); u32(4 + 8 + 56); cc("hdrl")
    cc("avih"); u32(56); out.write(Array.fill[Byte](12)(0x7f)) // truncated
    val v = Multimodal.decodeAviStats(out.toByteArray).get
    assert(v.width == 32 && v.height == 24, s"want decoded dims, got $v")
    assert(v.fps == 0f && v.nFrames == 1 && v.durationSec == 0f, v.toString)
  }

  test("frames nested in 'rec ' LISTs keep file order (interleaved layout)") {
    // standard AVI interleave: direct ##dc chunks mixed with frames
    // wrapped one level deeper in 'rec ' LISTs — a breadth-first walk
    // without the offset sort would probe [f1, f3, f2] and misread the
    // monotone luma ramp as extra motion
    val frames = Seq(jpegFrame(16, 16, 30), jpegFrame(16, 16, 120),
      jpegFrame(16, 16, 220))
    val out = new java.io.ByteArrayOutputStream()
    def cc(x: String): Unit = out.write(x.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def chunkLen(f: Array[Byte]): Int = 8 + f.length + (f.length & 1)
    val recSize = 4 + chunkLen(frames(1))
    val moviSize = 4 + chunkLen(frames(0)) + (8 + recSize) + chunkLen(frames(2))
    cc("RIFF"); u32(4 + 8 + moviSize); cc("AVI ")
    cc("LIST"); u32(moviSize); cc("movi")
    def frame(f: Array[Byte]): Unit = {
      cc("00dc"); u32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0)
    }
    frame(frames(0))
    cc("LIST"); u32(recSize); cc("rec "); frame(frames(1))
    frame(frames(2))
    val v = Multimodal.decodeAviStats(out.toByteArray).get
    assert(v.nFrames == 3)
    // file-order lumas ≈ .12 .47 .86 → mean |Δ| ≈ 0.37; the out-of-
    // order walk (.12 .86 .47) reads ≈ 0.56
    assert(v.motion > 0.3f && v.motion < 0.45f,
      s"motion must reflect file-order ramp, got ${v.motion}")
  }

  test("frames across multiple movi lists keep file order (AVIX-style)") {
    // two sibling movi lists; dark frames in the first, bright in the
    // second — file-order probing sees ONE dark→bright step, so motion
    // = sum|Δ| / moved ≈ Δ/3; reversed list order would also be one
    // step here, but interleaved sampling from a LIFO walk historically
    // visited the SECOND list first, breaking monotone luma — pin the
    // monotone order directly via per-frame mean luma recomputation
    val frames = Seq(jpegFrame(16, 16, 20), jpegFrame(16, 16, 60),
      jpegFrame(16, 16, 200), jpegFrame(16, 16, 240))
    val out = new java.io.ByteArrayOutputStream()
    def cc(x: String): Unit = out.write(x.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def moviOf(fs: Seq[Array[Byte]]): Int = 4 + fs.map(x => 8 + x.length + (x.length & 1)).sum
    val m1 = moviOf(frames.take(2)); val m2 = moviOf(frames.drop(2))
    cc("RIFF"); u32(4 + (8 + m1) + (8 + m2)); cc("AVI ")
    for ((fs, ms) <- Seq((frames.take(2), m1), (frames.drop(2), m2))) {
      cc("LIST"); u32(ms); cc("movi")
      fs.foreach { x => cc("00dc"); u32(x.length); out.write(x)
        if ((x.length & 1) == 1) out.write(0) }
    }
    val v = Multimodal.decodeAviStats(out.toByteArray).get
    assert(v.nFrames == 4)
    // file order lumas ≈ .08 .24 .78 .94 → mean |Δ| over 3 steps ≈ 0.29;
    // a reversed-sibling walk would see .78 .94 .08 .24 → ≈ 0.40
    assert(v.motion > 0.2f && v.motion < 0.35f,
      s"motion must reflect file-order monotone ramp, got ${v.motion}")
  }

  test("VideoAviKernel decodes MJPEG AVI frames: dims, fps, duration, luma, motion") {
    // flashing clip: alternating dark/bright frames → motion ≈ ΔLuma
    val flash = buildAvi(
      (0 until 6).map(i => jpegFrame(48, 32, if (i % 2 == 0) 20 else 220)),
      w = 48, h = 32, usPerFrame = 40000) // 25 fps
    val v = Multimodal.decodeAviStats(flash).get
    assert(v.width == 48 && v.height == 32 && v.nFrames == 6)
    assert(math.abs(v.fps - 25f) < 1e-3)
    assert(math.abs(v.durationSec - 0.24f) < 1e-3)
    assert(v.meanLuma > 0.3f && v.meanLuma < 0.7f)
    assert(v.motion > 0.5f, s"alternating frames must show motion, got ${v.motion}")

    // static clip: identical frames → zero motion
    val static0 = buildAvi(
      (0 until 4).map(_ => jpegFrame(32, 32, 128)), 32, 32, 33333)
    val s = Multimodal.decodeAviStats(static0).get
    assert(s.motion < 1e-4, s"static clip must show ~no motion, got ${s.motion}")
    assert(math.abs(s.meanLuma - 0.5f) < 0.05)

    // kernel routing: video decodes, non-AVI video falls back, audio
    // and image still decode through the chained kernels
    val k = new Multimodal.VideoAviKernel()
    val feats = k.features("video", flash)
    assert(feats(0) == 48f && feats(5) == 6f)
    val garbage = Array.tabulate(64)(_.toByte)
    assert(k.features("video", garbage).toSeq ==
      new Multimodal.StubKernel(8).features("video", garbage).toSeq)
    val img = png(10, 10, 0xff0000)
    assert(k.features("image", img)(0) == 10f, "image decode must chain through")
  }

  test("dHash: planted near-identical PNGs within Hamming 2, distinct bases far apart") {
    val sigs = (0L until 40L).map(id => id -> Multimodal.dhash64(Multimodal.syntheticPng(id)).get)
    // planted pairs (2k, 2k+1): the perturbation lives inside ONE grid
    // cell, so at most the two comparisons touching it can flip
    for (k <- 0 until 20) {
      val ham = java.lang.Long.bitCount(sigs(2 * k)._2 ^ sigs(2 * k + 1)._2)
      assert(ham <= 2, s"planted pair $k drifted to Hamming $ham")
    }
    // distinct bases: independent noise => ~32-bit distances; anything
    // under 10 would threaten the banded join's precision story
    val crossMin = (for {
      a <- 0 until 40; b <- a + 1 until 40 if a / 2 != b / 2
    } yield java.lang.Long.bitCount(sigs(a)._2 ^ sigs(b)._2)).min
    assert(crossMin >= 10, s"distinct bases too close: min cross Hamming $crossMin")
    // undecodable payloads yield no signature (the asset is absent from
    // the sig frame, not silently hashed to garbage)
    assert(Multimodal.dhash64(Array.tabulate(32)(_.toByte)).isEmpty)
    assert(Multimodal.dhash64(null).isEmpty)
  }

  test("dHash banding is pigeonhole-complete to Hamming 3 and exact-verified") {
    import spark.implicits._
    // adversarial signatures: pairs at exactly Hamming 3 with the flipped
    // bits CONCENTRATED in one band (the worst case for banding), plus
    // Hamming-4 pairs that must be filtered by the exact verify
    val base = 0x0123456789abcdefL
    val sigs = Seq(
      10L -> base,
      11L -> (base ^ 0x7L),                  // Hamming 3, all in band 0
      12L -> (base ^ (0x7L << 48)),          // Hamming 3, all in band 3
      13L -> (base ^ 0x0001000100010001L),   // Hamming 4, one bit per band
      14L -> ~base                           // Hamming 64
    ).toDF("asset_id", "dhash")
    val pairs = Multimodal.dhashNearDupPairs(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((10L, 11L, 3)), s"band-0-concentrated pair missed: $pairs")
    assert(pairs.contains((10L, 12L, 3)), s"band-3-concentrated pair missed: $pairs")
    // 11 vs 12 differ in 6 bits across two bands — candidates (bands
    // 1/2 match) but the exact verify must reject them, like 13/14
    assert(!pairs.exists(p => p._3 > 3), s"exact verify leaked: $pairs")
    assert(!pairs.exists(p => Set(13L, 14L).contains(p._1) || Set(13L, 14L).contains(p._2)),
      s"Hamming>3 asset emitted: $pairs")
  }

  test("audio fingerprint: gain-invariant, planted pairs within Hamming 2, bases far apart") {
    def fp(id: Long) =
      Multimodal.audioFingerprint64(Multimodal.syntheticAudioPairWav(id)).get
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // planted pairs: within Hamming 2 (one perturbed window → ≤2 comparisons)
    (0L until 10L).foreach { k =>
      val h = hamming(fp(2 * k), fp(2 * k + 1))
      assert(h <= 2, s"planted pair $k at Hamming $h")
    }
    // distinct bases: far apart (independent splitmix64 energy profiles)
    for (a <- 0L until 6L; b <- (a + 1) until 6L) {
      val h = hamming(fp(2 * a), fp(2 * b))
      assert(h > 10, s"bases $a,$b at Hamming $h — profiles not independent")
    }
    // gain invariance directly: the SAME clip re-scaled must fingerprint
    // identically (the odd twin isolates gain+perturbation; here scale a
    // base clip's PCM by hand and require Hamming 0)
    val base = Multimodal.syntheticAudioPairWav(40L) // asset 2k=40, base profile 20
    val fpBase = Multimodal.audioFingerprint64(base).get
    // decode, scale every 16-bit sample by 2 exactly, re-encode
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(base))
    val pcm = ais.readAllBytes()
    var i = 0
    while (i < pcm.length) {
      val v = ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort * 2
      pcm(i) = (v & 0xff).toByte; pcm(i + 1) = ((v >> 8) & 0xff).toByte
      i += 2
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val scaled = {
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val fpScaled = Multimodal.audioFingerprint64(scaled).get
    assert(fpBase == fpScaled, "2x gain changed the fingerprint")
    // undecodable payload → absent, not garbage
    assert(Multimodal.audioFingerprint64("not audio".getBytes).isEmpty)
    // too-short clip → absent (aliased prints would pollute banding)
    assert(Multimodal.audioFingerprint64(
      Multimodal.syntheticAudioPairWav(0L, nWindows = 10)).isEmpty)
  }

  test("video fingerprint: planted pairs within Hamming 2, bases far apart, order-robust") {
    def fp(id: Long) =
      Multimodal.videoFingerprint64(Multimodal.syntheticVideoPairAvi(id)).get
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0L until 8L).foreach { k =>
      val h = hamming(fp(2 * k), fp(2 * k + 1))
      assert(h <= 2, s"planted pair $k at Hamming $h")
    }
    for (a <- 0L until 5L; b <- (a + 1) until 5L) {
      val h = hamming(fp(2 * a), fp(2 * b))
      assert(h > 10, s"bases $a,$b at Hamming $h")
    }
    // too-short clip and garbage -> absent, not garbage prints
    assert(Multimodal.videoFingerprint64(
      Multimodal.syntheticVideoPairAvi(0L, nFrames = 10)).isEmpty)
    assert(Multimodal.videoFingerprint64("not a movie".getBytes).isEmpty)
    // refactor guard: the shared chunk walk still feeds decodeAviStats —
    // header metadata and frame count survive on the fixture clip
    val v = Multimodal.decodeAviStats(Multimodal.syntheticVideoPairAvi(0L)).get
    assert(v.width == 16 && v.height == 16 && v.nFrames == 65)
    assert(math.abs(v.fps - 25f) < 1e-3)
  }
}

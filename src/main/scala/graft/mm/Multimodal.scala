package graft.mm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, plus the
  * Spark-side plumbing (schema, batching, partition sizing) for decode /
  * feature-extract stages.
  *
  * Image decode is REAL — [[Multimodal.ImageIoKernel]] and
  * [[Multimodal.resizeImages]] run actual pixel work through the JDK's
  * javax.imageio (PNG/JPEG/BMP/GIF, no extra dependencies). Audio
  * decode is REAL too — [[Multimodal.AudioWavKernel]] parses
  * WAV/AIFF/AU PCM through the JDK's javax.sound.sampled. Video decode
  * is REAL for MJPEG-in-AVI — [[Multimodal.VideoAviKernel]] walks the
  * RIFF/AVI chunk tree and decodes strided JPEG frames through
  * javax.imageio, emitting real temporal features (motion = mean
  * |Δluma| across sampled frames). Other video codecs (H.264/MP4 —
  * no JDK decoder) fall back to the deterministic byte-stat stub
  * behind `MediaKernel`, so the distributed plumbing (schema contract,
  * batch shape, partition-level execution, row-group pruning on
  * metadata) is real and tested for every kind; swapping in a fuller
  * video decoder touches ONLY the kernel.
  *
  * Scale notes: media tables are stored with payloads in their own
  * parquet column (columnar ⇒ metadata-only queries never read bytes);
  * decode runs via mapPartitions with a bounded batch per task — the
  * executor-memory knob is rows-per-partition (repartition by byte
  * budget), not driver collect.
  */
object Multimodal {

  /** media table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType), // image/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType), // audio/video
    StructField("n_bytes", LongType, nullable = false),
    StructField("payload", BinaryType)))

  /** The pluggable decode/feature kernel. Real implementations wrap an
    * image/audio codec; the stub is a deterministic byte-statistics fake
    * so tests exercise identical plumbing. */
  trait MediaKernel extends Serializable {
    /** Fixed-length feature vector from a payload. */
    def features(kind: String, payload: Array[Byte]): Array[Float]
    def dim: Int
  }

  /** Deterministic stand-in: byte histogram moments (decode step stubbed
    * — see file header). */
  final class StubKernel(val dim: Int = 8) extends MediaKernel {
    def features(kind: String, payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload == null || payload.isEmpty) return out
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      var j = 0
      while (j < dim) { out(j) /= math.max(1, payload.length / dim).toFloat; j += 1 }
      out
    }
  }

  /** REAL image kernel — the JDK ships javax.imageio (PNG/JPEG/BMP/GIF),
    * so kind=image decodes actual pixels with zero new dependencies.
    * Features (dim=8): [width, height, aspect, meanR, meanG, meanB,
    * meanLuma, stdLuma] — channel means in [0,1], sampled on a bounded
    * deterministic stride (≤ 64×64 probe pixels per image, so feature
    * cost is constant per asset regardless of resolution). Non-image
    * kinds and undecodable payloads fall back to the byte-stat stub:
    * the stub boundary is now ONLY audio/video codecs. */
  final class ImageIoKernel(fallback: MediaKernel = new StubKernel(8)) extends MediaKernel {
    val dim = 8
    require(fallback.dim == dim, "fallback kernel must emit the same dim")
    def features(kind: String, payload: Array[Byte]): Array[Float] = {
      if (kind != "image") return fallback.features(kind, payload)
      decodeImage(payload) match {
        case None => fallback.features(kind, payload)
        case Some(img) =>
          val w = img.getWidth; val h = img.getHeight
          val sx = math.max(1, w / 64); val sy = math.max(1, h / 64)
          var sr = 0.0; var sg = 0.0; var sb = 0.0
          var sl = 0.0; var sl2 = 0.0; var n = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              val luma = 0.299 * r + 0.587 * g + 0.114 * b
              sr += r; sg += g; sb += b; sl += luma; sl2 += luma * luma; n += 1
              x += sx
            }
            y += sy
          }
          val ml = sl / n
          Array(w.toFloat, h.toFloat, w.toFloat / h,
            (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
            (ml / 255.0).toFloat,
            (math.sqrt(math.max(0.0, sl2 / n - ml * ml)) / 255.0).toFloat)
      }
    }
  }

  /** REAL audio kernel — the JDK ships javax.sound.sampled (WAV/AIFF/AU
    * containers, PCM 8/16/24/32-bit), so kind=audio decodes actual
    * samples with zero new dependencies. Features (dim=8):
    * [sampleRateHz, channels, durationSec, rms, peak, zeroCrossRate,
    * meanAbs, stdAmp] over the mono mix, amplitudes normalized to
    * [-1,1]; frames are probed on a bounded deterministic stride
    * (≤ 65536 frames per asset) so feature cost is constant regardless
    * of clip length. The default fallback chains through
    * [[ImageIoKernel]]: `new AudioWavKernel()` decodes audio AND images
    * for real, leaving ONLY video on the byte-stat stub. */
  final class AudioWavKernel(fallback: MediaKernel = new ImageIoKernel()) extends MediaKernel {
    val dim = 8
    require(fallback.dim == dim, "fallback kernel must emit the same dim")
    def features(kind: String, payload: Array[Byte]): Array[Float] = {
      if (kind != "audio") return fallback.features(kind, payload)
      decodeAudioStats(payload) match {
        case None => fallback.features(kind, payload)
        case Some(a) => Array(a.sampleRate, a.channels.toFloat, a.durationSec,
          a.rms, a.peak, a.zeroCrossRate, a.meanAbs, a.stdAmp)
      }
    }
  }

  /** REAL video kernel — MJPEG-in-AVI, the one video format decodable
    * with zero new dependencies: the RIFF/AVI container is a length-
    * prefixed chunk walk (parsed here), and each '00dc'/'00db' movi
    * chunk is a complete JPEG frame javax.imageio already decodes.
    * Features (dim=8): [width, height, aspect, fps, durationSec,
    * nFrames, meanLuma, motion] — meanLuma in [0,1] over ≤8 evenly-
    * strided sampled frames (constant probe cost per asset regardless
    * of clip length, the image/audio kernels' contract), motion = mean
    * |Δluma| between consecutive sampled frames in [0,1] (the temporal
    * signal: 0 for a static clip, large for cuts/flashes — the cheap
    * screen for frozen captures and strobe content). Non-AVI video
    * payloads (MP4/H.264 etc. — no JDK codec) fall back through the
    * audio+image chain to the byte-stat stub: the stub boundary is now
    * only NON-MJPEG video codecs. Chains as the outermost default:
    * `new VideoAviKernel()` decodes video AND audio AND images. */
  final class VideoAviKernel(fallback: MediaKernel = new AudioWavKernel()) extends MediaKernel {
    val dim = 8
    require(fallback.dim == dim, "fallback kernel must emit the same dim")
    def features(kind: String, payload: Array[Byte]): Array[Float] = {
      if (kind != "video") return fallback.features(kind, payload)
      decodeAviStats(payload) match {
        case None => fallback.features(kind, payload)
        case Some(v) => Array(v.width.toFloat, v.height.toFloat,
          v.width.toFloat / math.max(1, v.height),
          v.fps, v.durationSec, v.nFrames.toFloat, v.meanLuma, v.motion)
      }
    }
  }

  private[mm] final case class VideoStats(
      width: Int, height: Int, fps: Float, durationSec: Float,
      nFrames: Int, meanLuma: Float, motion: Float)

  /** Parse an MJPEG AVI payload: walk the RIFF chunk tree for the
    * 'avih' main header (µs/frame, total frames, dimensions) and the
    * 'movi' list's video frame chunks, decode ≤ `maxProbeFrames`
    * evenly-strided frames as JPEG, and reduce to luma statistics.
    * None = not a RIFF/AVI or no decodable frames (caller falls back).
    */
  /** RIFF/AVI header + ordered frame chunks — the shared walk behind
    * [[decodeAviStats]] and [[videoFingerprint64]]. */
  private[mm] final case class AviChunks(
      usPerFrame: Long, totalFrames: Long, w: Int, h: Int,
      frames: IndexedSeq[(Int, Int)])

  private[mm] def decodeAviStats(
      payload: Array[Byte], maxProbeFrames: Int = 8): Option[VideoStats] = {
    aviFrameChunks(payload).flatMap { c =>
      decodeAviStatsFrom(payload, c, maxProbeFrames)
    }
  }

  private[mm] def aviFrameChunks(payload: Array[Byte]): Option[AviChunks] = {
    if (payload == null || payload.length < 24) return None
    def fourcc(off: Int): String =
      if (off + 4 > payload.length) ""
      else new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(off: Int): Long =
      if (off + 4 > payload.length) -1L
      else (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val end = math.min(payload.length.toLong, 8 + u32(4))

    var usPerFrame = 0L; var totalFrames = 0L; var w = 0; var h = 0
    val frameOffsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

    // iterative chunk walk (LIST recurses one level at a time via an
    // explicit FIFO queue — no payload-controlled recursion depth, and
    // sibling LISTs are visited in FILE order so frames spanning
    // multiple movi lists (RIFF AVIX extensions) keep temporal order —
    // the |delta-luma| motion feature assumes consecutive samples)
    val queue = scala.collection.mutable.Queue[(Long, Long)]((12L, end))
    while (queue.nonEmpty) {
      var (pos, lim) = queue.dequeue()
      while (pos + 8 <= lim) {
        val id = fourcc(pos.toInt)
        val size = u32(pos.toInt + 4)
        if (size < 0) { pos = lim } // truncated
        else {
          val dataStart = pos + 8
          val dataEnd = math.min(lim, dataStart + size)
          id match {
            case "LIST" =>
              // list type occupies the first 4 data bytes
              queue.enqueue((dataStart + 4, dataEnd))
            case "avih" if size >= 40 && dataEnd - dataStart >= 40 =>
              // guard on bytes actually PRESENT (dataEnd − dataStart),
              // not the claimed size — a truncated header would read
              // past payload and u32's -1 sentinel would otherwise
              // leak out as width/height/fps features
              val upf = u32(dataStart.toInt)
              val tf = u32(dataStart.toInt + 16)
              val ww = u32(dataStart.toInt + 32)
              val hh = u32(dataStart.toInt + 36)
              if (upf >= 0 && tf >= 0 && ww >= 0 && hh >= 0) {
                usPerFrame = upf; totalFrames = tf
                w = ww.toInt; h = hh.toInt
              }
            case _ =>
              // movi video chunks: '##dc' (compressed) / '##db' (full)
              val tail = if (id.length == 4) id.substring(2) else ""
              if ((tail == "dc" || tail == "db") && size > 0 && dataEnd <= end)
                frameOffsets += ((dataStart.toInt, size.toInt))
          }
          pos = dataStart + size + (size & 1) // chunks pad to even
        }
      }
    }
    if (frameOffsets.isEmpty) return None
    // temporal order = FILE order of the frame chunks: the queue walk
    // visits siblings in order but frames at DIFFERENT nesting depths
    // (interleaved 'rec ' LISTs mixed with direct ##dc chunks — the
    // standard AVI interleave) would still collect out of order, so
    // sort by byte offset — the one ordering every layout agrees on
    Some(AviChunks(usPerFrame, totalFrames, w, h,
      frameOffsets.sortInPlaceBy(_._1).toIndexedSeq))
  }

  /** Mean luma of one decoded frame on a bounded pixel stride. */
  private def frameLuma(img: java.awt.image.BufferedImage): Double = {
    val sx = math.max(1, img.getWidth / 32)
    val sy = math.max(1, img.getHeight / 32)
    var sl = 0.0; var np = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sl += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        np += 1
        x += sx
      }
      y += sy
    }
    sl / np / 255.0
  }

  private def decodeAviStatsFrom(
      payload: Array[Byte], c: AviChunks, maxProbeFrames: Int): Option[VideoStats] = {
    var w = c.w; var h = c.h
    val ordered = c.frames
    val n = ordered.length
    val stride = math.max(1, n / maxProbeFrames)
    var prevLuma = Double.NaN
    var sumLuma = 0.0; var sumMotion = 0.0
    var probed = 0; var moved = 0
    var i = 0
    while (i < n) {
      val (off, len) = ordered(i)
      val frame = java.util.Arrays.copyOfRange(payload, off, off + len)
      decodeImage(frame) match {
        case Some(img) =>
          if (w == 0) { w = img.getWidth; h = img.getHeight }
          val luma = frameLuma(img)
          sumLuma += luma; probed += 1
          if (!prevLuma.isNaN) { sumMotion += math.abs(luma - prevLuma); moved += 1 }
          prevLuma = luma
        case None => // skip undecodable frame
      }
      i += stride
    }
    if (probed == 0) return None
    val fps = if (c.usPerFrame > 0) (1e6 / c.usPerFrame).toFloat else 0f
    val nf = if (c.totalFrames > 0) c.totalFrames.toInt else n
    val dur = if (c.usPerFrame > 0) (nf * c.usPerFrame / 1e6).toFloat else 0f
    Some(VideoStats(w, h, fps, dur, nf,
      (sumLuma / probed).toFloat,
      (if (moved == 0) 0.0 else sumMotion / moved).toFloat))
  }

  private[mm] final case class AudioStats(
      sampleRate: Float, channels: Int, durationSec: Float, rms: Float,
      peak: Float, zeroCrossRate: Float, meanAbs: Float, stdAmp: Float)

  /** Decode a PCM audio payload to mono-mix amplitude statistics.
    * Supported: whatever the JDK parses (WAV/AIFF/AU) with PCM signed
    * 8/16/24/32-bit or unsigned 8-bit samples, either endianness.
    * None = not audio / unsupported encoding (caller falls back). */
  private[mm] def decodeAudioStats(
      payload: Array[Byte], maxProbeFrames: Int = 1 << 16): Option[AudioStats] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned8 =
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
        if (!(signed && (bits % 8 == 0) && bits <= 32) && !unsigned8) return None
        val channels = fmt.getChannels
        val bytesPerSample = bits / 8
        val frameSize =
          if (fmt.getFrameSize > 0) fmt.getFrameSize else bytesPerSample * channels
        val totalFrames = ais.getFrameLength
        if (totalFrames <= 0) return None
        require(totalFrames <= Int.MaxValue, "audio stream too long")
        val frames = totalFrames.toInt
        val big = fmt.isBigEndian
        val full = 1L << (bits - 1) // normalizer: max magnitude of a sample
        // probed frames are READ one at a time with skips in between —
        // the stream is never buffered whole (the payload byte array is
        // already the second copy in memory; a third would double peak
        // usage for nothing, the probe touches ≤ maxProbeFrames frames)
        val frameBuf = new Array[Byte](frameSize)
        def sampleAt(off: Int): Double = {
          var v = 0L
          if (big) { var i = 0; while (i < bytesPerSample) { v = (v << 8) | (frameBuf(off + i) & 0xffL); i += 1 } }
          else { var i = bytesPerSample - 1; while (i >= 0) { v = (v << 8) | (frameBuf(off + i) & 0xffL); i -= 1 } }
          if (signed) {
            val shift = 64 - bits
            ((v << shift) >> shift).toDouble / full
          } else (v - 128.0) / 128.0
        }
        def skipFully(bytes: Long): Boolean = {
          var left = bytes
          while (left > 0) {
            val sk = ais.skip(left)
            if (sk <= 0) return false
            left -= sk
          }
          true
        }
        val stride = math.max(1, frames / maxProbeFrames)
        var s = 0.0; var s2 = 0.0; var sAbs = 0.0; var peak = 0.0
        var crossings = 0L; var n = 0L; var prev = 0.0; var havePrev = false
        var f = 0
        var eof = false
        while (f < frames && !eof) {
          if (ais.readNBytes(frameBuf, 0, frameSize) < frameSize) eof = true
          else {
            var mono = 0.0
            var c = 0
            while (c < channels) { mono += sampleAt(c * bytesPerSample); c += 1 }
            mono /= channels
            s += mono; s2 += mono * mono; sAbs += math.abs(mono)
            if (math.abs(mono) > peak) peak = math.abs(mono)
            if (havePrev && ((prev < 0 && mono >= 0) || (prev >= 0 && mono < 0))) crossings += 1
            prev = mono; havePrev = true; n += 1
            f += stride
            if (stride > 1 && f < frames) eof = !skipFully((stride - 1).toLong * frameSize)
          }
        }
        if (n == 0) return None
        val mean = s / n
        val frameRate = if (fmt.getFrameRate > 0) fmt.getFrameRate else fmt.getSampleRate
        Some(AudioStats(
          sampleRate = fmt.getSampleRate,
          channels = channels,
          durationSec = (frames / frameRate.toDouble).toFloat,
          rms = math.sqrt(s2 / n).toFloat,
          peak = peak.toFloat,
          zeroCrossRate = (crossings.toDouble / math.max(1L, n - 1)).toFloat,
          meanAbs = (sAbs / n).toFloat,
          stdAmp = math.sqrt(math.max(0.0, s2 / n - mean * mean)).toFloat))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  private[mm] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

  /** Decode → bilinear scale to fit maxDim → PNG re-encode. Returns
    * (bytes, w, h, resized): already-fitting payloads pass through
    * byte-identical with their probed dims; None = undecodable. */
  private[mm] def resizeToFit(payload: Array[Byte], maxDim: Int)
      : Option[(Array[Byte], Int, Int, Boolean)] =
    decodeImage(payload).map { img =>
      val w = img.getWidth; val h = img.getHeight
      if (math.max(w, h) <= maxDim) (payload, w, h, false)
      else {
        val scale = maxDim.toDouble / math.max(w, h)
        val ow = math.max(1, math.floor(w * scale).toInt)
        val oh = math.max(1, math.floor(h * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, ow, oh, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        (baos.toByteArray, ow, oh, true)
      }
    }

  /** Execute the resize for [[resizePlan]]'s needs_resize rows: REAL
    * pixel work via javax.imageio, per-partition, payload read only
    * here. Unknown/corrupt-dimension rows are probed from the payload
    * (the plan routes them here with needs_resize=true). Never drops an
    * asset: undecodable payloads pass through with resized=false and
    * null output dims. */
  def resizeImages(planned: DataFrame, maxDim: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("payload", BinaryType),
      StructField("resized", BooleanType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    planned.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        resizeToFit(payload, maxDim) match {
          case Some((bytes, w, h, resized)) => Row(r.getLong(0), w, h, bytes, resized)
          case None => Row(r.getLong(0), null, null, payload, false)
        }
      }
    }(enc)
  }

  /** Decode/feature-extract stage: binary payload → feature vector,
    * executed per-partition with the payload column read only here
    * (metadata queries upstream never touch bytes). */
  def extractFeatures(media: DataFrame, kernel: MediaKernel): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    media.select("asset_id", "kind", "payload").mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(0), r.getString(1),
          kernel.features(r.getString(1), r.getAs[Array[Byte]]("payload")).toSeq)
      }
    }(enc)
  }

  /** Repartition a media table so each task's payload bytes stay within
    * budget — the knob that keeps decode tasks memory-bounded at 100 TB. */
  def repartitionByByteBudget(media: DataFrame, bytesPerTask: Long): DataFrame = {
    val totalBytes = media.agg(sum(col("n_bytes"))).collect()(0).getLong(0)
    val nParts = math.max(1, (totalBytes / math.max(1L, bytesPerTask)).toInt)
    media.repartition(nParts)
  }

  /** Resize plan for images: compute output dimensions that fit inside
    * maxDim preserving aspect ratio — pure column expressions over the
    * width/height metadata, so the planner sees which rows are no-ops
    * (already small enough) BEFORE any payload byte is read; only
    * needs_resize rows feed the (pluggable, stubbed) pixel kernel. The
    * rounding is floor(dim * scale), never below 1. */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    // non-positive dimensions are corrupt metadata, not a resize no-op:
    // treat them like unknown dims (probe the payload, needs_resize=true)
    // — otherwise maxDim/greatest(0,0) is NULL and the row would vanish
    // from a filter(needs_resize), silently losing the asset
    val dimsKnown = col("width").isNotNull && col("height").isNotNull &&
      col("width") > 0 && col("height") > 0
    media
      .filter(col("kind") === "image")
      .withColumn("out_w", when(dimsKnown,
        greatest(lit(1L), floor(col("width") * scale)).cast("long")))
      .withColumn("out_h", when(dimsKnown,
        greatest(lit(1L), floor(col("height") * scale)).cast("long")))
      // unknown-dimension images are NOT dropped: they flow to the kernel
      // flagged needs_resize (it must probe the payload for dimensions) —
      // silently losing assets from the pipeline is worse than one decode
      .withColumn("needs_resize", !dimsKnown ||
        (col("out_w") =!= col("width")) || (col("out_h") =!= col("height")))
  }

  /** Deterministic media-METADATA fixture derived from the documents
    * table: every column is pure integer/length arithmetic on doc_id and
    * text, so a SQL oracle (DuckDB) can mirror it exactly — this is what
    * lets resize/frame-sample/byte-budget plans be oracle-checked without
    * media codecs in the container. Payload stays absent (metadata-only
    * planning never reads bytes anyway). The mix deliberately includes
    * NULL dimensions (doc_id % 17) and corrupt zero dimensions
    * (doc_id % 19) so the never-lose-an-asset paths are exercised.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(
      id.as("asset_id"),
      when(id % 3 === 0, "image").when(id % 3 === 1, "audio").otherwise("video").as("kind"),
      when(id % 3 =!= 1 && id % 17 =!= 0,
        when(id % 19 === 0, lit(0))
          .otherwise((lit(320) + (id * 37) % 1600)).cast("int")).as("width"),
      when(id % 3 =!= 1 && id % 17 =!= 0,
        when(id % 19 === 0, lit(0))
          .otherwise((lit(240) + (id * 53) % 900)).cast("int")).as("height"),
      when(id % 3 =!= 0, (lit(500) + (id * 97) % 120000).cast("long")).as("duration_ms"),
      (length(col("text")).cast("long") * 40 + 100).as("n_bytes"))
  }

  /** The DuckDB spelling of [[mediaFromDocuments]] — shared CTE for the
    * mm_* oracle queries; MUST stay arithmetic-identical to the Spark
    * fixture above. */
  val mediaFixtureSql: String =
    """media AS (
      |  SELECT doc_id AS asset_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CASE WHEN doc_id % 3 != 1 AND doc_id % 17 != 0 THEN
      |      CAST(CASE WHEN doc_id % 19 = 0 THEN 0 ELSE 320 + (doc_id * 37) % 1600 END AS INTEGER) END AS width,
      |    CASE WHEN doc_id % 3 != 1 AND doc_id % 17 != 0 THEN
      |      CAST(CASE WHEN doc_id % 19 = 0 THEN 0 ELSE 240 + (doc_id * 53) % 900 END AS INTEGER) END AS height,
      |    CASE WHEN doc_id % 3 != 0 THEN CAST(500 + (doc_id * 97) % 120000 AS BIGINT) END AS duration_ms,
      |    CAST(len(text) * 40 + 100 AS BIGINT) AS n_bytes
      |  FROM documents
      |)""".stripMargin

  /** Frame-sampling plan for video: rows (asset_id, frame_idx) for every
    * nth frame — the explode that fans a video row out to per-frame work
    * items WITHOUT decoding (duration-based), so the decode stage
    * parallelizes per frame. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    media
      .filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("asset_id"),
        explode(expr(s"sequence(0L, duration_ms - 1, $everyMs)")).as("frame_ms"))
  }

  // ---------------------------------------------------------------------
  // Perceptual image near-dup: 64-bit dHash (difference hash) — the
  // image-side twin of document MinHash/SimHash. A decoded image reduces
  // to a 9×8 luma grid (area means); bit (r, c) is set when
  // grid[r][c] > grid[r][c+1] — 8 comparisons per row × 8 rows = 64 bits
  // that survive resizing, re-encoding and small edits, while any real
  // content change flips many bits. Candidate generation is BANDED
  // (4 × 16-bit bands): two hashes within Hamming 3 agree on ≥1 band by
  // pigeonhole, so candidates come from an equi-join on (band, value)
  // and the exact bit_count verify runs only on bucket-mates — the
  // dedup_simhash machinery pointed at pixels. At 100 TB the signature
  // pass is one map-side decode per asset (payload never shuffles; 8
  // bytes of signature do) and pair work scales with bucket occupancy.

  /** dHash grid edge sizes: 9 columns × 8 rows of area-mean luma. */
  private val DhashCols = 9
  private val DhashRows = 8

  /** 64-bit dHash of a decodable image payload; None = undecodable
    * (callers keep the asset and route it to quarantine/stub scoring —
    * silently dropping is the one forbidden outcome). */
  def dhash64(payload: Array[Byte]): Option[Long] =
    decodeImage(payload).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val sums = Array.ofDim[Double](DhashRows, DhashCols)
      val counts = Array.ofDim[Long](DhashRows, DhashCols)
      var y = 0
      while (y < h) {
        val r = math.min(DhashRows - 1, y * DhashRows / h)
        var x = 0
        while (x < w) {
          val c = math.min(DhashCols - 1, x * DhashCols / w)
          val rgb = img.getRGB(x, y)
          val luma = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          sums(r)(c) += luma; counts(r)(c) += 1
          x += 1
        }
        y += 1
      }
      var bits = 0L
      var r = 0
      while (r < DhashRows) {
        var c = 0
        while (c < DhashCols - 1) {
          val a = sums(r)(c) / math.max(1L, counts(r)(c))
          val b = sums(r)(c + 1) / math.max(1L, counts(r)(c + 1))
          if (a > b) bits |= 1L << (r * (DhashCols - 1) + c)
          c += 1
        }
        r += 1
      }
      bits
    }

  /** Deterministic synthetic PNG pair fixture for the dedup gate: asset
    * ids 2k and 2k+1 are planted near-duplicates — the same 32×32
    * hash-noise image, the odd twin with one dHash CELL's pixels lifted
    * by a small constant. The bump lives strictly inside grid cell
    * (4, 4) (x ∈ [15,18), y ∈ [16,20) for 32 px: column 4 is the x
    * where ⌊x·9/32⌋ = 4), so at most the TWO comparisons touching that
    * cell — (row 4, c3 vs c4) and (row 4, c4 vs c5) — can flip:
    * planted pairs are within Hamming 2 ≤ 3 BY CONSTRUCTION, while
    * distinct bases give independent ~32-bit distances. Encoded
    * through the real PNG writer so the pipeline exercises an actual
    * ImageIO decode. */
  def syntheticPng(assetId: Long): Array[Byte] = {
    val base = assetId / 2
    val perturb = assetId % 2 == 1
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        // full 64-bit avalanche (splitmix64 finalizer): a plain linear
        // combination mod 256 reduces `base` to a constant luma shift,
        // which dHash is (correctly) INVARIANT to — every base would
        // collide with every other
        var h = base * 0x9e3779b97f4a7c15L + x * 0xc2b2ae3d27d4eb4fL +
          y * 0x165667b19e3779f9L
        h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
        h ^= h >>> 27; h *= 0x94d049bb133111ebL
        h ^= h >>> 31
        var g = ((h >>> 33) & 0xffL).toInt
        if (perturb && x >= 15 && x < 18 && y >= 16 && y < 20)
          g = math.min(255, g + 6)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The fixture as a (asset_id, payload) frame — one synthetic PNG per
    * document id, built inside the task so the bytes never ship. */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the id frame reads from one tiny parquet split, but the encode+
    // decode work downstream is ~1 ms/image — repartition the 8-byte
    // ids (a near-free shuffle) so the pixel work uses every core, the
    // same byte-budget principle repartitionByByteBudget applies to
    // real payloads
    docs.select(col("doc_id")).repartition(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticPng(id))))
      .toDF("asset_id", "payload")
  }

  /** dHash signatures of an (asset_id, payload) frame: the decode→hash
    * pass is per-partition map-side work — the payload is consumed
    * inside the task and only the 8-byte signature survives (with
    * [[syntheticImages]] upstream the two mapPartitions pipeline into
    * ONE stage, so the fixture bytes never even materialize between
    * operators). Undecodable payloads yield no signature row: the
    * asset is absent from the sig frame, not hashed to garbage. */
  def dhashSignatures(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, png) => dhash64(png).map(h => (id, h)) })
      .toDF("asset_id", "dhash")
  }

  /** Banded near-dup pairs over any (asset_id, dhash) frame: 4 × 16-bit
    * band equi-join → distinct → exact Hamming verify at `maxHamming`.
    * Zero false negatives for maxHamming ≤ 3 (pigeonhole over 4 bands);
    * pair work scales with band-bucket occupancy, never corpus². */
  /** Per-window mean-|amplitude| energies of a PCM audio payload —
    * the frame-level signal voice-activity detection thresholds. Same
    * decode envelope as [[decodeAudioStats]] (JDK-parsed WAV/AIFF/AU,
    * PCM signed ≤32-bit or unsigned 8-bit), but emits one energy per
    * `frameSamples` window instead of whole-clip moments; the stream is
    * read sequentially, never buffered whole. None = not audio. */
  private[mm] def audioFrameEnergies(
      payload: Array[Byte], frameSamples: Int): Option[Array[Double]] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned8 =
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
        if (!(signed && (bits % 8 == 0) && bits <= 32) && !unsigned8) return None
        val channels = fmt.getChannels
        val bytesPerSample = bits / 8
        val frameSize =
          if (fmt.getFrameSize > 0) fmt.getFrameSize else bytesPerSample * channels
        val totalFrames = ais.getFrameLength
        if (totalFrames <= 0 || totalFrames > Int.MaxValue) return None
        val frames = totalFrames.toInt
        val big = fmt.isBigEndian
        val full = 1L << (bits - 1)
        val frameBuf = new Array[Byte](frameSize)
        def sampleAt(off: Int): Double = {
          var v = 0L
          if (big) { var i = 0; while (i < bytesPerSample) { v = (v << 8) | (frameBuf(off + i) & 0xffL); i += 1 } }
          else { var i = bytesPerSample - 1; while (i >= 0) { v = (v << 8) | (frameBuf(off + i) & 0xffL); i -= 1 } }
          if (signed) {
            val shift = 64 - bits
            ((v << shift) >> shift).toDouble / full
          } else (v - 128.0) / 128.0
        }
        val nWin = (frames + frameSamples - 1) / frameSamples
        val out = new Array[Double](nWin)
        var f = 0
        var winSum = 0.0; var winN = 0; var w = 0
        var eof = false
        while (f < frames && !eof) {
          if (ais.readNBytes(frameBuf, 0, frameSize) < frameSize) eof = true
          else {
            var mono = 0.0
            var c = 0
            while (c < channels) { mono += sampleAt(c * bytesPerSample); c += 1 }
            mono /= channels
            winSum += math.abs(mono); winN += 1
            if (winN == frameSamples) { out(w) = winSum / winN; w += 1; winSum = 0.0; winN = 0 }
            f += 1
          }
        }
        if (winN > 0 && w < nWin) { out(w) = winSum / winN; w += 1 }
        if (w == 0) None else Some(if (w == nWin) out else out.take(w))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** Deterministic synthetic speech/silence WAV for the VAD gate:
    * `nSegments` windows of `segSamples` samples each (8 kHz, 16-bit
    * mono PCM); segment s carries a full-scale-half alternating ±16384
    * square wave iff the REPLAYABLE predicate
    * `((assetId·2654435761 + s·40503) mod 97) < 48` says voiced, else
    * exact silence. ±16384/32768 decodes to exactly ±0.5 and windows
    * align 1:1 with segments, so window energies are EXACTLY 0.5 or
    * 0.0 — the oracle replays the same predicate in integer SQL and a
    * decode or windowing defect flips a boolean, not an ulp. (No
    * avalanche mixer needed here, unlike [[syntheticPng]]: the energy
    * path has no shift-invariance to hide a weak seed behind.) */
  def syntheticSpeechWav(
      assetId: Long, nSegments: Int = 12, segSamples: Int = 400): Array[Byte] = {
    val n = nSegments * segSamples
    val pcm = new Array[Byte](n * 2)
    var s = 0
    while (s < nSegments) {
      if (((assetId * 2654435761L + s * 40503L) % 97) < 48) {
        var i = 0
        while (i < segSamples) {
          val idx = s * segSamples + i
          val v = if (i % 2 == 0) 16384 else -16384
          pcm(2 * idx) = (v & 0xff).toByte
          pcm(2 * idx + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
      }
      s += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** The VAD fixture as an (asset_id, payload) frame — one synthetic
    * WAV per document id, built inside the task ([[syntheticImages]]'
    * repartition rationale: shuffle 8-byte ids, spread the PCM work). */
  def syntheticSpeech(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).repartition(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticSpeechWav(id))))
      .toDF("asset_id", "payload")
  }

  /** Energy-threshold voice-activity segments over an (asset_id,
    * payload) audio frame: decode → per-window energies (map-side; the
    * payload dies inside the task, only (id, window, energy) rows
    * survive) → threshold → gaps-and-islands merge of consecutive
    * voiced windows (the w12 spelling: window_idx − row_number is
    * constant within a run). One shuffle on asset_id for the island
    * window; segment rows are output-cardinality. Undecodable payloads
    * contribute no windows — absent, not silently "silent". Returns
    * (asset_id, grp, s0, s1, nf): segment start/end window and length. */
  def vadSegments(
      audio: DataFrame, frameSamples: Int = 400,
      threshold: Double = 0.25): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    val energies = audio.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        audioFrameEnergies(bytes, frameSamples).iterator.flatMap(es =>
          es.iterator.zipWithIndex.map { case (e, i) => (id, i, e) })
      })
      .toDF("asset_id", "frame_idx", "energy")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("asset_id").orderBy("frame_idx")
    energies.filter(col("energy") > threshold)
      .withColumn("grp", col("frame_idx") - row_number().over(w))
      .groupBy(col("asset_id"), col("grp"))
      .agg(min(col("frame_idx")).as("s0"), max(col("frame_idx")).as("s1"),
        count(lit(1)).as("nf"))
  }

  // Audio near-dup: 64-bit energy-delta fingerprint — the audio member
  // of the modality-dedup family (text MinHash, image dHash). Bit i is
  // the comparison e[i+1] > e[i] over 65 window energies, which makes
  // the print GAIN-INVARIANT (a re-encoded / re-normalized copy of the
  // same clip scales every energy by the same factor and flips no
  // comparison) — exactly the dHash trick, transposed from space to
  // time. Candidates then ride the SAME 4×16-bit banding machinery
  // (dhashNearDupPairs is hash-agnostic: any 64-bit signature column).

  /** 64-bit energy-delta fingerprint; None = undecodable or shorter
    * than 66 windows (a print from a truncated clip would alias). */
  def audioFingerprint64(payload: Array[Byte], frameSamples: Int = 256): Option[Long] =
    audioFrameEnergies(payload, frameSamples).flatMap { es =>
      if (es.length < 65) None
      else {
        var h = 0L
        var i = 0
        while (i < 64) {
          if (es(i + 1) > es(i)) h |= 1L << i
          i += 1
        }
        Some(h)
      }
    }

  /** Fingerprints of an (asset_id, payload) audio frame — decode dies
    * in the task, 8 bytes/asset survive (the dhashSignatures shape). */
  def audioFingerprints(audio: DataFrame, frameSamples: Int = 256): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        audioFingerprint64(bytes, frameSamples).map(h => (id, h))
      })
      .toDF("asset_id", "dhash")
  }

  /** Deterministic synthetic audio pair fixture: assets 2k/2k+1 are the
    * SAME 65-window square-wave clip where the odd twin is (a) played
    * at 5/4 the volume — amplitudes are multiples of 4, so the scaling
    * is integer-exact and every energy comparison (and tie) is
    * preserved: the gain-invariance claim is exercised, not asserted —
    * and (b) perturbed in ONE window w*, which can flip at most the two
    * comparisons (w*−1, w*): planted pairs sit within Hamming 2 ≤ 3 BY
    * CONSTRUCTION. Per-window amplitudes come from the splitmix64
    * finalizer (a linear mix would correlate adjacent windows and
    * shrink base-to-base distances). 16-bit mono 8 kHz through the real
    * WAV writer, so the pipeline exercises an actual javax.sound
    * decode. */
  def syntheticAudioPairWav(
      assetId: Long, nWindows: Int = 65, winSamples: Int = 256): Array[Byte] = {
    val base = assetId / 2
    val perturb = assetId % 2 == 1
    def mix(x: Long): Long = {
      var h = x * 0x9e3779b97f4a7c15L
      h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27; h *= 0x94d049bb133111ebL
      h ^ (h >>> 31)
    }
    val wStar = 1 + ((mix(base) >>> 7) % 63).toInt // in [1, 63]
    val n = nWindows * winSamples
    val pcm = new Array[Byte](n * 2)
    var w = 0
    while (w < nWindows) {
      var amp = (800 + 4 * ((mix(base * 131 + w) >>> 17) % 2048)).toInt
      if (perturb && w == wStar)
        amp = (800 + 4 * ((mix(base * 131 + 7919 + w) >>> 17) % 2048)).toInt
      if (perturb) amp = amp * 5 / 4 // exact: amp is a multiple of 4
      var i = 0
      while (i < winSamples) {
        val idx = w * winSamples + i
        val v = if (i % 2 == 0) amp else -amp
        pcm(2 * idx) = (v & 0xff).toByte
        pcm(2 * idx + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      w += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** The audio-pair fixture as an (asset_id, payload) frame. */
  def syntheticAudioPairs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).repartition(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticAudioPairWav(id))))
      .toDF("asset_id", "payload")
  }

  // Video near-dup: 64-bit luma-delta fingerprint — the video member of
  // the modality-dedup family. Bit i is the comparison luma[i+1] >
  // luma[i] over the first 65 frames: a re-encoded copy (same content,
  // different JPEG quality) preserves frame-to-frame luma ORDER even
  // when absolute lumas shift, the same way the audio print survives
  // gain and dHash survives brightness. Candidates ride the shared
  // banding machinery.

  /** 64-bit luma-delta fingerprint; None = not decodable AVI or fewer
    * than 65 frames (a truncated clip's print would alias). */
  def videoFingerprint64(payload: Array[Byte]): Option[Long] =
    aviFrameChunks(payload).flatMap { c =>
      if (c.frames.length < 65) None
      else {
        val lumas = new Array[Double](65)
        var i = 0
        while (i < 65) {
          val (off, len) = c.frames(i)
          decodeImage(java.util.Arrays.copyOfRange(payload, off, off + len)) match {
            case Some(img) => lumas(i) = frameLuma(img)
            case None => return None // a corrupt frame aliases the print
          }
          i += 1
        }
        var h = 0L
        i = 0
        while (i < 64) {
          if (lumas(i + 1) > lumas(i)) h |= 1L << i
          i += 1
        }
        Some(h)
      }
    }

  /** Fingerprints of an (asset_id, payload) video frame — decode dies
    * in the task, 8 bytes/asset survive. */
  def videoFingerprints(video: DataFrame): DataFrame = {
    val spark = video.sparkSession
    import spark.implicits._
    video.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        videoFingerprint64(bytes).map(h => (id, h))
      })
      .toDF("asset_id", "dhash")
  }

  /** Minimal RIFF/AVI container around MJPEG frames — the fixture
    * encoder (hdrl(avih) + movi, '00dc' chunks, even padding). */
  private def buildMjpegAvi(
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

  /** Deterministic synthetic video pair fixture: assets 2k/2k+1 are the
    * SAME 65-frame solid-gray MJPEG clip, the odd twin with ONE frame's
    * gray level re-drawn — flipping at most the two luma comparisons
    * touching that frame (Hamming ≤ 2 BY CONSTRUCTION). Every
    * unperturbed frame is byte-identical between the twins (same gray,
    * same encoder), so its decoded luma is identical and no other bit
    * can move — the same-bytes argument, stronger than any JPEG-noise
    * margin. Gray levels come from the splitmix64 finalizer on 8-level
    * steps, so distinct bases are ~32 bits apart. */
  def syntheticVideoPairAvi(assetId: Long, nFrames: Int = 65): Array[Byte] = {
    val base = assetId / 2
    val perturb = assetId % 2 == 1
    def mix(x: Long): Long = {
      var h = x * 0x9e3779b97f4a7c15L
      h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
      h ^= h >>> 27; h *= 0x94d049bb133111ebL
      h ^ (h >>> 31)
    }
    val fStar = 1 + ((mix(base) >>> 9) % 63).toInt
    def grayOf(f: Int): Int =
      if (perturb && f == fStar) (16 + 8 * ((mix(base * 151 + 7919 + f) >>> 19) % 28)).toInt
      else (16 + 8 * ((mix(base * 151 + f) >>> 19) % 28)).toInt
    val frames = (0 until nFrames).map { f =>
      val g = grayOf(f)
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < 16) { var x = 0; while (x < 16) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    buildMjpegAvi(frames, 16, 16, usPerFrame = 40000)
  }

  /** The video-pair fixture as an (asset_id, payload) frame. */
  def syntheticVideoPairs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).repartition(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticVideoPairAvi(id))))
      .toDF("asset_id", "payload")
  }

  def dhashNearDupPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, s"4x16 banding only guarantees recall to Hamming 3, got $maxHamming")
    // the band self-join reads the signature frame twice; without the
    // persist each side replays the full decode lineage (measured 2×
    // the whole query's cost on the PNG fixture). 16 bytes/asset.
    val cached = sigs.persist()
    val bands = cached.select(col("asset_id"), col("dhash"),
      explode(array((0 until 4).map(j =>
        (lit(j.toLong << 16) + shiftright(col("dhash"), 16 * j).bitwiseAND(0xffffL))): _*))
        .as("band"))
    bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") &&
        col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("asset_a"), col("b.asset_id").as("asset_b"),
        col("a.dhash").as("dhash_a"), col("b.dhash").as("dhash_b"))
      .distinct() // a pair can collide in several bands
      .withColumn("hamming", expr("bit_count(dhash_a ^ dhash_b)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("asset_a"), col("asset_b"), col("hamming"))
  }
}

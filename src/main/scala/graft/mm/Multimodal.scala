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
  * The decode kernels themselves are STUBS — the image/audio libraries
  * are not in this container — implemented as deterministic fakes behind
  * `MediaKernel` so the distributed plumbing (schema contract, batch
  * shape, partition-level execution, row-group pruning on metadata) is
  * real and tested. Swapping in a real decoder touches ONLY the kernel.
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
    val dimsKnown = col("width").isNotNull && col("height").isNotNull
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
}

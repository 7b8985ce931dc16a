package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the streaming EWMA control band beyond the shared oracle: a key
  * whose series crosses every micro-batch seam reproduces the BATCH
  * kernel bit-for-bit (doubles compared exactly), a planted outlier is
  * flagged on the pre-update band, and a late row drops visibly. */
class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  test("seam-crossing fold equals the batch kernel exactly; outlier flagged") {
    val tmp = java.nio.file.Files.createTempDirectory("sewma").toString
    // stable series with a planted 8σ-ish outlier at position 7
    val ys = Seq(10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 50.0, 10.0)
    val rows = ys.zipWithIndex.map { case (y, i) => ("A", day(i + 1), y) }
    rows.grouped(2).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("event_type", "day", "y")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c$i")
    }
    Streams.pinChunkOrder(spark, s"$tmp/in", 4)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.ewmaAnomalyStream(src, alpha = 0.25, zThreshold = 3.0, warmup = 3).toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day")
      .select($"level", $"z", $"isAnomaly")
      .as[(Double, Option[Double], Boolean)].collect().toSeq
    val batch = graft.ops.EwmaAnomaly.perKey(
        rows.toDF("event_type", "day", "y"), "event_type", Seq("day"), "y",
        alpha = 0.25, zThreshold = 3.0, warmup = 3)
      .orderBy($"day")
      .select($"level", $"z", $"is_anomaly")
      .as[(Double, Option[Double], Boolean)].collect().toSeq
    assert(got == batch, s"stream $got vs batch $batch")
    // the planted outlier (7th row) is the only anomaly, scored pre-update
    assert(got.map(_._3) == Seq(false, false, false, false, false, false, true, false))
    // warmup: first score appears on the 4th row
    assert(got.take(3).forall(_._2.isEmpty) && got(3)._2.nonEmpty)
  }

  test("a late row drops from the output; the fold continues undisturbed") {
    val tmp = java.nio.file.Files.createTempDirectory("sewma_late").toString
    Seq(("A", day(5), 10.0), ("A", day(6), 12.0)).toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c0")
    Seq(("A", day(2), 99.0), ("A", day(7), 11.0)).toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c1")
    Streams.pinChunkOrder(spark, s"$tmp/in", 2)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.ewmaAnomalyStream(src, alpha = 0.25, zThreshold = 3.0, warmup = 3).toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day").select($"day", $"y")
      .as[(java.sql.Timestamp, Double)].collect().toSeq
    assert(got == Seq((day(5), 10.0), (day(6), 12.0), (day(7), 11.0)),
      s"late row must vanish, got $got")
  }

  test("null observations pass through with null scores — cardinality parity with the batch kernel") {
    val tmp = java.nio.file.Files.createTempDirectory("sewma_null").toString
    // a null lands mid-series AND on a seam-adjacent row: the stream
    // twin must emit it (null scores, state untouched) exactly like the
    // batch kernel, so the two outputs agree in cardinality, not just
    // on non-null inputs
    val rows = Seq(
      ("A", day(1), Some(10.0)), ("A", day(2), None),
      ("A", day(3), Some(10.5)), ("A", day(4), None),
      ("A", day(5), Some(9.5)), ("A", day(6), Some(10.2)))
    rows.grouped(2).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("event_type", "day", "y")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c$i")
    }
    Streams.pinChunkOrder(spark, s"$tmp/in", 3)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.ewmaAnomalyStream(src, alpha = 0.25, zThreshold = 3.0, warmup = 2).toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day")
      .select($"y", $"level", $"z", $"isAnomaly")
      .as[(Option[Double], Option[Double], Option[Double], Option[Boolean])]
      .collect().toSeq
    val batch = graft.ops.EwmaAnomaly.perKey(
        rows.toDF("event_type", "day", "y"), "event_type", Seq("day"), "y",
        alpha = 0.25, zThreshold = 3.0, warmup = 2)
      .orderBy($"day")
      .select($"y", $"level", $"z", $"is_anomaly")
      .as[(Option[Double], Option[Double], Option[Double], Option[Boolean])]
      .collect().toSeq
    assert(got.length == rows.length, s"one output row per input row: $got")
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("a re-delivered null row drops — null passthrough advances the seen watermark") {
    val tmp = java.nio.file.Files.createTempDirectory("sewma_nulldup").toString
    Seq(("A", day(1), Some(10.0)), ("A", day(2), Option.empty[Double]))
      .toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c0")
    // batch 2 re-delivers the day-2 null before the next real row
    Seq(("A", day(2), Option.empty[Double]), ("A", day(3), Some(10.5)))
      .toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c1")
    Streams.pinChunkOrder(spark, s"$tmp/in", 2)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.ewmaAnomalyStream(src, alpha = 0.25, zThreshold = 3.0, warmup = 2).toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day").select($"y").as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(10.0), None, Some(10.5)),
      s"duplicate null must drop exactly once, got $got")
  }
}

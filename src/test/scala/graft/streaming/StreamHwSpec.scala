package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the streaming Holt–Winters beyond the shared oracle: the
  * warmup buffer straddles a micro-batch seam (first chunk carries
  * only 3 of the 7 seed observations) and the fold still reproduces
  * the batch kernel bit-for-bit; a late row drops visibly. */
class StreamHwSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).atStartOfDay())

  test("seeding straddles the seam; fold equals the batch kernel exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("shw").toString
    val ys = Seq(10.0, 12.0, 11.0, 13.0, 9.0, 10.5, 11.5, 12.5, 10.25, 11.75, 12.0)
    val rows = ys.zipWithIndex.map { case (y, i) => ("A", day(i), y) }
    // chunk 0 has 3 rows (mid-warmup), chunk 1 completes the seed,
    // chunk 2 carries the scored tail
    Seq(rows.take(3), rows.slice(3, 8), rows.drop(8)).zipWithIndex.foreach {
      case (chunk, i) =>
        chunk.toDF("event_type", "day", "y")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c$i")
    }
    Streams.pinChunkOrder(spark, s"$tmp/in", 3)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.holtWintersStream(src, m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
        .toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day")
      .select($"yhat", $"level", $"trend")
      .as[(Option[Double], Option[Double], Option[Double])].collect().toSeq
    val batch = graft.ops.HoltWinters.perKey(
        rows.toDF("event_type", "day", "y"), "event_type", Seq("day"), "y",
        m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
      .orderBy($"day")
      .select($"yhat", $"level", $"trend")
      .as[(Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got.count(_._1.nonEmpty) == 4)
  }

  test("a late row drops from the output; the fold continues undisturbed") {
    val tmp = java.nio.file.Files.createTempDirectory("shw_late").toString
    val base = (0 until 8).map(i => ("A", day(i), 10.0 + i))
    base.take(6).toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c0")
    // a row OLDER than the buffer's last timestamp arrives in batch 2
    (Seq(("A", day(2), 99.0)) ++ base.drop(6)).toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c1")
    Streams.pinChunkOrder(spark, s"$tmp/in", 2)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.holtWintersStream(src, m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
        .toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day").select($"day", $"y")
      .as[(java.sql.Timestamp, Double)].collect().toSeq
    assert(got == base.map(r => (r._2, r._3)),
      s"late duplicate must vanish, got $got")
  }

  test("null observations pass through without entering the seed buffer — batch cardinality parity") {
    val tmp = java.nio.file.Files.createTempDirectory("shw_null").toString
    // nulls fall INSIDE the warmup window: the batch kernel skips them
    // (the buffer fills from non-null rows only) while emitting their
    // passthrough rows — the stream twin must do both identically
    val rows: Seq[(String, java.sql.Timestamp, Option[Double])] =
      (0 until 12).map { i =>
        val y = if (i == 2 || i == 9) None else Some(10.0 + (i % 4))
        ("A", day(i), y)
      }
    Seq(rows.take(4), rows.slice(4, 9), rows.drop(9)).zipWithIndex.foreach {
      case (chunk, i) =>
        chunk.toDF("event_type", "day", "y")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c$i")
    }
    Streams.pinChunkOrder(spark, s"$tmp/in", 3)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.holtWintersStream(src, m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
        .toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day")
      .select($"y", $"yhat", $"level", $"trend")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    val batch = graft.ops.HoltWinters.perKey(
        rows.toDF("event_type", "day", "y"), "event_type", Seq("day"), "y",
        m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
      .orderBy($"day")
      .select($"y", $"yhat", $"level", $"trend")
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got.length == rows.length, s"one output row per input row: $got")
    assert(got == batch, s"stream $got vs batch $batch")
    // 10 non-null rows, m = 7 seeds -> exactly 3 scored forecasts
    assert(got.count(_._2.nonEmpty) == 3)
  }

  test("a re-delivered null row drops — the warmup buffer is not disturbed") {
    val tmp = java.nio.file.Files.createTempDirectory("shw_nulldup").toString
    Seq(("A", day(1), Some(10.0)), ("A", day(2), Option.empty[Double]))
      .toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c0")
    Seq(("A", day(2), Option.empty[Double]), ("A", day(3), Some(11.0)))
      .toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c1")
    Streams.pinChunkOrder(spark, s"$tmp/in", 2)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.holtWintersStream(src, m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
        .toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day").select($"y").as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(10.0), None, Some(11.0)),
      s"duplicate null must drop exactly once, got $got")
  }
}

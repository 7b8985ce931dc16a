package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the streaming Kalman fold beyond the shared oracle: a key whose
  * series crosses every micro-batch seam reproduces the BATCH kernel
  * bit-for-bit (doubles compared exactly — the property the hash gate
  * rides on), and a late row is dropped VISIBLY (absent from output,
  * later rows unaffected) rather than silently corrupting the fold. */
class StreamKalmanSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  private def pinOrder(tmp: String, n: Int): Unit =
    Streams.pinChunkOrder(spark, s"$tmp/in", n)

  test("seam-crossing fold equals the batch kernel exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("skalman").toString
    val ys = Seq(10.0, 14.0, 9.0, 12.0, 11.0, 13.0, 10.5, 11.5)
    val rows = ys.zipWithIndex.map { case (y, i) => ("A", day(i + 1), y) }
    // four 2-day batch files, written in ascending order
    rows.grouped(2).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("event_type", "day", "y")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c$i")
    }
    pinOrder(tmp, 4)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.kalmanLevelStream(src, q = 0.5, r = 4.0).toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day")
      .select($"level", $"gain", $"variance")
      .as[(Double, Double, Double)].collect().toSeq
    val batch = graft.ops.KalmanLevel.perKey(
        rows.toDF("event_type", "day", "y"), "event_type", Seq("day"), "y",
        q = 0.5, r = 4.0)
      .orderBy($"day")
      .select($"level", $"gain", $"variance")
      .as[(Double, Double, Double)].collect().toSeq
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("a late row drops from the output; the fold continues undisturbed") {
    val tmp = java.nio.file.Files.createTempDirectory("skalman_late").toString
    Seq(("A", day(5), 10.0), ("A", day(6), 12.0)).toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c0")
    // batch 2 carries a row OLDER than the state's last timestamp
    Seq(("A", day(2), 99.0), ("A", day(7), 11.0)).toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c1")
    pinOrder(tmp, 2)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.kalmanLevelStream(src, q = 0.5, r = 4.0).toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day").select($"day", $"y").as[(java.sql.Timestamp, Double)]
      .collect().toSeq
    assert(got.map(_._2) == Seq(10.0, 12.0, 11.0), s"got $got")
    // the surviving fold equals the batch fold over the on-time rows
    val batch = graft.ops.KalmanLevel.perKey(
        Seq(("A", day(5), 10.0), ("A", day(6), 12.0), ("A", day(7), 11.0))
          .toDF("event_type", "day", "y"),
        "event_type", Seq("day"), "y", q = 0.5, r = 4.0)
      .orderBy($"day").select($"level").as[Double].collect().toSeq
    val lv = spark.read.parquet(s"$tmp/out")
      .orderBy($"day").select($"level").as[Double].collect().toSeq
    assert(lv == batch)
  }

  test("a re-delivered null row is dropped like any duplicate — even before the first observation") {
    val tmp = java.nio.file.Files.createTempDirectory("skalman_nulldup").toString
    // batch 1: a LEADING null (no fold state exists yet)
    Seq(("A", day(3), Option.empty[Double])).toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c0")
    // batch 2 re-delivers the same null, then the first real observation
    Seq(("A", day(3), Option.empty[Double]), ("A", day(4), Some(10.0)))
      .toDF("event_type", "day", "y")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/c1")
    pinOrder(tmp, 2)
    val src = spark.readStream
      .schema("event_type STRING, day TIMESTAMP, y DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.kalmanLevelStream(src, q = 0.5, r = 4.0).toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out")
      .orderBy($"day").select($"day", $"y").collect().toSeq
    // exactly ONE null row (the redelivery vanished) + the seed row
    assert(got.length == 2, s"duplicate null must drop, got $got")
    assert(got.head.isNullAt(1) && got(1).getDouble(1) == 10.0, s"got $got")
  }
}

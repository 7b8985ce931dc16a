package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Row-level parity of the streaming SCD2 maintainer with the batch
  * window spelling (the driver's stream_scd2 gate checks the per-user
  * census; this pins EVERY version row — attr, version number, both
  * boundaries, open-version null): a version spanning a micro-batch
  * seam must not split, a consecutive-duplicate change must not open a
  * version, and the fixed flush deadline must emit each final open
  * version exactly once. */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream versions ≡ batch lag-dedup/lead/row_number on the real feed") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.core.Tables.events(spark, sf).filter($"user_id" < 80)
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val tmp = java.nio.file.Files.createTempDirectory("scd2spec").toString
    val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-02-01")
    for (i <- 0 until 4) {
      ev.filter($"ts" >= lit(weeks(i)).cast("timestamp") &&
          $"ts" < lit(weeks(i + 1)).cast("timestamp"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/w$i")
    }
    for ((st, i) <- Seq("2024-05-01", "2024-05-02").zipWithIndex) {
      Seq((-1L, java.sql.Timestamp.valueOf(s"$st 00:00:00"), 0L, "z"))
        .toDF("user_id", "ts", "event_id", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/z$i")
    }
    val src = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.runAvailableNow(
      Streams.scd2Stream(src,
        java.sql.Timestamp.valueOf("2024-04-01 00:00:00")).toDF(),
      s"$tmp/ckpt", s"$tmp/out")
    val got = spark.read.parquet(s"$tmp/out").filter($"user_id" >= 0)
      .select($"user_id", $"version", $"attr", $"valid_from", $"valid_to")

    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val want = ev
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      .select($"user_id",
        row_number().over(w.orderBy($"ts", $"event_id")).as("version"),
        $"event_type".as("attr"),
        $"ts".as("valid_from"),
        lead($"ts", 1).over(w.orderBy($"ts", $"event_id")).as("valid_to"))

    assert(got.count() > 0)
    assert(got.count() === want.count())
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join ≡ the batch join with the same
  * time-range predicate, across multiple micro-batches. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("click attribution stream matches the batch join across micro-batches") {
    val srcV = tmp("sj_views")
    val srcC = tmp("sj_clicks")
    val out = tmp("sj_out")
    val ckpt = tmp("sj_ckpt")

    // views and clicks split across TWO files each, so the join state
    // must carry rows across micro-batch boundaries
    val views = Seq(
      (1L, 100L, t(0)), (1L, 101L, t(20)), // user 1: two views
      (2L, 102L, t(5)),                    // user 2: one view
      (3L, 103L, t(0)))                    // user 3: view, no click
    val clicks = Seq(
      (1L, 200L, t(4)),   // within 10 min of view 100 only
      (1L, 201L, t(25)),  // within 10 min of view 101 only
      (2L, 202L, t(16)),  // 11 min after view 102 -> NO match
      (4L, 203L, t(3)))   // click, no view
    views.take(2).toDF("user_id", "event_id", "ts").repartition(1).write.parquet(s"$srcV/f0")
    views.drop(2).toDF("user_id", "event_id", "ts").repartition(1).write.parquet(s"$srcV/f1")
    clicks.take(2).toDF("user_id", "event_id", "ts").repartition(1).write.parquet(s"$srcC/f0")
    clicks.drop(2).toDF("user_id", "event_id", "ts").repartition(1).write.parquet(s"$srcC/f1")

    def readSrc(dir: String) = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")

    val joined = Streams.clickAttributionStream(readSrc(srcV), readSrc(srcC))
    Streams.runAvailableNow(joined, ckpt, out)

    val got = spark.read.parquet(out)
      .select($"view_id", $"click_id").as[(Long, Long)].collect().toSet
    // batch reference with the identical predicate
    val bv = views.toDF("user_id", "event_id", "ts").alias("v")
    val bc = clicks.toDF("user_id", "event_id", "ts").alias("c")
    val want = bv.join(bc, expr(
        "v.user_id = c.user_id AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTES"))
      .select(col("v.event_id"), col("c.event_id")).as[(Long, Long)].collect().toSet
    assert(want === Set((100L, 200L), (101L, 201L))) // the spec's own sanity pin
    assert(got === want)
  }

  test("left-outer attribution emits unmatched views with null click after watermark expiry") {
    val srcV = tmp("soj_views")
    val srcC = tmp("soj_clicks")
    val out = tmp("soj_out")
    val ckpt = tmp("soj_ckpt")

    // user 3's view never matches; user 2's click arrives OUTSIDE the
    // window. Both must surface as (view_id, null) — but only because a
    // LATE second file advances the watermark far enough (t(50) - 10min
    // > every view's ts + 10min) to prove no match can come: the
    // expiry-then-emit path, split across micro-batches.
    val views = Seq(
      (1L, 100L, t(0)), (1L, 101L, t(20)),
      (2L, 102L, t(5)),
      (3L, 103L, t(0)))
    val clicks = Seq(
      (1L, 200L, t(4)),
      (1L, 201L, t(25)),
      (2L, 202L, t(16)),  // 11 min after view 102 -> NO match
      (4L, 203L, t(50)))  // watermark driver: pushes global wm past all expiries
    views.take(2).toDF("user_id", "event_id", "ts").repartition(1).write.parquet(s"$srcV/f0")
    views.drop(2).toDF("user_id", "event_id", "ts").repartition(1).write.parquet(s"$srcV/f1")
    // the view side also needs a late row or ITS watermark pins the
    // global minimum at t(20) and nothing ever expires
    Seq((5L, 104L, t(50))).toDF("user_id", "event_id", "ts")
      .repartition(1).write.parquet(s"$srcV/f2")
    clicks.take(2).toDF("user_id", "event_id", "ts").repartition(1).write.parquet(s"$srcC/f0")
    clicks.drop(2).toDF("user_id", "event_id", "ts").repartition(1).write.parquet(s"$srcC/f1")

    def readSrc(dir: String) = spark.readStream
      .schema("user_id LONG, event_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")

    val joined = Streams.clickAttributionOuterStream(readSrc(srcV), readSrc(srcC))
    Streams.runAvailableNow(joined, ckpt, out)

    val got = spark.read.parquet(out)
      .filter($"view_ts" < t(40)) // fully-expired region only (tail rows may hold)
      .select($"view_id", $"click_id").as[(Long, Option[Long])].collect().toSet
    // batch left join over the same region is the exact reference
    val bv = views.toDF("user_id", "event_id", "ts").alias("v")
    val bc = clicks.toDF("user_id", "event_id", "ts").alias("c")
    val want = bv.join(bc, expr(
        "v.user_id = c.user_id AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTES"),
        "left_outer")
      .select(col("v.event_id"), col("c.event_id"))
      .as[(Long, Option[Long])].collect().toSet
    assert(want === Set(
      (100L, Some(200L)), (101L, Some(201L)),
      (102L, None), (103L, None))) // the spec's own sanity pin
    assert(got === want)
  }
}

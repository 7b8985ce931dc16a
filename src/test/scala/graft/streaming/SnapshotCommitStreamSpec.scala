package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming ingestion × snapshot governance: a foreachBatch sink that
  * lands each micro-batch as an append AND commits it as one snapshot
  * — the composition that turns a raw stream into a time-travelable,
  * incrementally-consumable table. Pins: one snapshot per micro-batch
  * (exactly-once commit bookkeeping under AvailableNow), the
  * incremental read of each consecutive snapshot pair returning
  * EXACTLY that batch's rows (the O(delta) feed contract), and the
  * latest snapshot reading the full accumulated table. */
class SnapshotCommitStreamSpec extends SparkSpec {
  import spark.implicits._

  test("one snapshot per micro-batch; incremental reads return exactly each batch's delta") {
    val d = java.nio.file.Files.createTempDirectory("snapstream").toString
    val chunks = Seq(1L to 40L, 41L to 70L, 71L to 100L)
    chunks.zipWithIndex.foreach { case (ks, i) =>
      ks.toDF("k").coalesce(1).write.mode("overwrite").parquet(s"$d/in/c$i")
    }
    Streams.pinChunkOrder(spark, s"$d/in", 3)
    val src = spark.readStream
      .schema("k BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$d/in/*")
    val q = src.writeStream
      .option("checkpointLocation", s"$d/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(s"$d/data")
        graft.ops.Snapshots.commitFromFs(spark, s"$d/data", s"$d/snaps", Seq("k"))
        ()
      }
      .start()
    q.awaitTermination()

    assert(graft.ops.Snapshots.snapshots(spark, s"$d/snaps") == Seq(0L, 1L, 2L))
    // each consecutive pair's incremental read is exactly that batch
    Seq((0L, 1L), (1L, 2L)).foreach { case (from, to) =>
      val delta = graft.ops.Snapshots.readIncremental(spark, s"$d/snaps", from, to)
        .select($"k").as[Long].collect().sorted.toSeq
      assert(delta == chunks(to.toInt), s"delta $from->$to: $delta")
    }
    // the latest snapshot reads the whole accumulated table; the first
    // still reads only its own batch (time travel over the ingest)
    assert(graft.ops.Snapshots.readAt(spark, s"$d/snaps", 2L)
      .select($"k").as[Long].collect().sorted.toSeq == (1L to 100L))
    assert(graft.ops.Snapshots.readAt(spark, s"$d/snaps", 0L)
      .select($"k").as[Long].collect().sorted.toSeq == (1L to 40L))
    // history census matches the ingest
    val hist = graft.ops.Snapshots.history(spark, s"$d/snaps")
      .select($"snapshot", $"n_files", $"n_rows").as[(Long, Long, Long)]
      .collect().toSeq
    assert(hist == Seq((0L, 1L, 40L), (1L, 2L, 70L), (2L, 3L, 100L)), s"$hist")
  }
}

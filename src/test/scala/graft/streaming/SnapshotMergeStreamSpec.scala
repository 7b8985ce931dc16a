package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CDC snapshot maintenance: per-batch upsert merge into a
  * versioned parquet snapshot behind an atomic pointer. */
class SnapshotMergeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("change batches fold into a keyed snapshot; versions stay readable") {
    val snap = Files.createTempDirectory("graft_snap").toString
    val ckpt = Files.createTempDirectory("graft_snap_ck").toString
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    def changes = input.toDF().toDF("k", "ver", "payload")

    assert(Streams.readSnapshot(spark, snap).isEmpty, "no pointer before first commit")

    // batch 0: two versions of key 1 in ONE batch (latest must win) + key 2
    input.addData((1L, 1L, "one-v1"), (1L, 2L, "one-v2"), (2L, 1L, "two-v1"))
    Streams.snapshotMergeStream(changes, snap, ckpt, Seq("k"), Seq("ver"))
      .awaitTermination()
    val s0 = Streams.readSnapshot(spark, snap).get
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(s0 == Map(1L -> (2L, "one-v2"), 2L -> (1L, "two-v1")))

    // batch 1: update key 2, insert key 3, and a STALE update for key 1
    // that must lose to the snapshot row
    input.addData((2L, 5L, "two-v5"), (3L, 1L, "three-v1"), (1L, 1L, "stale"))
    Streams.snapshotMergeStream(changes, snap, ckpt, Seq("k"), Seq("ver"))
      .awaitTermination()
    val s1 = Streams.readSnapshot(spark, snap).get
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(s1 == Map(
      1L -> (2L, "one-v2"), // stale change lost
      2L -> (5L, "two-v5"),
      3L -> (1L, "three-v1")))

    // both versions on disk; pointer names the latest
    val v0 = spark.read.parquet(s"$snap/v0").count()
    val v1 = spark.read.parquet(s"$snap/v1").count()
    assert(v0 == 2 && v1 == 3, "old snapshot version must stay readable")
  }
}

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

  test("crash replay of an already-committed batch is a pointer re-assert, not a self-overwrite") {
    val snap = Files.createTempDirectory("graft_snap_replay").toString
    val b0 = Seq((1L, 1L, "one-v1"), (2L, 1L, "two-v1")).toDF("k", "ver", "payload")
    Streams.applySnapshotBatch(spark, snap, b0, 0L, Seq("k"), Seq("ver"))
    val b1 = Seq((2L, 5L, "two-v5"), (3L, 1L, "three-v1")).toDF("k", "ver", "payload")
    Streams.applySnapshotBatch(spark, snap, b1, 1L, Seq("k"), Seq("ver"))

    // crash between commitPointer(v1) and the checkpoint commit →
    // restart replays batch 1 with _CURRENT already at v1. Before the
    // fix this read v1 while overwriting v1 (AnalysisException, stream
    // permanently wedged); now it must be a no-op re-assert
    Streams.applySnapshotBatch(spark, snap, b1, 1L, Seq("k"), Seq("ver"))
    val after = Streams.readSnapshot(spark, snap).get
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(after == Map(1L -> (1L, "one-v1"), 2L -> (5L, "two-v5"), 3L -> (1L, "three-v1")))

    // and the stream continues past the replayed batch
    val b2 = Seq((1L, 9L, "one-v9")).toDF("k", "ver", "payload")
    Streams.applySnapshotBatch(spark, snap, b2, 2L, Seq("k"), Seq("ver"))
    val s2 = Streams.readSnapshot(spark, snap).get
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s2(1L) == "one-v9" && s2.size == 3)
  }

  test("missing pointer heals from the highest complete version") {
    val snap = Files.createTempDirectory("graft_snap_heal").toString
    val b0 = Seq((1L, 1L, "a")).toDF("k", "ver", "payload")
    val b1 = Seq((1L, 2L, "b")).toDF("k", "ver", "payload")
    Streams.applySnapshotBatch(spark, snap, b0, 0L, Seq("k"), Seq("ver"))
    Streams.applySnapshotBatch(spark, snap, b1, 1L, Seq("k"), Seq("ver"))

    // simulate a crash inside a non-atomic pointer swap: _CURRENT gone
    Files.delete(java.nio.file.Paths.get(snap, "_CURRENT"))
    val healed = Streams.readSnapshot(spark, snap).get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(healed.toSeq == Seq((1L, 2L, "b")), "reader must fall back to v1, not v0 or None")

    // a replayed batch 1 with the pointer missing re-commits it
    Streams.applySnapshotBatch(spark, snap, b1, 1L, Seq("k"), Seq("ver"))
    assert(Files.exists(java.nio.file.Paths.get(snap, "_CURRENT")))
    assert(Streams.readSnapshot(spark, snap).get.collect().map(_.getString(2)).toSeq == Seq("b"))
  }

  test("vacuum deletes only old versions, never the current or foreign files") {
    val snap = Files.createTempDirectory("graft_snap_vac").toString
    val ckpt = Files.createTempDirectory("graft_snap_vac_ck").toString
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    def changes = input.toDF().toDF("k", "ver", "payload")
    for (i <- 0 until 4) {
      input.addData((i.toLong, 1L, s"row$i"))
      Streams.snapshotMergeStream(changes, snap, ckpt, Seq("k"), Seq("ver"))
        .awaitTermination()
    }
    // a foreign file the vacuum must not touch
    Files.writeString(java.nio.file.Path.of(snap, "NOTES.txt"), "keep me")

    val deleted = Streams.vacuumSnapshots(spark, snap, keep = 2)
    assert(deleted == Seq("v0", "v1"), s"got $deleted")
    assert(!Files.exists(java.nio.file.Path.of(snap, "v0")))
    assert(Files.exists(java.nio.file.Path.of(snap, "v2")), "kept version gone")
    assert(Files.exists(java.nio.file.Path.of(snap, "v3")), "current version gone")
    assert(Files.exists(java.nio.file.Path.of(snap, "NOTES.txt")))
    // current snapshot still reads, with all 4 keys
    assert(Streams.readSnapshot(spark, snap).get.count() == 4)
    // idempotent; keep=1 keeps exactly the current version
    assert(Streams.vacuumSnapshots(spark, snap, keep = 2).isEmpty)
    assert(Streams.vacuumSnapshots(spark, snap, keep = 1) == Seq("v2"))
    assert(Streams.readSnapshot(spark, snap).get.count() == 4)
    intercept[IllegalArgumentException](Streams.vacuumSnapshots(spark, snap, 0))
  }

  test("time travel: historic versions readable, uncommitted/vacuumed refused") {
    val snap = Files.createTempDirectory("graft_snap_tt").toString
    val ckpt = Files.createTempDirectory("graft_snap_tt_ck").toString
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    def changes = input.toDF().toDF("k", "ver", "payload")

    input.addData((1L, 1L, "a"), (2L, 1L, "b"))
    Streams.snapshotMergeStream(changes, snap, ckpt, Seq("k"), Seq("ver"))
      .awaitTermination()
    input.addData((3L, 1L, "c"), (1L, 2L, "a2"))
    Streams.snapshotMergeStream(changes, snap, ckpt, Seq("k"), Seq("ver"))
      .awaitTermination()

    assert(Streams.snapshotVersions(spark, snap) == Seq(0L, 1L))
    // as-of v0: the state BEFORE batch 1 — key 3 absent, key 1 at ver 1
    val asOf0 = Streams.readSnapshotAt(spark, snap, 0).get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asOf0 == Map(1L -> 1L, 2L -> 1L))
    val asOf1 = Streams.readSnapshotAt(spark, snap, 1).get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asOf1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))

    // an ahead-of-pointer directory is NOT history: fake an uncommitted
    // merge (complete parquet, pointer not advanced) and ask for it
    Streams.readSnapshot(spark, snap).get.write.parquet(s"$snap/v9")
    assert(Streams.readSnapshotAt(spark, snap, 9).isEmpty,
      "uncommitted version must be refused")
    assert(Streams.snapshotVersions(spark, snap) == Seq(0L, 1L))

    // vacuumed history is gone — and says so, rather than erroring
    Streams.vacuumSnapshots(spark, snap, keep = 1)
    assert(Streams.readSnapshotAt(spark, snap, 0).isEmpty)
    assert(Streams.readSnapshotAt(spark, snap, 1).get.count() == 3)
  }
}

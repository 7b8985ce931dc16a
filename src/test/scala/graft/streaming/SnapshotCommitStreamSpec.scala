package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming ingestion × snapshot governance: the
  * [[graft.ops.Snapshots.commitStreamBatch]] foreachBatch sink that
  * lands each micro-batch under a batch-stamped dir AND commits it as
  * one snapshot — the composition that turns a raw stream into a
  * time-travelable, incrementally-consumable table, EXACTLY-ONCE.
  * Pins: one snapshot per micro-batch, the incremental read of each
  * consecutive snapshot pair returning EXACTLY that batch's rows (the
  * O(delta) feed contract), the latest snapshot reading the full
  * accumulated table — and, in the second test, that BOTH redelivery
  * crash windows (crash mid-append, crash after commit but before the
  * checkpoint write) leave snapshot lineage and deltas IDENTICAL to
  * the no-failure run: Structured Streaming's contract makes the sink
  * responsible for batchId-keyed idempotence, and a plain append sink
  * double-appends forever on replay. */
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
      .foreachBatch { (df: DataFrame, id: Long) =>
        graft.ops.Snapshots.commitStreamBatch(
          spark, s"$d/data", s"$d/snaps", Seq("k"), id, df)
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

  test("redelivered micro-batch cannot double-append: lineage identical to the no-failure run") {
    // reference run (no failures) and a run where batch 1 is delivered
    // THREE times — once crashing mid-append (partial files, no
    // commit), once completing, once redelivered after its commit —
    // must produce byte-identical lineage. The batch bodies are invoked
    // directly (the foreachBatch function IS the unit under test;
    // AvailableNow's scheduling is already pinned by the first test).
    val chunks = Seq(1L to 40L, 41L to 70L, 71L to 100L)
    def run(d: String, failBatch1: Boolean): Unit = {
      def commit(id: Int): Unit = {
        graft.ops.Snapshots.commitStreamBatch(spark, s"$d/data", s"$d/snaps",
          Seq("k"), id.toLong, chunks(id).toDF("k").coalesce(1))
        ()
      }
      commit(0)
      if (failBatch1) {
        // crash window 1: an attempt died mid-append — partial files
        // under the batch dir, NO snapshot commit
        chunks(1).take(7).toDF("k").coalesce(1)
          .write.mode("overwrite").parquet(s"$d/data/batch=1")
      }
      commit(1) // the retry: overwrites the partial files, commits once
      if (failBatch1) commit(1) // crash window 2: post-commit redelivery
      commit(2)
    }
    val ref = java.nio.file.Files.createTempDirectory("snapref").toString
    val ret = java.nio.file.Files.createTempDirectory("snapretry").toString
    run(ref, failBatch1 = false)
    run(ret, failBatch1 = true)
    for (d <- Seq(ref, ret)) {
      assert(graft.ops.Snapshots.snapshots(spark, s"$d/snaps") == Seq(0L, 1L, 2L))
      Seq((0L, 1L), (1L, 2L)).foreach { case (from, to) =>
        val delta = graft.ops.Snapshots.readIncremental(spark, s"$d/snaps", from, to)
          .select($"k").as[Long].collect().sorted.toSeq
        assert(delta == chunks(to.toInt), s"$d delta $from->$to: $delta")
      }
      assert(graft.ops.Snapshots.readAt(spark, s"$d/snaps", 2L)
        .select($"k").as[Long].collect().sorted.toSeq == (1L to 100L))
    }
    // the two runs' histories agree row-for-row
    def hist(d: String) = graft.ops.Snapshots.history(spark, s"$d/snaps")
      .select($"snapshot", $"n_files", $"n_rows")
      .as[(Long, Long, Long)].collect().toSeq
    assert(hist(ref) == hist(ret), s"${hist(ref)} vs ${hist(ret)}")
  }

  test("redelivery after a compaction rewrite is still a no-op: tombstones keep the batch committed") {
    // a rewrite landing between a batch's commit and a crash replay
    // removes the batch's paths from the manifest's DATA rows — the
    // KindRemoved tombstones are what keep the batchId guard sound,
    // else the replay re-appends and every later snapshot double-counts
    val d = java.nio.file.Files.createTempDirectory("snaprw").toString
    val data = s"$d/data"; val root = s"$d/snaps"
    def commit(id: Long, ks: Seq[Long]): Unit = {
      graft.ops.Snapshots.commitStreamBatch(spark, data, root, Seq("k"),
        id, ks.toDF("k").coalesce(1))
      ()
    }
    commit(0L, 1L to 40L)
    commit(1L, 41L to 70L)
    // maintenance: compact BOTH batches into one out-of-dataDir file
    val files = graft.ops.Snapshots.filesAt(spark, root,
      graft.ops.Snapshots.latest(spark, root).get)
    spark.read.parquet(files: _*).coalesce(1).write.parquet(s"$d/cout")
    graft.ops.Snapshots.commitRewrite(spark, root, removed = files,
      addedDir = s"$d/cout", cols = Seq("k"))
    // crash replay of batch 1 AFTER the rewrite — must be a no-op
    assert(graft.ops.Snapshots.streamBatchCommitted(spark, data, root, 1L),
      "a rewritten-away batch must still read as committed")
    commit(1L, 41L to 70L)
    val last = graft.ops.Snapshots.latest(spark, root).get
    assert(graft.ops.Snapshots.readAt(spark, root, last)
      .select($"k").as[Long].collect().sorted.toSeq == (1L to 70L),
      "redelivery after rewrite must not duplicate the batch")
    // and the NEXT real batch composes cleanly on top
    commit(2L, 71L to 100L)
    assert(graft.ops.Snapshots.readAt(spark, root,
      graft.ops.Snapshots.latest(spark, root).get)
      .select($"k").as[Long].collect().sorted.toSeq == (1L to 100L))
  }

  test("merge-stream redelivery: the batchId guard protects the batch's own new versions") {
    // a MERGE micro-batch = tombstone generation + new-version append,
    // one commit. The tombstone-add is the side effect that is NOT
    // replay-idempotent after the commit: redelivered, it dangles until
    // the NEXT commit's watermark, arrives with that LATER sequence,
    // and erases the merge's own new versions (file seq < gen seq).
    // Both spellings are run; the unguarded one must actually lose the
    // row — proving the guard is load-bearing, not ceremony.
    def run(d: String, guarded: Boolean): Seq[(Long, Long)] = {
      val data = s"$d/data"; val root = s"$d/snaps"; val eq = s"$d/eq"
      def commit(id: Long, df: org.apache.spark.sql.DataFrame): Unit = {
        graft.ops.Snapshots.commitStreamBatch(spark, data, root,
          Seq("k"), id, df.coalesce(1), eqDeleteDir = Some(eq))
        ()
      }
      def addTomb(): Unit =
        graft.ops.DeletionVectors.addKeyDeletes(spark, eq, Seq(1L).toDF("k"))
      commit(0L, (1L to 10L).map(k => (k, k * 100L)).toDF("k", "v"))
      // batch 1: MERGE — key 1 gets a new version
      addTomb()
      commit(1L, Seq((1L, 999L)).toDF("k", "v"))
      // batch 1 REDELIVERED after its commit
      if (guarded) {
        if (!graft.ops.Snapshots.streamBatchCommitted(spark, data, root, 1L)) {
          addTomb(); commit(1L, Seq((1L, 999L)).toDF("k", "v"))
        }
      } else {
        addTomb() // the unguarded body re-runs its side effects
        commit(1L, Seq((1L, 999L)).toDF("k", "v")) // commit itself skips
      }
      commit(2L, Seq((11L, 1100L)).toDF("k", "v"))
      val last = graft.ops.Snapshots.latest(spark, root).get
      graft.ops.Snapshots.readAt(spark, root, last)
        .select($"k", $"v").as[(Long, Long)].collect().sorted.toSeq
    }
    val good = run(java.nio.file.Files.createTempDirectory("mergeg").toString,
      guarded = true)
    assert(good.contains((1L, 999L)),
      s"guarded merge must keep the new version: $good")
    assert(good.length == 11)
    val bad = run(java.nio.file.Files.createTempDirectory("mergeu").toString,
      guarded = false)
    assert(!bad.contains((1L, 999L)),
      s"the unguarded spelling must actually lose the new version " +
        s"(else the guard is pointless): $bad")
  }
}

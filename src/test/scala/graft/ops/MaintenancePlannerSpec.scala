package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the planner's decision rules against real lifecycles: the o36
  * merge-on-read table gets exactly the absorb the bench's dv cells
  * price (and nothing else), the post-absorb table gets an empty plan
  * (the planner never invents work), small-file debt and retention
  * fire their own actions under their thresholds, and clustering
  * drift on the probe column proposes a recluster only on an
  * overlapping layout. */
class MaintenancePlannerSpec extends SparkSpec {
  import spark.implicits._

  private def actionsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String)] =
    df.select($"priority", $"action", $"target")
      .as[(Long, String, String)].collect().toSeq

  test("MoR lifecycle: exactly the absorb before, empty plan after") {
    val d = java.nio.file.Files.createTempDirectory("plannermor").toString
    val data = s"$d/data"; val root = s"$d/snaps"; val dv = s"$d/dv"
    (1L to 400L).toDF("k").repartitionByRange(4, $"k")
      .sortWithinPartitions($"k").write.parquet(data)
    Snapshots.commitFromFs(spark, data, root, Seq("k"), posDeleteDir = Some(dv))
    DeletionVectors.addDeletes(spark, data, dv, $"k" % 10 === 0)
    Snapshots.commitFromFs(spark, data, root, Seq("k"), posDeleteDir = Some(dv))

    // the plan is ONE action: absorb the visible generation (file
    // sizes are fine at targetBytes=2, history is short, layout is
    // range-clustered on k)
    val before = actionsOf(MaintenancePlanner.plan(spark, root,
      targetBytes = 2L, statsCol = Some("k")))
    assert(before.length == 1, s"expected one action, got $before")
    assert(before.head._1 == 1L && before.head._2 == "absorb_compact")
    assert(before.head._3.contains("gen=0"), s"target: ${before.head._3}")

    // absorb exactly that generation (CoW spelling: rewrite minus the
    // deleted rows) and drop it from the new watermark
    val files = Snapshots.filesAt(spark, root, 1L)
    spark.read.parquet(files: _*).filter($"k" % 10 =!= 0)
      .repartitionByRange(4, $"k").sortWithinPartitions($"k")
      .write.parquet(s"$d/cout")
    val genPaths = Snapshots.manifestAt(spark, root, 1L)
      .filter($"kind" =!= "data").select($"file").as[String].collect().toSeq
    Snapshots.commitRewrite(spark, root, removed = files,
      addedDir = s"$d/cout", cols = Seq("k"), dropDeleteGens = genPaths)

    // freshly maintained: the planner proposes NOTHING
    val after = actionsOf(MaintenancePlanner.plan(spark, root,
      targetBytes = 2L, statsCol = Some("k")))
    assert(after.isEmpty, s"expected empty plan, got $after")
  }

  test("absorbDeletes executes the planner's absorb: exact content, affected-only rewrite, empty plan after") {
    val d = java.nio.file.Files.createTempDirectory("absorbexec").toString
    val data = s"$d/data"; val root = s"$d/snaps"
    val dv = s"$d/dv"; val eq = s"$d/eq"
    def commit(): Unit = {
      Snapshots.commitFromFs(spark, data, root, Seq("k"),
        posDeleteDir = Some(dv), eqDeleteDir = Some(eq))
      ()
    }
    (1L to 10L).map(k => (k, k * 100L)).toDF("k", "v")
      .coalesce(1).write.parquet(data)
    commit() // s0
    DeletionVectors.addDeletes(spark, data, dv, $"k" === 10L)
    commit() // s1: position delete
    DeletionVectors.addKeyDeletes(spark, eq, Seq(1L, 2L).toDF("k"))
    commit() // s2: tombstones at seq 2
    Seq((1L, 999L)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(data)
    commit() // s3: key 1 re-inserted at seq 3 — must survive the absorb
    val want = Snapshots.readAt(spark, root, 3L)
      .select($"k", $"v").as[(Long, Long)].collect().sorted.toSeq
    assert(want == ((1L, 999L) +: (3L to 9L).map(k => (k, k * 100L))), s"$want")
    // the planner proposes the absorbs; the executor runs them
    val plan0 = actionsOf(MaintenancePlanner.plan(spark, root, targetBytes = 2L))
    assert(plan0.map(_._2).distinct == Seq("absorb_compact"), s"$plan0")
    val reinsertFile = Snapshots.filesAt(spark, root, 3L)
      .filterNot(Snapshots.filesAt(spark, root, 2L).toSet).head
    val c = Snapshots.absorbDeletes(spark, root, s"$d/absorbed", Seq("k")).get
    assert(c.snapshot == 4L)
    // content identical to the MoR read, now physical
    val got = Snapshots.readAt(spark, root, 4L)
      .select($"k", $"v").as[(Long, Long)].collect().sorted.toSeq
    assert(got == want, s"absorb must preserve content: $got")
    // AFFECTED-ONLY: the re-insert file (seq 3, past every tombstone)
    // was not rewritten — it survives into the new snapshot's list
    assert(Snapshots.filesAt(spark, root, 4L).contains(reinsertFile),
      "unaffected file must be kept, not rewritten")
    // watermark empty, planner has nothing left; older snapshots intact
    assert(actionsOf(MaintenancePlanner.plan(spark, root, targetBytes = 2L)).isEmpty)
    assert(Snapshots.readAt(spark, root, 3L)
      .select($"k", $"v").as[(Long, Long)].collect().sorted.toSeq == want)
    assert(Snapshots.readAt(spark, root, 0L).count() == 10L)
    // idempotent: a second absorb is a no-op (None)
    assert(Snapshots.absorbDeletes(spark, root, s"$d/absorbed2", Seq("k")).isEmpty)
  }

  test("small-file debt, retention, and clustering drift each fire their own action") {
    val d = java.nio.file.Files.createTempDirectory("plannerdebt").toString
    val data = s"$d/data"; val root = s"$d/snaps"
    // 8 tiny unclustered files: every file spans the whole k domain
    (1L to 4000L).toDF("k").repartition(8).write.parquet(data)
    Snapshots.commitFromFs(spark, data, root, Seq("k"))
    val p1 = actionsOf(MaintenancePlanner.plan(spark, root,
      targetBytes = 1L << 30, statsCol = Some("k")))
    assert(p1.map(_._2) == Seq("compact_small_files", "recluster"), s"$p1")

    // grow history past retention: expire joins the plan, ordered last
    (4001L to 4100L).toDF("k").coalesce(1).write.mode("append").parquet(data)
    Snapshots.commitFromFs(spark, data, root, Seq("k"))
    (4101L to 4200L).toDF("k").coalesce(1).write.mode("append").parquet(data)
    Snapshots.commitFromFs(spark, data, root, Seq("k"))
    val p2 = actionsOf(MaintenancePlanner.plan(spark, root,
      targetBytes = 1L << 30, keepSnapshots = 1, statsCol = Some("k")))
    assert(p2.map(_._2) == Seq("compact_small_files", "recluster", "expire"),
      s"$p2")
    assert(p2.last._3 == "keepFrom=2", s"expire target: ${p2.last._3}")
    // priorities strictly ordered = run order
    assert(p2.map(_._1) == p2.map(_._1).sorted)
  }

  test("execute: absorb + recluster + expire in order, empty plan after, content exact") {
    val d = java.nio.file.Files.createTempDirectory("plannerexec").toString
    val data = s"$d/data"; val root = s"$d/snaps"
    val dv = s"$d/dv"; val eq = s"$d/eq"
    def commit(): Unit = {
      Snapshots.commitFromFs(spark, data, root, Seq("k"),
        posDeleteDir = Some(dv), eqDeleteDir = Some(eq))
      ()
    }
    // 8 round-robin files — every file spans the whole k range, so
    // clustering depth on k is ~8; sizes (~1.2 KB) sit ABOVE the
    // small-file line at targetBytes=2000, so compaction stays out of
    // this lifecycle and the recluster branch is what must fire
    (1L to 800L).toDF("k").repartition(8).write.parquet(data)
    commit() // s0
    DeletionVectors.addDeletes(spark, data, dv, $"k" % 10 === 0)
    commit() // s1
    DeletionVectors.addKeyDeletes(spark, eq, Seq(5L, 15L).toDF("k"))
    commit() // s2 — three snapshots, keepSnapshots=2 ⇒ expire fires
    val knobs = (2000L, 2, Some("k"), 2.0)
    val report = MaintenancePlanner.execute(spark, root, s"$d/maint", Seq("k"),
      targetBytes = knobs._1, keepSnapshots = knobs._2, statsCol = knobs._3,
      depthThreshold = knobs._4)
    assert(report.map(_.action) == Seq("absorb_compact", "recluster", "expire"),
      s"actions: $report")
    // the plan with the SAME knobs is now empty — maintenance is done
    val after = actionsOf(MaintenancePlanner.plan(spark, root,
      targetBytes = knobs._1, keepSnapshots = knobs._2, statsCol = knobs._3,
      depthThreshold = knobs._4))
    assert(after.isEmpty, s"expected empty plan after execute, got $after")
    // content is exact through the absorb + recluster rewrites
    val want = (1L to 800L).filterNot(k => k % 10 == 0 || k == 5L || k == 15L)
    val got = Snapshots.readAt(spark, root,
        Snapshots.latest(spark, root).get)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(got == want, s"content drifted: ${got.length} vs ${want.length}")
    // the reclustered layout actually skips: a narrow range probe at
    // the latest snapshot opens a strict subset of the files
    val snap = Snapshots.latest(spark, root).get
    val total = Snapshots.filesAt(spark, root, snap).length
    val cand = Snapshots.candidateFilesAt(spark, root, snap, "k", 10L, 30L)
    assert(total > 1 && cand.length < total,
      s"range probe must prune after recluster: $cand of $total")
  }

  test("execute: small-file compaction alone, empty plan after, content exact") {
    val d = java.nio.file.Files.createTempDirectory("plannercompact").toString
    val data = s"$d/data"; val root = s"$d/snaps"
    (1L to 400L).toDF("k").repartition(8).write.parquet(data)
    Snapshots.commitFromFs(spark, data, root, Seq("k"))
    val report = MaintenancePlanner.execute(spark, root, s"$d/maint", Seq("k"),
      targetBytes = 1L << 20, keepSnapshots = 7)
    assert(report.map(_.action) == Seq("compact_small_files"), s"$report")
    assert(report.head.removed == 8 && report.head.added < 8, s"$report")
    assert(actionsOf(MaintenancePlanner.plan(spark, root,
      targetBytes = 1L << 20, keepSnapshots = 7)).isEmpty)
    val got = Snapshots.readAt(spark, root,
        Snapshots.latest(spark, root).get)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(got == (1L to 400L))
  }
}

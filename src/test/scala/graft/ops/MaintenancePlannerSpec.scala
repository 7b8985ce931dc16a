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
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Maintenance planner — the operator's "what should run tonight"
  * call, derived from METADATA ONLY: the latest snapshot's manifest
  * ([[Snapshots.manifestAt]] — file census, per-file stats, delete
  * watermark) and the snapshot list. No data file is opened; driver
  * state is manifest-sized, the lakehouse module's standing bound.
  *
  * Emits ORDERED actions (priority ascending = run first), each with
  * the metric that justified it — the same decision rules the bench
  * prices as A/B cells, so the planner's output is literally "the
  * cheap side of the measured trade":
  *
  *  1. `absorb_compact` — delete generations visible in the latest
  *     watermark. Merge-on-read tax is paid on EVERY read until a
  *     rewrite absorbs the deletes (the bench's scan_dv_merge_on_read
  *     0.88 s / scan_snapshot_mor 1.20 s vs scan_dv_after_absorb
  *     0.17 s cells); debt only grows, so this outranks everything.
  *     One action per generation dir; EXECUTABLE in one call via
  *     [[Snapshots.absorbDeletes]] (affected-files-only rewrite that
  *     drops the whole watermark), or composed by hand through
  *     [[Compaction.compact]] + [[Snapshots.commitRewrite]]
  *     (seq-scoped via [[Snapshots.eqScopeAt]]) when the absorb should
  *     ride an already-planned compaction.
  *  2. `compact_small_files` — the [[TableHealth]] rule (≥ 4 files
  *     under half the target and they are the majority): per-file
  *     listing RPCs and footer reads dominate planning at 10⁵⁺ files
  *     (the scan_smallfiles_64 vs scan_compacted cells).
  *  3. `recluster` — average clustering depth on the caller's probe
  *     column above `depthThreshold` ([[Manifest.clusteringDepth]]
  *     over the snapshot manifest): range probes stop skipping files
  *     when spans overlap (the manifest-scan cluster_depth cells);
  *     fix is a [[ZOrder]]/[[HilbertOrder]] rewrite committed as a
  *     snapshot.
  *  4. `expire` — snapshots beyond the retention count: old
  *     generations and rewritten originals hold disk until
  *     [[Snapshots.expire]] retires them; lowest priority because it
  *     frees bytes but speeds up no read.
  *
  * A freshly-maintained table (no visible deletes, right-sized files,
  * clustered layout, short history) yields an EMPTY plan — the
  * planner never invents work.
  */
object MaintenancePlanner {

  final case class Action(priority: Long, action: String, target: String,
      metric: Double, reason: String)

  def plan(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024, keepSnapshots: Int = 7,
      statsCol: Option[String] = None,
      depthThreshold: Double = 2.0): DataFrame = {
    import spark.implicits._
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(keepSnapshots >= 1, s"keepSnapshots must be >= 1, got $keepSnapshots")
    val snaps = Snapshots.snapshots(spark, root)
    require(snaps.nonEmpty, s"no snapshots under $root to plan maintenance for")
    val latest = snaps.last
    val m = Snapshots.manifestAt(spark, root, latest)
    val rows = m.collect()
    val ki = m.schema.fieldIndex("kind")
    val fi = m.schema.fieldIndex("file")
    val bi = m.schema.fieldIndex("n_bytes")
    val data = rows.filter(_.getString(ki) == "data")
    // watermark kinds only: "removed" tombstone rows (rewritten-away
    // file records) are bookkeeping, not absorbable delete debt
    val gens = rows.filter(r =>
      r.getString(ki) == "posdel" || r.getString(ki) == "eqdel")
    val dataBytes = math.max(1L, data.map(_.getLong(bi)).sum)

    val actions = Seq.newBuilder[Action]

    // 1. absorb visible delete generations — MoR tax on every read
    gens.sortBy(r => (r.getString(ki), r.getString(fi))).foreach { g =>
      val bytes = g.getLong(bi)
      actions += Action(1L, "absorb_compact", g.getString(fi), bytes.toDouble,
        f"${g.getString(ki)} generation (${bytes} B vs ${dataBytes} B data): " +
          "every read pays the merge-on-read join until a rewrite absorbs it")
    }

    // 2. small-file debt — the TableHealth compaction rule
    val small = data.filter(_.getLong(bi) < targetBytes / 2)
    if (small.length >= 4 && small.length * 2 > data.length)
      actions += Action(2L, "compact_small_files", s"snap=$latest",
        small.length.toDouble,
        s"${small.length} of ${data.length} files under ${targetBytes / 2} B: " +
          "per-file listing and footer overhead dominates planning at scale")

    // 3. clustering drift on the probe column
    statsCol.foreach { c =>
      val depth = Manifest.clusteringDepth(spark, s"$root/snap=$latest", c)
      if (depth.nFiles > 1 && depth.avgDepth > depthThreshold)
        actions += Action(3L, "recluster", s"snap=$latest",
          math.floor(depth.avgDepth * 10000 + 0.5) / 10000,
          f"avg clustering depth ${depth.avgDepth}%.2f on '$c' " +
            s"(max ${depth.maxDepth}): range probes stop skipping files")
    }

    // 4. retention — history beyond the keep window holds disk
    if (snaps.length > keepSnapshots) {
      val keepFrom = snaps(snaps.length - keepSnapshots)
      actions += Action(4L, "expire", s"keepFrom=$keepFrom",
        (snaps.length - keepSnapshots).toDouble,
        s"${snaps.length} snapshots, retention $keepSnapshots: expired " +
          "snapshots release their rewritten originals and delete generations")
    }

    actions.result().sortBy(a => (a.priority, a.target)).toDF()
  }

  final case class Executed(action: String, snapshot: Long,
      added: Int, removed: Int, detail: String)

  /** EXECUTE the full ordered plan — the loop [[plan]] opened, closed:
    * each action class runs through the engine's own maintenance
    * primitives, committing one snapshot per rewrite, and the returned
    * rows are the per-action commits. Re-plans each step from the
    * CURRENT latest snapshot (an absorb changes what compaction sees;
    * a compaction changes what reclustering sees), so after a full
    * run `plan(...)` with the same knobs returns EMPTY — the
    * MaintenancePlannerSpec contract.
    *
    *  1. `absorb_compact` → [[Snapshots.absorbDeletes]]: affected-
    *     files-only MoR rewrite, watermark dropped.
    *  2. `compact_small_files` → [[Compaction.pack]] over the LATEST
    *     SNAPSHOT's file census (manifest truth, not a dir listing —
    *     rewrite outputs live outside the data dir) +
    *     [[Compaction.compact]] + [[Snapshots.commitRewrite]].
    *  3. `recluster` → sorted rewrite of the whole table on the probe
    *     column ([[graft.sources.Sinks.writeSortedBy]] — range
    *     partition, one disjoint span per file) committed as a
    *     rewrite.
    *  4. `expire` → [[Snapshots.expire]] keeping the newest
    *     `keepSnapshots` (re-derived AFTER the maintenance commits —
    *     the rewrites above add history).
    *
    * Flat tables only (the manifest census carries no partition
    * subpaths); a Hive-partitioned layout should compact through
    * [[Compaction.plan]] on its data dir instead. */
  def execute(spark: SparkSession, root: String, outDir: String,
      cols: Seq[String], targetBytes: Long = 128L * 1024 * 1024,
      keepSnapshots: Int = 7, statsCol: Option[String] = None,
      depthThreshold: Double = 2.0): Seq[Executed] = {
    def planned(): Set[String] =
      plan(spark, root, targetBytes, keepSnapshots, statsCol, depthThreshold)
        .select("action").collect().map(_.getString(0)).toSet
    val out = Seq.newBuilder[Executed]

    if (planned().contains("absorb_compact"))
      Snapshots.absorbDeletes(spark, root, s"$outDir/absorb", cols).foreach { c =>
        out += Executed("absorb_compact", c.snapshot, c.added, c.removed,
          s"absorbed the delete watermark into ${c.added} rewritten file(s)")
      }

    if (planned().contains("compact_small_files")) {
      val snap = Snapshots.latest(spark, root).get
      val m = Snapshots.manifestAt(spark, root, snap)
      val files = m.filter(org.apache.spark.sql.functions.col("kind") === "data")
        .select("file", "n_bytes").collect()
        .map(r => Compaction.FileMeta(r.getString(0), r.getLong(1), ""))
        .toSeq
      val groups = Compaction.pack(files, targetBytes)
      val multi = groups.filter(_.files.length > 1)
      if (multi.nonEmpty) {
        Compaction.compact(spark, multi, s"$outDir/compact")
        val c = Snapshots.commitRewrite(spark, root,
          removed = multi.flatMap(_.files.map(_.path)),
          addedDir = s"$outDir/compact", cols = cols)
        out += Executed("compact_small_files", c.snapshot, c.added, c.removed,
          s"packed ${c.removed} small file(s) into ${c.added}")
      }
    }

    if (planned().contains("recluster")) {
      val c0 = statsCol.get // recluster is only ever planned with a probe col
      val snap = Snapshots.latest(spark, root).get
      val m = Snapshots.manifestAt(spark, root, snap)
      val dataRows = m.filter(org.apache.spark.sql.functions.col("kind") === "data")
        .select("file", "n_bytes").collect()
      val totalBytes = dataRows.map(_.getLong(1)).sum
      val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
      graft.sources.Sinks.writeSortedBy(
        Snapshots.readAt(spark, root, snap), s"$outDir/recluster",
        Seq(c0), numFiles = nFiles)
      val c = Snapshots.commitRewrite(spark, root,
        removed = dataRows.map(_.getString(0)).toSeq,
        addedDir = s"$outDir/recluster", cols = cols)
      out += Executed("recluster", c.snapshot, c.added, c.removed,
        s"range-sorted the table on '$c0' into ${c.added} file(s)")
    }

    if (planned().contains("expire")) {
      val snaps = Snapshots.snapshots(spark, root)
      val keepFrom = snaps(snaps.length - keepSnapshots)
      val rep = Snapshots.expire(spark, root, keepFrom)
      out += Executed("expire", keepFrom, 0, rep.filesDeleted,
        s"dropped ${rep.snapshotsDropped} snapshot(s), freed ${rep.bytesFreed} B")
    }
    out.result()
  }
}

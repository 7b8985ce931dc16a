package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned manifests — TIME TRAVEL for the lakehouse
  * family, and the piece that makes maintenance auditable: every
  * [[Manifest]] state becomes an immutable `snap=<k>` generation
  * instead of an in-place overwrite, so a reader pinned to a snapshot
  * sees ONE consistent file set no matter what compaction / erasure /
  * delete maintenance commits concurrently, and an operator can answer
  * "what did this table look like before last night's compaction?" by
  * reading the previous snapshot.
  *
  * The model is Iceberg's, reduced to its load-bearing core: a TABLE IS
  * ITS SNAPSHOT'S FILE LIST (absolute paths + per-file stats), not a
  * directory scan. Writers only ADD files and commit a new list;
  * nothing is physically deleted at commit time — a rewrite (compaction
  * group, erasure CoW) lands its outputs beside the inputs and commits
  * `prev − removed + added`. Old snapshots stay readable until
  * [[expire]] drops them AND the files only they reference — the
  * vacuum step, deliberately separate from every commit so retention is
  * a policy knob, not a side effect.
  *
  * Commit mechanics reuse the engine's crash-safe generation
  * discipline (the [[DeletionVectors]] pattern): the new manifest is
  * written under a `_`-prefixed staging name and RENAMED to
  * `snap=<k>` — readers either see the whole snapshot or none of it,
  * and the previous snapshot is never touched. Driver-side state is
  * the manifest itself — metadata-sized (one row per file), the same
  * bound as [[Manifest]]/[[Compaction]] and Spark's own file index.
  *
  * What this deliberately does NOT do: physically-destructive in-place
  * maintenance ([[Erasure.erase]] rewrites files in place) breaks
  * older snapshots by construction — snapshot-safe erasure is the
  * copy-on-write spelling ([[commitRewrite]] with cleaned replacement
  * files), priced against the in-place one in the bench's erase cells.
  */
object Snapshots {

  final case class Commit(snapshot: Long, added: Int, removed: Int, kept: Int)
  final case class ExpireReport(snapshotsDropped: Int, filesDeleted: Int,
      bytesFreed: Long)

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapDir(root: String, snap: Long) = s"$root/snap=$snap"

  private def norm(s: String): String = new Path(s).toUri.getPath

  /** Committed snapshot ids under `root`, ascending (empty if none). */
  def snapshots(spark: SparkSession, root: String): Seq[Long] = {
    val p = new Path(root)
    val fs = fsOf(spark, root)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap="))
      .map(_.getPath.getName.stripPrefix("snap=").toLong)
      .sorted
  }

  def latest(spark: SparkSession, root: String): Option[Long] =
    snapshots(spark, root).lastOption

  /** The manifest frame of one snapshot (the [[Manifest]] schema:
    * `file`, `n_bytes`, `mtime`, `n_rows`, min_/max_ per stats col). */
  def manifestAt(spark: SparkSession, root: String, snap: Long): DataFrame =
    spark.read.parquet(snapDir(root, snap))

  /** Absolute data-file paths of one snapshot. */
  def filesAt(spark: SparkSession, root: String, snap: Long): Seq[String] =
    manifestAt(spark, root, snap).select(col("file"))
      .collect().map(_.getString(0)).toSeq.sorted

  /** Stage-then-rename commit of a manifest frame as the next snapshot.
    * Returns the committed id. */
  private def commitManifest(spark: SparkSession, root: String,
      manifest: DataFrame): Long = {
    val fs = fsOf(spark, root)
    val stage = new Path(root, "_stage")
    if (fs.exists(stage)) fs.delete(stage, true)
    manifest.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val next = latest(spark, root).map(_ + 1).getOrElse(0L)
    val dst = new Path(snapDir(root, next))
    if (!fs.rename(stage, dst))
      throw new java.io.IOException(s"could not commit snapshot $dst")
    next
  }

  /** Commit a snapshot from the CURRENT files of `dataDir` — the
    * append-path commit (a batch load landed new files in the table
    * dir). Incremental like [[Manifest.refresh]]: stats are computed
    * only for files whose (path, size, mtime) identity the latest
    * snapshot has never seen; known files carry their rows over. The
    * previous snapshot is left intact — that is the entire point. */
  def commitFromFs(spark: SparkSession, dataDir: String, root: String,
      cols: Seq[String]): Commit = {
    val current = Manifest.fsList(spark, dataDir)
    latest(spark, root) match {
      case None =>
        val m = Manifest.statsFor(spark, dataDir, cols, current)
        Commit(commitManifest(spark, root, m), current.length, 0, 0)
      case Some(prev) =>
        val old = manifestAt(spark, root, prev)
        val oldRows = old.collect()
        val fi = old.schema.fieldIndex("file")
        val bi = old.schema.fieldIndex("n_bytes")
        val mi = old.schema.fieldIndex("mtime")
        val curIds = current.map { case (n, _, b, m) => (n, b, m) }.toSet
        val kept = oldRows.filter(r =>
          curIds((norm(r.getString(fi)), r.getLong(bi), r.getLong(mi))))
        val keptNorm = kept.map(r => norm(r.getString(fi))).toSet
        val newFiles = current.filterNot(f => keptNorm(f._1))
        val keptDf = spark.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(kept: _*)), old.schema)
        val combined =
          if (newFiles.isEmpty) keptDf
          else keptDf.unionByName(
            Manifest.statsFor(spark, dataDir, cols, newFiles)
              .select(old.schema.fieldNames.map(col): _*))
        Commit(commitManifest(spark, root, combined),
          newFiles.length, oldRows.length - kept.length, kept.length)
    }
  }

  /** Commit an explicit REWRITE: next snapshot = latest − `removed` +
    * the files under `addedDir` (compaction group outputs, erasure-CoW
    * replacements). The removed files are NOT deleted — they stay on
    * disk for older snapshots until [[expire]] — which is exactly what
    * makes a mid-maintenance read repeatable. Stats for the added
    * files are computed here (one column-pruned scan of just those
    * files). */
  def commitRewrite(spark: SparkSession, root: String,
      removed: Seq[String], addedDir: String, cols: Seq[String]): Commit = {
    val prev = latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no snapshot under $root to rewrite"))
    val old = manifestAt(spark, root, prev)
    val oldRows = old.collect()
    val fi = old.schema.fieldIndex("file")
    val removedNorm = removed.map(norm).toSet
    val (dropped, kept) = oldRows.partition(r => removedNorm(norm(r.getString(fi))))
    require(dropped.length == removedNorm.size,
      s"rewrite removes ${removedNorm.size} files but snapshot $prev " +
        s"contains only ${dropped.length} of them")
    val added = Manifest.fsList(spark, addedDir)
    val keptDf = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(kept: _*)), old.schema)
    val combined =
      if (added.isEmpty) keptDf
      else keptDf.unionByName(
        Manifest.statsFor(spark, addedDir, cols, added)
          .select(old.schema.fieldNames.map(col): _*))
    Commit(commitManifest(spark, root, combined),
      added.length, dropped.length, kept.length)
  }

  /** Read EXACTLY the files of one snapshot — the time-travel scan.
    * `basePath` keeps Hive partition columns visible for partitioned
    * layouts (pass the table root). A vanished file fails the read
    * loudly (the snapshot outlived its retention — see [[expire]]),
    * never silently narrows it. An empty snapshot is unrepresentable
    * here by construction (commits always carry the file list). */
  def readAt(spark: SparkSession, root: String, snap: Long,
      basePath: Option[String] = None): DataFrame = {
    val files = filesAt(spark, root, snap)
    require(files.nonEmpty, s"snapshot $snap lists no files")
    val r = basePath.foldLeft(spark.read)((rd, b) => rd.option("basePath", b))
    r.parquet(files: _*)
  }

  /** Manifest-pruned range read AT a snapshot: candidate files from
    * that snapshot's stats, then the row-level predicate — the
    * [[Manifest.readRange]] contract with a pinned file set. */
  def readRangeAt(spark: SparkSession, root: String, snap: Long,
      statsCol: String, lo: Any, hi: Any,
      basePath: Option[String] = None): DataFrame = {
    val m = manifestAt(spark, root, snap)
    val files = m
      .filter(col(s"min_$statsCol") <= lit(hi) && col(s"max_$statsCol") >= lit(lo))
      .select(col("file")).collect().map(_.getString(0)).toSeq
    val base =
      if (files.isEmpty) readAt(spark, root, snap, basePath).filter(lit(false))
      else {
        val r = basePath.foldLeft(spark.read)((rd, b) => rd.option("basePath", b))
        r.parquet(files: _*)
      }
    base.filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }

  /** Append-only INCREMENTAL scan — the CDC-consumer pattern on
    * snapshots (Iceberg's incremental read): exactly the files `to`
    * lists that `from` does not, i.e. the data appended between the
    * two commits — a downstream consumer processes each commit's delta
    * without ever rescanning the table. Defined ONLY on append lineage:
    * if any `from` file is gone by `to` (a compaction/erasure rewrite
    * happened in between), the "added" files carry REWRITTEN OLD ROWS
    * and an incremental consumer would double-process them — so this
    * fails loudly and the consumer must resync from a full read (the
    * same contract Iceberg enforces on replace snapshots). */
  def readIncremental(spark: SparkSession, root: String, fromSnap: Long,
      toSnap: Long, basePath: Option[String] = None): DataFrame = {
    val before = filesAt(spark, root, fromSnap).toSet
    val after = filesAt(spark, root, toSnap)
    val removed = before -- after.toSet
    require(removed.isEmpty,
      s"snapshots $fromSnap->$toSnap are not append-only lineage " +
        s"(${removed.size} files removed/rewritten); incremental " +
        "consumption is defined on appends - resync from a full read")
    val added = after.filterNot(before)
    if (added.isEmpty)
      readAt(spark, root, toSnap, basePath).filter(lit(false))
    else {
      val r = basePath.foldLeft(spark.read)((rd, b) => rd.option("basePath", b))
      r.parquet(added: _*)
    }
  }

  /** Roll the table BACK to an older snapshot's state — incident
    * recovery after a bad commit (a corrupted load, a wrong erasure) —
    * by committing a NEW snapshot whose file list copies `to`'s.
    * Append-only like every other commit: the bad snapshots stay
    * readable for the post-mortem and nothing is deleted until
    * [[expire]]; history remains linear (the rollback is just the next
    * snapshot), so consumers need no branch semantics. Fails loudly if
    * any of `to`'s files has already been expired from disk. */
  def rollback(spark: SparkSession, root: String, to: Long): Commit = {
    val m = manifestAt(spark, root, to)
    val fs = fsOf(spark, root)
    val files = filesAt(spark, root, to)
    val missing = files.filterNot(f => fs.exists(new Path(f)))
    require(missing.isEmpty,
      s"cannot roll back to snapshot $to: ${missing.length} of its files " +
        s"were expired (first: ${missing.headOption.getOrElse("")})")
    Commit(commitManifest(spark, root, m), files.length, 0, 0)
  }

  /** Retention: drop every snapshot older than `keepFrom` and delete
    * the data files ONLY those snapshots reference (a file listed by
    * any surviving snapshot survives). This is the ONE destructive
    * call in the module — everything before it is append-only — and
    * the reason a crashed maintenance job can never strand readers:
    * expiry is explicit, never implied by a commit. */
  def expire(spark: SparkSession, root: String, keepFrom: Long): ExpireReport = {
    val all = snapshots(spark, root)
    val (drop, keep) = all.partition(_ < keepFrom)
    require(keep.nonEmpty, s"expire($keepFrom) would drop every snapshot")
    if (drop.isEmpty) return ExpireReport(0, 0, 0L)
    val fs = fsOf(spark, root)
    def filesWithBytes(s: Long): Seq[(String, Long)] = {
      val m = manifestAt(spark, root, s)
      m.select(col("file"), col("n_bytes")).collect()
        .map(r => (norm(r.getString(0)), r.getLong(1))).toSeq
    }
    val referenced = keep.flatMap(s => filesWithBytes(s).map(_._1)).toSet
    val victims = drop.flatMap(filesWithBytes).distinct
      .filterNot { case (p, _) => referenced(p) }
    var freed = 0L
    var deleted = 0
    victims.foreach { case (p, bytes) =>
      if (fs.delete(new Path(p), false)) { deleted += 1; freed += bytes }
    }
    drop.foreach(s => fs.delete(new Path(snapDir(root, s)), true))
    ExpireReport(drop.length, deleted, freed)
  }
}

package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the OPTIMIZE half of table maintenance
  * (the [[Manifest]] is the other): streaming sinks, per-trigger
  * micro-batches and fine-grained partition overwrites leave a table as
  * thousands of KB-scale files, and at 100 TB the per-file overhead
  * (listing RPCs, footer reads, task scheduling — one task minimum per
  * file) dominates scans long before data volume does.
  *
  * Two phases, deliberately separated:
  *
  *  - [[plan]] is PURE METADATA: list the data files (sizes from the
  *    file system, no data read) and first-fit-decreasing bin-pack them
  *    into groups of ≤ `targetBytes`. FFD is deterministic (sizes
  *    descending, path as tiebreak) and within 11/9·OPT + 1 of optimal
  *    bin count — the classical guarantee. Files ≥ target stay
  *    singleton groups (already big enough; rewriting them buys
  *    nothing). The plan is reviewable before any I/O happens.
  *  - [[compact]] executes the plan: one read+write per MULTI-FILE
  *    group (a group that is one file is ALREADY compact — copying it
  *    would double its I/O for zero benefit, so it is left in place and
  *    listed in the returned report as `kept`). Each rewritten group
  *    coalesces to one output file.
  *
  * The driver holds only file metadata (path, size) — the same
  * metadata-sized state bound as [[Manifest]] and Spark's own file
  * index. Data never routes through the driver.
  */
object Compaction {

  /** `subdir` is the file's partition subpath relative to the table
    * root ("" for an unpartitioned table, "station_id=KLGA/year=2024"
    * for the engine's canonical hourly layout) — the unit compaction
    * must respect: a rewritten file's partition values live in its
    * DIRECTORY name, so merging files across partitions would silently
    * reassign every row's partition columns. */
  final case class FileMeta(path: String, bytes: Long, subdir: String = "")
  final case class Group(id: Int, files: Seq[FileMeta], subdir: String = "") {
    def bytes: Long = files.map(_.bytes).sum
    /** Output path of this group's rewrite, relative to the compaction
      * outDir — partition subpath preserved so a partition-aware reader
      * sees the same partition values after the swap. */
    def outSubPath: String = if (subdir.isEmpty) s"g$id" else s"$subdir/g$id"
  }

  /** Data files under `dir`, RECURSIVE into `key=value` partition
    * directories (`_`/`.`-prefixed files and dirs excluded at every
    * level), sizes from the FS — no data read. Each file carries its
    * partition subpath. */
  def listFiles(spark: SparkSession, dir: String): Seq[FileMeta] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(root).toUri
    def walk(d: Path): Seq[FileMeta] =
      fs.listStatus(d).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (s.isFile) {
          val rel = rootUri.relativize(fs.makeQualified(s.getPath).toUri).getPath
          val sub = rel.lastIndexOf('/') match {
            case -1 => ""
            case i  => rel.substring(0, i)
          }
          Seq(FileMeta(s.getPath.toString, s.getLen, sub))
        } else walk(s.getPath)
      }
    walk(root).sortBy(_.path)
  }

  /** First-fit-decreasing bin packing of the table's files into groups
    * of at most `targetBytes` (singleton groups may exceed it — a file
    * already ≥ target is its own group). Packing is PER PARTITION
    * SUBDIR: a group never spans partitions, because the rewrite's
    * output directory IS the partition encoding. Deterministic: subdirs
    * process in sorted order, files sort by (bytes desc, path), bins
    * are probed first-fit in creation order; group ids are global and
    * stable. */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): Seq[Group] =
    pack(listFiles(spark, dir), targetBytes)

  /** The same FFD packing over an EXPLICIT file list — for tables
    * whose truth is a snapshot manifest rather than a directory
    * listing ([[MaintenancePlanner.execute]] hands it the latest
    * snapshot's data files, which may span the data dir and earlier
    * rewrites' out dirs). */
  def pack(allFiles: Seq[FileMeta], targetBytes: Long): Seq[Group] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val byPart = allFiles.groupBy(_.subdir).toSeq.sortBy(_._1)
    var nextId = 0
    byPart.flatMap { case (sub, partFiles) =>
      val files = partFiles.sortBy(f => (-f.bytes, f.path))
      val bins = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[FileMeta]]
      val free = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (f <- files) {
        // a zero-byte file fits ANY bin by `free >= 0` — including the
        // CLOSED bin of an oversize singleton (free would be 0), which
        // would turn that singleton into a multi-file group and make
        // compact() rewrite an already-huge file. Oversize bins are
        // marked closed with free = −1 so nothing (not even a zero-byte
        // file) can ever join them.
        val i = free.indexWhere(_ >= f.bytes)
        if (i >= 0) { bins(i) += f; free(i) -= f.bytes }
        else {
          bins += scala.collection.mutable.ArrayBuffer(f)
          free += (if (f.bytes >= targetBytes) -1L else targetBytes - f.bytes)
        }
      }
      bins.toSeq.map { b =>
        val g = Group(nextId, b.toSeq, sub)
        nextId += 1
        g
      }
    }
  }

  final case class CompactReport(
      groupsRewritten: Int, filesRewritten: Int, bytesRewritten: Long,
      filesKept: Int)

  /** Execute a [[plan]]: every multi-file group is read and rewritten
    * as ONE parquet file under `outDir/<partition-subpath>/g<id>`;
    * single-file groups are kept in place (already compact). Returns
    * the rewrite report. The caller swaps the compacted layout in
    * atomically (pointer file / directory rename — the snapshot-store
    * discipline) and then runs [[Manifest.refresh]] as the documented
    * post-compact step: compaction changes the file set, and refresh
    * re-scans ONLY the rewritten group files (their (path, size, mtime)
    * identity is new) while dropping the absorbed originals' rows.
    *
    * Groups are independent, and each rewrite is a 1-task job
    * (coalesce(1)) — a serial loop would leave the cluster idle and
    * make wall-clock the SUM of per-group latencies at exactly the
    * many-small-files scale this module exists for. Jobs submit
    * concurrently through a bounded pool (Spark's scheduler interleaves
    * them); `parallelism` caps in-flight jobs, not data.
    *
    * `deleteDir`: a [[DeletionVectors]] position-delete table to ABSORB
    * — each group rewrite anti-joins its rows' (file_path, row_index)
    * against the recorded positions, so the compacted files are born
    * CLEAN and the absorbed files' vectors become dangling (the caller
    * runs [[DeletionVectors.pruneDanglingDeletes]] after the layout
    * swap — the documented lifecycle). Without this, a compaction
    * would copy deleted rows into new files whose positions no vector
    * covers — silently UNDOING the deletes. Files kept in place
    * (single-file groups) keep their live vectors; the merge-on-read
    * path still applies them. The delete side broadcasts (positions
    * only — KBs per million deletes), so absorption adds no shuffle
    * to the rewrites.
    *
    * `eqDeleteDir`: an equality-delete (tombstone-key) table to absorb
    * the same way — rewritten groups anti-join on the key columns, so
    * their files carry no tombstoned rows. WITHOUT `eqScope` a
    * tombstone applies to every rewritten row (the engine's CDC
    * latest-per-key semantics): reapplying a key tombstone to an
    * absorbed file is idempotent — the matching rows are already gone —
    * so a partial rewrite is always safe, but a re-inserted key would
    * be absorbed away too.
    *
    * `eqScope` adds Iceberg v2's sequence-number scoping (the
    * [[Snapshots]] composition): each tombstone applies only to rows
    * from data files whose commit sequence is STRICTLY LESS than its
    * generation's — a key re-inserted after its tombstone survives the
    * rewrite. `fileSeq` maps normalized (URI-path) data-file paths to
    * their commit sequence — a file absent from the map is treated as
    * newest (never eq-deleted), the safe default; `genSeq` maps
    * eq-generation ids to their commit sequence — a generation absent
    * from the map is invisible to this rewrite (not yet committed to
    * any snapshot). Both are file-/generation-grain: metadata-sized,
    * broadcast. */
  final case class EqScope(fileSeq: Seq[(String, Long)], genSeq: Map[Int, Long])

  // strips scheme + optional authority (`file:/x` and `file:///x` both
  // render from _metadata.file_path depending on the path printer)
  private def normSfExpr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.regexp_replace(
      c, "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", "")

  def compact(spark: SparkSession, groups: Seq[Group], outDir: String,
      parallelism: Int = 8, deleteDir: Option[String] = None,
      eqDeleteDir: Option[String] = None,
      eqScope: Option[EqScope] = None): CompactReport = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val multi = groups.filter(_.files.length > 1)
    val kept = groups.filter(_.files.length <= 1).map(_.files.length).sum
    if (multi.isEmpty) return CompactReport(0, 0, 0L, kept)
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(parallelism, multi.length))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
      // the absorb side is planned once; each group job anti-joins the
      // same (tiny, broadcast) position table — positions of files
      // outside the group simply match nothing
      val dels = deleteDir
        .filter(d => DeletionVectors.hasDeletes(spark, d))
        .map(d => spark.read.parquet(d).drop("gen")
          .select(col("file_path"), col("row_index")).distinct())
      val eqDels = eqDeleteDir
        .filter(d => DeletionVectors.hasDeletes(spark, d))
        .map { d =>
          eqScope match {
            case None => spark.read.parquet(d).drop("gen").distinct()
            case Some(sc) =>
              // keep the generation id, stamp each tombstone with its
              // commit sequence (max per key: applies to the most
              // files); gens outside the scope map are invisible
              import spark.implicits._
              val raw = spark.read.parquet(d)
              val genSeq = broadcast(
                sc.genSeq.toSeq.toDF("gen", "__eq_seq"))
              val keyCols = raw.columns.filterNot(_ == "gen").toSeq
              raw.join(genSeq, Seq("gen"))
                .groupBy(keyCols.map(col): _*)
                .agg(org.apache.spark.sql.functions.max(col("__eq_seq"))
                  .as("__eq_seq"))
          }
        }
      val fileSeqDf = eqScope.map { sc =>
        import spark.implicits._
        broadcast(sc.fileSeq.toDF("__sf", "__file_seq"))
      }
      val futs = multi.map { g =>
        scala.concurrent.Future {
          // the group's files share one partition subdir by plan()'s
          // contract, so the PHYSICAL columns of every file agree and
          // the rewrite lands under the same partition encoding
          val raw0 = spark.read.parquet(g.files.map(_.path): _*)
          // every _metadata-derived helper is projected in ONE select
          // on the scan (hidden metadata columns resolve only there);
          // the scoped absorb needs each row's normalized source path
          val helpers =
            (if (dels.isDefined)
              Seq(col("_metadata.file_path").as("__dv_file"),
                col("_metadata.row_index").as("__dv_pos"))
            else Seq.empty) ++
            (if (fileSeqDf.isDefined)
              Seq(normSfExpr(col("_metadata.file_path")).as("__sf"))
            else Seq.empty)
          val raw = if (helpers.isEmpty) raw0
            else raw0.select(col("*") +: helpers: _*)
          val posClean = dels match {
            case None => raw
            case Some(dv) =>
              raw.join(broadcast(dv),
                  raw("__dv_file") === dv("file_path") &&
                    raw("__dv_pos") === dv("row_index"),
                  "left_anti")
                .drop("__dv_file", "__dv_pos")
          }
          val cleaned = (eqDels, fileSeqDf) match {
            case (None, _) => posClean
            case (Some(keys), None) =>
              val ks = keys.toDF(keys.columns.map(c => s"__eq_$c"): _*)
              val cond = keys.columns.toSeq
                .map(c => posClean(c) <=> ks(s"__eq_$c")).reduce(_ && _)
              posClean.join(broadcast(ks), cond, "left_anti")
            case (Some(keys), Some(fsq)) =>
              // sequence-scoped absorb: tag each row with its source
              // file's commit sequence (left join — an unmapped file
              // is newest, never deleted) and require the tombstone's
              // sequence to be strictly greater. `_metadata` resolves
              // only against the scan, so the tag is projected from
              // `raw` and carried through the position anti-join.
              val keyCols = keys.columns.filterNot(_ == "__eq_seq").toSeq
              val ks = keys.toDF(
                keyCols.map(c => s"__eq_$c") :+ "__eq_seq": _*)
              val tagged = posClean.join(fsq, Seq("__sf"), "left")
                .withColumn("__row_seq",
                  coalesce(col("__file_seq"), lit(Long.MaxValue)))
              val cond = keyCols
                .map(c => tagged(c) <=> ks(s"__eq_$c")).reduce(_ && _) &&
                ks("__eq_seq") > tagged("__row_seq")
              tagged.join(broadcast(ks), cond, "left_anti")
                .drop("__file_seq", "__row_seq")
          }
          cleaned
            .drop("__sf")
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$outDir/${g.outSubPath}")
          (g.files.length, g.bytes)
        }
      }
      val res =
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futs),
          scala.concurrent.duration.Duration.Inf)
        catch {
          case t: Throwable =>
            // fail-fast leaves up to parallelism−1 rewrites still
            // running: stop them and WAIT before propagating, or a
            // caller's delete-outDir-and-retry races zombie writers
            // resurrecting partial g<N> dirs
            pool.shutdownNow()
            pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
            throw t
        }
      CompactReport(multi.length, res.map(_._1).sum, res.map(_._2).sum, kept)
    } finally pool.shutdown()
  }
}

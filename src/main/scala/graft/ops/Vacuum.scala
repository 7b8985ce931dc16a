package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Orphan-file vacuum — the garbage-collection corner of table
  * maintenance: failed writes, killed compactions and abandoned
  * `.erase_tmp_*` staging dirs leave parquet bytes on disk that no
  * manifest row references. They are invisible to manifest-routed
  * readers but NOT to `spark.read.parquet(dir)` — a raw directory scan
  * resurrects half-written data — and at 100 TB they are also real
  * storage money.
  *
  * [[findOrphans]] is PURE METADATA: recursive listing (the
  * Manifest/Compaction walk, `_`/`.`-prefixed entries skipped — except
  * `.erase_tmp_*` staging dirs, which are exactly the garbage this op
  * exists to find) anti-joined driver-side against the manifest's
  * `file` column. [[vacuum]] deletes them, with a SAFETY GATE: a file
  * younger than `minAgeMs` is kept (it may be a write in flight —
  * the same grace-period discipline as Delta's VACUUM retention).
  *
  * The inverse direction (manifest rows whose file VANISHED) is
  * [[Manifest.refresh]]'s job; vacuum never mutates the manifest.
  */
object Vacuum {

  final case class VacuumReport(
      orphans: Seq[String], deleted: Int, keptYoung: Int, bytesFreed: Long)

  /** Files on disk under `dataDir` that no manifest row references.
    * Staging dirs (`.erase_tmp_*`) are walked INTO (their contents are
    * orphaned bytes); other `_`/`.` entries (commit markers, manifest
    * sidecars) stay invisible, matching the reader's listing rules. */
  def findOrphans(spark: SparkSession, dataDir: String, manifestDir: String)
      : Seq[(String, Long, Long)] = {
    val root = new Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(d).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (s.isDirectory && n.startsWith(".erase_tmp_")) walk(s.getPath)
        else if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (s.isFile) Seq(s)
        else walk(s.getPath)
      }
    val referenced = spark.read.parquet(manifestDir)
      .select("file").collect()
      .map(r => new Path(r.getString(0)).toUri.getPath).toSet
    walk(root)
      .filterNot(s => referenced(s.getPath.toUri.getPath))
      .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
      .sortBy(_._1)
  }

  /** Delete orphans older than `minAgeMs` (grace period for writes in
    * flight); younger orphans are reported but kept. Empty staging
    * dirs left behind by deleted contents are removed too. */
  def vacuum(spark: SparkSession, dataDir: String, manifestDir: String,
      minAgeMs: Long = 24L * 3600 * 1000,
      nowMs: Long = System.currentTimeMillis()): VacuumReport = {
    val fs = new Path(dataDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphans = findOrphans(spark, dataDir, manifestDir)
    val (old, young) = orphans.partition(o => nowMs - o._3 >= minAgeMs)
    old.foreach { case (p, _, _) =>
      val path = new Path(p)
      fs.delete(path, false)
      val parent = path.getParent
      // a drained staging dir may still hold commit markers (_SUCCESS,
      // .crc) — entries the listing rules make invisible; the dir is
      // garbage once nothing VISIBLE remains
      if (parent.getName.startsWith(".erase_tmp_") && fs.exists(parent) &&
          fs.listStatus(parent).forall { s =>
            val n = s.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          })
        fs.delete(parent, true)
    }
    VacuumReport(orphans.map(_._1), old.length, young.length, old.map(_._2).sum)
  }
}

package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style POSITION DELETES — row-level delete without rewriting
  * data files, the third leg of the lakehouse maintenance stool next to
  * [[Manifest]] (stats) and [[Compaction]] (layout).
  *
  * A delete that must take effect NOW cannot wait for a copy-on-write
  * rewrite of every touched file (at 100 TB a scattered 0.1% delete
  * touches nearly every file — a full-table rewrite). Instead the
  * delete is recorded as (file_path, row_index) positions in a small
  * side table, and every read anti-joins them away (merge-on-read).
  * The data files are immutable; [[Compaction]] later ABSORBS deletes
  * by rewriting hot files, after which [[pruneDanglingDeletes]] drops
  * the vectors whose files vanished.
  *
  * Spark-first mechanics: positions come from the parquet reader's own
  * hidden `_metadata` struct (`file_path`, `row_index` — stable row
  * numbering within each file, split-independent), so capture is ONE
  * predicate scan, and the read path is ONE left-anti join on
  * (file_path, row_index). The delete side is broadcast when small —
  * the overwhelmingly common case: a delete vector is positions only,
  * KBs per million deleted rows — so a merge-on-read scan costs the
  * data side NO shuffle at all; past `broadcastRowLimit` the join
  * falls back to shuffle (and that is the signal compaction is
  * overdue). Appending the same positions twice is harmless: the read
  * is an anti-join, membership not multiplicity, and [[read]] dedups
  * the (tiny) delete side before joining.
  */
object DeletionVectors {

  /** Record positions of rows matching `pred` against the CURRENT file
    * layout of `dataDir`, appended to `deleteDir` as one more delete
    * generation. Returns the number of positions written (rows already
    * covered by earlier generations are re-recorded — membership
    * semantics make that a no-op at read time). */
  def addDeletes(spark: SparkSession, dataDir: String, deleteDir: String,
      pred: Column): Long = {
    val hits = spark.read.parquet(dataDir)
      .filter(pred)
      .select(
        col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"))
    val n = hits.count()
    if (n > 0)
      hits.write.mode("append").parquet(deleteDir)
    n
  }

  private def hasDeletes(spark: SparkSession, deleteDir: String): Boolean = {
    val p = new Path(deleteDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
  }

  /** Merge-on-read scan: `dataDir` minus every position recorded in
    * `deleteDir`. No delete table (or an empty one) reads the data
    * unchanged. The delete side is deduped (generations may overlap)
    * and broadcast while its ON-DISK size stays under
    * `broadcastByteLimit` — decided from the FS listing the wrapper
    * already pays, NOT a count() job (counting would scan the delete
    * table once per read, doubling the metadata cost of every
    * merge-on-read query); beyond the limit the anti-join shuffles
    * both sides — correct but a compaction smell. */
  def read(spark: SparkSession, dataDir: String, deleteDir: String,
      broadcastByteLimit: Long = 256L * 1024 * 1024): DataFrame = {
    val data = spark.read.parquet(dataDir)
    if (!hasDeletes(spark, deleteDir)) return data
    val p = new Path(deleteDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delBytes = fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
    val dels = spark.read.parquet(deleteDir)
      .select(col("file_path"), col("row_index")).distinct()
    val delsSided =
      if (delBytes <= broadcastByteLimit) broadcast(dels) else dels
    val keyed = data.select(
      col("*"),
      col("_metadata.file_path").as("__dv_file"),
      col("_metadata.row_index").as("__dv_pos"))
    keyed.join(delsSided,
        keyed("__dv_file") === delsSided("file_path") &&
          keyed("__dv_pos") === delsSided("row_index"),
        "left_anti")
      .drop("__dv_file", "__dv_pos")
  }

  final case class PruneReport(kept: Long, dropped: Long)

  /** Post-compaction maintenance: drop delete rows whose data file no
    * longer exists (a rewrite gave surviving rows NEW positions in NEW
    * files, so the old vectors are dangling — harmless to reads, pure
    * bloat). Mirrors [[Manifest.refresh]]'s delta discipline: the live
    * file set comes from one FS listing, the rewrite touches only the
    * metadata-sized delete table. */
  def pruneDanglingDeletes(spark: SparkSession, dataDir: String,
      deleteDir: String): PruneReport = {
    if (!hasDeletes(spark, deleteDir)) return PruneReport(0L, 0L)
    val p = new Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // compare URI PATHS, not rendered URI strings: `_metadata.file_path`
    // renders as `file:///x` (and URL-encodes specials) while Hadoop
    // Path.toUri prints `file:/x` — string equality silently matches
    // nothing (the Manifest.normScan lesson)
    def norm(s: String): String =
      try {
        val g = new java.net.URI(s).getPath
        if (g != null) g else new Path(s).toUri.getPath
      } catch {
        case _: java.net.URISyntaxException => new Path(s).toUri.getPath
      }
    def walk(dir: Path): Seq[String] =
      fs.listStatus(dir).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (s.isFile) Seq(s.getPath.toUri.getPath)
        else walk(s.getPath)
      }
    val live = walk(p).toSet
    val dels = spark.read.parquet(deleteDir)
      .select(col("file_path"), col("row_index")).distinct()
      .collect()
    // the delete table is metadata-sized by construction (positions of
    // deleted rows, bounded by the broadcast-side budget) — same
    // driver-state bound as Manifest/Compaction
    val (kept, dropped) = dels.partition(r => live.contains(norm(r.getString(0))))
    import spark.implicits._
    kept.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("file_path", "row_index")
      .coalesce(1).write.mode("overwrite").parquet(deleteDir)
    PruneReport(kept.length.toLong, dropped.length.toLong)
  }
}

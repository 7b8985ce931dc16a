package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max manifest — the lakehouse data-skipping pattern
  * (Iceberg manifest files / Delta add-file stats) in plain Spark.
  *
  * Footer-stat pruning (Sinks.writeSortedBy / ZOrder) already skips row
  * groups, but the reader still has to LIST the table and OPEN every
  * file's footer to learn it can skip — at 100 TB with 10⁵–10⁶ files
  * that metadata pass is itself a distributed job and dominates
  * planning for selective queries. A manifest inverts it: ONE build
  * pass records per-file min/max/rowcount for the clustered columns
  * into a metadata-sized side table (|files| rows, KBs); every later
  * range probe consults the manifest FIRST and hands Spark only the
  * files that can match, so listing + footer I/O is O(matching files),
  * not O(table). Complements (not replaces) footer pruning: survivors
  * still row-group-prune inside each file.
  *
  * The build groups by `input_file_name()` — distributed, one scan of
  * the stats columns only (column-pruned). The probe's collect() is
  * bounded by the file count, i.e. metadata-sized driver state (the
  * sanctioned class: same bound as Spark's own driver-side file index).
  * Like any external index the manifest is only sound while the data
  * dir is unchanged (rebuild after writes — a stale manifest can prune
  * files that now contain matching rows; ManifestSpec pins the
  * stale-read hazard note on the happy path instead: the pruned read
  * must equal the full-scan filter row-for-row).
  */
object Manifest {

  /** One row per data file: `file`, `n_rows`, and min_/max_ for each of
    * `cols` (file-local stats; null min/max ⟺ the file is all-null for
    * that column). */
  def build(spark: SparkSession, dataDir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest needs at least one stats column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dataDir)
      .select(cols.map(col): _*)
      .withColumn("file", input_file_name())
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build and persist the manifest beside the data (single small file —
    * it is metadata). */
  def write(spark: SparkSession, dataDir: String, manifestDir: String,
      cols: Seq[String]): Unit =
    build(spark, dataDir, cols).coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)

  final case class RefreshDelta(added: Int, removed: Int, kept: Int)

  /** Incremental refresh — the maintenance call that closes the
    * staleness hazard documented above: after appends, deletes or a
    * [[Compaction]] run, stats are computed ONLY for files the manifest
    * has never seen, and rows for files no longer present are dropped —
    * a full rebuild re-scans the whole table for what is usually a
    * handful of new files. File identity compares by normalized URI
    * path (input_file_name() and DataFrame.inputFiles render the same
    * file differently — `file:///x` vs `file:/x`). The old manifest is
    * held driver-side during the rewrite (it is metadata-sized by
    * construction — the same bound as every other driver-held state
    * here). */
  def refresh(spark: SparkSession, dataDir: String, manifestDir: String,
      cols: Seq[String]): RefreshDelta = {
    import org.apache.hadoop.fs.Path
    def norm(s: String) = new Path(s).toUri.getPath
    val current = spark.read.parquet(dataDir).inputFiles.toSeq
    val curNorm = current.map(norm).toSet
    val old = spark.read.parquet(manifestDir)
    val oldRows = old.collect()
    val fileIdx = old.schema.fieldIndex("file")
    val kept = oldRows.filter(r => curNorm(norm(r.getString(fileIdx))))
    val keptNorm = kept.map(r => norm(r.getString(fileIdx))).toSet
    val newFiles = current.filterNot(f => keptNorm(norm(f))).sorted
    val keptDf = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(kept: _*)), old.schema)
    val combined =
      if (newFiles.isEmpty) keptDf
      else {
        val aggs = count(lit(1)).as("n_rows") +:
          cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        val newRows = spark.read.parquet(newFiles: _*)
          .select(cols.map(col): _*)
          .withColumn("file", input_file_name())
          .groupBy(col("file"))
          .agg(aggs.head, aggs.tail: _*)
        keptDf.unionByName(newRows.select(old.schema.fieldNames.map(col): _*))
      }
    combined.coalesce(1).write.mode("overwrite").parquet(manifestDir)
    RefreshDelta(newFiles.length, oldRows.length - kept.length, kept.length)
  }

  /** Files whose [min,max] span can intersect [lo, hi] on `statsCol` —
    * the candidate set a range probe must read. All-null files never
    * match (a range predicate is null-rejecting). */
  def candidateFiles(spark: SparkSession, manifestDir: String,
      statsCol: String, lo: Any, hi: Any): Array[String] =
    spark.read.parquet(manifestDir)
      .filter(col(s"min_$statsCol") <= lit(hi) && col(s"max_$statsCol") >= lit(lo))
      .select("file").collect().map(_.getString(0))

  /** Manifest-pruned range read: scan ONLY the candidate files, then
    * apply the row-level predicate (file grain is coarser than row
    * grain, so survivors still need the filter). Returns an empty frame
    * with the data schema when no file can match — without touching any
    * data file. */
  def readRange(spark: SparkSession, dataDir: String, manifestDir: String,
      statsCol: String, lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(spark, manifestDir, statsCol, lo, hi)
    val base =
      if (files.isEmpty)
        spark.read.parquet(dataDir).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }
}

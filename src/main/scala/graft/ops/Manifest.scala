package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * The FS LISTING is the manifest's spine — every listed data file gets
  * a row, carrying its size and modification time as the file's
  * IDENTITY alongside the path (a file rewritten in place with new
  * content changes size/mtime, so [[refresh]] re-scans it instead of
  * trusting stale stats; a zero-row file gets an explicit n_rows = 0
  * row instead of silently vanishing from the per-row aggregate and
  * being perpetually "new"). Stats come from ONE column-pruned scan
  * grouped by `input_file_name()`. The probe's collect() is bounded by
  * the file count — metadata-sized driver state, the same bound as
  * Spark's own file index.
  */
object Manifest {

  private def norm(s: String): String = new Path(s).toUri.getPath

  /** Normalize a value of `input_file_name()`: Spark returns the file's
    * URL-ENCODED URI string, while Hadoop listStatus paths are raw —
    * matching them through [[norm]] alone silently misses any path
    * containing a space or %-escapable char (the file would get an
    * n_rows = 0 row and its rows would be dropped by every later
    * manifest probe). Decode through java.net.URI first; fall back to
    * [[norm]] for values that are not syntactically URIs. */
  private def normScan(s: String): String =
    try {
      val p = new java.net.URI(s).getPath
      if (p != null) p else norm(s)
    } catch { case _: java.net.URISyntaxException => norm(s) }

  /** Driver-side RECURSIVE FS listing of the table's data files:
    * (normalized path, canonical path string, bytes, mtime).
    * Metadata-only. Recursion is what makes the manifest see
    * Hive-partitioned layouts — the engine's own canonical hourly table
    * is `station_id=…/year=…` ([[graft.sources.Sinks.writeHourlyObs]]),
    * and a non-recursive listing over it would see ZERO files.
    * `_`/`.`-prefixed files AND directories (commit metadata, staging
    * dirs) are skipped at every level. */
  private[ops] def fsList(spark: SparkSession, dataDir: String)
      : Seq[(String, String, Long, Long)] = {
    val p = new Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (s.isFile) Seq(s)
        else walk(s.getPath)
      }
    walk(p)
      .map(s => (norm(s.getPath.toString), s.getPath.toString,
        s.getLen, s.getModificationTime))
      .sortBy(_._1)
  }

  /** Per-file stats frame for an explicit file list (column-pruned scan
    * keyed by input_file_name), reconciled against the FS listing so
    * every file — including zero-row files — has exactly one row.
    * The scan reads with `basePath = dataDir`, so Hive partition
    * columns (`station_id=…/year=…`) surface as ordinary columns and a
    * partition column requested in `cols` gets its stats for free —
    * min = max = the partition value, constant per file by
    * construction. */
  private[ops] def statsFor(spark: SparkSession, dataDir: String, cols: Seq[String],
      files: Seq[(String, String, Long, Long)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val data = spark.read.option("basePath", dataDir).parquet(files.map(_._2): _*)
    val scanned = data
      .select(cols.map(col): _*)
      .withColumn("__sf", input_file_name())
      .groupBy(col("__sf"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => normScan(r.getString(0)) -> r).toMap
    // identity check — a scanned file that matches NO listed file means
    // the path normalization broke (encoding drift between
    // input_file_name and the FS listing): fail loudly instead of
    // silently recording n_rows = 0 rows that drop data on every probe
    val listed = files.map(_._1).toSet
    val orphans = scanned.keys.filterNot(listed)
    require(orphans.isEmpty,
      s"scanned file(s) matched no FS-listed path (encoding drift?): " +
        orphans.take(3).mkString(", "))
    val statFields = StructField("n_rows", LongType) +:
      cols.flatMap { c =>
        val dt = data.schema(c).dataType
        Seq(StructField(s"min_$c", dt), StructField(s"max_$c", dt))
      }
    val schema = StructType(
      StructField("file", org.apache.spark.sql.types.StringType) +:
        StructField("n_bytes", LongType) +: StructField("mtime", LongType) +:
        statFields)
    val rows = files.map { case (n, path, bytes, mtime) =>
      scanned.get(n) match {
        case Some(r) =>
          Row.fromSeq(path +: bytes +: mtime +: r.toSeq.drop(1))
        case None => // zero-row file: explicit empty-stats row
          Row.fromSeq(path +: bytes +: mtime +: 0L +:
            Seq.fill(cols.length * 2)(null))
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)
  }

  /** One row per data file: `file`, `n_bytes`, `mtime`, `n_rows`, and
    * min_/max_ for each of `cols` (file-local stats; null min/max ⟺ the
    * file has no non-null values for that column, including the
    * zero-row file). */
  def build(spark: SparkSession, dataDir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest needs at least one stats column")
    statsFor(spark, dataDir, cols, fsList(spark, dataDir))
  }

  /** Build and persist the manifest beside the data (single small file —
    * it is metadata). */
  def write(spark: SparkSession, dataDir: String, manifestDir: String,
      cols: Seq[String]): Unit =
    build(spark, dataDir, cols).coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)

  final case class RefreshDelta(added: Int, removed: Int, kept: Int)

  /** Incremental refresh — the maintenance call that closes the
    * staleness hazard: after appends, deletes, in-place rewrites or a
    * [[Compaction]] run, stats are computed ONLY for files whose
    * (path, size, mtime) identity the manifest has never seen; rows for
    * vanished or changed files are dropped — a full rebuild re-scans the
    * whole table for what is usually a handful of new files. Identity
    * includes size and mtime precisely so an in-place rewrite (same
    * path, new content) is re-scanned rather than served stale stats.
    * The old manifest is held driver-side during the rewrite (it is
    * metadata-sized by construction). */
  def refresh(spark: SparkSession, dataDir: String, manifestDir: String,
      cols: Seq[String]): RefreshDelta = {
    val current = fsList(spark, dataDir)
    val curIds = current.map { case (n, _, b, m) => (n, b, m) }.toSet
    val old = spark.read.parquet(manifestDir)
    val oldRows = old.collect()
    val fi = old.schema.fieldIndex("file")
    val bi = old.schema.fieldIndex("n_bytes")
    val mi = old.schema.fieldIndex("mtime")
    val kept = oldRows.filter(r =>
      curIds((norm(r.getString(fi)), r.getLong(bi), r.getLong(mi))))
    val keptNorm = kept.map(r => norm(r.getString(fi))).toSet
    val newFiles = current.filterNot(f => keptNorm(f._1))
    val keptDf = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(kept: _*)), old.schema)
    val combined =
      if (newFiles.isEmpty) keptDf
      else keptDf.unionByName(
        statsFor(spark, dataDir, cols, newFiles)
          .select(old.schema.fieldNames.map(col): _*))
    combined.coalesce(1).write.mode("overwrite").parquet(manifestDir)
    RefreshDelta(newFiles.length, oldRows.length - kept.length, kept.length)
  }

  final case class ClusterDepth(nFiles: Long, avgDepth: Double, maxDepth: Long)

  /** Clustering depth of the layout on `statsCol` — the observability
    * number behind the "is it time to recluster?" decision (the metric
    * warehouses expose per clustered table): for each file, the number
    * of files (itself included) whose [min, max] span OVERLAPS its own
    * — i.e. how many files a range probe touching that file must also
    * consider. A perfectly range-clustered layout scores 1 everywhere
    * (disjoint spans); a layout whose every file spans the whole
    * domain scores |files| and gets no skipping at all from
    * [[candidateFiles]]. Average and max are reported; rising
    * averages after appends/compactions are the trigger for a
    * [[graft.ops.ZOrder]]/[[graft.ops.HilbertOrder]] rewrite. For each
    * file, overlap count = F − #(starts > max_i) − #(ends < min_i)
    * (the two excluded sets are disjoint since every span has
    * min ≤ max) — two binary searches per file over the sorted
    * boundary arrays, O(F log F) on the METADATA-sized manifest
    * driver-side (the same bound as every other Manifest call).
    * All-null-stats files are excluded (they have no span). */
  def clusteringDepth(spark: SparkSession, manifestDir: String,
      statsCol: String): ClusterDepth = {
    val rows = spark.read.parquet(manifestDir)
      .select(col(s"min_$statsCol"), col(s"max_$statsCol"))
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    if (rows.isEmpty) return ClusterDepth(0L, 0.0, 0L)
    @annotation.nowarn("cat=unchecked")
    def cmp(a: Any, b: Any): Int =
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    val spans = rows.map(r => (r.get(0), r.get(1)))
    val starts = spans.map(_._1).sortWith(cmp(_, _) < 0)
    val ends = spans.map(_._2).sortWith(cmp(_, _) < 0)
    val f = spans.length
    // #elements of sorted `arr` strictly greater than / less than v
    def countGreater(arr: Array[Any], v: Any): Int = {
      var lo = 0; var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmp(arr(mid), v) > 0) hi = mid else lo = mid + 1
      }
      arr.length - lo
    }
    def countLess(arr: Array[Any], v: Any): Int = {
      var lo = 0; var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmp(arr(mid), v) < 0) lo = mid + 1 else hi = mid
      }
      lo
    }
    var sumDepth = 0L
    var maxDepth = 0L
    for ((mn, mx) <- spans) {
      val depth = f - countGreater(starts, mx) - countLess(ends, mn)
      sumDepth += depth
      if (depth > maxDepth) maxDepth = depth
    }
    ClusterDepth(f.toLong, sumDepth.toDouble / f, maxDepth)
  }

  /** Files whose [min,max] span can intersect [lo, hi] on `statsCol` —
    * the candidate set a range probe must read. All-null and zero-row
    * files never match (a range predicate is null-rejecting). */
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
    // basePath keeps Hive partition columns visible when reading the
    // candidate files directly — without it a partitioned table's
    // statsCol could vanish from the read schema (it lives in the
    // directory names, not the file bytes)
    val base =
      if (files.isEmpty)
        spark.read.parquet(dataDir).filter(lit(false))
      else spark.read.option("basePath", dataDir).parquet(files: _*)
    base.filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the file-manifest data-skipping contract: (1) a range probe
  * through the manifest reads strictly fewer files than the table holds
  * when the layout clusters the stats column, (2) the pruned result is
  * row-identical to the full-scan filter (zero false negatives — the
  * property that makes skipping sound), (3) a probe outside the data's
  * range reads ZERO data files, and (4) all-null stats files are never
  * candidates for a range probe. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("manifest").toString
    val df = (1 to 10000).map(i => (i.toLong, i % 97, s"p$i")).toDF("k", "m", "payload")
    // range-clustered layout: 8 files with disjoint k spans — the shape
    // writeSortedBy produces, where file skipping has something to skip
    df.repartitionByRange(8, $"k").sortWithinPartitions($"k")
      .write.mode("overwrite").parquet(s"$d/data")
    Manifest.write(spark, s"$d/data", s"$d/manifest", Seq("k"))
    d
  }

  test("manifest rows = files; counts conserve") {
    val m = spark.read.parquet(s"$dir/manifest").collect()
    val nFiles = spark.read.parquet(s"$dir/data").inputFiles.length
    assert(m.length == nFiles, s"${m.length} manifest rows vs $nFiles files")
    assert(m.map(_.getAs[Long]("n_rows")).sum == 10000L)
  }

  test("pruned read: fewer files, identical rows") {
    val total = spark.read.parquet(s"$dir/data").inputFiles.length
    val pruned = Manifest.readRange(spark, s"$dir/data", s"$dir/manifest",
      "k", 2000L, 2500L)
    assert(pruned.inputFiles.length < total,
      s"no skipping: ${pruned.inputFiles.length} of $total files")
    val want = spark.read.parquet(s"$dir/data")
      .filter($"k" >= 2000L && $"k" <= 2500L)
      .select($"k").as[Long].collect().sorted.toSeq
    val got = pruned.select($"k").as[Long].collect().sorted.toSeq
    assert(got == want, s"pruned read lost rows: ${got.length} vs ${want.length}")
  }

  test("out-of-range probe reads zero data files") {
    val pruned = Manifest.readRange(spark, s"$dir/data", s"$dir/manifest",
      "k", 50000L, 60000L)
    assert(pruned.inputFiles.forall(_.contains("manifest")) ||
      pruned.inputFiles.isEmpty || pruned.count() == 0L)
    assert(Manifest.candidateFiles(spark, s"$dir/manifest", "k",
      50000L, 60000L).isEmpty)
  }

  test("refresh: new files join, deleted files drop, pruning stays sound") {
    val d = java.nio.file.Files.createTempDirectory("manifest_refresh").toString
    (1 to 4000).map(i => (i.toLong, s"p$i")).toDF("k", "p")
      .repartitionByRange(4, $"k").sortWithinPartitions($"k")
      .write.mode("overwrite").parquet(s"$d/data")
    Manifest.write(spark, s"$d/data", s"$d/manifest", Seq("k"))
    val before = spark.read.parquet(s"$d/data").inputFiles.length
    // APPEND two files of fresh key range
    (9000L to 9999L).map(i => (i, s"p$i")).toDF("k", "p")
      .repartitionByRange(2, $"k").sortWithinPartitions($"k")
      .write.mode("append").parquet(s"$d/data")
    val after = spark.read.parquet(s"$d/data").inputFiles.length
    val d1 = Manifest.refresh(spark, s"$d/data", s"$d/manifest", Seq("k"))
    assert(d1.added == after - before && d1.removed == 0 && d1.kept == before,
      s"$d1 vs before=$before after=$after")
    val m1 = spark.read.parquet(s"$d/manifest")
    assert(m1.count() == after && m1.agg(sum($"n_rows")).collect()(0).getLong(0) == 5000L)
    // pruned read over the appended range is complete and file-bounded
    val pruned = Manifest.readRange(spark, s"$d/data", s"$d/manifest", "k", 9000L, 9999L)
    assert(pruned.count() == 1000L)
    assert(pruned.inputFiles.length < after)
    // DELETE one original data file, refresh again
    val victim = new org.apache.hadoop.fs.Path(
      spark.read.parquet(s"$d/data").inputFiles.min)
    victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(victim, false)
    val d2 = Manifest.refresh(spark, s"$d/data", s"$d/manifest", Seq("k"))
    assert(d2.removed == 1 && d2.added == 0, s"$d2")
    val m2 = spark.read.parquet(s"$d/manifest").collect()
    assert(m2.length == after - 1)
    assert(m2.map(_.getAs[Long]("n_rows")).sum ==
      spark.read.parquet(s"$d/data").count())
  }

  test("in-place rewrite changes file identity (size/mtime) and is re-scanned") {
    val d = java.nio.file.Files.createTempDirectory("manifest_inplace").toString
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1L to 100L).map(i => (i, s"p$i")).toDF("k", "p")
      .repartitionByRange(2, $"k").write.mode("overwrite").parquet(s"$d/data")
    Manifest.write(spark, s"$d/data", s"$d/manifest", Seq("k"))
    // rewrite one file IN PLACE with a disjoint key range
    val victim = spark.read.parquet(s"$d/data").inputFiles.min
    (9000L to 9099L).map(i => (i, s"p$i")).toDF("k", "p")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/tmp")
    val src = Compaction.listFiles(spark, s"$d/tmp").head.path
    fs.delete(new org.apache.hadoop.fs.Path(victim), false)
    fs.rename(new org.apache.hadoop.fs.Path(src),
      new org.apache.hadoop.fs.Path(new java.net.URI(victim).getPath))
    val delta = Manifest.refresh(spark, s"$d/data", s"$d/manifest", Seq("k"))
    assert(delta.added == 1 && delta.removed == 1, s"$delta")
    // the stale row is gone: the 9000-range probe must FIND the file
    val got = Manifest.readRange(spark, s"$d/data", s"$d/manifest", "k", 9000L, 9099L)
      .count()
    assert(got == 100L, s"stale manifest pruned the rewritten file: $got rows")
  }

  test("zero-row files get explicit n_rows=0 rows; refresh is a stable no-op") {
    val d = java.nio.file.Files.createTempDirectory("manifest_zero").toString
    (1L to 100L).map(i => (i, s"p$i")).toDF("k", "p")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/data")
    // append a 0-row part file
    spark.read.parquet(s"$d/data").filter(lit(false))
      .coalesce(1).write.mode("append").parquet(s"$d/data")
    Manifest.write(spark, s"$d/data", s"$d/manifest", Seq("k"))
    val m = spark.read.parquet(s"$d/manifest").collect()
    assert(m.length == spark.read.parquet(s"$d/data").inputFiles.length)
    assert(m.exists(r => r.getAs[Long]("n_rows") == 0L),
      s"zero-row file missing from manifest: ${m.toSeq}")
    val delta = Manifest.refresh(spark, s"$d/data", s"$d/manifest", Seq("k"))
    assert(delta.added == 0 && delta.removed == 0, s"refresh not a no-op: $delta")
  }

  test("partitioned layout: recursion sees every file, partition cols carry min=max stats, " +
      "refresh-after-compaction is the maintenance loop") {
    val d = java.nio.file.Files.createTempDirectory("manifest_part").toString
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the engine's own canonical hourly layout: station_id=…/year=…
    // (sources/Sinks.writeHourlyObs), several files per partition
    val hourly = (0 until 4000).map { i =>
      (java.sql.Timestamp.valueOf(s"${2023 + (i / 2) % 2}-0${1 + i % 9}-15 0${i % 10}:00:00"),
        s"ST${i % 2}", 20.0 + i % 10, 0L)
    }.toDF("ts_utc", "station_id", "temp_c", "qc_flags").repartition(4)
    graft.sources.Sinks.writeHourlyObs(hourly, s"$d/data")
    Manifest.write(spark, s"$d/data", s"$d/manifest",
      Seq("ts_utc", "station_id", "year"))
    val m = spark.read.parquet(s"$d/manifest").collect()
    val nFiles = spark.read.parquet(s"$d/data").inputFiles.length
    assert(nFiles > 4, s"fixture should fan out to many files, got $nFiles")
    assert(m.length == nFiles, s"${m.length} manifest rows vs $nFiles files")
    assert(m.map(_.getAs[Long]("n_rows")).sum == 4000L)
    // partition columns are implicit per-file constants: min = max
    m.foreach { r =>
      assert(r.getAs[String]("min_station_id") == r.getAs[String]("max_station_id"))
      assert(r.getAs[Int]("min_year") == r.getAs[Int]("max_year"))
    }
    // a partition-column probe prunes to that partition's files only
    val st0 = Manifest.readRange(spark, s"$d/data", s"$d/manifest",
      "station_id", "ST0", "ST0")
    assert(st0.inputFiles.forall(_.contains("station_id=ST0")))
    val st0Rows = st0.count() // materialized NOW — the files move below
    assert(st0Rows ==
      spark.read.parquet(s"$d/data").filter($"station_id" === "ST0").count())
    // compact within partitions, swap in, refresh — the documented loop
    val files = Compaction.listFiles(spark, s"$d/data")
    assert(files.forall(_.subdir.matches("station_id=ST[01]/year=202[34]")),
      s"unexpected subdirs: ${files.map(_.subdir).distinct.toSeq}")
    val groups = Compaction.plan(spark, s"$d/data", 1L << 30)
    assert(groups.forall(g => g.files.forall(_.subdir == g.subdir)),
      "a group spanned partitions")
    val multi = groups.filter(_.files.length > 1)
    assert(multi.nonEmpty, "fixture should produce mergeable groups")
    Compaction.compact(spark, multi, s"$d/cout")
    multi.foreach { g =>
      g.files.foreach(f =>
        fs.delete(new org.apache.hadoop.fs.Path(f.path), false))
      val part = Compaction.listFiles(spark, s"$d/cout/${g.outSubPath}").head
      fs.rename(new org.apache.hadoop.fs.Path(part.path),
        new org.apache.hadoop.fs.Path(s"$d/data/${g.subdir}/g${g.id}.parquet"))
    }
    val delta = Manifest.refresh(spark, s"$d/data", s"$d/manifest",
      Seq("ts_utc", "station_id", "year"))
    assert(delta.added == multi.length &&
      delta.removed == multi.map(_.files.length).sum, s"$delta")
    val m2 = spark.read.parquet(s"$d/manifest").collect()
    assert(m2.map(_.getAs[Long]("n_rows")).sum == 4000L,
      "rows lost across compaction + refresh")
    // probes stay sound over the compacted layout
    val st0b = Manifest.readRange(spark, s"$d/data", s"$d/manifest",
      "station_id", "ST0", "ST0")
    assert(st0b.count() == st0Rows)
  }

  test("clustering depth: ~1 on disjoint spans, |files| on full-overlap, nulls excluded") {
    val d = java.nio.file.Files.createTempDirectory("manifest_depth").toString
    // range-clustered: 8 disjoint k spans → every point probe hits 1 file
    (1 to 8000).map(i => (i.toLong, s"p$i")).toDF("k", "p")
      .repartitionByRange(8, $"k").sortWithinPartitions($"k")
      .write.mode("overwrite").parquet(s"$d/sorted")
    Manifest.write(spark, s"$d/sorted", s"$d/ms", Seq("k"))
    val sortedDepth = Manifest.clusteringDepth(spark, s"$d/ms", "k")
    assert(sortedDepth.nFiles == 8 && sortedDepth.maxDepth == 1L
      && sortedDepth.avgDepth == 1.0, s"$sortedDepth")
    // round-robin: every file spans ~the whole domain → depth ≈ files
    (1 to 8000).map(i => (i.toLong, s"p$i")).toDF("k", "p")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$d/random")
    Manifest.write(spark, s"$d/random", s"$d/mr", Seq("k"))
    val randomDepth = Manifest.clusteringDepth(spark, s"$d/mr", "k")
    assert(randomDepth.avgDepth >= 7.0 && randomDepth.maxDepth == 8L,
      s"$randomDepth")
    // hand case: spans [1,10] [5,20] [15,30] → overlap counts 2, 3, 2
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("file", StringType), StructField("n_bytes", LongType),
      StructField("mtime", LongType), StructField("n_rows", LongType),
      StructField("min_k", LongType), StructField("max_k", LongType)))
    val hand = Seq(Row("f1", 1L, 1L, 1L, 1L, 10L), Row("f2", 1L, 1L, 1L, 5L, 20L),
      Row("f3", 1L, 1L, 1L, 15L, 30L),
      Row("f4", 1L, 1L, 0L, null, null)) // all-null stats: excluded
    spark.createDataFrame(spark.sparkContext.parallelize(hand), sch)
      .write.mode("overwrite").parquet(s"$d/mh")
    val h = Manifest.clusteringDepth(spark, s"$d/mh", "k")
    assert(h.nFiles == 3 && h.maxDepth == 3L
      && math.abs(h.avgDepth - 7.0 / 3) < 1e-12, s"$h")
  }

  test("all-null stats files are never range candidates") {
    val d = java.nio.file.Files.createTempDirectory("manifest_null").toString
    val withNull = Seq((Some(1L), "a"), (Some(2L), "b")).toDF("k", "p")
      .union(Seq((Option.empty[Long], "c"), (Option.empty[Long], "d")).toDF("k", "p"))
    withNull.repartitionByRange(2, $"k").write.mode("overwrite").parquet(s"$d/data")
    Manifest.write(spark, s"$d/data", s"$d/manifest", Seq("k"))
    val cands = Manifest.candidateFiles(spark, s"$d/manifest", "k", 0L, 10L)
    val rows = Manifest.readRange(spark, s"$d/data", s"$d/manifest", "k", 0L, 10L)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 2L), s"got $rows via ${cands.length} candidate files")
  }
}

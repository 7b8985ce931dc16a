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

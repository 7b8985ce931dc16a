package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the compaction contract: the FFD plan is deterministic and
  * respects the size target (singleton oversize excepted), the
  * classical bound sanity (no two groups could merge and still fit),
  * and the execute phase preserves every row while collapsing each
  * multi-file group to one file and leaving already-compact files
  * untouched. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("compact").toString
    // 16 small files of varying sizes + payload ballast for size spread
    (0 until 16).foreach { i =>
      (0 until (i + 1) * 50).map(j => (i.toLong * 100000 + j, "x" * 100))
        .toDF("id", "pad")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/raw/f$i")
    }
    // flatten into one directory of data files
    val flat = s"$d/data"
    val fs = new org.apache.hadoop.fs.Path(flat)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(flat))
    (0 until 16).foreach { i =>
      val src = Compaction.listFiles(spark, s"$d/raw/f$i").head
      fs.rename(new org.apache.hadoop.fs.Path(src.path),
        new org.apache.hadoop.fs.Path(s"$flat/part-$i.parquet"))
    }
    d
  }

  test("FFD plan: deterministic, target respected, no two groups mergeable") {
    val files = Compaction.listFiles(spark, s"$dir/data")
    assert(files.length == 16)
    val target = files.map(_.bytes).max * 3
    val plan1 = Compaction.plan(spark, s"$dir/data", target)
    val plan2 = Compaction.plan(spark, s"$dir/data", target)
    assert(plan1 == plan2)
    assert(plan1.map(_.files.length).sum == 16)
    plan1.filter(_.files.length > 1).foreach(g =>
      assert(g.bytes <= target, s"group ${g.id} over target"))
    // bound sanity: FFD never leaves two groups that would fit together
    // (a witness that packing actually happened)
    val sizes = plan1.map(_.bytes).sorted
    if (sizes.length >= 2)
      assert(sizes.take(2).sum > target || plan1.length == 1,
        s"two smallest groups ${sizes.take(2)} both fit in $target")
  }

  test("compact: rows preserved, multi-file groups become one file, singletons kept") {
    val files = Compaction.listFiles(spark, s"$dir/data")
    val target = files.map(_.bytes).max * 3
    val groups = Compaction.plan(spark, s"$dir/data", target)
    val before = spark.read.parquet(s"$dir/data").count()
    val rep = Compaction.compact(spark, groups, s"$dir/out")
    assert(rep.filesRewritten + rep.filesKept == 16)
    val multi = groups.filter(_.files.length > 1)
    assert(rep.groupsRewritten == multi.length)
    // every rewritten group is exactly one data file with all its rows
    multi.foreach { g =>
      val out = spark.read.parquet(s"$dir/out/g${g.id}")
      assert(out.inputFiles.length == 1, s"group ${g.id} not one file")
      val want = spark.read.parquet(g.files.map(_.path): _*).count()
      assert(out.count() == want)
    }
    // total rows conserve across rewritten + kept
    val keptRows = groups.filter(_.files.length <= 1)
      .flatMap(_.files).map(f => spark.read.parquet(f.path).count()).sum
    val rewrittenRows = multi
      .map(g => spark.read.parquet(s"$dir/out/g${g.id}").count()).sum
    assert(keptRows + rewrittenRows == before)
  }

  test("oversize file stays a singleton group") {
    val files = Compaction.listFiles(spark, s"$dir/data")
    val target = files.map(_.bytes).min // everything oversize
    val groups = Compaction.plan(spark, s"$dir/data", target)
    assert(groups.forall(_.files.length == 1) && groups.length == 16)
  }

  test("zero-byte file never joins an oversize singleton's closed bin") {
    val d = java.nio.file.Files.createTempDirectory("compact_zero").toString
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$d/data"))
    // one oversize data file + one zero-byte file
    (1L to 5000L).map(i => (i, "x" * 100)).toDF("id", "pad")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/big")
    val big = Compaction.listFiles(spark, s"$d/big").head
    fs.rename(new org.apache.hadoop.fs.Path(big.path),
      new org.apache.hadoop.fs.Path(s"$d/data/big.parquet"))
    fs.create(new org.apache.hadoop.fs.Path(s"$d/data/empty.parquet")).close()
    val groups = Compaction.plan(spark, s"$d/data", big.bytes / 2)
    // the oversize file's bin is CLOSED: the zero-byte file must open
    // its own bin, never ride along and force a full rewrite of the
    // already-huge file
    val bigGroup = groups.find(_.files.exists(_.bytes > 0)).get
    assert(bigGroup.files.length == 1,
      s"zero-byte file joined the oversize bin: $bigGroup")
    assert(groups.map(_.files.length).sum == 2)
  }

  test("partitioned table: groups never span partitions, rewrite preserves the subpath") {
    val d = java.nio.file.Files.createTempDirectory("compact_part").toString
    // 2×2 hive partitions, multiple small files each
    (0 until 2000).map(i => (i.toLong, s"k${i % 2}", (i / 2) % 2, "x" * 50))
      .toDF("id", "part_a", "part_b", "pad")
      .repartition(4)
      .write.mode("overwrite").partitionBy("part_a", "part_b")
      .parquet(s"$d/data")
    val files = Compaction.listFiles(spark, s"$d/data")
    assert(files.nonEmpty && files.forall(_.subdir.matches("part_a=k[01]/part_b=[01]")),
      s"subdirs: ${files.map(_.subdir).distinct.toSeq}")
    val groups = Compaction.plan(spark, s"$d/data", 1L << 30)
    assert(groups.forall(g => g.files.forall(_.subdir == g.subdir)))
    assert(groups.map(_.subdir).distinct.size == 4,
      "each partition packs independently")
    val multi = groups.filter(_.files.length > 1)
    assert(multi.nonEmpty)
    val rep = Compaction.compact(spark, multi, s"$d/out")
    assert(rep.groupsRewritten == multi.length)
    multi.foreach { g =>
      val out = spark.read.parquet(s"$d/out/${g.outSubPath}")
      assert(out.inputFiles.length == 1)
      assert(out.count() == spark.read.parquet(g.files.map(_.path): _*).count())
      assert(g.outSubPath.startsWith(g.subdir + "/"))
    }
    // plan determinism across invocations holds for the partitioned walk
    assert(Compaction.plan(spark, s"$d/data", 1L << 30) == groups)
  }
}

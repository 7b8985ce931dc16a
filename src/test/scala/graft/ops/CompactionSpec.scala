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
}

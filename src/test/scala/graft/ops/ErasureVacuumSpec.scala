package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the targeted-erasure contract: the plan opens only files whose
  * manifest key span can contain a tombstone, untouched files stay
  * BYTE-IDENTICAL (path, size, mtime), erased keys vanish while every
  * other row survives, a fully-tombstoned file is removed outright,
  * and Manifest.refresh afterwards re-scans exactly the rewritten
  * files. Vacuum: orphan bytes (unreferenced files, abandoned staging
  * dirs) are found and deleted under the age gate, referenced data is
  * never touched.
  */
class ErasureVacuumSpec extends SparkSpec {
  import spark.implicits._

  /** A fresh key-clustered table: 8 range-disjoint files over id
    * 0..799 (file i holds ids [100i, 100i+99]), plus its manifest. */
  private def mkTable(tag: String): (String, String) = {
    val d = java.nio.file.Files.createTempDirectory(tag).toString
    val data = s"$d/data"
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(data))
    (0 until 8).foreach { i =>
      (0 until 100).map(j => (i * 100L + j, s"payload_${i}_$j"))
        .toDF("id", "payload")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/raw$i")
      val part = Compaction.listFiles(spark, s"$d/raw$i").head
      fs.rename(new org.apache.hadoop.fs.Path(part.path),
        new org.apache.hadoop.fs.Path(s"$data/part-$i.parquet"))
    }
    Manifest.write(spark, data, s"$d/manifest", Seq("id"))
    (data, s"$d/manifest")
  }

  private def fileIds(data: String): Map[String, (Long, Long)] =
    Compaction.listFiles(spark, data).map { f =>
      val st = new org.apache.hadoop.fs.Path(f.path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(new org.apache.hadoop.fs.Path(f.path))
      f.path -> (st.getLen, st.getModificationTime)
    }.toMap

  test("erasure: plan prunes to span-matching files; erase keeps the rest byte-identical") {
    val (data, man) = mkTable("erase1")
    // keys live in files 1 and 6 only
    val keys = Seq(130L, 145L, 630L)
    val p = Erasure.plan(spark, man, "id", keys)
    assert(p.rewrite.length == 2, s"expected 2 candidate files, got ${p.rewrite}")
    assert(p.untouched.length == 6)
    assert(p.rewrite.forall(f => f.contains("part-1") || f.contains("part-6")))

    val before = fileIds(data)
    val totalBefore = spark.read.parquet(data).count()
    val rep = Erasure.erase(spark, p)
    assert(rep.filesRewritten == 2 && rep.filesRemoved == 0 && rep.filesUntouched == 6)
    assert(rep.rowsDeleted == 3L)

    val after = fileIds(data)
    p.untouched.foreach { f =>
      assert(after(f) == before(f), s"untouched file changed identity: $f")
    }
    val remaining = spark.read.parquet(data)
    assert(remaining.count() == totalBefore - 3)
    assert(remaining.filter(col("id").isin(keys: _*)).count() == 0, "keys survived")
    // every non-tombstoned row survived with payload intact
    assert(remaining.filter(col("id").isin(131L, 629L, 0L, 799L)).count() == 4)

    // refresh re-scans exactly the rewritten files
    val delta = Manifest.refresh(spark, data, man, Seq("id"))
    assert(delta.added == 2 && delta.removed == 2 && delta.kept == 6, s"$delta")
    // and the refreshed manifest routes a probe past the erased keys
    assert(Manifest.readRange(spark, data, man, "id", 130L, 130L).count() == 0)
  }

  test("erasure: fully-tombstoned file is removed; span-only candidates stay byte-identical") {
    val (data, man) = mkTable("erase2")
    // all of file 3, plus a span probe into file 5 that matches no row
    // (key 5000 is outside every span -> no candidate; key 550 exists)
    val keys = (300L until 400L) :+ 550L
    val p = Erasure.plan(spark, man, "id", keys)
    assert(p.rewrite.length == 2)
    val rep = Erasure.erase(spark, p)
    assert(rep.filesRemoved == 1, s"file 3 should be deleted: $rep")
    assert(rep.filesRewritten == 1)
    assert(rep.rowsDeleted == 101L)
    val remaining = spark.read.parquet(data)
    assert(remaining.count() == 800L - 101L)
    assert(remaining.filter(col("id") >= 300 && col("id") < 400).count() == 0)
    // refresh (the documented post-erase step), then a batch whose keys
    // miss every span plans zero rewrites over the 7 surviving files
    Manifest.refresh(spark, data, man, Seq("id"))
    val p2 = Erasure.plan(spark, man, "id", Seq(5000L))
    assert(p2.rewrite.isEmpty && p2.untouched.length == 7)
    val rep2 = Erasure.erase(spark, p2)
    assert(rep2.filesRewritten == 0 && rep2.rowsDeleted == 0L)
  }

  test("vacuum: orphans found and deleted under the age gate; referenced files kept") {
    val (data, man) = mkTable("vac1")
    val fs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plant garbage: an unreferenced data file + an abandoned staging dir
    Seq((9999L, "junk")).toDF("id", "payload")
      .coalesce(1).write.mode("overwrite").parquet(s"$data/.erase_tmp_part-9")
    Seq((8888L, "stray")).toDF("id", "payload")
      .coalesce(1).write.mode("overwrite").parquet(s"$data/straydir")
    val orphans = Vacuum.findOrphans(spark, data, man)
    assert(orphans.nonEmpty)
    assert(orphans.forall(o =>
      o._1.contains(".erase_tmp_") || o._1.contains("straydir")),
      s"referenced file flagged as orphan: $orphans")

    // young files survive a 24h gate...
    val repYoung = Vacuum.vacuum(spark, data, man)
    assert(repYoung.deleted == 0 && repYoung.keptYoung == orphans.length)
    // ...and fall to a zero-age gate
    val rep = Vacuum.vacuum(spark, data, man, minAgeMs = 0L)
    assert(rep.deleted == orphans.length && rep.bytesFreed > 0L)
    assert(Vacuum.findOrphans(spark, data, man).isEmpty)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$data/.erase_tmp_part-9")))
    // the table itself is intact
    assert(spark.read.parquet(data).count() == 800L)
  }
}

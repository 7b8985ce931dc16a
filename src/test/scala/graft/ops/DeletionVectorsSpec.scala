package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the row-level-delete merge-on-read contract: (1) the read path
  * with no delete table is the identity; (2) delete-by-predicate then
  * read equals a content filter (positions encode exactly the predicate
  * snapshot, nothing else); (3) generations stack (NOT p1 AND NOT p2);
  * (4) membership semantics — re-recording the same predicate changes
  * nothing; (5) the anti-join broadcasts the delete side (the data side
  * pays no shuffle); (6) pruning after a rewrite drops exactly the
  * dangling vectors and keeps reads correct; (7) deletes commit as
  * generation dirs with no staging residue; (8) equality (keyed)
  * deletes stack and compose with position deletes; (9) compaction
  * with a deleteDir ABSORBS the positions — the compacted layout reads
  * identically to the pre-compaction merge-on-read, and prune then
  * empties the vector table. */
class DeletionVectorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("dv").toString
    val df = (1 to 5000)
      .map(i => (i.toLong, i % 89, s"payload$i")).toDF("k", "m", "payload")
    df.repartitionByRange(4, $"k").sortWithinPartitions($"k")
      .write.mode("overwrite").parquet(s"$d/data")
    d
  }

  test("no delete table: identity read") {
    val got = DeletionVectors.read(spark, s"$dir/data", s"$dir/nodeletes")
    assert(got.count() == 5000L)
    assert(got.columns.toSet == Set("k", "m", "payload"))
  }

  test("delete-by-predicate equals content filter; generations stack; idempotent") {
    val d2 = java.nio.file.Files.createTempDirectory("dv2").toString
    spark.read.parquet(s"$dir/data").write.parquet(s"$d2/data")
    val del = s"$d2/deletes"
    val n1 = DeletionVectors.addDeletes(spark, s"$d2/data", del, $"m" === 7)
    assert(n1 > 0)
    val keys1 = DeletionVectors.read(spark, s"$d2/data", del)
      .select($"k").as[Long].collect().sorted
    val want1 = (1 to 5000).map(_.toLong).filterNot(_ % 89 == 7)
    assert(keys1.toSeq == want1)

    // second generation stacks
    DeletionVectors.addDeletes(spark, s"$d2/data", del, $"k" <= 100)
    val keys2 = DeletionVectors.read(spark, s"$d2/data", del)
      .select($"k").as[Long].collect().sorted
    val want2 = want1.filter(_ > 100)
    assert(keys2.toSeq == want2)

    // membership, not multiplicity: re-adding the first predicate is a no-op
    DeletionVectors.addDeletes(spark, s"$d2/data", del, $"m" === 7)
    val keys3 = DeletionVectors.read(spark, s"$d2/data", del)
      .select($"k").as[Long].collect().sorted
    assert(keys3.toSeq == want2)
  }

  test("read plan broadcasts the delete side (no data-side shuffle for the anti join)") {
    val d3 = java.nio.file.Files.createTempDirectory("dv3").toString
    spark.read.parquet(s"$dir/data").write.parquet(s"$d3/data")
    DeletionVectors.addDeletes(spark, s"$d3/data", s"$d3/deletes", $"m" === 3)
    val plan = DeletionVectors.read(spark, s"$d3/data", s"$d3/deletes")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join, got:\n$plan")
  }

  test("pruneDanglingDeletes drops vectors of vanished files, keeps live ones") {
    val d4 = java.nio.file.Files.createTempDirectory("dv4").toString
    // two separate data files written as separate commits so we can
    // delete one file from disk to simulate a compaction rewrite
    (1L to 100L).toDF("k").coalesce(1).write.parquet(s"$d4/data")
    (101L to 200L).toDF("k").coalesce(1).write.mode("append").parquet(s"$d4/data")
    DeletionVectors.addDeletes(spark, s"$d4/data", s"$d4/deletes", $"k" % 10 === 0)
    val before = spark.read.parquet(s"$d4/deletes").count()
    assert(before == 20L)
    // remove one data file (as compaction absorbing it would)
    val files = new java.io.File(s"$d4/data").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    val victim = files.head
    val victimRows = spark.read.parquet(victim.getPath)
      .filter($"k" % 10 === 0).count()
    assert(victim.delete())
    val rep = DeletionVectors.pruneDanglingDeletes(spark, s"$d4/data", s"$d4/deletes")
    assert(rep.dropped == victimRows, s"dropped ${rep.dropped} want $victimRows")
    assert(rep.kept == 20L - victimRows)
    // surviving reads still honor the kept vectors
    val got = DeletionVectors.read(spark, s"$d4/data", s"$d4/deletes")
      .select($"k").as[Long].collect().toSet
    assert(!got.exists(k => k % 10 == 0 && k > 100))
  }

  test("deletes commit as generation dirs; no staging residue") {
    val d5 = java.nio.file.Files.createTempDirectory("dv5").toString
    spark.read.parquet(s"$dir/data").write.parquet(s"$d5/data")
    DeletionVectors.addDeletes(spark, s"$d5/data", s"$d5/deletes", $"m" === 1)
    DeletionVectors.addDeletes(spark, s"$d5/data", s"$d5/deletes", $"m" === 2)
    // a predicate matching nothing commits NO generation
    val n0 = DeletionVectors.addDeletes(spark, s"$d5/data", s"$d5/deletes", $"m" === 500)
    assert(n0 == 0L)
    val entries = new java.io.File(s"$d5/deletes").listFiles().map(_.getName).sorted
    assert(entries.toSeq == Seq("gen=0", "gen=1"), entries.mkString(","))
  }

  test("equality deletes: keyed anti-join, stacking, composition with positions") {
    val d6 = java.nio.file.Files.createTempDirectory("dv6").toString
    spark.read.parquet(s"$dir/data").write.parquet(s"$d6/data")
    // a CDC deleter knows keys, not positions: tombstone two key batches
    val n1 = DeletionVectors.addKeyDeletes(spark, s"$d6/eqdel",
      Seq(1L, 2L, 3L).toDF("k"))
    assert(n1 == 3L)
    DeletionVectors.addKeyDeletes(spark, s"$d6/eqdel", Seq(3L, 10L).toDF("k"))
    val got = DeletionVectors.readWithKeyDeletes(spark, s"$d6/data", s"$d6/eqdel")
      .select($"k").as[Long].collect().sorted
    assert(got.toSeq == (1 to 5000).map(_.toLong).filterNot(Set(1L, 2L, 3L, 10L)))
    // plan: the keyed anti-join broadcasts the delete side too
    val plan = DeletionVectors.readWithKeyDeletes(spark, s"$d6/data", s"$d6/eqdel")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join, got:\n$plan")
    // composition: position deletes (predicate scan) + equality deletes
    DeletionVectors.addDeletes(spark, s"$d6/data", s"$d6/posdel", $"m" === 7)
    val merged = DeletionVectors.readMerged(
        spark, s"$d6/data", s"$d6/posdel", s"$d6/eqdel")
      .select($"k").as[Long].collect().sorted
    val want = (1 to 5000).map(_.toLong)
      .filterNot(Set(1L, 2L, 3L, 10L)).filterNot(_ % 89 == 7)
    assert(merged.toSeq == want)
  }

  test("compaction absorbs position deletes; prune then empties the vectors") {
    val d7 = java.nio.file.Files.createTempDirectory("dv7").toString
    // many small files — the compaction-worthy shape
    val df = (1 to 5000).map(i => (i.toLong, i % 89)).toDF("k", "m")
    df.repartition(8).write.parquet(s"$d7/data")
    DeletionVectors.addDeletes(spark, s"$d7/data", s"$d7/deletes", $"m" % 3 === 0)
    val before = DeletionVectors.read(spark, s"$d7/data", s"$d7/deletes")
      .select($"k").as[Long].collect().sorted
    // compact WITH absorption, then swap the layout in (the caller's
    // atomic-swap step, spelled as delete-originals + keep-outputs)
    val groups = Compaction.plan(spark, s"$d7/data", 1L << 30)
    val rep = Compaction.compact(spark, groups, s"$d7/out",
      deleteDir = Some(s"$d7/deletes"))
    assert(rep.groupsRewritten == 1)
    val fs = new org.apache.hadoop.fs.Path(d7)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    groups.filter(_.files.length > 1).flatMap(_.files).foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(f.path), false)
    }
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$d7/out/g0"))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .foreach { s =>
        fs.rename(s.getPath,
          new org.apache.hadoop.fs.Path(s"$d7/data/${s.getPath.getName}"))
      }
    // the swapped layout must read EXACTLY like the pre-compaction
    // merge-on-read — absorption rewrote the files clean, so the old
    // positions (now dangling) must not matter...
    val after = DeletionVectors.read(spark, s"$d7/data", s"$d7/deletes")
      .select($"k").as[Long].collect().sorted
    assert(after.toSeq == before.toSeq)
    // ...and prune drops every vector (all source files were absorbed)
    val prep = DeletionVectors.pruneDanglingDeletes(
      spark, s"$d7/data", s"$d7/deletes")
    assert(prep.kept == 0L && prep.dropped > 0L, prep.toString)
    val finalRead = DeletionVectors.read(spark, s"$d7/data", s"$d7/deletes")
      .select($"k").as[Long].collect().sorted
    assert(finalRead.toSeq == before.toSeq)
  }

  test("compaction absorbs equality deletes; full rewrite lets the eq table drop") {
    val d8 = java.nio.file.Files.createTempDirectory("dv8").toString
    (1 to 5000).map(i => (i.toLong, i % 89)).toDF("k", "m")
      .repartition(8).write.parquet(s"$d8/data")
    DeletionVectors.addKeyDeletes(spark, s"$d8/eqdel",
      (1 to 50).map(_.toLong * 97).toDF("k"))
    val before = DeletionVectors
      .readWithKeyDeletes(spark, s"$d8/data", s"$d8/eqdel")
      .select($"k").as[Long].collect().sorted
    val groups = Compaction.plan(spark, s"$d8/data", 1L << 30)
    Compaction.compact(spark, groups, s"$d8/out",
      eqDeleteDir = Some(s"$d8/eqdel"))
    val fs = new org.apache.hadoop.fs.Path(d8)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    groups.flatMap(_.files).foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(f.path), false)
    }
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$d8/out/g0"))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .foreach { s =>
        fs.rename(s.getPath,
          new org.apache.hadoop.fs.Path(s"$d8/data/${s.getPath.getName}"))
      }
    // every file was rewritten since the tombstones landed, so the
    // PLAIN read already equals the merge-on-read — the condition under
    // which the eq table may be dropped
    val plainAfter = spark.read.parquet(s"$d8/data")
      .select($"k").as[Long].collect().sorted
    assert(plainAfter.toSeq == before.toSeq)
    fs.delete(new org.apache.hadoop.fs.Path(s"$d8/eqdel"), true)
    val dropped = DeletionVectors
      .readWithKeyDeletes(spark, s"$d8/data", s"$d8/eqdel")
      .select($"k").as[Long].collect().sorted
    assert(dropped.toSeq == before.toSeq)
  }
}

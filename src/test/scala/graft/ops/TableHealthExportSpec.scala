package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Pins the partition-health audit (flags derive from the planted
  * layout, metadata only) and the shard-export contract (budget bounds,
  * coverage, non-overlapping ordered spans, deterministic re-plan). */
class TableHealthExportSpec extends SparkSpec {
  import spark.implicits._

  test("TableHealth.audit: small-file partition flagged, compact partition clean") {
    val d = java.nio.file.Files.createTempDirectory("health").toString
    // partition a: 8 tiny files; partition b: 1 file
    (0 until 8).foreach { i =>
      Seq((i.toLong, "x")).toDF("id", "p")
        .coalesce(1).write.mode("append").parquet(s"$d/data/part=a")
    }
    (0 until 500).map(j => (j.toLong, "y" * 50)).toDF("id", "p")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/data/part=b")
    val rows = TableHealth.audit(spark, s"$d/data", targetBytes = 1L << 20)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("part=a"); val b = rows("part=b")
    assert(a.getLong(1) == 8L && a.getBoolean(7), "8 tiny files must flag")
    assert(b.getLong(1) == 1L && !b.getBoolean(7), "single file must not flag")
    assert(a.getDouble(5) == 1.0, "all of a's files are small")
    assert(b.getDouble(6) == 1.0, "single file has skew exactly 1")
  }

  test("ExportShards: budget bounds, exact coverage, ordered disjoint spans, deterministic") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text", $"source")
    val budget = 2000L
    val d = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = ExportShards.export(docs, d, budget).collect()
    assert(manifest.nonEmpty)
    assert(manifest.map(_.getLong(1)).sum == docs.count(), "every doc lands in a shard")
    // shards are contiguous from 0
    val ids = manifest.map(_.getLong(0))
    assert(ids.toSeq == (0L until ids.length).toSeq)
    // spans are ordered and disjoint (assignment is monotone in doc_id)
    val spans = manifest.map(r => (r.getLong(3), r.getLong(4)))
    spans.sliding(2).foreach {
      case Array((_, lastA), (firstB, _)) => assert(lastA < firstB)
      case _ =>
    }
    // token bounds: a doc is never split, so shard k (except the last)
    // ends within one max-doc of the boundary
    val maxDoc = docs.select(size(split($"text", " ")).cast("long")).as[Long]
      .collect().max
    manifest.dropRight(1).foreach { r =>
      val t = r.getLong(2)
      assert(t >= budget - maxDoc && t <= budget + maxDoc,
        s"shard ${r.getLong(0)} tokens $t outside [${budget - maxDoc}, ${budget + maxDoc}]")
    }
    // deterministic re-plan
    val p1 = ExportShards.plan(docs, budget)
      .select($"doc_id", $"shard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = ExportShards.plan(docs, budget)
      .select($"doc_id", $"shard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == p2)
    // the written layout is readable by shard with partition pruning
    val s0 = spark.read.parquet(s"$d/data").filter($"shard" === 0)
    assert(s0.count() == manifest.head.getLong(1))
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming drift-admission monitor: per-batch PSI vs a reference
  * profile, one idempotent partition per batch. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("in-distribution batch passes, shifted batch is flagged; replay is idempotent") {
    val srcDir = tmp("drift_src")
    val monitorDir = tmp("drift_mon")
    val ckpt = tmp("drift_ckpt")

    // reference profile: uniform values in [0, 100) for segment "s"
    val refRows = (0 until 1000).map(i => ("s", (i % 100).toDouble))
    val ref = graft.ops.Profile.cells(
      refRows.toDF("seg", "v"), "seg", "v", bins = 10, lo = 0.0, width = 10.0)

    // batch 0: same distribution; batch 1: collapsed onto [0, 10)
    (0 until 500).map(i => ("s", (i % 100).toDouble)).toDF("seg", "v")
      .repartition(1).write.parquet(s"$srcDir/f0")
    (0 until 500).map(i => ("s", (i % 10).toDouble)).toDF("seg", "v")
      .repartition(1).write.parquet(s"$srcDir/f1")

    val docs = spark.readStream
      .schema("seg STRING, v DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/*")
    val q = Streams.driftMonitorStream(docs, ref, monitorDir, ckpt,
      segCol = "seg", valCol = "v", bins = 10, lo = 0.0, width = 10.0, threshold = 0.2)
    q.awaitTermination()

    val mon = spark.read.parquet(monitorDir)
      .select($"batch_id", $"seg", $"n_cur", $"psi", $"drifted")
      .orderBy($"batch_id").collect()
    assert(mon.length === 2)
    val psis = mon.map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    // file order into batches is nondeterministic; classify by value
    val (low, high) = (psis.values.map(_._1).min, psis.values.map(_._1).max)
    assert(low < 0.05, s"in-distribution batch should score ~0, got $low")
    assert(high > 0.5, s"collapsed batch should score large, got $high")
    assert(psis.values.count(_._2) === 1)
    assert(mon.forall(_.getLong(2) === 500L))

    // crash replay: re-applying a batch id rewrites only its own
    // partition — same monitor content after
    val before = spark.read.parquet(monitorDir).orderBy($"batch_id").collect().toSeq
    val replayed = spark.read.parquet(s"$srcDir/f0").toDF("seg", "v")
    Streams.applyDriftBatch(replayed, ref, monitorDir, batchId = 0L,
      segCol = "seg", valCol = "v", bins = 10, lo = 0.0, width = 10.0, threshold = 0.2)
    val after = spark.read.parquet(monitorDir).orderBy($"batch_id").collect().toSeq
    assert(after.map(_.getLong(0)).sorted === before.map(_.getLong(0)).sorted)
    assert(after.length === before.length)
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning over the Hive-style day-partitioned fact
  * layout: a star join whose dim-side filter is only known at runtime
  * must prune the fact's partition directories from the BROADCASTED dim
  * keys — planning-time pruning cannot help (the fact query has no
  * literal day predicate). This is the mechanism that makes
  * "join January's 2 flagged days against a year of partitions" read 2
  * directories instead of 365 at 100 TB. Pinned two ways: the physical
  * plan carries a dynamicpruning partition filter, and the fact rows
  * actually decoded drop to the selected days' share (with a DPP-off
  * negative control decoding the full table). */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  private def decodedRows(work: => Unit): Long = {
    val sc = spark.sparkContext
    val rows = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        rows.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    sc.addSparkListener(listener)
    try { work; org.apache.spark.graft.ListenerBridge.waitUntilEmpty(sc) }
    finally sc.removeSparkListener(listener)
    rows.get()
  }

  test("star join prunes fact partitions from the runtime dim filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    // fact: 30 days × ~3.3k rows, one directory per day
    val fact = spark.range(100000).select(
      (col("id") % 30).cast("int").as("day_no"),
      col("id").as("event_id"),
      (col("id") % 97).cast("double").as("value"))
    fact.write.partitionBy("day_no").parquet(s"$dir/fact")
    // dim: the runtime-only selection — 2 of 30 days flagged
    (0 until 30).map(d => (d, if (d == 7 || d == 19) 1 else 0))
      .toDF("day_no", "flagged").write.parquet(s"$dir/dim")

    def query() = spark.read.parquet(s"$dir/fact")
      .join(spark.read.parquet(s"$dir/dim").filter($"flagged" === 1), "day_no")
      .agg(sum($"value").as("total"), count(lit(1)).as("n"))

    val row = query().collect()(0)
    assert(row.getAs[Long]("n") == 100000L * 2 / 30 + (if (7 < 100000 % 30) 1 else 0) +
      (if (19 < 100000 % 30) 1 else 0))

    val plan = query().queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$plan")

    val withDpp = decodedRows { query().collect() }
    val dppKey = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val prev = spark.conf.get(dppKey)
    val withoutDpp =
      try { spark.conf.set(dppKey, "false"); decodedRows { query().collect() } }
      finally spark.conf.set(dppKey, prev)
    // DPP-on reads ~2/30 of the fact (plus the 30-row dim, twice for the
    // broadcast + reuse); DPP-off decodes the whole fact
    assert(withoutDpp >= 100000, s"control should decode the full fact, got $withoutDpp")
    assert(withDpp < withoutDpp / 5,
      s"DPP decoded $withDpp rows vs $withoutDpp without pruning")
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sinks.writeWithBloom: a point lookup on a high-cardinality key must
  * decode far fewer rows from a bloom-filtered layout than from the
  * same layout without filters. Measured in recordsRead (rows the
  * parquet reader emits) — the quantity row-group skipping changes, and
  * the one that stays observable on a local fs where positioned reads
  * bypass the bytesRead statistics. Dictionary encoding is disabled for
  * BOTH layouts: the bloom's regime is precisely "the dictionary does
  * not fit" (a dictionary page answers point-absence for free), so the
  * A/B isolates the filter's contribution. */
class BloomSinkSpec extends SparkSpec {

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

  test("point lookup decodes O(row-group) rows with blooms, O(table) without") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val prevDict = hc.get("parquet.enable.dictionary")
    // ~200k rows, 32-char uuid-ish keys, 128 KB row groups → many groups
    // per file; every group's [min,max] spans the whole key space, so
    // min/max stats prune nothing and the bloom is the only skip signal
    val rows = spark.range(200000).select(
      md5(col("id").cast("string")).as("key"),
      col("id").as("payload"))
    try {
      hc.setInt("parquet.block.size", 128 * 1024)
      hc.set("parquet.enable.dictionary", "false")
      Sinks.writeWithBloom(rows, s"$dir/bloom", Map("key" -> 20000L), numFiles = 4)
      rows.repartition(4).write.mode("overwrite").parquet(s"$dir/plain")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", prevBlock)
      if (prevDict == null) hc.unset("parquet.enable.dictionary") else hc.set("parquet.enable.dictionary", prevDict)
    }
    val needle = md5(lit("123456")).cast("string")
    def lookup(sub: String): Long = {
      var n = 0L
      val counted = decodedRows {
        n = spark.read.parquet(s"$dir/$sub")
          .filter(col("key") === needle).count()
      }
      assert(n == 1, s"$sub lookup found $n rows")
      counted
    }
    lookup("bloom"); lookup("plain") // warm (footer cache, code paths)
    val withBloom = lookup("bloom")
    val without = lookup("plain")
    assert(without >= 190000, s"plain layout should decode ~all rows, got $without")
    // 128 KB groups ≈ 4-6k rows each; a handful of groups may false-
    // positive at 1% FPP — 10x headroom still proves the skip
    assert(withBloom < without / 10,
      s"bloom layout decoded $withBloom rows vs $without without filters")
  }
}

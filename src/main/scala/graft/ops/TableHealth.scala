package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partition-health audit — the monitoring face of table maintenance:
  * [[Compaction]] fixes small files and [[graft.ops.ZOrder]]/Hilbert fix
  * clustering AFTER someone notices; this op is how a platform notices,
  * per partition, from METADATA ONLY (the recursive listing — no data
  * read, the Manifest/Compaction walk).
  *
  * Per partition subdir ("" for an unpartitioned table):
  *   - file count, total bytes;
  *   - small-file fraction (files < `targetBytes`/2 — the population
  *     FFD compaction would fold);
  *   - size skew = max/mean file bytes (a straggler-task predictor: one
  *     task per file, the biggest file paces the stage);
  *   - `needs_compaction` — enough small files that a [[Compaction]]
  *     run pays for itself (≥ 4 smalls and they are the majority).
  *
  * Driver state is file metadata — the same bound as the manifest. The
  * result is returned as a DataFrame so it composes (alert joins,
  * dashboards, a WHERE clause to pick partitions to compact).
  */
object TableHealth {

  final case class PartitionHealth(
      partition: String, n_files: Long, total_bytes: Long,
      max_bytes: Long, small_files: Long, small_frac: Double,
      size_skew: Double, needs_compaction: Boolean)

  def audit(spark: SparkSession, dataDir: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    import spark.implicits._
    val rows = Compaction.listFiles(spark, dataDir)
      .groupBy(_.subdir).toSeq.sortBy(_._1)
      .map { case (sub, files) =>
        val n = files.length.toLong
        val bytes = files.map(_.bytes).sum
        val maxB = files.map(_.bytes).max
        val small = files.count(_.bytes < targetBytes / 2).toLong
        val mean = bytes.toDouble / n
        PartitionHealth(
          partition = sub,
          n_files = n,
          total_bytes = bytes,
          max_bytes = maxB,
          small_files = small,
          small_frac = math.floor(small.toDouble / n * 10000 + 0.5) / 10000,
          size_skew =
            if (mean == 0.0) 1.0
            else math.floor(maxB / mean * 10000 + 0.5) / 10000,
          needs_compaction = small >= 4 && small * 2 > n)
      }
    rows.toDF()
  }
}

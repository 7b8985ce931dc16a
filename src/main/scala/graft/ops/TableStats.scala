package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted table statistics + the cost decisions they feed — the
  * ANALYZE-and-catalog layer a plain-parquet deployment lacks (Spark's
  * own CBO statistics live in a metastore this engine does not assume).
  *
  * `collect` makes ONE pass over the table: row count, on-disk bytes
  * (from the file listing, not a scan), and per-column null count +
  * HLL++ distinct estimate, all in a single map-side-combinable
  * aggregate (the o23b no-Expand shape — approx_count_distinct per
  * column, never the exact multi-distinct rewrite that replicates every
  * row per column through the exchange). Stats persist as one tiny
  * parquet table next to the data (`<dir>/_stats`), readable by any
  * session.
  *
  * `broadcastSide` is the decision the numbers exist for: given two
  * join inputs with collected stats, broadcast the side whose measured
  * bytes fit the threshold (prefer the smaller; neither fits → None =
  * let the shuffle join stand). This is the catalog-informed version of
  * the guess `spark.sql.autoBroadcastJoinThreshold` makes from file
  * sizes at plan time — measured stats see through projections the
  * planner cannot cost, and survive across sessions. At 100 TB the
  * stats pass rides the ingest write (collect once per batch, merge),
  * not a separate scan of the lake.
  */
object TableStats {

  final case class Stats(
      table: String, rows: Long, bytes: Long,
      columns: Map[String, ColStats])

  final case class ColStats(nulls: Long, approxDistinct: Long)

  /** One-pass stats over `df`, with `bytes` taken from the parquet
    * files under `dataDir` (0 when unknown/absent). */
  def collect(spark: SparkSession, df: DataFrame, table: String,
      dataDir: Option[String] = None): Stats = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        approx_count_distinct(col(c)).as(s"__d_$c"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*).head()
    val bytes = dataDir.map(dirBytes(spark, _)).getOrElse(0L)
    Stats(table, row.getAs[Long]("__rows"), bytes,
      cols.map(c => c -> ColStats(
        row.getAs[Long](s"__n_$c"), row.getAs[Long](s"__d_$c"))).toMap)
  }

  /** Persist stats as a one-row-per-column parquet table at
    * `<dir>/_stats` (overwrite — stats describe the current data). */
  def write(spark: SparkSession, stats: Stats, dir: String): Unit = {
    import spark.implicits._
    stats.columns.toSeq.sortBy(_._1)
      .map { case (c, cs) =>
        (stats.table, stats.rows, stats.bytes, c, cs.nulls, cs.approxDistinct) }
      .toDF("table", "rows", "bytes", "column", "nulls", "approx_distinct")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stats")
  }

  /** Load stats written by [[write]]; None when absent. */
  def read(spark: SparkSession, dir: String): Option[Stats] = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/_stats")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val rows = spark.read.parquet(s"$dir/_stats").collect()
      rows.headOption.map { h =>
        Stats(h.getAs[String]("table"), h.getAs[Long]("rows"),
          h.getAs[Long]("bytes"),
          rows.map(r => r.getAs[String]("column") ->
            ColStats(r.getAs[Long]("nulls"), r.getAs[Long]("approx_distinct"))).toMap)
      }
    }
  }

  /** Which side of a join to broadcast under `thresholdBytes`: Left /
    * Right when that side's measured bytes fit (smaller side preferred
    * on a tie-capable pair), None when neither fits. */
  def broadcastSide(left: Stats, right: Stats,
      thresholdBytes: Long): Option[Either[Unit, Unit]] = {
    val lFits = left.bytes > 0 && left.bytes <= thresholdBytes
    val rFits = right.bytes > 0 && right.bytes <= thresholdBytes
    (lFits, rFits) match {
      case (true, true) =>
        if (left.bytes <= right.bytes) Some(Left(())) else Some(Right(()))
      case (true, false) => Some(Left(()))
      case (false, true) => Some(Right(()))
      case _ => None
    }
  }

  /** Join with the strategy the COLLECTED stats justify: the side whose
    * measured bytes fit the threshold gets an explicit `broadcast()`
    * hint (overriding whatever the planner would guess from raw file
    * sizes); neither fits → plain join, and the shuffle is the honest
    * plan. `usingColumns` join, inner by default. */
  def joinWithStats(
      a: DataFrame, aStats: Stats, b: DataFrame, bStats: Stats,
      usingColumns: Seq[String], joinType: String = "inner",
      thresholdBytes: Long = 64L * 1024 * 1024): DataFrame =
    broadcastSide(aStats, bStats, thresholdBytes) match {
      case Some(Left(_))  => broadcast(a).join(b, usingColumns, joinType)
      case Some(Right(_)) => a.join(broadcast(b), usingColumns, joinType)
      case None           => a.join(b, usingColumns, joinType)
    }

  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0L
    else {
      val it = fs.listFiles(path, true)
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
      }
      total
    }
  }
}

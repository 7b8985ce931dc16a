package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * Scale design notes (100 TB target, tested on local[32]):
  *  - shuffle partitions default 32 locally; on a real cluster AQE
  *    coalesces from a high initial number, so we enable AQE + skew join
  *    handling unconditionally.
  *  - session timezone pinned to UTC: all local-time semantics go through
  *    explicit from_utc_timestamp/to_utc_timestamp (see ops.DailyTmax),
  *    never through implicit session-zone arithmetic.
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // index-probe lookups push bounded key SETS into sorted parquet
      // scans (DedupDocs.incrementalIndexed); the default threshold (10)
      // would degrade a >10-key In to a min/max range filter, which
      // prunes nothing for uniformly-hashed keys — raise it to the
      // probe's own pushdown cap so each key prunes by its own stats
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[*]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

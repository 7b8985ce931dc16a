package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sinks — SURVEY §2.1 S8/S9.
  *
  * The reference writes `.parquet.tmp` then renames for atomicity
  * (build_daily_tmax.py:146-151); Spark's commit protocol (staging dir +
  * job commit) replaces that. Partition layout follows §4: Hive-style
  * station_id/year directories so station- and time-sliced reads prune
  * partitions at planning time — the manual per-year file naming of the
  * reference (isd_<year>.parquet) done by the engine instead.
  */
object Sinks {

  /** Canonical hourly_obs layout: partitioned by (station_id, year). */
  def writeHourlyObs(df: DataFrame, dir: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("year", year(col("ts_utc")))
      .write.mode(mode)
      .partitionBy("station_id", "year")
      .parquet(dir)

  /** Daily tables: partitioned by station only (small per-station files;
    * a year split would fragment 365-row partitions). */
  def writeDaily(df: DataFrame, dir: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy("station_id").parquet(dir)

  /** Forecast parts keyed by issue time (the reference's
    * part-YYYY-MM-DDTHH.parquet, openmeteo_daily_forecast.py:270-274):
    * dynamic-partition append — re-ingesting one issue hour overwrites
    * only that partition. */
  def appendForecastPartition(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      df.withColumn("issue_hour", date_format(col("issue_time_utc"), "yyyy-MM-dd'T'HH"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("station_id", "issue_hour")
        .parquet(dir)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}

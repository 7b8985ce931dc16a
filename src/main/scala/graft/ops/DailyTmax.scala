package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.schemas.QcFlags

/** Hourly → daily Tmax: the engine's flagship aggregate.
  * Mirrors aggregate/build_daily_tmax.py:39-122.
  *
  * Timezone semantics: ts_utc is a UTC instant; the local calendar day is
  * from_utc_timestamp(ts_utc, stationTz) truncated to a date — DST days
  * of 23/25 local hours group correctly. coverage_hours counts DISTINCT
  * valid local hours, so sub-hourly data can't inflate it
  * (build_daily_tmax.py:80-95).
  *
  * Scale notes: a single hash aggregate keyed (date_local, station_id)
  * with map-side partial aggregation; bit_or is the built-in aggregate.
  * coverage_hours is computed as bit_count(bit_or(1 << hour)) — hours
  * are bounded 0–23, so the distinct-hour count collapses into a
  * 24-bit set OR'd per group. Unlike countDistinct (which expands to a
  * two-phase aggregate with an extra exchange), the bitset is a plain
  * single-pass aggregate — one shuffle for the whole daily build — and
  * it is exact, deterministic, and streaming-legal.
  */
object DailyTmax {

  def apply(
      hourly: DataFrame,
      stationTz: String,
      minCoverageHours: Int = 18,
      source: String = "noaa_isd",
      clock: () => java.sql.Timestamp = () => new java.sql.Timestamp(System.currentTimeMillis())): DataFrame =
    perStationTz(hourly, lit(stationTz), minCoverageHours, source, clock)

  /** Multi-timezone spelling: the zone is a per-row COLUMN (join a
    * station→tz dimension in), so one frame can carry stations across
    * timezones and still group on each station's own local calendar —
    * the multi-station generalization the single-station reference never
    * needs. Same single hash aggregate; `from_utc_timestamp` takes the
    * zone as a column, so nothing about the plan changes shape. */
  def perStationTz(
      hourly: DataFrame,
      stationTz: org.apache.spark.sql.Column,
      minCoverageHours: Int = 18,
      source: String = "noaa_isd",
      clock: () => java.sql.Timestamp = () => new java.sql.Timestamp(System.currentTimeMillis())): DataFrame = {

    // eligibility: temp present and not flagged out-of-range
    // (build_daily_tmax.py:75-78)
    val isValid = col("temp_c").isNotNull &&
      (col("qc_flags").bitwiseAND(QcFlags.OutOfRange) === 0)

    val localized = hourly
      .withColumn("local_ts", from_utc_timestamp(col("ts_utc"), stationTz))
      .withColumn("date_local", to_date(col("local_ts")))
      .withColumn("temp_valid", when(isValid, col("temp_c")))
      .withColumn("hour_valid", when(isValid, hour(col("local_ts"))))

    val daily = localized
      .groupBy(col("date_local"), col("station_id"))
      .agg(
        max(col("temp_valid")).as("tmax_c"),
        coalesce(bit_count(expr("bit_or(shiftleft(1L, hour_valid))")), lit(0))
          .cast("int").as("coverage_hours"),
        expr("bit_or(qc_flags)").as("qc_flags"))

    daily
      .withColumn("tmax_f", round(col("tmax_c") * 9.0 / 5.0 + 32.0, 1)) // :102
      // coverage flags (:107-114): IncompleteDay only when coverage == 0,
      // LowCoverage alone for 0 < coverage < threshold
      .withColumn("qc_flags",
        when(col("coverage_hours") === 0,
          col("qc_flags").bitwiseOR(QcFlags.IncompleteDay))
          .when(col("coverage_hours") < minCoverageHours,
            col("qc_flags").bitwiseOR(QcFlags.LowCoverage))
          .otherwise(col("qc_flags")))
      .filter(col("tmax_c").isNotNull) // drop days with no valid obs (:115-117)
      .withColumn("source", lit(source))
      .withColumn("updated_at_utc", lit(clock()))
      .select("date_local", "station_id", "tmax_c", "tmax_f",
        "coverage_hours", "source", "qc_flags", "updated_at_utc")
  }
}

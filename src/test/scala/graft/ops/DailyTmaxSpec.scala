package graft.ops

import java.sql.Timestamp
import graft.SparkSpec
import graft.schemas.QcFlags

/** Ports the reference's daily-aggregate battery
  * (tests/test_build_daily_tmax.py:94-491 — UTC-midnight crossing, QC
  * exclusion/inclusion, coverage counting, sub-hourly capping,
  * multi-station grouping). */
class DailyTmaxSpec extends SparkSpec {
  import spark.implicits._

  private val fixedClock = () => Timestamp.valueOf("2024-07-15 00:00:00")

  private def hourly(rows: Seq[(String, String, Double, Long)]) = // (tsUtc, station, temp, flags)
    rows.map { case (ts, st, t, f) =>
      (Timestamp.valueOf(ts), st, Option(40.78), Option(-73.87), Option(t), "isd", f)
    }.toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")

  test("groups by LOCAL day across UTC midnight (tz America/New_York)") {
    // 2024-07-01T23Z, 07-02T03Z, 07-02T05Z = NY July 1 7pm/11pm, July 2 1am
    val df = hourly(Seq(
      ("2024-07-01 23:00:00", "KLGA", 30.0, 0L),
      ("2024-07-02 03:00:00", "KLGA", 35.0, 0L),
      ("2024-07-02 05:00:00", "KLGA", 25.0, 0L)))
    val out = DailyTmax(df, "America/New_York", clock = fixedClock)
      .orderBy("date_local").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("tmax_c") == 35.0) // July 1 local: 30, 35
    assert(out(1).getAs[Double]("tmax_c") == 25.0) // July 2 local: 25
  }

  test("excludes OUT_OF_RANGE-flagged temps; includes spike-flagged temps") {
    val df = hourly(Seq(
      ("2024-07-01 14:00:00", "KLGA", 30.0, 0L),
      ("2024-07-01 15:00:00", "KLGA", 99.0, QcFlags.OutOfRange.toLong),
      ("2024-07-01 16:00:00", "KLGA", 25.0, 0L),
      ("2024-07-01 17:00:00", "KLGA", 28.0, 0L)))
    val out = DailyTmax(df, "America/New_York", clock = fixedClock).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("tmax_c") == 30.0)
    assert(out(0).getAs[Int]("coverage_hours") == 3)

    val spiky = hourly(Seq(
      ("2024-07-01 14:00:00", "KLGA", 30.0, 0L),
      ("2024-07-01 15:00:00", "KLGA", 45.0, QcFlags.SpikeDetected.toLong)))
    val out2 = DailyTmax(spiky, "America/New_York", clock = fixedClock).collect()
    assert(out2(0).getAs[Double]("tmax_c") == 45.0) // spikes are NOT excluded
  }

  test("propagates qc flags with bitwise OR and adds coverage flags") {
    val df = hourly(Seq(
      ("2024-07-01 14:00:00", "KLGA", 30.0, QcFlags.SpikeDetected.toLong),
      ("2024-07-01 15:00:00", "KLGA", 31.0, QcFlags.DuplicateTs.toLong)))
    val out = DailyTmax(df, "America/New_York", minCoverageHours = 18, clock = fixedClock).collect()
    val flags = out(0).getAs[Long]("qc_flags")
    assert((flags & QcFlags.SpikeDetected) != 0)
    assert((flags & QcFlags.DuplicateTs) != 0)
    assert((flags & QcFlags.LowCoverage) != 0)   // 2 < 18 hours
    // IncompleteDay is reserved for coverage == 0 days (which are dropped
    // with the null-tmax filter) — build_daily_tmax.py:107-114
    assert((flags & QcFlags.IncompleteDay) == 0)
  }

  test("sub-hourly observations do not inflate coverage_hours") {
    // 6 obs across 3 distinct hours → coverage 3 (test_build_daily_tmax.py:434-465)
    val df = hourly((0 until 6).map { i =>
      (f"2024-07-01 1${i / 2}%d:${(i % 2) * 30}%02d:00", "KLGA", 20.0 + i, 0L)
    })
    val out = DailyTmax(df, "America/New_York", clock = fixedClock).collect()
    assert(out(0).getAs[Int]("coverage_hours") == 3)
  }

  test("multi-station grouping is independent and °F is consistent") {
    val df = hourly(Seq(
      ("2024-07-01 14:00:00", "KLGA", 30.0, 0L),
      ("2024-07-01 14:00:00", "KJFK", 20.0, 0L)))
    val out = DailyTmax(df, "America/New_York", clock = fixedClock)
      .orderBy("station_id").collect()
    assert(out.map(_.getAs[String]("station_id")).toSeq == Seq("KJFK", "KLGA"))
    assert(out(1).getAs[Double]("tmax_f") == 86.0) // 30C = 86F
    val validated = graft.schemas.Checks.validateDailyTmax(
      DailyTmax(df, "America/New_York", clock = fixedClock))
    assert(validated.count() == 2)
  }
}

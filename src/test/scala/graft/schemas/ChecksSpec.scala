package graft.schemas

import java.sql.Timestamp
import graft.SparkSpec

/** Validator failure-injection battery (SURVEY §5 category 2 — one test
  * per violated rule, mirroring tests/test_*_schema.py). */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def validHourly = Seq(
    (Timestamp.valueOf("2024-07-01 00:00:00"), "KLGA", Option(40.78), Option(-73.87), Option(20.0), "isd", 0L),
    (Timestamp.valueOf("2024-07-01 01:00:00"), "KLGA", Option(40.78), Option(-73.87), Option(21.0), "isd", 0L))
    .toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")

  test("valid frame passes all hourly checks") {
    assert(Checks.validateHourlyObs(validHourly).count() == 2)
  }

  test("missing column fails") {
    val e = intercept[IllegalArgumentException] {
      Checks.validateHourlyObs(validHourly.drop("source").withColumn("source2", org.apache.spark.sql.functions.lit("x")))
    }
    assert(e.getMessage.contains("require_columns"))
  }

  test("null in non-null column fails with count and rule name") {
    val bad = Seq(
      (Timestamp.valueOf("2024-07-01 00:00:00"), null.asInstanceOf[String], Option(40.78), Option(-73.87), Option(20.0), "isd", 0L))
      .toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")
    val e = intercept[IllegalArgumentException](Checks.validateHourlyObs(bad))
    assert(e.getMessage.contains("require_no_nulls(station_id)"))
    assert(e.getMessage.contains("1 rows"))
  }

  test("out-of-range temp fails; null temp is allowed (missing, not invalid)") {
    val bad = Seq(
      (Timestamp.valueOf("2024-07-01 00:00:00"), "KLGA", Option(40.78), Option(-73.87), Option(99.0), "isd", 0L))
      .toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")
    val e = intercept[IllegalArgumentException](Checks.validateHourlyObs(bad))
    assert(e.getMessage.contains("require_range(temp_c"))
    val nullTemp = Seq(
      (Timestamp.valueOf("2024-07-01 00:00:00"), "KLGA", Option(40.78), Option(-73.87), Option.empty[Double], "isd", 1L))
      .toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")
    assert(Checks.validateHourlyObs(nullTemp).count() == 1)
  }

  test("duplicate keys fail only when uniqueness required") {
    val dup = validHourly.unionByName(validHourly)
    assert(Checks.validateHourlyObs(dup, requireUniqueKeys = false).count() == 4)
    val e = intercept[IllegalArgumentException](Checks.validateHourlyObs(dup))
    assert(e.getMessage.contains("require_unique"))
  }

  test("daily C/F consistency beyond 0.2°F fails") {
    val bad = Seq(
      (java.sql.Date.valueOf("2024-07-01"), "KLGA", 30.0, 90.0, 24, "noaa_isd", 0L,
        Timestamp.valueOf("2024-07-02 00:00:00"))) // 30C = 86F, not 90F
      .toDF("date_local", "station_id", "tmax_c", "tmax_f", "coverage_hours",
        "source", "qc_flags", "updated_at_utc")
    val e = intercept[IllegalArgumentException](Checks.validateDailyTmax(bad))
    assert(e.getMessage.contains("cf_consistency"))
  }

  test("all data rules evaluate in a single pass (one collected row)") {
    // smoke: a frame violating two rules reports both in one exception
    val bad = Seq(
      (Timestamp.valueOf("2024-07-01 00:00:00"), "KLGA", Option(400.0), Option(-73.87), Option(99.0), "isd", 0L))
      .toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")
    val e = intercept[IllegalArgumentException](Checks.validateHourlyObs(bad))
    assert(e.getMessage.contains("require_range(temp_c"))
    assert(e.getMessage.contains("require_range(lat"))
  }
}

package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

/** DST-transition days (23/25 local hours) and empty-input edges — the
  * timezone risk SURVEY §7 flags as the biggest correctness hazard. */
class DstEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def obs(rows: Seq[(String, Double)]) =
    rows.map { case (ts, t) =>
      (Timestamp.valueOf(ts), "KLGA", Option(40.78), Option(-73.87), Option(t), "isd", 0L)
    }.toDF("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")

  private val clock = () => Timestamp.valueOf("2024-12-01 00:00:00")

  test("fall-back day (Nov 3 2024, 25 local hours): repeated wall hour counts once") {
    // US Eastern: clocks fall back 2024-11-03 at 2:00 EDT → 1:00 EST.
    // UTC 05:30 = 1:30 EDT; UTC 06:30 = 1:30 EST — the SAME local wall
    // hour observed twice at two different UTC instants.
    val df = obs(Seq(
      ("2024-11-03 05:30:00", 10.0), // 01:30 EDT
      ("2024-11-03 06:30:00", 12.0), // 01:30 EST (repeated hour 1)
      ("2024-11-03 15:00:00", 15.0))) // 10:00 EST
    val out = DailyTmax(df, "America/New_York", clock = clock).collect()
    assert(out.length == 1)
    assert(out(0).getAs[java.sql.Date]("date_local").toString == "2024-11-03")
    assert(out(0).getAs[Double]("tmax_c") == 15.0)
    // hour 1 seen twice → counts once; hours {1, 10} → coverage 2
    assert(out(0).getAs[Int]("coverage_hours") == 2)
  }

  test("fall-back day boundaries: UTC 03:59 is still Nov 2 locally; UTC 05:00 next day is Nov 3") {
    val df = obs(Seq(
      ("2024-11-03 03:59:00", 20.0), // 23:59 EDT Nov 2
      ("2024-11-04 04:59:00", 30.0))) // 23:59 EST Nov 3 (UTC−5 after fall-back)
    val out = DailyTmax(df, "America/New_York", clock = clock)
      .orderBy("date_local").collect()
    assert(out.map(_.getAs[java.sql.Date]("date_local").toString).toSeq ==
      Seq("2024-11-02", "2024-11-03"))
  }

  test("spring-forward day (Mar 10 2024, 23 local hours): skipped hour never appears") {
    // 2:00 EST → 3:00 EDT: local hour 2 does not exist on Mar 10.
    val df = obs((0 until 24).map { h => // all 24 UTC hours of Mar 10 EST-window
      (f"2024-03-10 ${h}%02d:00:00", 10.0 + h)
    })
    val out = DailyTmax(df, "America/New_York", clock = clock).collect()
    val mar10 = out.find(_.getAs[java.sql.Date]("date_local").toString == "2024-03-10").get
    // our UTC 05..23 rows land on local hours {0, 1, 3..19} — hour 2 is
    // skipped by the transition → 19 distinct hours, not 20
    assert(mar10.getAs[Int]("coverage_hours") == 19)
  }

  test("empty input produces empty, schema-correct output through clean and daily") {
    val empty = obs(Seq.empty)
    val cleaned = CleanHourly(empty)
    assert(cleaned.count() == 0)
    val daily = DailyTmax(cleaned, "America/New_York", clock = clock)
    assert(daily.count() == 0)
    assert(daily.columns.toSeq == Seq("date_local", "station_id", "tmax_c", "tmax_f",
      "coverage_hours", "source", "qc_flags", "updated_at_utc"))
  }
}

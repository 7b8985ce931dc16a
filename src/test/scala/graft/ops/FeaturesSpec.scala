package graft.ops

import java.sql.{Date, Timestamp}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** No-lookahead rolling features — the reference's strictest contract
  * (tests/test_build_train_daily_tmax.py:114-191). */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  /** residuals [1,1,1,1,100] for one (station, lead) series. */
  private def series(residuals: Seq[Double]) =
    residuals.zipWithIndex.map { case (r, i) =>
      ("KLGA", 28, Timestamp.valueOf(f"2024-07-${i + 1}%02d 12:00:00"), r)
    }.toDF("station_id", "lead_hours", "issue_time_utc", "residual_f")

  test("current row never contributes: last of [1,1,1,1,100] has bias_7d = 1.0") {
    val out = Features.rollingFeatures(series(Seq(1, 1, 1, 1, 100)))
      .orderBy("issue_time_utc").collect()
    assert(out.last.getAs[Double]("bias_7d") == 1.0)
    assert(out.head.isNullAt(out.head.fieldIndex("bias_7d"))) // no prior rows → null
  }

  test("shift(1) + window exact values (w=7 over [10,20,30,40])") {
    val out = Features.rollingFeatures(series(Seq(10, 20, 30, 40)))
      .orderBy("issue_time_utc").collect()
    val bias = out.map(r => Option(r.getAs[java.lang.Double]("bias_7d")).map(_.toDouble))
    assert(bias(0).isEmpty)
    assert(bias(1).contains(10.0))
    assert(bias(2).contains(15.0)) // (10+20)/2
    assert(bias(3).contains(20.0)) // (10+20+30)/3
  }

  test("expanding std is SAMPLE std (ddof=1) with min 2 priors") {
    val out = Features.rollingFeatures(series(Seq(2, 4, 6)))
      .orderBy("issue_time_utc").collect()
    val sig = out.map(r => Option(r.getAs[java.lang.Double]("sigma_lead")).map(_.toDouble))
    assert(sig(0).isEmpty) // 0 priors
    assert(sig(1).isEmpty) // 1 prior → null (min_periods=2)
    assert(math.abs(sig(2).get - math.sqrt(2.0)) < 1e-12) // std([2,4], ddof=1) = √2
  }

  test("per-(station,lead) isolation: groups don't leak into each other") {
    val a = series(Seq(1, 1))
    val b = Seq(("KJFK", 52, Timestamp.valueOf("2024-07-01 12:00:00"), 1000.0))
      .toDF("station_id", "lead_hours", "issue_time_utc", "residual_f")
    val out = Features.rollingFeatures(a.unionByName(b))
      .filter($"station_id" === "KLGA").orderBy("issue_time_utc").collect()
    assert(out(1).getAs[Double]("bias_7d") == 1.0) // unaffected by KJFK's 1000
  }

  test("forecast↔truth join keys on (station, date), applies coverage gate, computes residual") {
    val forecast = Seq(
      ("KLGA", Timestamp.valueOf("2024-06-30 12:00:00"), Date.valueOf("2024-07-01"), 86.0, 28, "openmeteo"),
      ("KLGA", Timestamp.valueOf("2024-07-01 12:00:00"), Date.valueOf("2024-07-02"), 90.0, 28, "openmeteo"))
      .toDF("station_id", "issue_time_utc", "target_date_local", "tmax_pred_f", "lead_hours", "source")
    val truth = Seq(
      (Date.valueOf("2024-07-01"), "KLGA", 30.0, 86.0, 24, 0L),
      (Date.valueOf("2024-07-02"), "KLGA", 32.0, 89.6, 10, 0L)) // low coverage → gated out
      .toDF("date_local", "station_id", "tmax_c", "tmax_f", "coverage_hours", "qc_flags")
    val out = Features.joinForecastTruth(forecast, truth, minCoverageHours = 18).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("residual_f") == 0.0) // 86 - 86
  }

  test("seasonal encodings use the 365.25 divisor and bounded range") {
    val df = Seq(("KLGA", Date.valueOf("2024-03-05"))).toDF("station_id", "target_date_local")
    val row = Features.seasonalEncodings(df).collect()(0)
    val doy = 65 // 2024-03-05
    assert(math.abs(row.getAs[Double]("sin_doy") - math.sin(2 * math.Pi * doy / 365.25)) < 1e-12)
    assert(row.getAs[Int]("month") == 3)
  }
}

package graft

import java.nio.file.{Files, Paths}
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.ops.{CleanHourly, DailyTmax, Features}
import graft.eval.{Forecaster, Passthrough, Ridge, Runner}
import graft.sources.{Ingest, Sinks}

/** The complete reference lifecycle in one run (SURVEY §3):
  * raw ISD CSV → decode → clean → partitioned parquet → hourly→daily
  * Tmax → forecast↔truth join → rolling features → multi-model eval →
  * run artifacts. What a reference user actually does, end to end.
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("raw CSV to ranked multi-model evaluation artifacts") {
    val work = Files.createTempDirectory("graft_e2e").toString

    // --- 1. raw ISD CSV (90 days × 24 h of synthetic weather) ---
    val rawCsv = new StringBuilder("DATE,TMP,LATITUDE,LONGITUDE,JUNK\n")
    val days = 90
    for (d <- 0 until days; h <- 0 until 24) {
      val dayOfYear = 150 + d
      // seasonal + diurnal signal, tenths of °C, ISD "+0253,1" format
      val temp = 20.0 + 8 * math.sin(2 * math.Pi * dayOfYear / 365.25) +
        6 * math.sin(2 * math.Pi * (h - 9) / 24.0)
      val tmpField = f"${math.round(temp * 10)}%+05d,1"
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(dayOfYear - 1)
      rawCsv.append(f"${date}T$h%02d:00:00,$tmpField,40.78,-73.87,x\n")
    }
    // inject garbage rows the decode must survive: unparseable timestamp
    // (dropped) and a sentinel temp at a fresh hour (kept, temp null)
    rawCsv.append("not-a-date,+0100,40.78,-73.87,x\n")
    rawCsv.append("2024-12-01T00:00:00,+9999,40.78,-73.87,x\n")
    val csvPath = s"$work/isd.csv"
    Files.writeString(Paths.get(csvPath), rawCsv.toString)

    // --- 2. decode → clean → partitioned sink ---
    val decoded = Ingest.readIsdCsv(spark, csvPath, "KLGA")
    val cleaned = CleanHourly(decoded)
    Sinks.writeHourlyObs(cleaned, s"$work/hourly")
    val hourly = spark.read.parquet(s"$work/hourly")
    assert(hourly.count() == days * 24 + 1) // garbage ts dropped; sentinel kept as null temp

    // --- 3. hourly → daily Tmax (validated) ---
    val daily = graft.schemas.Checks.validateDailyTmax(
      DailyTmax(hourly, "America/New_York",
        clock = () => Timestamp.valueOf("2024-09-15 00:00:00")))
    val nDays = daily.count()
    assert(nDays >= days - 1 && nDays <= days + 1) // tz shift may split edge days

    // --- 4. synthetic forecasts (pred = truth + noise + bias) joined to truth ---
    val forecast = daily.select(
      $"station_id",
      (unix_timestamp($"date_local".cast("timestamp")) - 86400L)
        .cast("timestamp").as("issue_time_utc"),
      $"date_local".as("target_date_local"),
      round($"tmax_f" + lit(1.2) + sin($"date_local".cast("timestamp").cast("long") / 86400.0) * 1.5, 1)
        .as("tmax_pred_f"),
      lit(28).as("lead_hours"),
      lit("openmeteo").as("source"))
    val train = Features.buildTrainTable(forecast, daily, minCoverageHours = 18)
    assert(train.columns.contains("bias_7d") && train.columns.contains("sigma_lead"))
    val nTrain = train.count()
    assert(nTrain > 50)
    // no-lookahead sanity on the real pipeline: first row per key has null bias
    assert(train.orderBy("issue_time_utc").limit(1)
      .select("bias_7d").collect()(0).isNullAt(0))

    // --- 5. multi-model evaluation with artifacts ---
    val runDir = s"$work/runs/e2e"
    val models = Seq[Forecaster](
      new Passthrough(),
      new Ridge(Seq("tmax_pred_f", "sin_doy", "cos_doy", "bias_7d", "bias_14d"),
        "tmax_actual_f", alpha = 1.0))
    val ranked = Runner.runMultiModel(train, models, runDir)
    assert(ranked.size == 2)
    assert(ranked.head.name.startsWith("Ridge")) // ridge beats biased passthrough
    assert(ranked.head.metrics.mae < ranked.last.metrics.mae)
    assert(Files.exists(Paths.get(s"$runDir/comparison.json")))
    val back = Runner.loadRun(spark, runDir, "Passthrough")
    assert(back.count() > 0)
  }

  test("two stations in two timezones, one frame, across a DST fall-back boundary") {
    // The reference is single-station; the engine generalizes: a
    // station→timezone dimension joins in and DailyTmax.perStationTz
    // groups every station on ITS OWN local calendar in one aggregate.
    // Span 2024-11-01 .. 2024-11-06 UTC — the US fall-back (Nov 3,
    // 02:00 local) lands mid-frame for both zones.
    val clock = () => Timestamp.valueOf("2024-12-01 00:00:00")
    def hourlyFor(station: String, tempBase: Double) = {
      val start = Timestamp.valueOf("2024-11-01 00:00:00").getTime / 1000
      spark.range(6 * 24)
        .select(
          timestamp_seconds(lit(start) + $"id" * 3600).as("ts_utc"),
          lit(station).as("station_id"),
          lit(40.0).as("lat"), lit(-75.0).as("lon"),
          (lit(tempBase) + ($"id" % 24)).as("temp_c"),
          lit("isd").as("source"), lit(0L).as("qc_flags"))
    }
    val ny = hourlyFor("KLGA", 5.0)
    val chi = hourlyFor("KORD", 3.0)
    val tzDim = Seq(("KLGA", "America/New_York"), ("KORD", "America/Chicago"))
      .toDF("station_id", "tz")

    val combined = DailyTmax.perStationTz(
      ny.unionByName(chi).join(broadcast(tzDim), "station_id"), $"tz",
      clock = clock)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("station_id", "date_local", "tmax_c", "tmax_f",
        "coverage_hours", "qc_flags")
        .collect().map(_.toSeq).toSet

    // per-station runs through the single-tz spelling are the oracle
    val singles = rows(DailyTmax(ny, "America/New_York", clock = clock)) ++
      rows(DailyTmax(chi, "America/Chicago", clock = clock))
    assert(rows(combined) == singles,
      "combined multi-tz run must equal the per-station single-tz runs")

    // DST sanity: the 25-hour local day groups correctly — the repeated
    // 01:00 hour collapses in the DISTINCT-hour coverage bitset, so
    // coverage stays ≤ 24 while the day absorbs 25 UTC hours of data
    val dst = combined
      .filter($"date_local" === Date.valueOf("2024-11-03"))
      .select($"station_id", $"coverage_hours").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dst.keySet == Set("KLGA", "KORD"))
    assert(dst.values.forall(_ == 24), s"DST-day coverage: $dst")
    // and the two zones disagree on which UTC hours belong to Nov 3:
    // Chicago's local day lags New York's by an hour, so its Nov 3 max
    // over base+((utcHour+offset)%24) differs — both must match their
    // own single-tz oracle (already asserted), not each other's shape
    val nyNov3 = rows(combined.filter($"station_id" === "KLGA" &&
      $"date_local" === Date.valueOf("2024-11-03")))
    val chiNov3 = rows(combined.filter($"station_id" === "KORD" &&
      $"date_local" === Date.valueOf("2024-11-03")))
    assert(nyNov3.nonEmpty && chiNov3.nonEmpty)
  }
}

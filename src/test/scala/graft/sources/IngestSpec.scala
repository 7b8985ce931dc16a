package graft.sources

import java.sql.Timestamp
import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("ISD decode: '+0150,1' → 15.0°C; sentinel 9999 → null; bad ts dropped") {
    val raw = Seq(
      ("2024-07-01T00:00:00", "+0150,1", "40.78", "-73.87"),
      ("2024-07-01T01:00:00", "+9999,9", "40.78", "-73.87"),
      ("2024-07-01T02:00:00", "-0063,1", "40.78", "-73.87"),
      ("not-a-date", "+0100,1", "40.78", "-73.87"))
      .toDF("DATE", "TMP", "LATITUDE", "LONGITUDE")
    val out = Ingest.decodeIsd(raw, "KLGA").orderBy("ts_utc").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Double]("temp_c") == 15.0)
    assert(out(1).isNullAt(out(1).fieldIndex("temp_c"))) // sentinel
    assert(out(2).getAs[Double]("temp_c") == -6.3)
    assert(out(0).getAs[String]("source") == "isd")
  }

  test("GHCNh decode: header normalization, column discovery, -9999 sentinel") {
    val raw = Seq(
      ("2024-07-01 00:00:00", "21.5", "40.78"),
      ("2024-07-01 01:00:00", "-9999", "40.78"),
      ("2024-07-01 02:00:00", "", "40.78"))
      .toDF(" Date_Time ", "Temperature", "Latitude")
    val out = Ingest.decodeGhcnh(raw, "KLGA").orderBy("ts_utc").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Double]("temp_c") == 21.5)
    assert(out(1).isNullAt(out(1).fieldIndex("temp_c")))
    assert(out(2).isNullAt(out(2).fieldIndex("temp_c")))
    assert(out(0).getAs[Double]("lat") == 40.78)
  }

  test("GHCNh decode fails loudly when no candidate column matches") {
    val raw = Seq(("x", "y")).toDF("colA", "colB")
    val e = intercept[IllegalArgumentException](Ingest.decodeGhcnh(raw, "KLGA"))
    assert(e.getMessage.contains("no datetime column"))
  }

  test("Open-Meteo decode: zip arrays, skip null temps, lead_hours from local midnight") {
    val json =
      """{"daily": {"time": ["2024-07-02", "2024-07-03", "2024-07-04"],
        |"temperature_2m_max": [30.0, null, 32.5]}}""".stripMargin
    val resp = spark.read.json(Seq(json).toDS())
    val issue = Timestamp.valueOf("2024-07-01 12:00:00") // UTC
    val out = Ingest.decodeOpenMeteo(resp, "KLGA", 40.78, -73.87, issue, "America/New_York")
      .orderBy("target_date_local").collect()
    assert(out.length == 2) // null skipped
    assert(out(0).getAs[Double]("tmax_pred_c") == 30.0)
    assert(out(0).getAs[Double]("tmax_pred_f") == 86.0)
    // 2024-07-02 00:00 NY = 04:00 UTC → (04:00 − 12:00 prev day) = 16h
    assert(out(0).getAs[Int]("lead_hours") == 16)
    assert(out(1).getAs[Int]("lead_hours") == 16 + 48)
  }

  test("ERA5 rows: Kelvin → Celsius") {
    val out = Ingest.fromEra5Rows(spark,
      Seq((Timestamp.valueOf("2015-01-01 00:00:00"), 273.15 + 20.0)),
      "KLGA", 40.78, -73.87).collect()
    assert(math.abs(out(0).getAs[Double]("temp_c") - 20.0) < 1e-9)
    assert(out(0).getAs[String]("source") == "era5")
  }

  test("hybrid routing: strict cutoff, union of sources") {
    val before = Seq((Timestamp.valueOf("2025-08-28 00:00:00"), "isd"))
      .toDF("ts_utc", "source")
    val after = Seq(
      (Timestamp.valueOf("2025-08-28 00:00:00"), "ghcnh"), // pre-cutoff row in post-source: dropped
      (Timestamp.valueOf("2025-08-30 00:00:00"), "ghcnh"))
      .toDF("ts_utc", "source")
    val out = Ingest.routeByCutoff(before, after, "ts_utc",
      Timestamp.valueOf("2025-08-29 00:00:00")).orderBy("ts_utc").collect()
    assert(out.map(_.getAs[String]("source")).toSeq == Seq("isd", "ghcnh"))
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scalar expression operators — SURVEY §2.3 E1–E18.
  *
  * All are pure Column expressions (no UDFs) so they stay inside
  * whole-stage codegen and remain oracle-comparable. Trig results are
  * rounded to 4 decimals on both sides (java.lang.Math vs libm can differ
  * in the last ulp).
  */
object ExprQueries {

  private val NY = "America/New_York"

  def all: Seq[OracleQuery] = Seq(
    // E1/E2: unit conversions (°C→°F with 1-decimal rounding as in
    // aggregate/build_daily_tmax.py:29-31; K→°C as in era5_hourly.py:292).
    OracleQuery(
      "e1_unit_conversions",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select(
            $"event_id",
            round($"value" * 9.0 / 5.0 + 32.0, 1).as("temp_f"),
            round($"value" - 273.15, 4).as("kelvin_to_c"))
          .orderBy($"event_id")
          .limit(500)
      },
      Some("""SELECT event_id,
             |  round(value * 9.0 / 5.0 + 32.0, 1) AS temp_f,
             |  round(value - 273.15, 4) AS kelvin_to_c
             |FROM events ORDER BY event_id LIMIT 500""".stripMargin)
    ),

    // E3/E4: sentinel-aware numeric decode from a raw string field
    // (ISD "+0150,1" → value/10, null on sentinel; noaa_hourly.py:135-163).
    // Here: extract the integer from the JSON-ish props string, treat
    // >= 90 as the sentinel, scale by /10.
    OracleQuery(
      "e3_sentinel_decode",
      (s, d) => {
        import s.implicits._
        val k = regexp_extract($"props", "([0-9]+)", 1).cast("int")
        Tables.events(s, d)
          .select($"event_id", when(k >= 90, lit(null)).otherwise(k / 10.0).as("decoded"))
          .agg(
            count(lit(1)).as("n"),
            sum(when($"decoded".isNull, 1).otherwise(0)).cast("long").as("n_sentinel"),
            round(avg($"decoded"), 4).as("avg_decoded"))
      },
      Some("""WITH dec AS (
             |  SELECT event_id,
             |    CASE WHEN TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) >= 90 THEN NULL
             |         ELSE TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) / 10.0 END AS decoded
             |  FROM events
             |)
             |SELECT count(*) AS n,
             |  CAST(sum(CASE WHEN decoded IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_sentinel,
             |  round(avg(decoded), 4) AS avg_decoded
             |FROM dec""".stripMargin)
    ),

    // E6/E7: UTC instant → station-local wall clock → local day. The
    // timezone-correct daily grouping that is the reference's core
    // semantic (build_daily_tmax.py:68-69). DuckDB two-step AT TIME ZONE
    // is session-tz independent and equals from_utc_timestamp.
    OracleQuery(
      "e6_tz_local_day",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("local_ts", from_utc_timestamp($"ts", NY))
          .withColumn("local_date", date_trunc("DAY", $"local_ts"))
          .groupBy($"local_date")
          .agg(
            count(lit(1)).as("cnt"),
            round(max($"value"), 4).as("max_value"),
            min(hour($"local_ts")).cast("int").as("first_hour"))
          .orderBy($"local_date")
      },
      Some("""WITH loc AS (
             |  SELECT (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS local_ts, value
             |  FROM events
             |)
             |SELECT date_trunc('day', local_ts) AS local_date, count(*) AS cnt,
             |  round(max(value), 4) AS max_value,
             |  CAST(min(hour(local_ts)) AS INT) AS first_hour
             |FROM loc GROUP BY 1 ORDER BY local_date""".stripMargin)
    ),

    // E8: calendar extracts (hour/month/dayofyear/iso weekday).
    OracleQuery(
      "e8_calendar_extracts",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select(
            $"o_orderkey",
            month($"o_orderdate").as("mo"),
            dayofyear($"o_orderdate").as("doy"),
            (weekday($"o_orderdate") + 1).as("isodow"),
            year($"o_orderdate").as("yr"))
          .orderBy($"o_orderkey")
          .limit(1000)
      },
      Some("""SELECT o_orderkey, month(o_orderdate) AS mo, dayofyear(o_orderdate) AS doy,
             |  isodow(o_orderdate) AS isodow, year(o_orderdate) AS yr
             |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin)
    ),

    // E9: seasonal harmonics sin/cos(2π·doy/365.25)
    // (build_train_daily_tmax.py:114-119 — 365.25 divisor normalized).
    OracleQuery(
      "e9_seasonal_harmonics",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select(dayofyear($"o_orderdate").as("doy"))
          .distinct()
          .select(
            $"doy",
            round(sin(lit(2 * math.Pi) * $"doy" / 365.25), 4).as("sin_doy"),
            round(cos(lit(2 * math.Pi) * $"doy" / 365.25), 4).as("cos_doy"))
          .orderBy($"doy")
      },
      Some("""SELECT doy,
             |  round(sin(2 * pi() * doy / 365.25), 4) AS sin_doy,
             |  round(cos(2 * pi() * doy / 365.25), 4) AS cos_doy
             |FROM (SELECT DISTINCT dayofyear(o_orderdate) AS doy FROM orders)
             |ORDER BY doy""".stripMargin)
    ),

    // E10: lead-hours = floor(seconds(ship − order)/3600) clamped ≥ 0
    // (openmeteo_daily_forecast.py:30-54).
    OracleQuery(
      "e10_lead_hours",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate")
        val ord = Tables.orders(s, d).select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .withColumn("lead_hours",
            greatest(lit(0L),
              floor((unix_timestamp($"l_shipdate") - unix_timestamp($"o_orderdate")) / 3600.0)))
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).as("cnt"),
            round(avg($"lead_hours"), 4).as("avg_lead_h"),
            max($"lead_hours").cast("long").as("max_lead_h"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
             |  round(avg(lead_hours), 4) AS avg_lead_h,
             |  CAST(max(lead_hours) AS BIGINT) AS max_lead_h
             |FROM (
             |  SELECT o_orderpriority,
             |    greatest(0, floor(date_diff('second', o_orderdate, l_shipdate) / 3600.0)) AS lead_hours
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),

    // E11–E14: the QC-bitmask pipeline as expressions — flag missing (1),
    // flag+nullify out-of-range (2), bitwise OR accumulate, bitmask test
    // (clean_hourly.py:59-141; qc_flags.py:13-23).
    OracleQuery(
      "e11_qc_flag_pipeline",
      (s, d) => {
        import s.implicits._
        val flags =
          (when($"value".isNull, 1).otherwise(0)
            .bitwiseOR(when($"value" < 5.0 || $"value" > 150.0, 2).otherwise(0)))
        Tables.events(s, d)
          .withColumn("qc_flags", flags)
          .withColumn("value_clean",
            when($"qc_flags".bitwiseAND(lit(2)) =!= 0, lit(null).cast("double")).otherwise($"value"))
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(when($"qc_flags".bitwiseAND(lit(2)) =!= 0, 1).otherwise(0)).cast("long").as("n_oor"),
            sum(when($"qc_flags" === 0, 1).otherwise(0)).cast("long").as("n_clean"),
            round(max($"value_clean"), 4).as("max_clean"),
            round(min($"value_clean"), 4).as("min_clean"))
          .orderBy($"event_type")
      },
      Some("""WITH qc AS (
             |  SELECT event_type, value,
             |    (CASE WHEN value IS NULL THEN 1 ELSE 0 END) |
             |    (CASE WHEN value < 5.0 OR value > 150.0 THEN 2 ELSE 0 END) AS qc_flags
             |  FROM events
             |), cleaned AS (
             |  SELECT event_type, qc_flags,
             |    CASE WHEN (qc_flags & 2) != 0 THEN NULL ELSE value END AS value_clean
             |  FROM qc
             |)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(CASE WHEN (qc_flags & 2) != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oor,
             |  CAST(sum(CASE WHEN qc_flags = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
             |  round(max(value_clean), 4) AS max_clean,
             |  round(min(value_clean), 4) AS min_clean
             |FROM cleaned GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // S4 analogue: JSON field extraction from a semi-structured string
    // column (the Open-Meteo response shape, openmeteo_daily_forecast.py:
    // 124-189) — get_json_object keeps the parse inside codegen.
    OracleQuery(
      "s4_json_extract",
      (s, d) => {
        import s.implicits._
        val k = get_json_object($"props", "$.k").cast("int")
        Tables.events(s, d)
          .select($"event_id", k.as("k"))
          .filter($"k".isNotNull)
          .groupBy(($"k" % 10).as("k_mod"))
          .agg(count(lit(1)).as("cnt"), avg($"k").as("avg_k"))
          .select($"k_mod", $"cnt", round($"avg_k", 4).as("avg_k"))
          .orderBy($"k_mod")
      },
      Some("""WITH parsed AS (
             |  SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
             |  FROM events
             |)
             |SELECT k % 10 AS k_mod, count(*) AS cnt, round(avg(k), 4) AS avg_k
             |FROM parsed WHERE k IS NOT NULL
             |GROUP BY k % 10 ORDER BY k_mod""".stripMargin)
    ),

    // E16: month → meteorological season label (eval/slicing.py:87-95).
    OracleQuery(
      "e16_season_label",
      (s, d) => {
        import s.implicits._
        val mo = month($"o_orderdate")
        Tables.orders(s, d)
          .withColumn("season",
            when(mo.isin(12, 1, 2), "DJF")
              .when(mo.isin(3, 4, 5), "MAM")
              .when(mo.isin(6, 7, 8), "JJA")
              .otherwise("SON"))
          .groupBy($"season")
          .agg(count(lit(1)).as("cnt"), round(sum($"o_totalprice"), 4).as("sum_price"))
          .orderBy($"season")
      },
      Some("""SELECT CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'DJF'
             |            WHEN month(o_orderdate) IN (3, 4, 5) THEN 'MAM'
             |            WHEN month(o_orderdate) IN (6, 7, 8) THEN 'JJA'
             |            ELSE 'SON' END AS season,
             |  count(*) AS cnt, round(sum(o_totalprice), 4) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY season""".stripMargin)
    ),

    // E17: string normalization — upper/trim/lpad/substring
    // (noaa_hourly.py:68,84,42,252 zero-padding and header cleanup).
    OracleQuery(
      "e17_string_normalize",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .select(
            $"c_custkey",
            upper(trim($"c_name")).as("name_norm"),
            lpad($"c_custkey".cast("string"), 12, "0").as("key_padded"),
            substring($"c_name", 1, 8).as("name_prefix"),
            length($"c_name").cast("long").as("name_len"))
          .orderBy($"c_custkey")
          .limit(200)
      },
      Some("""SELECT c_custkey, upper(trim(c_name)) AS name_norm,
             |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
             |  substring(c_name, 1, 8) AS name_prefix,
             |  CAST(length(c_name) AS BIGINT) AS name_len
             |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin)
    )
  )
}

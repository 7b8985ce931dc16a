package graft.schemas

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampType}

/** Validation failure: dataset, rule, offending count, sample values.
  * Mirrors the reference's error contract (schemas/validate.py:18-36). */
final case class CheckError(dataset: String, rule: String, count: Long, sample: Seq[String]) {
  def message: String = s"[$dataset] $rule failed for $count rows (sample: ${sample.mkString(", ")})"
}

/** The validator library — SURVEY §2.9 V1–V8 — as composable checks.
  * Schema-level checks (columns/dtypes) run driver-side on `df.schema`;
  * data-level checks compile into ONE aggregation pass over the data
  * (a single job regardless of how many rules are attached), which is
  * the 100 TB-friendly shape: no per-rule scan.
  */
final class Checks(dataset: String, df: DataFrame) {

  private var schemaErrors = List.empty[CheckError]
  /** (rule name, count expression, sample expression) */
  private var dataRules = List.empty[(String, Column, Column)]

  private def countWhere(rule: String, bad: Column, sampleCol: Column): this.type = {
    dataRules ::= ((rule, sum(when(bad, 1L).otherwise(0L)),
      slice(collect_list(when(bad, sampleCol.cast("string"))), 1, 5)))
    this
  }

  /** V1: required columns present. */
  def requireColumns(cols: String*): this.type = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      schemaErrors ::= CheckError(dataset, s"require_columns(${missing.mkString(",")})", missing.size.toLong, missing)
    this
  }

  /** V2: soft dtype compatibility. */
  def requireType(col0: String, t: DataType): this.type = {
    df.schema.find(_.name == col0).foreach { f =>
      if (f.dataType != t)
        schemaErrors ::= CheckError(dataset, s"require_dtype($col0: ${f.dataType} != $t)", 1, Seq(f.dataType.toString))
    }
    this
  }

  /** V5: timestamp columns are TimestampType (session TZ pinned UTC). */
  def requireTimestampUtc(cols: String*): this.type = {
    cols.foreach(c => requireType(c, TimestampType))
    this
  }

  /** V3: zero nulls. */
  def requireNoNulls(cols: String*): this.type = {
    cols.foreach(c => countWhere(s"require_no_nulls($c)", col(c).isNull, lit(c)))
    this
  }

  /** V6: values within [lo, hi]; nulls allowed unless also in requireNoNulls. */
  def requireRange(c: String, lo: Double, hi: Double): this.type =
    countWhere(s"require_range($c in [$lo,$hi])", col(c).isNotNull && (col(c) < lo || col(c) > hi), col(c))

  /** V6b: nonnegative. */
  def requireNonNegative(c: String): this.type =
    countWhere(s"require_nonnegative($c)", col(c).isNotNull && col(c) < 0, col(c))

  /** V7: |f(a) − b| ≤ tol on non-null pairs (°C/°F consistency, tol 0.2). */
  def requireClose(a: Column, b: Column, tol: Double, rule: String): this.type =
    countWhere(rule, a.isNotNull && b.isNotNull && abs(a - b) > tol, abs(a - b))

  /** V8: date column carries no time component (moot for DateType; kept
    * for timestamp-typed local dates). */
  def requireMidnightOnly(c: String): this.type =
    countWhere(s"require_date_no_time($c)",
      col(c).isNotNull && (hour(col(c)) =!= 0 || minute(col(c)) =!= 0 || second(col(c)) =!= 0), col(c))

  /** V4: key uniqueness — needs its own aggregation (group-by keys). */
  def requireUnique(keys: String*): Either[CheckError, Unit] = {
    val dups = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
    val sample = dups.limit(5).collect().map(_.mkString("(", ",", ")")).toSeq
    val n = if (sample.isEmpty) 0L else dups.count()
    if (n > 0) Left(CheckError(dataset, s"require_unique(${keys.mkString(",")})", n, sample))
    else Right(())
  }

  /** Run all attached rules in one pass; Left(errors) if any fire.
    * Schema errors short-circuit — data rules may reference the very
    * columns that are missing. */
  def run(): Either[List[CheckError], DataFrame] = {
    if (schemaErrors.nonEmpty) return Left(schemaErrors.reverse)
    if (dataRules.isEmpty) return Right(df)
    val dataErrors =
      if (dataRules.isEmpty) Nil
      else {
        val rules = dataRules.reverse
        val aggs = rules.flatMap { case (name, cnt, sample) =>
          Seq(cnt.as(s"cnt_$name"), sample.as(s"sample_$name"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        rules.zipWithIndex.flatMap { case ((name, _, _), i) =>
          // SUM over an empty frame is null — an empty dataset passes
          // every data rule (schemas/validate.py:103-105)
          val n = if (row.isNullAt(2 * i)) 0L else row.getLong(2 * i)
          if (n > 0) {
            val sample = Option(row.getSeq[String](2 * i + 1)).getOrElse(Seq.empty).filter(_ != null)
            Some(CheckError(dataset, name, n, sample))
          } else None
        }
      }
    val all = schemaErrors.reverse ++ dataErrors
    if (all.nonEmpty) Left(all) else Right(df)
  }

  /** run() that throws — stage-boundary contract like the reference's
    * validate_*(df) raising ValueError. */
  def runOrThrow(): DataFrame = run() match {
    case Right(ok)   => ok
    case Left(errs)  => throw new IllegalArgumentException(errs.map(_.message).mkString("; "))
  }
}

object Checks {
  def apply(dataset: String, df: DataFrame): Checks = new Checks(dataset, df)

  /** Structure-only hourly_obs check for the clean stage's validate-in:
    * columns, timestamp type, no-null keys — but NOT temp_c range, which
    * the clean stage itself fixes (clean_hourly.py:248-249 "We check
    * structure and types, but NOT temp_c range"). */
  def validateHourlyObsStructure(df: DataFrame): DataFrame =
    Checks("hourly_obs", df)
      .requireColumns(Schemas.hourlyObs.fieldNames.toIndexedSeq: _*)
      .requireTimestampUtc("ts_utc")
      .requireNoNulls("ts_utc", "station_id", "source", "qc_flags")
      .requireNonNegative("qc_flags")
      .runOrThrow()

  /** Full hourly_obs contract (schemas/hourly_obs.py:77-123). */
  def validateHourlyObs(df: DataFrame, requireUniqueKeys: Boolean = true): DataFrame = {
    val c = Checks("hourly_obs", df)
      .requireColumns(Schemas.hourlyObs.fieldNames.toIndexedSeq: _*)
      .requireTimestampUtc("ts_utc")
      .requireNoNulls("ts_utc", "station_id", "source", "qc_flags")
      .requireRange("temp_c", -90, 60)
      .requireRange("lat", -90, 90)
      .requireRange("lon", -180, 180)
      .requireNonNegative("qc_flags")
    val out = c.runOrThrow()
    if (requireUniqueKeys)
      Checks("hourly_obs", df).requireUnique("ts_utc", "station_id").left.foreach(e =>
        throw new IllegalArgumentException(e.message))
    out
  }

  /** Full daily_tmax contract (schemas/daily_tmax.py:77-134) incl. the
    * 0.2°F C/F consistency rule. */
  def validateDailyTmax(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val out = Checks("daily_tmax", df)
      .requireColumns(Schemas.dailyTmax.fieldNames.toIndexedSeq: _*)
      .requireNoNulls("date_local", "station_id", "tmax_c", "tmax_f", "coverage_hours", "source", "qc_flags")
      .requireRange("tmax_c", -90, 60)
      .requireRange("tmax_f", -130, 140)
      .requireRange("coverage_hours", 0, 24)
      .requireClose(c("tmax_c") * 9.0 / 5.0 + 32.0, c("tmax_f"), 0.2, "cf_consistency(0.2F)")
      .runOrThrow()
    Checks("daily_tmax", df).requireUnique("date_local", "station_id").left.foreach(e =>
      throw new IllegalArgumentException(e.message))
    out
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature engineering: forecast↔truth join + leakage-free rolling
  * window features → the train_daily_tmax table.
  * Mirrors features/build_train_daily_tmax.py + features/rolling_stats.py.
  *
  * Causality contract: every trailing frame ends at -1 — the current row
  * NEVER contributes to its own feature (rolling_stats.py:1-8; pinned by
  * the no-lookahead specs). Frame semantics map exactly:
  *   pandas shift(1).rolling(w, min_periods=1).mean()  ≡ avg over (-w, -1)
  *   shift(1).expanding(min_periods=2).std() (ddof=1)  ≡ stddev_samp over (-∞, -1)
  * because Spark's avg over an empty frame and stddev_samp of <2 rows
  * are null.
  *
  * Scale notes: repartition by (station_id, lead_hours) before the
  * window stage so W1–W3 evaluate in one exchange; the forecast↔truth
  * join keys on (station_id, date) with DateType keys (no tz-strip
  * juggling). The truth side is pre-filtered by coverage BEFORE the join
  * (filter-below-join, which Catalyst would also do on its own).
  */
object Features {

  /** J1: forecast↔truth inner join with residual
    * (build_train_daily_tmax.py:27-94). */
  def joinForecastTruth(
      forecast: DataFrame,
      truth: DataFrame,
      minCoverageHours: Int = 18): DataFrame = {
    val truthSide = truth
      .filter(col("coverage_hours") >= minCoverageHours)
      .select(
        col("station_id"),
        col("date_local").as("target_date_local"),
        col("tmax_f").as("tmax_actual_f"),
        col("qc_flags").as("truth_qc_flags"),
        col("coverage_hours"))
    forecast
      .withColumnRenamed("source", "forecast_source")
      .join(truthSide, Seq("station_id", "target_date_local"), "inner")
      .withColumn("residual_f", col("tmax_pred_f") - col("tmax_actual_f"))
  }

  /** E9: seasonal harmonics + month — divisor pinned to 365.25
    * (SURVEY §4: the reference is inconsistent 365 vs 365.25; normalized
    * here, build_train_daily_tmax.py:114-119). */
  def seasonalEncodings(df: DataFrame, dateCol: String = "target_date_local"): DataFrame = {
    val doy = dayofyear(col(dateCol))
    df.withColumn("sin_doy", sin(lit(2 * math.Pi) * doy / 365.25))
      .withColumn("cos_doy", cos(lit(2 * math.Pi) * doy / 365.25))
      .withColumn("month", month(col(dateCol)))
  }

  /** W1–W3: trailing bias means, trailing RMSEs, expanding sigma —
    * partitioned (station_id, lead_hours), ordered by issue_time_utc
    * (rolling_stats.py:42,80-81,123-124). */
  def rollingFeatures(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("station_id", "lead_hours").orderBy("issue_time_utc")
    def trailing(n: Int) = w.rowsBetween(-n, -1)
    df.repartition(col("station_id"), col("lead_hours"))
      .withColumn("bias_7d", avg(col("residual_f")).over(trailing(7)))
      .withColumn("bias_14d", avg(col("residual_f")).over(trailing(14)))
      .withColumn("bias_30d", avg(col("residual_f")).over(trailing(30)))
      .withColumn("rmse_14d", sqrt(avg(col("residual_f") * col("residual_f")).over(trailing(14))))
      .withColumn("rmse_30d", sqrt(avg(col("residual_f") * col("residual_f")).over(trailing(30))))
      .withColumn("sigma_lead",
        stddev_samp(col("residual_f")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
  }

  /** W4: per-station lag-1 of observed Tmax (persistence feature,
    * eval/data.py:230-236). */
  def lagFeature(df: DataFrame, orderCol: String = "target_date_local"): DataFrame = {
    val w = Window.partitionBy("station_id").orderBy(orderCol)
    df.withColumn("tmax_actual_f_lag1", lag(col("tmax_actual_f"), 1).over(w))
  }

  /** Full train-table build (§3 stage 4). */
  def buildTrainTable(forecast: DataFrame, truth: DataFrame, minCoverageHours: Int = 18): DataFrame = {
    val joined = joinForecastTruth(forecast, truth, minCoverageHours)
    rollingFeatures(seasonalEncodings(joined))
      .select("station_id", "issue_time_utc", "target_date_local", "tmax_pred_f",
        "lead_hours", "forecast_source", "sin_doy", "cos_doy", "month",
        "tmax_actual_f", "truth_qc_flags", "coverage_hours", "residual_f",
        "bias_7d", "bias_14d", "bias_30d", "rmse_14d", "rmse_30d", "sigma_lead")
  }
}

package graft.eval

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Forecast metrics — one aggregation pass each.
  * Mirrors eval/metrics.py:108-236 (A4–A6) and eval/slicing.py (A9).
  *
  * std_error is population std (np.std ddof=0, metrics.py:136) — vs the
  * sample std used for sigma_lead; both mapped explicitly.
  */
object Metrics {

  final case class ForecastMetrics(
      n: Long, mae: Double, rmse: Double, bias: Double, stdError: Double, r2: Double)

  /** A4: n, MAE, RMSE, bias, std(e), R². Rounded to 4 decimals as the
    * reference does (metrics.py:42-49). */
  def forecastMetrics(df: DataFrame, yTrue: String = "y_true_f", yPred: String = "y_pred_f"): ForecastMetrics = {
    val e = col(yPred) - col(yTrue)
    val row = df.agg(
      count(lit(1)).as("n"),
      avg(abs(e)).as("mae"),
      sqrt(avg(e * e)).as("rmse"),
      avg(e).as("bias"),
      stddev_pop(e).as("std"),
      // try_divide: R² undefined (→ NaN) for constant truth — a tiny or
      // degenerate test split must not crash the run under ANSI mode
      (lit(1.0) - try_divide(avg(e * e), var_pop(col(yTrue)))).as("r2")).collect()(0)
    def r(i: Int) =
      if (row.isNullAt(i)) Double.NaN
      else BigDecimal(row.getDouble(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    ForecastMetrics(row.getLong(0), r(1), r(2), r(3), r(4), r(5))
  }

  /** z-scores for central-interval levels 50/80/90% — compile-time
    * constants at full double precision (the reference computes them via
    * scipy norm.ppf, metrics.py:173-187; rounded constants shift the
    * coverage threshold by ~1e-5·σ, enough to flip a borderline row). */
  val ZScores: Map[Int, Double] = Map(
    50 -> 0.6744897501960817, 80 -> 1.2815515655446004, 90 -> 1.6448536269514722)

  /** A5: interval coverage (fraction of |y−μ| ≤ z·σ) and sharpness
    * (mean interval width 2zσ) per level. */
  def calibrationMetrics(
      df: DataFrame,
      yTrue: String = "y_true_f", yPred: String = "y_pred_f", sigma: String = "y_pred_sigma_f")
      : Map[String, Double] = {
    val e = abs(col(yTrue) - col(yPred))
    val aggs = ZScores.toSeq.sortBy(_._1).flatMap { case (lvl, z) =>
      Seq(
        avg(when(e <= lit(z) * col(sigma), 1.0).otherwise(0.0)).as(s"coverage_$lvl"),
        avg(lit(2.0 * z) * col(sigma)).as(s"sharpness_$lvl"))
    } :+ avg(col(sigma)).as("mean_sigma") // metrics.py:193
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
      f -> BigDecimal(row.getDouble(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  /** A6: pinball loss per quantile column (metrics.py:200-236). */
  def pinballLoss(df: DataFrame, yTrue: String, quantilePreds: Map[Double, String]): Map[Double, Double] = {
    val aggs = quantilePreds.toSeq.sortBy(_._1).map { case (q, c) =>
      val e = col(yTrue) - col(c)
      avg(when(e >= 0, lit(q) * e).otherwise(lit(q - 1) * e)).as(s"pinball_$q")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    quantilePreds.keys.toSeq.sorted.zipWithIndex.map { case (q, i) =>
      q -> BigDecimal(row.getDouble(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  /** A9: sliced metric fan-out — ONE shuffle via GROUPING SETS over
    * precomputed slice labels instead of the reference's per-dimension
    * loops (eval/slicing.py:22-168). Slices under minCount are dropped. */
  def metricsBySlices(
      df: DataFrame,
      sliceCols: Seq[String],
      yTrue: String = "y_true_f", yPred: String = "y_pred_f",
      minCount: Int = 10): DataFrame = {
    val e = col(yPred) - col(yTrue)
    val labeled = df.withColumn("__e", e)
    labeled.createOrReplaceTempView("__slices_in")
    val sets = sliceCols.map(c => s"($c)").mkString(", ")
    val sliceSelect = sliceCols.map(c => s"coalesce(CAST($c AS STRING), 'ALL') AS $c").mkString(", ")
    labeled.sparkSession.sql(
      s"""SELECT $sliceSelect,
         |  count(*) AS n,
         |  round(avg(abs(__e)), 4) AS mae,
         |  round(sqrt(avg(__e * __e)), 4) AS rmse,
         |  round(avg(__e), 4) AS bias
         |FROM __slices_in
         |GROUP BY GROUPING SETS ($sets)
         |HAVING count(*) >= $minCount""".stripMargin)
  }

  /** E16: month → meteorological season (eval/slicing.py:87-95). */
  def seasonCol(monthCol: String): org.apache.spark.sql.Column = {
    val m = col(monthCol)
    when(m.isin(12, 1, 2), "DJF").when(m.isin(3, 4, 5), "MAM")
      .when(m.isin(6, 7, 8), "JJA").otherwise("SON")
  }

  /** A8: temperature regimes from exact quartiles at eval scale
    * (slicing.py:146); approx at production scale. */
  def temperatureRegimes(df: DataFrame, yTrue: String, approx: Boolean = false): (Double, Double) = {
    if (approx) {
      val q = df.stat.approxQuantile(yTrue, Array(0.25, 0.75), 1e-4)
      (q(0), q(1))
    } else {
      val row = df.agg(
        expr(s"percentile($yTrue, 0.25)").as("p25"),
        expr(s"percentile($yTrue, 0.75)").as("p75")).collect()(0)
      (row.getDouble(0), row.getDouble(1))
    }
  }
}

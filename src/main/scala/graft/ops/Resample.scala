package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar resampling: project a sparse per-key daily series onto the
  * dense day spine spanned by each key and fill the gaps.
  *
  * Shape: the spine is `sequence(min_day, max_day)` per key exploded
  * map-side from a 1-row-per-key aggregate — O(keys × span-days) rows
  * regardless of observation count; the observations left-join on; the
  * carries are last-before/first-after IGNORE NULLS window passes that
  * share ONE (key) partition spec (one exchange, one WindowExec with
  * both frame directions). Interpolation is row-local arithmetic on
  * the carried (day, value) pairs. At 100 TB of observations the spine
  * is the SMALL side of this plan.
  */
object Resample {

  /** Linear interpolation between the nearest observations; edges clamp
    * to the single available neighbor. Input: one row per (key, day)
    * observation. Output: one row per (key, spine day) with `filled`
    * (null only for keys with zero observations) and `observed`.
    *
    * @param spine optional dense (key, day) frame; derived from the
    *              observations' per-key [min, max] span when None —
    *              pass one to resample onto a fixed calendar instead
    */
  def dailyLinear(
      obs: DataFrame,
      keyCol: String, dayCol: String, valueCol: String,
      spine: Option[DataFrame] = None): DataFrame = {
    val k = col(keyCol); val day = col(dayCol)
    val grid = spine.getOrElse(
      obs.groupBy(k)
        .agg(min(day).as("__d0"), max(day).as("__d1"))
        .select(k, explode(sequence(col("__d0"), col("__d1"),
          expr("interval 1 day"))).as(dayCol)))
    val wAll = Window.partitionBy(k).orderBy(day)
    val wPrev = wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = wAll.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col("__v")
    // all four carries in ONE select: same-direction pairs collapse
    // into a shared WindowExec, and every pass reuses the single
    // (key)-sort — the observation marker is pre-projected so no
    // Project lands between the window operators
    grid.join(obs.select(k, day, col(valueCol).as("__v")),
        Seq(keyCol, dayCol), "left_outer")
      .withColumn("__od", when(v.isNotNull, day))
      .select(k, day, v,
        last(v, ignoreNulls = true).over(wPrev).as("__pv"),
        last(col("__od"), ignoreNulls = true).over(wPrev).as("__pd"),
        first(v, ignoreNulls = true).over(wNext).as("__nv"),
        first(col("__od"), ignoreNulls = true).over(wNext).as("__nd"))
      .withColumn("filled",
        when(v.isNotNull, v)
          .when(col("__pv").isNull, col("__nv"))
          .when(col("__nv").isNull, col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            datediff(day, col("__pd")) / datediff(col("__nd"), col("__pd"))))
      .withColumn("observed", v.isNotNull)
      .select(k, day, col("filled"), col("observed"))
  }

  /** Step (forward-fill) variant: carry the last observation forward;
    * days before a key's first observation stay null. */
  def dailyFfill(
      obs: DataFrame,
      keyCol: String, dayCol: String, valueCol: String,
      spine: Option[DataFrame] = None): DataFrame = {
    val k = col(keyCol); val day = col(dayCol)
    val grid = spine.getOrElse(
      obs.groupBy(k)
        .agg(min(day).as("__d0"), max(day).as("__d1"))
        .select(k, explode(sequence(col("__d0"), col("__d1"),
          expr("interval 1 day"))).as(dayCol)))
    val wPrev = Window.partitionBy(k).orderBy(day)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col("__v")
    grid.join(obs.select(k, day, col(valueCol).as("__v")),
        Seq(keyCol, dayCol), "left_outer")
      .withColumn("filled", last(v, ignoreNulls = true).over(wPrev))
      .withColumn("observed", v.isNotNull)
      .select(k, day, col("filled"), col("observed"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group statistics — winsorization and MAD-based outlier
  * scoring — with an exact/approx percentile switch.
  *
  * `exact = true` spells percentiles as `percentile` (linear
  * interpolation — value-level parity with DuckDB `quantile_cont`,
  * which the a16/a17 oracle entries pin). Its aggregation buffer holds
  * EVERY value of a group: fine at eval scale, an executor-OOM hazard
  * when a 100 TB fact has a handful of groups. `exact = false` spells
  * them as `percentile_approx` (Greenwald–Khanna sketch: fixed memory,
  * rank error ≤ 1/accuracy) — the production spelling, registered as
  * the `a16b`/`a17b` query twins and drift-bounded by RobustStatsSpec.
  *
  * Either way the fact side stays map-side: the per-group stats tables
  * are tiny and broadcast; the final summary is a hash aggregate with
  * partial combine.
  */
object RobustStats {

  private def pct(value: String, p: Double, exact: Boolean, accuracy: Int) =
    if (exact) expr(s"percentile($value, $p)")
    else expr(s"percentile_approx($value, $p, $accuracy)")

  /** A16: clip `valueCol` to its group's [lo, hi] percentile band and
    * summarize the clip's effect per group. */
  def winsorizeSummary(ev: DataFrame, groupCol: String, valueCol: String,
      lo: Double = 0.05, hi: Double = 0.95,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val stats = ev.groupBy(g).agg(
      pct(valueCol, lo, exact, accuracy).as("p_lo"),
      pct(valueCol, hi, exact, accuracy).as("p_hi"))
    ev.join(broadcast(stats), groupCol)
      .select(g, v,
        when(v < col("p_lo"), col("p_lo"))
          .when(v > col("p_hi"), col("p_hi"))
          .otherwise(v).as("clipped"),
        (v < col("p_lo") || v > col("p_hi")).cast("long").as("was_clipped"))
      .groupBy(g)
      .agg(
        count(lit(1)).as("n"),
        sum(col("was_clipped")).cast("long").as("n_clipped"),
        // hash-compared means are spelled as DECIMAL-cast sums divided
        // once by the NON-NULL count (avg semantics), display-rounded
        // via the floor recipe — round(avg(..),4) is a summation-order-
        // dependent double through Spark's shortest-repr round and can
        // flip at a …5000 boundary
        graft.core.Parity.floorRound4(
          sum(v.cast("decimal(28,10)")).cast("double") / count(v)).as("raw_mean"),
        graft.core.Parity.floorRound4(
          sum(col("clipped").cast("decimal(28,10)")).cast("double")
            / count(col("clipped"))).as("winsor_mean"),
        graft.core.Parity.floorRound4(min(col("clipped"))).as("lo"),
        graft.core.Parity.floorRound4(max(col("clipped"))).as("hi"))
      .orderBy(g)
  }

  /** A17: Iglewicz–Hoaglin robust z-score (0.6745·(x − median)/MAD,
    * |z| > threshold flags an outlier).
    *
    * MAD = 0 (at least half a group's values equal its median) makes
    * the z-score undefined: those rows get NULL rz and count as
    * non-outliers; a fully degenerate group reports n_outliers = 0 and
    * NULL max_abs_rz. The DuckDB oracle mirrors this with
    * `nullif(mad, 0)` — without the guard Spark's non-ANSI double
    * divide yields NULL while DuckDB yields ±inf and the two sides
    * silently diverge. Pinned in RobustStatsSpec. */
  def robustZscoreSummary(ev: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 3.5,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val med = ev.groupBy(g).agg(pct(valueCol, 0.5, exact, accuracy).as("med"))
    val mad = ev.join(broadcast(med), groupCol)
      .select(g, abs(v - col("med")).as("__ad"))
      .groupBy(g)
      .agg(pct("__ad", 0.5, exact, accuracy).as("mad"))
    ev.join(broadcast(med), groupCol)
      .join(broadcast(mad), groupCol)
      .select(g,
        when(col("mad") =!= 0.0,
          lit(0.6745) * (v - col("med")) / col("mad")).as("rz"))
      .groupBy(g)
      .agg(
        count(lit(1)).as("n"),
        sum(when(abs(col("rz")) > threshold, 1L).otherwise(0L)).cast("long").as("n_outliers"),
        round(max(abs(col("rz"))), 4).as("max_abs_rz"))
      .orderBy(g)
  }
}

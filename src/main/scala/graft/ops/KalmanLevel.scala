package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Per-key local-level Kalman filter — the adaptive-gain sibling of
  * [[Ewma]]/[[HoltLinear]]: the filter TELLS you how much to trust each
  * observation instead of taking a fixed α on faith.
  *
  * Model: levelₜ = levelₜ₋₁ + wₜ (w ~ N(0, q)), yₜ = levelₜ + vₜ
  * (v ~ N(0, r)). Recursion per observation:
  *
  *   p⁻ = p + q;  k = p⁻ / (p⁻ + r);  x ← x + k·(y − x);  p ← (1−k)·p⁻
  *
  * Init on a key's first non-null value: x = y, p = r, gain 1 (the
  * first observation is taken verbatim under an obs-noise-sized prior).
  * Null values pass through with null outputs and leave state untouched
  * (the Ewma ignore-nulls contract).
  *
  * Scale shape: same as [[HoltLinear.perKey]] — ONE hash exchange on
  * the key, one local sort, a forward pass holding (x, p) per key run.
  * Giant single keys: the VARIANCE recursion is data-independent (p
  * never reads y) and converges geometrically to the steady state
  * p∞ = (q + √(q² + 4qr))/2 − q·…, i.e. the gain sequence kₜ → k∞
  * within a few dozen steps; past convergence the filter IS a
  * constant-α EWMA with α = k∞, so the [[Ewma.perKeyBlocked]]
  * decomposition applies to the tail verbatim — run the exact
  * recursion for the head of each key (bounded steps) and the blocked
  * EWMA beyond. The per-key spelling here is the exact filter.
  */
object KalmanLevel {

  /** @param orderCols total per-key order (include a unique tiebreak)
    * @param q process-noise variance (level drift per step), ≥ 0
    * @param r observation-noise variance, > 0 */
  def perKey(
      df: DataFrame, key: String, orderCols: Seq[String], valueCol: String,
      q: Double, r: Double,
      outLevel: String = "level", outGain: String = "gain",
      outVar: String = "variance"): DataFrame = {
    require(q >= 0.0, s"process noise q must be >= 0, got $q")
    require(r > 0.0, s"observation noise r must be > 0, got $r")
    require(orderCols.nonEmpty, "need at least one order column")
    val missing = (key +: valueCol +: orderCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")

    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(outLevel, DoubleType, nullable = true),
      StructField(outGain, DoubleType, nullable = true),
      StructField(outVar, DoubleType, nullable = true)))
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(valueCol)
    val clustered = df
      .repartition(col(key))
      .sortWithinPartitions((key +: orderCols).map(col): _*)
    // .rdd boundary keeps the sort terminal (the Ewma/HoltLinear lesson:
    // EliminateSorts would drop sortWithinPartitions under an object
    // consumer)
    val folded = clustered.rdd.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var stStarted = false
      var x = 0.0
      var p = 0.0
      rows.map { row =>
        val k = row.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k; started = true; stStarted = false; x = 0.0; p = 0.0
        }
        val (lv, gv, pv) =
          if (row.isNullAt(valIdx)) (null, null, null)
          else {
            val y = row.getAs[Number](valIdx).doubleValue()
            val gain =
              if (!stStarted) { stStarted = true; x = y; p = r; 1.0 }
              else {
                // spelled exactly as the oracle's recursive CTE
                val pPred = p + q
                val kg = pPred / (pPred + r)
                x = x + kg * (y - x)
                p = (1 - kg) * pPred
                kg
              }
            (java.lang.Double.valueOf(x), java.lang.Double.valueOf(gain),
              java.lang.Double.valueOf(p))
          }
        Row.fromSeq(row.toSeq :+ lv :+ gv :+ pv)
      }
    }
    df.sparkSession.createDataFrame(folded, outSchema)
  }
}

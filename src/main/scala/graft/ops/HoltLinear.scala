package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Per-key Holt double exponential smoothing (level + linear trend):
  *
  *   l_0 = y_0, b_0 = 0
  *   l_i = α·y_i + (1−α)·(l_{i−1} + b_{i−1})
  *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}
  *
  * The 2-STATE generalization of [[Ewma.perKey]]: a coupled linear
  * recurrence with no window spelling (CUSUM's reset-at-zero admits a
  * prefix-min trick, EWMA's scalar decay a power-weighted sum — a
  * coupled vector recurrence admits neither), so SURVEY's escape hatch
  * (d) applies: ONE hash exchange on the key, ONE local sort (the same
  * cost as any window over that spec), then a forward pass holding two
  * doubles of state per key run.
  *
  * Giant single keys: the recurrence is AFFINE in its carry state —
  * (l, b) ↦ M·(l, b) + c with M = [[1−α, 1−α], [−αβ, 1−β+β(1−α)]]
  * constant — and affine maps compose associatively, so the
  * [[Ewma.perKeyBlocked]] block decomposition generalizes verbatim:
  * per-block composed (M^k, Σ M^j c) summaries, a per-key carry
  * resolve over ≤ buckets summaries, one map to finish. Implemented
  * here only in the per-key spelling; the blocked variant changes the
  * carry algebra from scalar multiply to 2×2 matrix compose.
  *
  * Null values pass through with null level/trend and leave the state
  * untouched (the Ewma ignore-nulls contract).
  */
object HoltLinear {

  /** @param orderCols total per-key order (include a unique tiebreak) */
  def perKey(
      df: DataFrame, key: String, orderCols: Seq[String], valueCol: String,
      alpha: Double, beta: Double,
      outLevel: String = "level", outTrend: String = "trend"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1], got $beta")
    require(orderCols.nonEmpty, "need at least one order column")
    val missing = (key +: valueCol +: orderCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")

    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(outLevel, DoubleType, nullable = true),
      StructField(outTrend, DoubleType, nullable = true)))
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(valueCol)
    val clustered = df
      .repartition(col(key))
      .sortWithinPartitions((key +: orderCols).map(col): _*)
    // .rdd on purpose: Catalyst's EliminateSorts would delete the
    // sortWithinPartitions under an object consumer (the Ewma lesson);
    // the RDD boundary makes the sort terminal and order-preserving.
    val folded = clustered.rdd.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var stStarted = false // explicit, so NaN inputs poison, not restart
      var l = 0.0
      var b = 0.0
      rows.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k; started = true; stStarted = false; l = 0.0; b = 0.0
        }
        val (lv, bv) =
          if (r.isNullAt(valIdx)) (null, null)
          else {
            val y = r.getAs[Number](valIdx).doubleValue()
            if (!stStarted) { stStarted = true; l = y; b = 0.0 }
            else {
              // spelled exactly as the oracle's recursive CTE: the new
              // level expression is shared, then the trend reads it
              val lNew = alpha * y + (1 - alpha) * (l + b)
              val bNew = beta * (lNew - l) + (1 - beta) * b
              l = lNew; b = bNew
            }
            (java.lang.Double.valueOf(l), java.lang.Double.valueOf(b))
          }
        Row.fromSeq(r.toSeq :+ lv :+ bv)
      }
    }
    df.sparkSession.createDataFrame(folded, outSchema)
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, StructField, StructType}

/** Per-key EWMA control band — the classic streaming anomaly monitor
  * (the EWMA control chart): each observation is z-scored against the
  * exponentially-weighted MEAN and VARIANCE of its own history, then
  * folded in. Complements [[KalmanLevel]] (which tracks level but not
  * spread — it can say "the level moved", not "this point is 4σ out")
  * and [[CleanHourly]]'s spike rule (a fixed absolute threshold; the
  * control band adapts its threshold to each key's own volatility).
  *
  * Recursion per non-null observation, all state PRE-update when
  * scoring (an observation must never vouch for itself):
  *
  *   z = (y − m)/√v     (null until `warmup` observations seen and v > 0)
  *   anomaly = |z| > zThreshold  (false during warmup)
  *   δ = y − m;  m ← m + α·δ;  v ← (1−α)·(v + α·δ²)
  *
  * Init on a key's first value: m = y, v = 0. The v-recursion is the
  * standard EWMV (West 1979 incremental form): exact, one multiply-add
  * per row, no second pass.
  *
  * Scale shape — identical to [[KalmanLevel.perKey]]: ONE hash exchange
  * on the key, one local sort, a forward pass holding three doubles per
  * key run. The fold is spelled byte-for-byte as the streaming twin
  * ([[graft.streaming.Streams.ewmaAnomalyStream]]) and the oracle's
  * recursive CTE, so all three agree bit-for-bit (+,*,/ and IEEE-exact
  * sqrt only — no transcendentals).
  */
object EwmaAnomaly {

  /** @param orderCols total per-key order (include a unique tiebreak)
    * @param alpha smoothing weight in (0, 1]
    * @param zThreshold control-band half-width in σ units, > 0
    * @param warmup observations that must precede the first score, ≥ 1 */
  def perKey(
      df: DataFrame, key: String, orderCols: Seq[String], valueCol: String,
      alpha: Double, zThreshold: Double, warmup: Int,
      outLevel: String = "level", outZ: String = "z",
      outFlag: String = "is_anomaly"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(zThreshold > 0.0, s"zThreshold must be > 0, got $zThreshold")
    require(warmup >= 1, s"warmup must be >= 1, got $warmup")
    require(orderCols.nonEmpty, "need at least one order column")
    val missing = (key +: valueCol +: orderCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")

    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(outLevel, DoubleType, nullable = true),
      StructField(outZ, DoubleType, nullable = true),
      StructField(outFlag, BooleanType, nullable = true)))
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(valueCol)
    val clustered = df
      .repartition(col(key))
      .sortWithinPartitions((key +: orderCols).map(col): _*)
    // .rdd boundary keeps the sort terminal (the Ewma/HoltLinear lesson)
    val folded = clustered.rdd.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var n = 0L
      var m = 0.0
      var v = 0.0
      rows.map { row =>
        val k = row.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k; started = true; n = 0L; m = 0.0; v = 0.0
        }
        val (lv, zv, fv) =
          if (row.isNullAt(valIdx)) (null, null, null)
          else {
            val y = row.getAs[Number](valIdx).doubleValue()
            if (n == 0L) {
              n = 1L; m = y; v = 0.0
              (java.lang.Double.valueOf(m), null, java.lang.Boolean.valueOf(false))
            } else {
              val z =
                if (n >= warmup && v > 0.0) java.lang.Double.valueOf((y - m) / math.sqrt(v))
                else null
              val flag = java.lang.Boolean.valueOf(
                z != null && math.abs(z.doubleValue()) > zThreshold)
              val d = y - m
              m = m + alpha * d
              v = (1 - alpha) * (v + alpha * d * d)
              n += 1L
              (java.lang.Double.valueOf(m), z, flag)
            }
          }
        Row.fromSeq(row.toSeq :+ lv :+ zv :+ fv)
      }
    }
    df.sparkSession.createDataFrame(folded, outSchema)
  }
}

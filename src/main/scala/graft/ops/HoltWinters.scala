package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Per-key additive Holt–Winters — the SEASONAL member of the smoothing
  * family: [[Ewma]] tracks level, [[HoltLinear]] level+trend,
  * Holt–Winters adds a length-m seasonal profile, which is what daily
  * operational series actually need (weekly shape dominates most of
  * them). Three coupled recursions per observation (additive form,
  * S[0] always the slot m steps back):
  *
  *   ŷ  = L + B + S[0]                       (one-step forecast, PRE-update)
  *   L' = α(y − S[0]) + (1−α)(L + B)
  *   B' = β(L' − L) + (1−β)B
  *   S  ← rotate left, last slot = γ(y − L') + (1−γ)S[0]
  *
  * Seeding: the first m observations only buffer — L = their mean
  * (left-associated sum, spelled identically in the oracle), B = 0,
  * S[i] = yᵢ − L; emission starts at observation m+1. Warmup rows (and
  * keys shorter than m) emit nulls.
  *
  * Scale shape — the HoltLinear/KalmanLevel skeleton: ONE hash exchange
  * on the key, one local sort, a forward fold holding m+2 doubles per
  * key run. The coupled vector recursion admits no window spelling
  * (the w21 argument, now with an m-slot state); giant single keys
  * decompose per the HoltLinear blocked analysis — the step is affine
  * in (L, B, S), so per-block affine composition applies; the per-key
  * spelling here is the exact recursion. All arithmetic is +,*,/ on
  * doubles with dyadic coefficients, so the oracle's recursive CTE
  * reproduces it bit-for-bit.
  */
object HoltWinters {

  /** @param orderCols total per-key order (include a unique tiebreak)
    * @param m seasonal period, ≥ 2
    * @param alpha level weight, (0,1]; beta trend weight; gamma
    *              seasonal weight — use dyadic values for cross-engine
    *              bit parity */
  def perKey(
      df: DataFrame, key: String, orderCols: Seq[String], valueCol: String,
      m: Int, alpha: Double, beta: Double, gamma: Double,
      outForecast: String = "yhat", outLevel: String = "level",
      outTrend: String = "trend"): DataFrame = {
    require(m >= 2, s"seasonal period must be >= 2, got $m")
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    require(gamma >= 0 && gamma <= 1, s"gamma in [0,1], got $gamma")
    require(orderCols.nonEmpty, "need at least one order column")
    val missing = (key +: valueCol +: orderCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")

    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(outForecast, DoubleType, nullable = true),
      StructField(outLevel, DoubleType, nullable = true),
      StructField(outTrend, DoubleType, nullable = true)))
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(valueCol)
    val clustered = df
      .repartition(col(key))
      .sortWithinPartitions((key +: orderCols).map(col): _*)
    // .rdd boundary keeps the sort terminal (the Ewma/HoltLinear lesson)
    val folded = clustered.rdd.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var buf: scala.collection.mutable.ArrayBuffer[Double] = null
      var seeded = false
      var l = 0.0
      var b = 0.0
      var sea: Array[Double] = null
      var idx = 0
      rows.map { row =>
        val k = row.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k; started = true; seeded = false
          buf = scala.collection.mutable.ArrayBuffer.empty[Double]
        }
        val (fv, lv, bv) =
          if (row.isNullAt(valIdx)) (null, null, null)
          else {
            val y = row.getAs[Number](valIdx).doubleValue()
            if (!seeded) {
              buf += y
              if (buf.length == m) {
                // left-associated mean, spelled identically in the oracle
                var acc = 0.0
                var i = 0
                while (i < m) { acc += buf(i); i += 1 }
                l = acc / m
                b = 0.0
                sea = Array.tabulate(m)(j => buf(j) - l)
                idx = 0
                seeded = true
              }
              (null, null, null)
            } else {
              val sTm = sea(idx)
              val yhat = l + b + sTm
              val lNew = alpha * (y - sTm) + (1 - alpha) * (l + b)
              val bNew = beta * (lNew - l) + (1 - beta) * b
              sea(idx) = gamma * (y - lNew) + (1 - gamma) * sTm
              idx = (idx + 1) % m
              l = lNew; b = bNew
              (java.lang.Double.valueOf(yhat), java.lang.Double.valueOf(l),
                java.lang.Double.valueOf(b))
            }
          }
        Row.fromSeq(row.toSeq :+ fv :+ lv :+ bv)
      }
    }
    df.sparkSession.createDataFrame(folded, outSchema)
  }
}

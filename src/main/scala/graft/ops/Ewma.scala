package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Per-key exponentially-weighted moving average — the recursive
  * smoother (pandas `ewm(alpha).mean()` with `adjust=false`):
  *
  *   y_0 = x_0;  y_i = α·x_i + (1−α)·y_{i−1}
  *
  * A linear recurrence has no native DataFrame spelling: a window sum
  * can't weight by distance, and unrolling to lag() terms explodes
  * codegen. This is the one shape where SURVEY's escape hatch (d) —
  * `mapPartitions` over key-clustered, locally-sorted partitions — is
  * the genuinely right plan: ONE hash exchange on the key, ONE local
  * sort (exactly what a window over the same spec would cost), then a
  * single forward pass holding one double of state per key run. No
  * driver involvement, no state beyond the current accumulator, keys
  * never split across partitions — at 100 TB this is a shuffle + linear
  * scan, the same cost as any per-key window aggregate.
  *
  * Null values pass through as null EWMA and leave the accumulator
  * untouched (pandas ignore-nulls semantics).
  */
object Ewma {

  /** @param orderCols total per-key order (include a unique tiebreak)
    * @param out       appended double column with the running EWMA
    */
  def perKey(
      df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String, alpha: Double, out: String = "ewma"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(orderCols.nonEmpty, "need at least one order column")
    val missing = (key +: valueCol +: orderCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(",")}")

    val outSchema = StructType(df.schema.fields :+ StructField(out, DoubleType, nullable = true))
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(valueCol)
    val clustered = df
      .repartition(col(key))
      .sortWithinPartitions((key +: orderCols).map(col): _*)
    // The fold crosses an RDD boundary ON PURPOSE: Catalyst's
    // EliminateSorts treats an object consumer (Dataset.mapPartitions)
    // as order-agnostic and deletes the sortWithinPartitions right out
    // from under it — silently wrong results on any unsorted input.
    // Taking .rdd makes the sort the terminal operator of its plan, so
    // it cannot be eliminated, and RDD mapPartitions preserves the
    // partition-local order the fold depends on. EwmaSpec pins this
    // with adversarially shuffled input.
    val folded = clustered.rdd.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var acc = 0.0
      rows.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) { curKey = k; started = true; acc = Double.NaN }
        val vs = if (r.isNullAt(valIdx)) null
        else {
          val x = r.getAs[Number](valIdx).doubleValue()
          acc = if (acc.isNaN) x else alpha * x + (1 - alpha) * acc
          java.lang.Double.valueOf(acc)
        }
        Row.fromSeq(r.toSeq :+ vs)
      }
    }
    df.sparkSession.createDataFrame(folded, outSchema)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-ordered splits — never shuffled, so no leakage
  * (eval/splits.py:38-157).
  *
  * Two implementations:
  *  - positional: exact reference parity (row_number over a global time
  *    order). A global window is fine at evaluation scale (the table
  *    that gets split is the joined train table, not raw observations).
  *  - byTimeQuantile: the 100 TB path — thresholds on approximate time
  *    quantiles; no global sort, one pass, each row labeled
  *    independently. Use when the split fractions matter more than
  *    exact row counts.
  */
object Splits {

  final case class SplitFractions(train: Double = 0.7, validation: Double = 0.15) {
    require(train > 0 && validation >= 0 && train + validation < 1.0)
  }

  /** O3: static 70/15/15 positional split; adds a `split` column with
    * values train/val/test. Deterministic via (time, tiebreak) order. */
  def positional(df: DataFrame, timeCol: String, tiebreak: String,
      f: SplitFractions = SplitFractions()): DataFrame = {
    val w = Window.orderBy(col(timeCol), col(tiebreak))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("split",
        when(col("__rn") <= floor(col("__n") * f.train), "train")
          .when(col("__rn") <= floor(col("__n") * (f.train + f.validation)), "val")
          .otherwise("test"))
      .drop("__rn", "__n")
  }

  /** Scale path: label by time thresholds from approx quantiles —
    * single pass, no global window. */
  def byTimeQuantile(df: DataFrame, timeCol: String,
      f: SplitFractions = SplitFractions(), relErr: Double = 1e-4): DataFrame = {
    val qs = df
      .select(unix_timestamp(col(timeCol)).cast("double").as("__t"))
      .stat.approxQuantile("__t", Array(f.train, f.train + f.validation), relErr)
    val (tTrain, tVal) = (qs(0), qs(1))
    df.withColumn("split",
      when(unix_timestamp(col(timeCol)) <= tTrain, "train")
        .when(unix_timestamp(col(timeCol)) <= tVal, "val")
        .otherwise("test"))
  }

  /** O4: walk-forward folds — (train, test) frames per fold.
    * step = test size; window = trailing train size (or expanding when
    * None). Mirrors eval/splits.py:79-157. */
  def walkForward(
      df: DataFrame, timeCol: String, tiebreak: String,
      windowSize: Option[Int], stepSize: Int, nFolds: Int): Seq[(DataFrame, DataFrame)] = {
    val w = Window.orderBy(col(timeCol), col(tiebreak))
    val pos = df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
    (0 until nFolds).map { k =>
      // fold k (counting back from the end): test = rows
      // (n - (k+1)*step, n - k*step]; train = the preceding window.
      val testEnd = col("__n") - lit(k * stepSize)
      val testStart = col("__n") - lit((k + 1) * stepSize)
      val trainStart = windowSize match {
        case Some(ws) => testStart - lit(ws)
        case None     => lit(0)
      }
      val train = pos.filter(col("__rn") > trainStart && col("__rn") <= testStart)
        .drop("__rn", "__n")
      val test = pos.filter(col("__rn") > testStart && col("__rn") <= testEnd)
        .drop("__rn", "__n")
      (train, test)
    }
  }
}

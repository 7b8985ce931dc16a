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

  /** Scale path with EXACT positional parity: label by thresholds at
    * the positional boundary RANKS (floor(n·train), floor(n·(train+
    * val))) of a numeric order expression — no global window, no
    * global sort, each row labels itself map-side against two literal
    * thresholds. When `orderCol` is ties-free (make it so: pack a
    * tiebreak into the low bits), `split` equals [[positional]]'s
    * exactly, row for row — the spelling that replaces the registry's
    * one remaining single-reducer window at scale.
    *
    * Rank → probability uses (r − 0.5)/n, not r/n: the quantile sketch
    * ceils p·n to a target rank, and r/n in binary can land a hair
    * above r/n so the ceil overshoots to r+1 (same trap as
    * [[walkForwardLabelsByTime]]); backing off half a rank lands on r
    * for every r ≥ 1. relErr·n must stay below 0.5 for the rank to be
    * exact — the default covers n up to 5·10⁶ per mille of error
    * budget; tighten relErr when n grows. */
  def byOrderQuantile(df: DataFrame, orderCol: org.apache.spark.sql.Column,
      f: SplitFractions = SplitFractions(), relErr: Double = 1e-7,
      knownCount: Option[Long] = None): DataFrame = {
    val tagged = df.withColumn("__o", orderCol.cast("double"))
    val n = knownCount.getOrElse(tagged.count())
    require(n > 0, "byOrderQuantile needs a non-empty frame")
    val ranks = Seq(
      math.floor(n * f.train).toLong,
      math.floor(n * (f.train + f.validation)).toLong)
    // rank 0 (a fraction below 1/n) means an empty bucket: -inf threshold
    val probed = ranks.filter(_ >= 1)
    val qs = if (probed.isEmpty) Array.empty[Double]
      else tagged.stat.approxQuantile("__o", probed.map(r => (r - 0.5) / n).toArray, relErr)
    val thr = ranks.map(r =>
      if (r >= 1) qs(probed.indexOf(r)) else Double.NegativeInfinity)
    tagged
      .withColumn("split",
        when(col("__o") <= thr(0), "train")
          .when(col("__o") <= thr(1), "val")
          .otherwise("test"))
      .drop("__o")
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

  /** O4 as one labeled frame: every row that belongs to fold k gets a
    * (fold, role ∈ train|test) row — rows in several folds appear once
    * per fold. Dispatches on size: positional (exact row counts, global
    * window, adds `rn`) up to `scaleRows`; above that, fold boundaries
    * come from approximate time quantiles and every row is labeled
    * MAP-SIDE against literal thresholds — no global window anywhere in
    * the plan (pinned in SplitsSpec). With unique timestamps and a
    * tight relErr the two paths produce identical folds. */
  def walkForwardLabels(df: DataFrame, timeCol: String, tiebreak: String,
      windowSize: Option[Int], stepSize: Int, nFolds: Int,
      scaleRows: Long = 10000000L, relErr: Double = 1e-6): DataFrame = {
    val total = df.count()
    if (total <= scaleRows)
      walkForwardLabelsPositional(df, timeCol, tiebreak, windowSize, stepSize, nFolds)
    else
      walkForwardLabelsByTime(df, timeCol, windowSize, stepSize, nFolds, total, relErr)
  }

  /** Exact spelling: one global row_number window (evaluation-table
    * scale), folds via a broadcast cross join on the tiny fold list —
    * single lineage, no per-fold union. */
  def walkForwardLabelsPositional(df: DataFrame, timeCol: String,
      tiebreak: String, windowSize: Option[Int], stepSize: Int,
      nFolds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.orderBy(col(timeCol), col(tiebreak))
    val pos = df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
    val folds = broadcast((0 until nFolds).map(_.toLong).toDF("fold"))
    val testEnd = col("__n") - col("fold") * stepSize
    val testStart = testEnd - stepSize
    val trainStart = windowSize match {
      case Some(ws) => testStart - ws
      case None     => lit(0L)
    }
    pos.crossJoin(folds)
      .filter(col("rn") > trainStart && col("rn") <= testEnd)
      .withColumn("role", when(col("rn") <= testStart, "train").otherwise("test"))
      .drop("__n")
  }

  /** Scale spelling: fold boundaries = time values at the positional
    * boundary ranks (one approxQuantile pass over the time column);
    * rows label themselves against the broadcast threshold list. Ties
    * on the time column fall entirely on one side of a boundary. */
  def walkForwardLabelsByTime(df: DataFrame, timeCol: String,
      windowSize: Option[Int], stepSize: Int, nFolds: Int,
      total: Long, relErr: Double = 1e-4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(total > 0, "walkForwardLabelsByTime needs a non-empty frame")
    val timed = df.withColumn("__t", unix_timestamp(col(timeCol)).cast("double"))
    // boundary ranks per fold: (trainStart, testStart, testEnd]
    val ranks = (0 until nFolds).map { k =>
      val testEnd = total - k.toLong * stepSize
      val testStart = testEnd - stepSize
      val trainStart = windowSize.map(ws => testStart - ws).getOrElse(0L)
      (k.toLong, trainStart, testStart, testEnd)
    }
    val posRanks = ranks.flatMap { case (_, a, b, c) => Seq(a, b, c) }
      .filter(r => r > 0 && r <= total).distinct.sorted
    // probability targets (r − 0.5)/n, not r/n: the sketch ceils p·n to
    // a target rank, and r/n in binary can land a hair ABOVE r/n so
    // p·n = r + ulp ceils to r+1 (observed: n=60, r=31 → rank 32).
    // Backing off half a rank makes the ceil land on r for every r ≥ 1.
    val qs = timed.stat.approxQuantile("__t",
      posRanks.map(r => (r - 0.5) / total).toArray, relErr)
    val thr: Map[Long, Double] =
      posRanks.zip(qs).toMap.withDefaultValue(Double.NegativeInfinity)
    val bounds = broadcast(ranks
      .map { case (k, a, b, c) => (k, thr(a), thr(b), thr(c)) }
      .toDF("fold", "__t_train", "__t_test_start", "__t_test_end"))
    timed.crossJoin(bounds)
      .filter(col("__t") > col("__t_train") && col("__t") <= col("__t_test_end"))
      .withColumn("role",
        when(col("__t") <= col("__t_test_start"), "train").otherwise("test"))
      .drop("__t", "__t_train", "__t_test_start", "__t_test_end")
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

package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecaster protocol: fit on a train DataFrame → a prediction Column
  * (applied via select on any compatible frame). Fitted parameters are
  * tiny driver-side values broadcast into the expression — the Spark
  * shape of the reference's fit/predict protocol (eval/models.py:24-48).
  */
trait Forecaster {
  def name: String
  def fit(train: DataFrame): Unit
  /** Prediction expression over the feature columns. */
  def predictMu: Column
  /** Frame-level prediction: attach `out` = ŷ. Expression-backed models
    * inherit this default; models whose prediction is a whole-frame
    * transform (kNN's neighbor join, GBT's spark.ml transform) override
    * it — the runner only ever calls withMu, so every model type flows
    * through the same evaluate path (create_forecaster parity,
    * eval/models.py:262-290). */
  def withMu(df: DataFrame, out: String = "y_pred_f"): DataFrame =
    df.withColumn(out, predictMu)
}

/** M1: ŷ = tmax_pred_f (models.py:51-79). */
final class Passthrough(predCol: String = "tmax_pred_f") extends Forecaster {
  val name = "Passthrough"
  def fit(train: DataFrame): Unit = ()
  def predictMu: Column = col(predCol)
}

/** M2: ridge regression by exact closed-form normal equations on
  * centered features: w = (X̃ᵀX̃ + αI)⁻¹ X̃ᵀỹ, intercept unpenalized —
  * matching sklearn's objective ‖y−Xw−b‖² + α‖w‖² (models.py:82-174).
  * NaN features are zero-filled before fitting and at predict time
  * (handle_missing="fill_zero").
  *
  * The Gram matrix is (k×k) for k features (k=5 in the reference) —
  * computed in ONE aggregation pass (k(k+1)/2 + 2k sums), solved on the
  * driver with Gaussian elimination, then broadcast back as a literal
  * expression. Exact, deterministic, no MLlib iteration.
  */
final class Ridge(features: Seq[String], label: String, alpha: Double = 1.0) extends Forecaster {
  val name = s"Ridge(alpha=$alpha)"
  private var coefs: Array[Double] = _ // length k
  private var intercept: Double = Double.NaN
  def fittedCoefs: (Array[Double], Double) = (coefs, intercept)

  def fit(train: DataFrame): Unit = {
    val k = features.size
    val x = features.map(f => coalesce(col(f).cast("double"), lit(0.0)))
    val y = col(label).cast("double")
    // single pass: means, centered cross-products via covar_pop
    val aggs =
      Seq(count(lit(1)).cast("double").as("n"), avg(y).as("ybar")) ++
        x.zipWithIndex.map { case (c, i) => avg(c).as(s"xbar_$i") } ++
        x.zipWithIndex.map { case (c, i) => covar_pop(c, y).as(s"sxy_$i") } ++
        (for (i <- 0 until k; j <- i until k)
          yield covar_pop(x(i), x(j)).as(s"sxx_${i}_$j"))
    val row = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getDouble(0)
    val ybar = row.getDouble(1)
    val xbar = Array.tabulate(k)(i => row.getDouble(2 + i))
    val sxy = Array.tabulate(k)(i => row.getDouble(2 + k + i) * n)
    val a = Array.ofDim[Double](k, k)
    var idx = 2 + 2 * k
    for (i <- 0 until k; j <- i until k) {
      val v = row.getDouble(idx) * n
      a(i)(j) = v; a(j)(i) = v
      idx += 1
    }
    for (i <- 0 until k) a(i)(i) += alpha
    coefs = solve(a, sxy)
    intercept = ybar - (0 until k).map(i => coefs(i) * xbar(i)).sum
  }

  /** Gaussian elimination with partial pivoting (k ≤ ~10). */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val k = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (p <- 0 until k) {
      val piv = (p until k).maxBy(i => math.abs(a(i)(p)))
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      val tb = b(p); b(p) = b(piv); b(piv) = tb
      for (i <- p + 1 until k) {
        val f = a(i)(p) / a(p)(p)
        for (j <- p until k) a(i)(j) -= f * a(p)(j)
        b(i) -= f * b(p)
      }
    }
    val x = new Array[Double](k)
    for (i <- k - 1 to 0 by -1) {
      x(i) = (b(i) - (i + 1 until k).map(j => a(i)(j) * x(j)).sum) / a(i)(i)
    }
    x
  }

  def predictMu: Column =
    features.zip(coefs).map { case (f, w) =>
      coalesce(col(f).cast("double"), lit(0.0)) * lit(w)
    }.reduce(_ + _) + lit(intercept)
}

/** M3: persistence — ŷ = lag-1 observed value, zero-filled
  * (models.py:293-335; lag from eval/data.py:230-236). */
final class Persistence(lagCol: String = "tmax_actual_f_lag1") extends Forecaster {
  val name = "Persistence"
  def fit(train: DataFrame): Unit = ()
  def predictMu: Column = coalesce(col(lagCol).cast("double"), lit(0.0))
}

/** M4: kNN regressor (models.py:338-380): Euclidean distance over
  * zero-filled features, mean label of the k nearest train rows.
  *
  * Distributed shape: the train matrix is collected (it is the model —
  * small by the protocol) and broadcast; scoring is a broadcast
  * crossJoin + per-row top-k via window — no driver-side loop over test
  * rows. At 100 TB one would pre-bucket with LSH (see
  * SimilarityQueries.sim_lsh_buckets) to bound candidates.
  */
final class KnnRegressor(features: Seq[String], label: String, k: Int = 50)
    extends Forecaster {
  val name = s"kNN (k=$k)"
  private var trainDf: DataFrame = _
  private var kEff: Int = k

  def predictMu: Column = throw new UnsupportedOperationException(
    s"$name predicts frame-level (neighbor join); use withMu")

  /** Forecaster surface: tag rows with a synthetic id, run the
    * neighbor join, attach the mean-label prediction back. The id
    * column is cached so both sides of the join see the same ids; the
    * join result is pinned with an eager localCheckpoint (lineage
    * truncated, blocks freed by the ContextCleaner when the frame is
    * dropped) so the id cache can be released HERE instead of leaking
    * storage memory across repeated evals in a long-lived session. */
  override def withMu(df: DataFrame, out: String): DataFrame = {
    val withId = df.withColumn("__knn_id", monotonically_increasing_id()).cache()
    try {
      val preds = predict(withId, "__knn_id").withColumnRenamed("y_pred_f", out)
      withId.join(preds, "__knn_id").drop("__knn_id").localCheckpoint(true)
    } finally withId.unpersist(false)
  }

  def fit(train: DataFrame): Unit = {
    trainDf = train
    // explicit k cap against the train size, at FIT time like the
    // reference (models.py:361-363 caps n_neighbors in fit): the window
    // rank could never exceed the train row count anyway, but the cap
    // is part of the contract and paying the count once here keeps
    // predict() from re-scanning the train table per call
    kEff = math.max(1L, math.min(k.toLong, train.count())).toInt
  }

  def predict(test: DataFrame, idCol: String): DataFrame = {
    def zf(df: DataFrame, prefix: String) = features.zipWithIndex.foldLeft(df) {
      case (d, (f, i)) => d.withColumn(s"$prefix$i", coalesce(col(f).cast("double"), lit(0.0)))
    }
    val tr = zf(trainDf, "__tr").select(
      (features.indices.map(i => col(s"__tr$i")) :+ col(label).cast("double").as("__trlabel")): _*)
    val te = zf(test, "__te")
    val dist = features.indices
      .map(i => (col(s"__te$i") - col(s"__tr$i")) * (col(s"__te$i") - col(s"__tr$i")))
      .reduce(_ + _)
    val w = Window.partitionBy(col(idCol)).orderBy(col("__dist"), col("__trlabel"))
    te.crossJoin(broadcast(tr))
      .withColumn("__dist", dist)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= kEff)
      .groupBy(col(idCol))
      .agg(avg(col("__trlabel")).as("y_pred_f"))
  }
}

/** M5: gradient-boosted trees stand-in for the reference's XGBoost
  * (models.py:177-259) — documented divergence: exact xgboost parity is
  * out of scope offline; spark.ml GBTRegressor is the in-Spark analogue.
  * Kept behind a thin wrapper so the eval runner treats it like any
  * Forecaster. */
final class GbtForecaster(features: Seq[String], label: String,
    maxIter: Int = 100, maxDepth: Int = 3, stepSize: Double = 0.1)
    extends Forecaster {
  val name = "GBT"
  private var model: org.apache.spark.ml.regression.GBTRegressionModel = _

  def predictMu: Column = throw new UnsupportedOperationException(
    s"$name predicts frame-level (spark.ml transform); use withMu")

  override def withMu(df: DataFrame, out: String): DataFrame =
    predict(df).withColumnRenamed("y_pred_f", out)

  def fit(train: DataFrame): Unit = {
    val assembler = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features").setHandleInvalid("keep")
    val gbt = new org.apache.spark.ml.regression.GBTRegressor()
      .setFeaturesCol("__features").setLabelCol(label)
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setStepSize(stepSize).setSeed(42L)
    val zf = features.foldLeft(train) { (d, f) =>
      d.withColumn(f, coalesce(col(f).cast("double"), lit(0.0)))
    }
    model = gbt.fit(assembler.transform(zf))
  }

  def predict(test: DataFrame): DataFrame = {
    // zero-fill into TEMP columns so the caller's feature columns come
    // through untouched (only the model input is nan_to_num'd, like the
    // reference); the assembler reads the temps — the model only sees
    // the assembled vector, never the column names
    val tmps = features.indices.map(i => s"__gbt$i")
    val assembler = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(tmps.toArray).setOutputCol("__features").setHandleInvalid("keep")
    val zf = features.zipWithIndex.foldLeft(test) { case (d, (f, i)) =>
      d.withColumn(s"__gbt$i", coalesce(col(f).cast("double"), lit(0.0)))
    }
    model.transform(assembler.transform(zf))
      .withColumnRenamed("prediction", "y_pred_f")
      .drop("__features").drop(tmps: _*)
  }
}

package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metrics micro-cases (tests/test_eval.py:225-261), ridge closed-form
  * exactness, persistence, kNN, uncertainty models. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("MAE/bias micro-case: pred [70,75,80] vs true [72,73,78] → mae 2.0, bias 2/3") {
    val df = Seq((70.0, 72.0), (75.0, 73.0), (80.0, 78.0)).toDF("y_pred_f", "y_true_f")
    val m = Metrics.forecastMetrics(df)
    assert(m.mae == 2.0)
    assert(m.bias == 0.6667)
    assert(m.n == 3)
  }

  test("perfect predictions with σ=3 → all coverages 1.0") {
    val df = Seq((70.0, 70.0, 3.0), (75.0, 75.0, 3.0), (80.0, 80.0, 3.0))
      .toDF("y_pred_f", "y_true_f", "y_pred_sigma_f")
    val cal = Metrics.calibrationMetrics(df)
    assert(cal("coverage_50") == 1.0 && cal("coverage_80") == 1.0 && cal("coverage_90") == 1.0)
    assert(cal("sharpness_50") ==
      BigDecimal(2 * Metrics.ZScores(50) * 3.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(cal("mean_sigma") == 3.0)
  }

  test("ridge closed form recovers y = 2x + 1 exactly as alpha → 0") {
    val train = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1.0)).toDF("x", "y")
    val ridge = new Ridge(Seq("x"), "y", alpha = 1e-9)
    ridge.fit(train)
    val (w, b) = ridge.fittedCoefs
    assert(math.abs(w(0) - 2.0) < 1e-6)
    assert(math.abs(b - 1.0) < 1e-4)
  }

  test("ridge shrinks the slope by exactly Sxx/(Sxx+alpha), intercept unpenalized") {
    // sklearn semantics: w = Sxy/(Sxx + α); b = ȳ − w·x̄
    val xs = Seq(1.0, 2.0, 3.0, 4.0)
    val ys = Seq(3.0, 5.0, 7.0, 9.0) // y = 2x + 1
    val train = xs.zip(ys).toDF("x", "y")
    val alpha = 5.0
    val xbar = xs.sum / 4; val ybar = ys.sum / 4
    val sxx = xs.map(x => (x - xbar) * (x - xbar)).sum
    val sxy = xs.zip(ys).map { case (x, y) => (x - xbar) * (y - ybar) }.sum
    val wExpected = sxy / (sxx + alpha)
    val ridge = new Ridge(Seq("x"), "y", alpha)
    ridge.fit(train)
    val (w, b) = ridge.fittedCoefs
    assert(math.abs(w(0) - wExpected) < 1e-12)
    assert(math.abs(b - (ybar - wExpected * xbar)) < 1e-12)
  }

  test("ridge zero-fills missing features (handle_missing=fill_zero)") {
    val train = Seq((Option(1.0), 3.0), (None, 1.0), (Option(3.0), 7.0))
      .toDF("x", "y")
    val ridge = new Ridge(Seq("x"), "y", alpha = 1e-9)
    ridge.fit(train) // fits through (1,3),(0,1),(3,7) → y = 2x + 1
    val (w, b) = ridge.fittedCoefs
    assert(math.abs(w(0) - 2.0) < 1e-6 && math.abs(b - 1.0) < 1e-5)
  }

  test("kNN with k=1 returns nearest label; k=3 averages") {
    val train = Seq((0.0, 10.0), (1.0, 20.0), (10.0, 30.0)).toDF("x", "y")
    val test = Seq((0.9, 1L)).toDF("x", "id")
    val knn1 = new KnnRegressor(Seq("x"), "y", k = 1)
    knn1.fit(train)
    assert(knn1.predict(test, "id").collect()(0).getAs[Double]("y_pred_f") == 20.0)
    val knn3 = new KnnRegressor(Seq("x"), "y", k = 3)
    knn3.fit(train)
    assert(knn3.predict(test, "id").collect()(0).getAs[Double]("y_pred_f") == 20.0) // (10+20+30)/3
    // k > n: explicit cap to the train size (models.py:361-363) —
    // degrades to the mean of ALL train labels
    val knn50 = new KnnRegressor(Seq("x"), "y", k = 50)
    knn50.fit(train)
    assert(knn50.predict(test, "id").collect()(0).getAs[Double]("y_pred_f") == 20.0) // (10+20+30)/3
  }

  test("bucketed sigma: per-bucket when n>=min, global fallback otherwise, floor applied") {
    val resid = ((1 to 20).map(i => (if (i % 2 == 0) 5.0 else -5.0, 10)) ++
      Seq((100.0, 50), (-100.0, 50))) // bucket [36,72): only 2 samples
      .toDF("residual_f", "lead_hours")
    val m = new Uncertainty.BucketedSigma(minSamples = 10)
    m.fit(resid)
    val out = resid.select(col("lead_hours"), m.predictSigma().as("sigma"))
      .distinct().collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // bucket [0,36): std of ±5 alternating (n=20) ≈ 5.13; bucket [36,72):
    // n=2 < 10 → global sigma
    assert(out(10) < 10.0)
    assert(out(50) > 20.0) // fell back to global (dominated by ±100)
  }

  test("rolling sigma: coalesce(sigma_lead, fallback) with floor") {
    val df = Seq(Option(2.5), None, Option(0.2)).toDF("sigma_lead")
    val m = new Uncertainty.RollingSigma(fallback = 3.0, floor = 1.0)
    val out = df.select(m.predictSigma().as("s")).as[Double].collect()
    assert(out.toSeq == Seq(2.5, 3.0, 1.0))
  }

  test("sliced metrics via grouping sets drop small slices") {
    val df = ((1 to 20).map(i => ("A", 1.0 + i % 2, 1.0)) ++ Seq(("B", 5.0, 1.0)))
      .toDF("slice", "y_pred_f", "y_true_f")
    val out = Metrics.metricsBySlices(df, Seq("slice"), minCount = 10).collect()
    assert(out.length == 1 && out(0).getAs[String]("slice") == "A") // B has n=1 < 10
  }
}

package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** M5 stand-in for the reference's XGBoost (models.py:177-259): GBT
  * learns a non-linear signal a linear model can't, deterministically
  * under a fixed seed. */
class GbtSpec extends SparkSpec {
  import spark.implicits._

  test("GBT fits a step function and beats ridge on it") {
    val data = (1 to 200).map { i =>
      val x = i / 200.0
      (x, if (x < 0.5) 10.0 else 20.0)
    }.toDF("x", "y")
    val gbt = new GbtForecaster(Seq("x"), "y", maxIter = 20, maxDepth = 2)
    gbt.fit(data)
    val preds = gbt.predict(data)
    val mae = preds.agg(avg(abs(col("y_pred_f") - col("y")))).collect()(0).getDouble(0)
    assert(mae < 0.5, s"GBT mae=$mae")

    val ridge = new Ridge(Seq("x"), "y", alpha = 1.0)
    ridge.fit(data)
    val ridgeMae = data.select(avg(abs(ridge.predictMu - col("y"))))
      .collect()(0).getDouble(0)
    assert(mae < ridgeMae) // the tree model captures the step

    // determinism under fixed seed
    val gbt2 = new GbtForecaster(Seq("x"), "y", maxIter = 20, maxDepth = 2)
    gbt2.fit(data)
    val same = preds.select("y_pred_f").collect().map(_.getDouble(0)).toSeq ==
      gbt2.predict(data).select("y_pred_f").collect().map(_.getDouble(0)).toSeq
    assert(same)
  }
}

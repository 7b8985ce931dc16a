package graft.eval

import java.nio.file.{Files, Paths}
import java.sql.{Date, Timestamp}
import graft.SparkSpec

/** Multi-model E2E: synthetic forecast/truth, Persistence + Ridge,
  * artifact tree + load-back (tests/eval/test_multi_model.py:38-100). */
class RunnerSpec extends SparkSpec {
  import spark.implicits._

  private def trainTable = (1 to 40).map { i =>
    val actual = 70.0 + (i % 7)
    ("TEST", Timestamp.valueOf(f"2024-07-${(i % 28) + 1}%02d 12:00:00"),
      Date.valueOf(f"2024-08-${(i % 28) + 1}%02d"),
      actual + 1.5, // forecast biased +1.5
      28, actual, Option(actual - (if (i > 1) 0.0 else 0.0)))
  }.toDF("station_id", "issue_time_utc", "target_date_local",
    "tmax_pred_f", "lead_hours", "tmax_actual_f", "tmax_actual_f_lag1")

  test("multi-model run: ranking, artifact tree, load-back round-trip") {
    val runDir = Files.createTempDirectory("graft_run").toString
    val models = Seq[Forecaster](
      new Passthrough(),
      new Ridge(Seq("tmax_pred_f"), "tmax_actual_f", alpha = 1.0))
    val ranked = Runner.runMultiModel(trainTable, models, runDir)
    assert(ranked.size == 2)
    assert(ranked.head.metrics.mae <= ranked.last.metrics.mae) // rank order
    // artifact tree
    assert(Files.exists(Paths.get(s"$runDir/comparison.json")))
    assert(Files.exists(Paths.get(s"$runDir/meta.json")))
    for (m <- Seq("Passthrough", "Ridge(alpha=1.0)")) {
      assert(Files.exists(Paths.get(s"$runDir/models/$m/metrics.json")))
      val back = Runner.loadRun(spark, runDir, m)
      assert(back.count() > 0)
      assert(back.columns.contains("y_pred_f") && back.columns.contains("y_pred_sigma_f"))
    }
    // passthrough has the constant +1.5 bias
    val pass = ranked.find(_.name == "Passthrough").get
    assert(pass.metrics.bias == 1.5 && pass.metrics.mae == 1.5)
    // ridge corrects the bias on the test split
    val ridge = ranked.find(_.name.startsWith("Ridge")).get
    assert(ridge.metrics.mae < 1.0)
    assert(ranked.head.name.startsWith("Ridge"))
  }
}

package graft.eval

import java.nio.file.Files
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** Config codec + the reference's validation battery
  * (eval/config.py:73-202, error messages at :126-161). Pure JVM — no
  * SparkSession needed. */
class RunConfigSpec extends AnyFunSuite {

  private def base = RunConfig(
    runName = "klga_july",
    stationIds = Seq("KLGA"),
    startDateLocal = LocalDate.parse("2024-07-01"),
    endDateLocal = LocalDate.parse("2024-07-31"))

  test("JSON round-trip preserves every field, including nested configs") {
    val cfg = base.copy(
      minCoverageHours = 20,
      leadHoursAllowed = Some(Seq(24, 48)),
      split = RunConfig.SplitConfig("walk_forward", 0.7, 0.15, 0.15, Some(30), Some(7)),
      model = RunConfig.ModelConfig("persistence", 0.5,
        Map("n_neighbors" -> 25.0), Seq("tmax_pred_f")),
      uncertainty = RunConfig.UncertaintyConfig("bucketed", Some(Seq((0, 36), (36, 72))), 2.0),
      randomSeed = 7)
    assert(RunConfig.fromJson(cfg.toJson) == cfg)
  }

  test("save/load file round-trip") {
    val p = Files.createTempDirectory("cfg").resolve("sub/config.json").toString
    base.save(p)
    assert(RunConfig.load(p) == base)
  }

  test("explicit JSON nulls fall back to defaults like absent keys") {
    val cfg = RunConfig.fromJson(
      """{"run_name": "r", "station_ids": ["KLGA"],
        |"start_date_local": "2024-07-01", "end_date_local": "2024-07-31",
        |"min_coverage_hours": null, "lead_hours_allowed": null,
        |"split": {"type": null, "train_frac": null, "val_frac": null, "test_frac": null},
        |"model": {"type": null, "alpha": null, "features": null},
        |"uncertainty": {"type": null, "buckets": null, "sigma_floor": null}}""".stripMargin)
    assert(cfg.minCoverageHours == 18)
    assert(cfg.split == RunConfig.SplitConfig())   // not train_frac=0.0
    assert(cfg.model == RunConfig.ModelConfig())   // not type="null"
    assert(cfg.uncertainty == RunConfig.UncertaintyConfig())
  }

  test("control characters in strings survive the JSON round-trip") {
    val cfg = base.copy(runName = "july\nrun\t\"x\"", stationIds = Seq("K\\LGA"))
    assert(RunConfig.fromJson(cfg.toJson) == cfg)
    val p = Files.createTempDirectory("cfgq").resolve("c.json").toString
    cfg.save(p)
    assert(RunConfig.load(p) == cfg)
  }

  test("missing optional keys fall back to defaults") {
    val cfg = RunConfig.fromJson(
      """{"run_name": "r", "station_ids": ["KLGA"],
        |"start_date_local": "2024-07-01", "end_date_local": "2024-07-31"}""".stripMargin)
    assert(cfg.minCoverageHours == 18 && cfg.leadHoursAllowed.isEmpty)
    assert(cfg.split == RunConfig.SplitConfig() && cfg.model == RunConfig.ModelConfig())
    assert(cfg.uncertainty == RunConfig.UncertaintyConfig() && cfg.randomSeed == 42)
  }

  // ---- the validation battery, rule by rule (config.py:126-161) ----

  private def errOf(cfg: RunConfig): String =
    intercept[IllegalArgumentException](cfg.validated).getMessage

  test("empty station_ids") {
    assert(errOf(base.copy(stationIds = Seq.empty)).contains("station_ids must not be empty"))
  }

  test("start date must precede end date (equal dates also fail)") {
    val msg = errOf(base.copy(endDateLocal = LocalDate.parse("2024-07-01")))
    assert(msg.contains("start_date_local (2024-07-01) must be before end_date_local (2024-07-01)"))
  }

  test("coverage hours outside [0, 24]") {
    assert(errOf(base.copy(minCoverageHours = 25)).contains("min_coverage_hours must be in [0, 24], got 25"))
    assert(errOf(base.copy(minCoverageHours = -1)).contains("got -1"))
  }

  test("static split fractions must sum to 1") {
    val bad = base.copy(split = RunConfig.SplitConfig(trainFrac = 0.5, valFrac = 0.2, testFrac = 0.2))
    assert(errOf(bad).contains("Split fractions must sum to 1"))
  }

  test("walk_forward requires positive window_size and step_size") {
    val noWin = base.copy(split = RunConfig.SplitConfig("walk_forward", stepSize = Some(7)))
    assert(errOf(noWin).contains("walk_forward requires positive window_size"))
    val zeroStep = base.copy(split = RunConfig.SplitConfig("walk_forward", windowSize = Some(30), stepSize = Some(0)))
    assert(errOf(zeroStep).contains("walk_forward requires positive step_size"))
  }

  test("unknown enum values are rejected with all errors aggregated") {
    val bad = base.copy(
      stationIds = Seq.empty,
      model = RunConfig.ModelConfig(modelType = "linear"),
      uncertainty = RunConfig.UncertaintyConfig(uncertaintyType = "quantile"))
    val msg = errOf(bad)
    assert(msg.contains("EvalConfig validation failed"))
    assert(msg.contains("station_ids must not be empty"))
    assert(msg.contains("unknown model type: linear"))
    assert(msg.contains("unknown uncertainty type: quantile"))
  }

  test("fromJson validates at construction, like the reference __post_init__") {
    val bad = base.copy(minCoverageHours = 99).toJson
    assert(intercept[IllegalArgumentException](RunConfig.fromJson(bad))
      .getMessage.contains("min_coverage_hours"))
  }

  test("buildForecaster constructs all five model types (create_forecaster parity)") {
    def withModel(m: RunConfig.ModelConfig) = base.copy(model = m)
    assert(withModel(RunConfig.ModelConfig("passthrough")).buildForecaster().name == "Passthrough")
    assert(withModel(RunConfig.ModelConfig("persistence")).buildForecaster().name == "Persistence")
    assert(withModel(RunConfig.ModelConfig("ridge", alpha = 2.0)).buildForecaster().name == "Ridge(alpha=2.0)")
    // knn: n_neighbors from hyperparams, default 50 (models.py:346)
    assert(withModel(RunConfig.ModelConfig("knn")).buildForecaster().name == "kNN (k=50)")
    assert(withModel(RunConfig.ModelConfig("knn",
      hyperparams = Map("n_neighbors" -> 10.0))).buildForecaster().name == "kNN (k=10)")
    assert(withModel(RunConfig.ModelConfig("xgboost",
      hyperparams = Map("n_estimators" -> 20.0, "max_depth" -> 2.0)))
      .buildForecaster().name == "GBT")
  }

  test("hyperparams survive the JSON round-trip") {
    val cfg = base.copy(model = RunConfig.ModelConfig("knn",
      hyperparams = Map("n_neighbors" -> 10.0, "weights_like" -> 1.5)))
    assert(RunConfig.fromJson(cfg.toJson) == cfg)
  }

  test("bridge into the runner config carries split fractions and sigma settings") {
    val cfg = base.copy(
      split = RunConfig.SplitConfig(trainFrac = 0.6, valFrac = 0.2, testFrac = 0.2),
      uncertainty = RunConfig.UncertaintyConfig("bucketed", Some(Seq((0, 48))), 1.5))
    val rc = cfg.runnerConfig
    assert(rc.splitFractions.train == 0.6 && rc.splitFractions.validation == 0.2)
    assert(rc.sigmaBuckets == Seq((0, 48)) && rc.sigmaFloor == 1.5)
    assert(cfg.copy(model = RunConfig.ModelConfig("passthrough")).buildForecaster().name == "Passthrough")
  }
}

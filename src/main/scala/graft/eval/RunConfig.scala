package graft.eval

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.LocalDate
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, isnan, lit}

/** Frozen run configuration with JSON round-trip and validation —
  * parity with eval/config.py:20-202 (SplitConfig / ModelConfig /
  * UncertaintyConfig / EvalConfig and the validation battery at
  * config.py:126-161). The JSON layout (snake_case keys, ISO dates,
  * nested objects) matches the reference's `to_dict`, so a config
  * written by either side loads in the other.
  *
  * Jackson (on Spark's classpath) parses; serialization is hand-rolled
  * like Runner's artifact JSON — no extra dependencies.
  */
final case class RunConfig(
    runName: String,
    stationIds: Seq[String],
    startDateLocal: LocalDate,
    endDateLocal: LocalDate,
    minCoverageHours: Int = 18,
    leadHoursAllowed: Option[Seq[Int]] = None,
    split: RunConfig.SplitConfig = RunConfig.SplitConfig(),
    model: RunConfig.ModelConfig = RunConfig.ModelConfig(),
    uncertainty: RunConfig.UncertaintyConfig = RunConfig.UncertaintyConfig(),
    randomSeed: Int = 42) {

  /** The reference's `_validate` rules (config.py:126-161), collected
    * rather than thrown so callers can render all failures at once. */
  def validationErrors: Seq[String] = {
    val errors = Seq.newBuilder[String]
    if (stationIds.isEmpty)
      errors += "station_ids must not be empty"
    if (!startDateLocal.isBefore(endDateLocal))
      errors += s"start_date_local ($startDateLocal) must be before end_date_local ($endDateLocal)"
    if (minCoverageHours < 0 || minCoverageHours > 24)
      errors += s"min_coverage_hours must be in [0, 24], got $minCoverageHours"
    split.splitType match {
      case "static" =>
        val total = split.trainFrac + split.valFrac + split.testFrac
        if (math.abs(total - 1.0) > 1e-6)
          errors += s"Split fractions must sum to 1, got $total"
      case "walk_forward" =>
        if (!split.windowSize.exists(_ > 0))
          errors += "walk_forward requires positive window_size"
        if (!split.stepSize.exists(_ > 0))
          errors += "walk_forward requires positive step_size"
      case other =>
        errors += s"unknown split type: $other"
    }
    if (!RunConfig.ModelTypes.contains(model.modelType))
      errors += s"unknown model type: ${model.modelType}"
    if (!RunConfig.UncertaintyTypes.contains(uncertainty.uncertaintyType))
      errors += s"unknown uncertainty type: ${uncertainty.uncertaintyType}"
    errors.result()
  }

  /** Throws with the reference's aggregate message when invalid. */
  def validated: RunConfig = {
    val errs = validationErrors
    if (errs.nonEmpty)
      throw new IllegalArgumentException(
        "EvalConfig validation failed:\n  - " + errs.mkString("\n  - "))
    this
  }

  /** Scope a train table to this config — apply_config_filters
    * (eval/data.py:160-190): station membership, inclusive date range
    * on target_date_local, coverage_hours floor when the column exists,
    * lead_hours membership when configured, and the null/NaN drop on
    * the key pred/actual columns. */
  def applyScope(df: DataFrame): DataFrame = {
    var out = df
      .filter(col("station_id").isin(stationIds: _*))
      .filter(col("target_date_local") >= lit(java.sql.Date.valueOf(startDateLocal)) &&
        col("target_date_local") <= lit(java.sql.Date.valueOf(endDateLocal)))
    if (out.columns.contains("coverage_hours"))
      out = out.filter(col("coverage_hours") >= minCoverageHours)
    leadHoursAllowed.filter(_.nonEmpty).foreach { lhs =>
      if (out.columns.contains("lead_hours"))
        out = out.filter(col("lead_hours").isin(lhs: _*))
    }
    Seq("tmax_pred_f", "tmax_actual_f").filter(out.columns.contains)
      .foldLeft(out)((d, c) => d.filter(col(c).isNotNull && !isnan(col(c).cast("double"))))
  }

  /** Bridge into the runner's operational config: split fractions,
    * sigma buckets and floor carry over; column names keep the runner's
    * defaults. NOTE: the multi-model runner evaluates the STATIC split
    * protocol, matching the reference runner (runner.py never branches
    * on split.type either) — a walk_forward config validates but its
    * window/step only drive `ops.Splits.walkForward` when called
    * directly; callers should surface that (the CLI warns). */
  def runnerConfig: Runner.EvalConfig = Runner.EvalConfig(
    splitFractions = graft.ops.Splits.SplitFractions(split.trainFrac, split.valFrac),
    sigmaBuckets = uncertainty.buckets.getOrElse(Seq((0, 36), (36, 72), (72, 120))),
    sigmaFloor = uncertainty.sigmaFloor)

  /** The forecaster named by model.type — all five types, matching
    * create_forecaster (eval/models.py:262-290). knn reads n_neighbors
    * from hyperparams (KNNForecaster default 50, models.py:346);
    * xgboost reads n_estimators/max_depth/learning_rate (the GBT
    * stand-in's knobs; XGBoost defaults at models.py:198-203). */
  def buildForecaster(labelCol: String = "tmax_actual_f"): Forecaster = {
    def hp(key: String, default: Double): Double =
      model.hyperparams.getOrElse(key, default)
    model.modelType match {
      case "passthrough" => new Passthrough()
      case "persistence" => new Persistence()
      case "ridge"       => new Ridge(model.features, labelCol, model.alpha)
      case "knn" =>
        new KnnRegressor(model.features, labelCol, k = hp("n_neighbors", 50.0).toInt)
      case "xgboost" =>
        new GbtForecaster(model.features, labelCol,
          maxIter = hp("n_estimators", 100.0).toInt,
          maxDepth = hp("max_depth", 3.0).toInt,
          stepSize = hp("learning_rate", 0.1))
      case other => throw new IllegalArgumentException(s"unknown model type: $other")
    }
  }

  def toJson: String = {
    def q(s: String) = RunConfig.jsonQuote(s)
    def arr(xs: Seq[String]) = xs.mkString("[", ", ", "]")
    val lead = leadHoursAllowed.map(h => arr(h.map(_.toString))).getOrElse("null")
    val win = split.windowSize.map(_.toString).getOrElse("null")
    val step = split.stepSize.map(_.toString).getOrElse("null")
    val buckets = uncertainty.buckets
      .map(bs => arr(bs.map { case (lo, hi) => s"[$lo, $hi]" })).getOrElse("null")
    s"""{
       |  "run_name": ${q(runName)},
       |  "station_ids": ${arr(stationIds.map(q))},
       |  "start_date_local": ${q(startDateLocal.toString)},
       |  "end_date_local": ${q(endDateLocal.toString)},
       |  "min_coverage_hours": $minCoverageHours,
       |  "lead_hours_allowed": $lead,
       |  "split": {"type": ${q(split.splitType)}, "train_frac": ${split.trainFrac}, "val_frac": ${split.valFrac}, "test_frac": ${split.testFrac}, "window_size": $win, "step_size": $step},
       |  "model": {"type": ${q(model.modelType)}, "alpha": ${model.alpha}, "hyperparams": ${
           model.hyperparams.toSeq.sortBy(_._1)
             .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ", ", "}")
         }, "features": ${arr(model.features.map(q))}},
       |  "uncertainty": {"type": ${q(uncertainty.uncertaintyType)}, "buckets": $buckets, "sigma_floor": ${uncertainty.sigmaFloor}},
       |  "random_seed": $randomSeed
       |}""".stripMargin
  }

  def save(path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, toJson,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}

object RunConfig {

  val ModelTypes: Set[String] = Set("passthrough", "ridge", "persistence", "knn", "xgboost")
  val UncertaintyTypes: Set[String] = Set("global", "bucketed", "rolling")

  /** JSON string literal with control characters escaped — save() must
    * never produce a file load() can't parse back. */
  private[eval] def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    } + "\""

  final case class SplitConfig(
      splitType: String = "static",
      trainFrac: Double = 0.70,
      valFrac: Double = 0.15,
      testFrac: Double = 0.15,
      windowSize: Option[Int] = None,
      stepSize: Option[Int] = None)

  final case class ModelConfig(
      modelType: String = "ridge",
      alpha: Double = 1.0,
      // numeric model hyperparameters (config.py ModelConfig.hyperparams;
      // knn: n_neighbors, xgboost: n_estimators/max_depth/learning_rate)
      hyperparams: Map[String, Double] = Map.empty,
      features: Seq[String] =
        Seq("tmax_pred_f", "sin_doy", "cos_doy", "bias_7d", "bias_14d"))

  final case class UncertaintyConfig(
      uncertaintyType: String = "bucketed",
      buckets: Option[Seq[(Int, Int)]] = None,
      sigmaFloor: Double = 1.0)

  /** Parse + validate (construction-time validation, matching the
    * reference's `__post_init__`). Missing optional keys fall back to
    * the dataclass defaults. */
  def fromJson(json: String): RunConfig = {
    val n = new ObjectMapper().readTree(json)
    // an explicit JSON null is the same as an absent key: fall back to
    // the default rather than coercing NullNode (0.0 / "null")
    def opt(node: JsonNode, key: String): Option[JsonNode] =
      Option(node.get(key)).filterNot(_.isNull)
    def strSeq(node: JsonNode): Seq[String] = {
      import scala.jdk.CollectionConverters._
      node.elements().asScala.map(_.asText()).toSeq
    }
    def req(key: String): JsonNode = {
      val v = n.get(key)
      require(v != null && !v.isNull, s"missing required config field: $key")
      v
    }
    val split = opt(n, "split").map { s =>
      SplitConfig(
        splitType = opt(s, "type").map(_.asText()).getOrElse("static"),
        trainFrac = opt(s, "train_frac").map(_.asDouble()).getOrElse(0.70),
        valFrac = opt(s, "val_frac").map(_.asDouble()).getOrElse(0.15),
        testFrac = opt(s, "test_frac").map(_.asDouble()).getOrElse(0.15),
        windowSize = opt(s, "window_size").map(_.asInt()),
        stepSize = opt(s, "step_size").map(_.asInt()))
    }.getOrElse(SplitConfig())
    val model = opt(n, "model").map { m =>
      import scala.jdk.CollectionConverters._
      ModelConfig(
        modelType = opt(m, "type").map(_.asText()).getOrElse("ridge"),
        alpha = opt(m, "alpha").map(_.asDouble()).getOrElse(1.0),
        hyperparams = opt(m, "hyperparams").map(_.properties().asScala
          .filter(_.getValue.isNumber)
          .map(kv => kv.getKey -> kv.getValue.asDouble()).toMap)
          .getOrElse(Map.empty),
        features = opt(m, "features").map(strSeq).getOrElse(ModelConfig().features))
    }.getOrElse(ModelConfig())
    val uncertainty = opt(n, "uncertainty").map { u =>
      import scala.jdk.CollectionConverters._
      UncertaintyConfig(
        uncertaintyType = opt(u, "type").map(_.asText()).getOrElse("bucketed"),
        buckets = opt(u, "buckets").map(bs =>
          bs.elements().asScala.map(b => (b.get(0).asInt(), b.get(1).asInt())).toSeq),
        sigmaFloor = opt(u, "sigma_floor").map(_.asDouble()).getOrElse(1.0))
    }.getOrElse(UncertaintyConfig())
    RunConfig(
      runName = req("run_name").asText(),
      stationIds = strSeq(req("station_ids")),
      startDateLocal = LocalDate.parse(req("start_date_local").asText()),
      endDateLocal = LocalDate.parse(req("end_date_local").asText()),
      minCoverageHours = opt(n, "min_coverage_hours").map(_.asInt()).getOrElse(18),
      leadHoursAllowed = opt(n, "lead_hours_allowed").map(h => {
        import scala.jdk.CollectionConverters._
        h.elements().asScala.map(_.asInt()).toSeq
      }),
      split = split, model = model, uncertainty = uncertainty,
      randomSeed = opt(n, "random_seed").map(_.asInt()).getOrElse(42)
    ).validated
  }

  def load(path: String): RunConfig = fromJson(Files.readString(Paths.get(path)))
}

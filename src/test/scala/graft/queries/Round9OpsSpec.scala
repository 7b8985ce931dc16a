package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-9 operators, beyond the DuckDB oracle:
  * equivalence of the binned interval join with the naive theta-join,
  * the piecewise-linear envelope of the gap filler, leakage-freedom of
  * the point-in-time feature join, and closed-form agreement of the
  * grouped regression.
  */
class Round9OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("j30: binned interval join ≡ naive theta-join (small-data ground truth)") {
    import spark.implicits._
    val binned = Registry.queries("j30_interval_overlap")(spark, sf)
      .select("l_orderkey", "l_linenumber", "n_overlaps")
    // ground truth: the plan we must NEVER run at scale — fine at sf0.001
    val ships = Tables.lineitem(spark, sf)
      .filter($"l_returnflag" === "R" && $"l_quantity" <= 2.0)
      .select($"l_orderkey", $"l_linenumber",
        to_date($"l_shipdate").as("s0"),
        date_add(to_date($"l_shipdate"), ($"l_quantity" * 7).cast("int")).as("s1"))
    val wins = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey",
        to_date($"o_orderdate").as("w0"), date_add(to_date($"o_orderdate"), 6).as("w1"))
    val naive = ships.join(wins, $"s0" <= $"w1" && $"w0" <= $"s1")
      .groupBy($"l_orderkey", $"l_linenumber")
      .agg(count(lit(1)).as("n_overlaps"))
    assert(binned.count() > 0)
    assert(binned.except(naive).isEmpty && naive.except(binned).isEmpty)
  }

  test("w14: spine is dense per key; observed rows keep their value; fills obey the linear envelope") {
    import spark.implicits._
    val out = Registry.queries("w14_gap_fill")(spark, sf).cache()
    try {
      // dense: per event_type, row count == span in days (inclusive)
      val spans = out.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          (datediff(max($"day"), min($"day")) + 1).cast("long").as("span"))
        .collect()
      spans.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
      // every row is filled (no key has zero observations in testdata)
      assert(out.filter($"filled".isNull).isEmpty)
      // interpolated values sit inside the [prev, next] observation band
      val wAll = Window.partitionBy($"event_type").orderBy($"day")
      val obs = out.withColumn("pv",
          last(when($"observed", $"filled"), ignoreNulls = true)
            .over(wAll.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("nv",
          first(when($"observed", $"filled"), ignoreNulls = true)
            .over(wAll.rowsBetween(1, Window.unboundedFollowing)))
        .filter(!$"observed" && $"pv".isNotNull && $"nv".isNotNull)
        .filter($"filled" < least($"pv", $"nv") - 1e-9 ||
                $"filled" > greatest($"pv", $"nv") + 1e-9)
      assert(obs.isEmpty, "interpolation left the neighbor envelope")
    } finally out.unpersist()
  }

  test("w15: rolling corr is in [-1, 1] and only emitted on full frames") {
    import spark.implicits._
    val out = Registry.queries("w15_rolling_corr")(spark, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(abs($"trend_corr") > 1.0 + 1e-9).isEmpty)
      // emitted count: per event_type with n rows, exactly max(0, n-19)
      val ev = Tables.events(spark, sf).groupBy($"event_type").count()
      val expected = ev.select(sum(greatest(lit(0L), $"count" - 19))).as[Long].head()
      assert(out.count() == expected)
    } finally out.unpersist()
  }

  test("pipe_feature_snapshot: features never leak from after the label timestamp") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val out = Registry.queries("pipe_feature_snapshot")(spark, sf)
    // recompute the as-of error feature naively per label row
    val labels = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id".as("eu"), $"ts".as("ets"), $"value")
    val naive = labels.join(errors, $"user_id" === $"eu" && $"ets" <= $"ts", "left_outer")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"event_id").orderBy($"ets".desc_nulls_last)))
      .filter($"rk" === 1)
      .select($"event_id", round($"value", 4).as("err_naive"))
    val joined = out.join(naive, Seq("event_id"))
    assert(joined.count() == out.count())
    assert(joined.filter(!($"err_value" <=> $"err_naive")).isEmpty)
  }

  test("a24: regr aggregates agree with the explicit moment formulas") {
    import spark.implicits._
    val out = Registry.queries("a24_grouped_regression")(spark, sf)
    val manual = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"l_quantity").as("sx"), sum($"l_extendedprice").as("sy"),
        sum($"l_quantity" * $"l_extendedprice").as("sxy"),
        sum($"l_quantity" * $"l_quantity").as("sxx"))
      .select($"l_returnflag",
        (($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx")).as("m_slope"))
    val j = out.join(manual, Seq("l_returnflag"))
    assert(j.count() == out.count())
    assert(j.filter(abs($"slope" - $"m_slope") > 1e-3).isEmpty)
  }

  test("a26: ridge shrinks both slopes toward zero relative to the λ=0 OLS fit") {
    import spark.implicits._
    // re-derive the closed form at λ=0 from the same moments and check
    // the published λ=1000 coefficients are strictly smaller in |·|
    def fit(lam: Double) = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"l_quantity").as("s1"), sum($"l_discount").as("s2"),
        sum($"l_extendedprice").as("sy"),
        sum($"l_quantity" * $"l_quantity").as("s11"),
        sum($"l_discount" * $"l_discount").as("s22"),
        sum($"l_quantity" * $"l_discount").as("s12"),
        sum($"l_quantity" * $"l_extendedprice").as("s1y"),
        sum($"l_discount" * $"l_extendedprice").as("s2y"))
      .withColumn("cxx1", $"s11" - $"s1" * $"s1" / $"n")
      .withColumn("cxx2", $"s22" - $"s2" * $"s2" / $"n")
      .withColumn("cx12", $"s12" - $"s1" * $"s2" / $"n")
      .withColumn("cx1y", $"s1y" - $"s1" * $"sy" / $"n")
      .withColumn("cx2y", $"s2y" - $"s2" * $"sy" / $"n")
      .withColumn("det", ($"cxx1" + lam) * ($"cxx2" + lam) - $"cx12" * $"cx12")
      .select($"l_returnflag",
        (($"cx1y" * ($"cxx2" + lam) - $"cx2y" * $"cx12") / $"det").as("b1"),
        (($"cx2y" * ($"cxx1" + lam) - $"cx1y" * $"cx12") / $"det").as("b2"))
    val ols = fit(0.0).withColumnRenamed("b1", "o1").withColumnRenamed("b2", "o2")
    val ridge = Registry.queries("a26_grouped_ridge")(spark, sf)
    val j = ridge.join(ols, Seq("l_returnflag"))
    assert(j.count() == 3)
    assert(j.filter(abs($"b1") > abs($"o1") + 1e-9 ||
      abs($"b2") > abs($"o2") + 1e-9).isEmpty)
  }

  test("w16: scoring the scale forecast against itself pins MASE at exactly 1") {
    import spark.implicits._
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(avg($"value").as("v"))
    val wd = Window.partitionBy($"event_type").orderBy($"day")
    val selfScored = daily
      .withColumn("l1", lag($"v", 1).over(wd))
      .filter($"l1".isNotNull)
      .groupBy($"event_type")
      .agg((avg(abs($"v" - $"l1")) / avg(abs($"v" - $"l1"))).as("mase_self"))
    assert(selfScored.filter(abs($"mase_self" - 1.0) > 1e-12).isEmpty)
    // and the real entry evaluates on exactly (series length − 7) rows
    val out = Registry.queries("w16_seasonal_mase")(spark, sf)
    val spans = daily.groupBy($"event_type")
      .agg((count(lit(1)) - 7).as("expect"))
    val j = out.join(spans, Seq("event_type"))
    assert(j.count() == out.count() && j.filter($"n_days" =!= $"expect").isEmpty)
  }

  test("w17: explode-spelling equals the naive day-spine range join; wau bounded by user count") {
    import spark.implicits._
    val out = Registry.queries("w17_rolling_distinct")(spark, sf)
    val ev = Tables.events(spark, sf).select(to_date($"ts").as("day"), $"user_id")
    val b = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
    val spine = b.select(explode(sequence(date_add($"d0", 6), $"d1",
      expr("interval 1 day"))).as("rday"))
    val naive = spine.join(ev,
        $"day".between(date_add($"rday", -6), $"rday"))
      .groupBy($"rday").agg(countDistinct($"user_id").as("wau"))
      .select($"rday".cast("timestamp").as("rday"), $"wau")
    assert(out.count() > 0)
    assert(out.except(naive).isEmpty && naive.except(out).isEmpty)
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(out.filter($"wau" > users).isEmpty)
  }

  test("a27: the Wilson interval contains the point rate and stays inside [0, 1]") {
    import spark.implicits._
    val out = Registry.queries("a27_wilson_ci")(spark, sf)
    assert(out.count() > 0)
    assert(out.filter($"ci_lo" > $"conv" || $"ci_hi" < $"conv").isEmpty)
    assert(out.filter($"ci_lo" < -1e-9 || $"ci_hi" > 1.0 + 1e-9).isEmpty)
  }

  test("w18: transition probabilities sum to 1 per source; transition count = events − active users") {
    import spark.implicits._
    val out = Registry.queries("w18_event_transitions")(spark, sf).cache()
    try {
      val sums = out.groupBy($"from_type").agg(sum($"p").as("sp"))
      // rounding each cell to 4 decimals can drift the row sum by ≤ |types|·5e-5
      assert(sums.filter(abs($"sp" - 1.0) > 3e-4).isEmpty)
      val ev = Tables.events(spark, sf)
      val expected = ev.count() - ev.select($"user_id").distinct().count()
      assert(out.agg(sum($"n")).as[Long].head() == expected)
    } finally out.unpersist()
  }

  test("time-to-convert: converted ⊆ signups, latency quantiles ordered and non-negative") {
    import spark.implicits._
    val r = Registry.queries("pipe_time_to_convert")(spark, sf).head()
    val (nS, nC) = (r.getAs[Long]("n_signup"), r.getAs[Long]("n_converted"))
    assert(nC <= nS && nS > 0)
    val (med, p90) = (r.getAs[Double]("median_hours"), r.getAs[Double]("p90_hours"))
    assert(med >= 0.0 && p90 >= med)
  }

  test("a28: cross-correlations bounded, lag 0 covers at least as many days as any shift") {
    import spark.implicits._
    val out = Registry.queries("a28_crosscorr_lags")(spark, sf).cache()
    try {
      assert(out.count() == 7)
      assert(out.filter(abs($"xcorr") > 1.0 + 1e-9).isEmpty)
      val n0 = out.filter($"lag" === 0).select($"n_days").as[Long].head()
      assert(out.filter($"n_days" > n0).isEmpty)
    } finally out.unpersist()
  }

  test("k-fold CV: moment-subtraction fit equals the fit trained directly on the complement") {
    import spark.implicits._
    // fold 0's model from the query path must match a ridge fit computed
    // the slow way: aggregate moments over the OTHER four folds directly
    val lam = 1000.0
    val fact = Tables.lineitem(spark, sf).select(
      expr("CAST(conv(substr(md5(concat(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING))), 1, 15), 16, 10) AS BIGINT) % 5")
        .cast("int").as("fold"),
      $"l_quantity".as("x"), $"l_extendedprice".as("y"))
    def ridgeOn(df: org.apache.spark.sql.DataFrame) = {
      val r = df.agg(count(lit(1)).cast("double").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy")).head()
      val (n, sx, sy, sxx, sxy) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val b1 = (sxy - sx * sy / n) / ((sxx - sx * sx / n) + lam)
      (b1, (sy - b1 * sx) / n)
    }
    val (b1Direct, b0Direct) = ridgeOn(fact.filter($"fold" =!= 0))
    // reproduce the query's fold-0 rmse from the direct fit
    val direct = fact.filter($"fold" === 0)
      .withColumn("err", $"y" - (lit(b0Direct) + lit(b1Direct) * $"x"))
      .agg(round(sqrt(avg($"err" * $"err")), 4)).as[Double].head()
    val fromQuery = Registry.queries("pipe_kfold_cv")(spark, sf)
      .filter($"fold" === 0).select($"rmse").as[Double].head()
    assert(math.abs(direct - fromQuery) <= 1e-4,
      s"direct=$direct query=$fromQuery")
  }

  test("a29: arm sizes partition the users; uplift consistent with the arm rates") {
    import spark.implicits._
    val r = Registry.queries("a29_ab_uplift")(spark, sf).head()
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
    val up = r.getAs[Double]("uplift")
    assert(math.abs(up - (r.getAs[Double]("conv_b") - r.getAs[Double]("conv_a"))) <= 2e-4)
  }

  test("a25: histogram counts sum to the table count and bins nest in global bounds") {
    import spark.implicits._
    val out = Registry.queries("a25_histogram")(spark, sf).cache()
    try {
      val total = out.agg(sum($"n")).as[Long].head()
      assert(total == Tables.lineitem(spark, sf).count())
      val b = Tables.lineitem(spark, sf)
        .agg(min($"l_extendedprice").as("mn"), max($"l_extendedprice").as("mx")).head()
      val (mn, mx) = (b.getDouble(0), b.getDouble(1))
      assert(out.filter($"bin_min" < mn - 1e-6 || $"bin_max" > mx + 1e-6).isEmpty)
      assert(out.filter($"bin" < 0 || $"bin" > 19).isEmpty)
    } finally out.unpersist()
  }
}

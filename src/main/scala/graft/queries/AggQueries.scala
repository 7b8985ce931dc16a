package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Aggregation operators — SURVEY §2.6 A2–A11.
  *
  * Scale notes: every aggregate here is a hash aggregate with map-side
  * partial combine; none require a sort. Exact percentile is the one
  * exception (sort-based) — kept for oracle parity; the scale path is
  * percentile_approx, exposed in graft.ops as well.
  */
object AggQueries {

  def all: Seq[OracleQuery] = Seq(
    // A2: bitwise-OR aggregate — the QC-flag propagation aggregate
    // (build_daily_tmax.py:34-36). Built-in bit_or, no UDAF needed.
    OracleQuery(
      "a2_bit_or_agg",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("flag",
            when($"value" > 150.0, 4).when($"value" > 100.0, 2)
              .when($"value" > 50.0, 1).otherwise(0))
          .groupBy($"user_id")
          .agg(
            expr("bit_or(flag)").cast("int").as("flags_or"),
            expr("bit_and(flag)").cast("int").as("flags_and"),
            count(lit(1)).as("cnt"))
          .orderBy($"user_id")
      },
      Some("""WITH f AS (
             |  SELECT user_id,
             |    CASE WHEN value > 150.0 THEN 4 WHEN value > 100.0 THEN 2
             |         WHEN value > 50.0 THEN 1 ELSE 0 END AS flag
             |  FROM events
             |)
             |SELECT user_id, CAST(bit_or(flag) AS INT) AS flags_or,
             |  CAST(bit_and(flag) AS INT) AS flags_and, count(*) AS cnt
             |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    // A3: exact count-distinct (coverage-hours counting,
    // build_daily_tmax.py:82-95) + A10 min/max stats.
    OracleQuery(
      "a3_count_distinct",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"event_type")
          .agg(
            countDistinct($"user_id").as("n_users"),
            countDistinct(hour($"ts")).as("n_hours"),
            count(lit(1)).as("cnt"),
            min($"ts").as("min_ts"),
            max($"ts").as("max_ts"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
             |  count(DISTINCT hour(ts)) AS n_hours, count(*) AS cnt,
             |  min(ts) AS min_ts, max(ts) AS max_ts
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // A4: global moment metrics — n, MAE, RMSE, bias, std, R²
    // (eval/metrics.py:108-138; std_error is population std per
    // metrics.py:136). Residual e = value − 100 as the synthetic pred.
    OracleQuery(
      "a4_moment_metrics",
      (s, d) => {
        import s.implicits._
        val e = $"value" - 100.0
        Tables.events(s, d)
          .select($"value", e.as("e"))
          .agg(
            count(lit(1)).as("n"),
            round(avg(abs($"e")), 4).as("mae"),
            round(sqrt(avg($"e" * $"e")), 4).as("rmse"),
            round(avg($"e"), 4).as("bias"),
            round(stddev_pop($"e"), 4).as("std_error"),
            round(lit(1.0) - avg($"e" * $"e") / var_pop($"value"), 4).as("r2"))
      },
      Some("""WITH r AS (SELECT value, value - 100.0 AS e FROM events)
             |SELECT count(*) AS n,
             |  round(avg(abs(e)), 4) AS mae,
             |  round(sqrt(avg(e * e)), 4) AS rmse,
             |  round(avg(e), 4) AS bias,
             |  round(stddev_pop(e), 4) AS std_error,
             |  round(1.0 - avg(e * e) / var_pop(value), 4) AS r2
             |FROM r""".stripMargin)
    ),

    // A5: interval coverage + sharpness at z ∈ {0.6745, 1.2816, 1.6449}
    // (eval/metrics.py:141-197; z-scores are compile-time constants).
    OracleQuery(
      "a5_coverage_sharpness",
      (s, d) => {
        import s.implicits._
        val e = abs($"value" - 100.0)
        val sigma = lit(40.0)
        def cov(z: Double) = round(avg(when(e <= lit(z) * sigma, 1.0).otherwise(0.0)), 4)
        def sharp(z: Double) = round(avg(lit(2.0 * z) * sigma), 4)
        Tables.events(s, d)
          .agg(
            cov(0.6745).as("coverage_50"),
            cov(1.2816).as("coverage_80"),
            cov(1.6449).as("coverage_90"),
            sharp(0.6745).as("sharpness_50"),
            sharp(1.2816).as("sharpness_80"),
            sharp(1.6449).as("sharpness_90"))
      },
      Some("""SELECT
             |  round(avg(CASE WHEN abs(value - 100.0) <= 0.6745 * 40.0 THEN 1.0 ELSE 0.0 END), 4) AS coverage_50,
             |  round(avg(CASE WHEN abs(value - 100.0) <= 1.2816 * 40.0 THEN 1.0 ELSE 0.0 END), 4) AS coverage_80,
             |  round(avg(CASE WHEN abs(value - 100.0) <= 1.6449 * 40.0 THEN 1.0 ELSE 0.0 END), 4) AS coverage_90,
             |  round(avg(2.0 * 0.6745 * 40.0), 4) AS sharpness_50,
             |  round(avg(2.0 * 1.2816 * 40.0), 4) AS sharpness_80,
             |  round(avg(2.0 * 1.6449 * 40.0), 4) AS sharpness_90
             |FROM events""".stripMargin)
    ),

    // A6: pinball (quantile) loss at q ∈ {0.1, 0.5, 0.9}
    // (eval/metrics.py:200-236): e = y − ŷ_q; mean(q·e if e≥0 else (q−1)·e).
    OracleQuery(
      "a6_pinball_loss",
      (s, d) => {
        import s.implicits._
        def pinball(q: Double) = {
          val e = $"value" - 100.0
          round(avg(when(e >= 0, lit(q) * e).otherwise(lit(q - 1) * e)), 4)
        }
        Tables.events(s, d)
          .agg(
            pinball(0.1).as("pinball_q10"),
            pinball(0.5).as("pinball_q50"),
            pinball(0.9).as("pinball_q90"))
      },
      Some("""SELECT
             |  round(avg(CASE WHEN value - 100.0 >= 0 THEN 0.1 * (value - 100.0) ELSE -0.9 * (value - 100.0) END), 4) AS pinball_q10,
             |  round(avg(CASE WHEN value - 100.0 >= 0 THEN 0.5 * (value - 100.0) ELSE -0.5 * (value - 100.0) END), 4) AS pinball_q50,
             |  round(avg(CASE WHEN value - 100.0 >= 0 THEN 0.9 * (value - 100.0) ELSE -0.1 * (value - 100.0) END), 4) AS pinball_q90
             |FROM events""".stripMargin)
    ),

    // A7: grouped sample-std with min-count gate and floor
    // (eval/uncertainty.py:120-142): σ per bucket, n≥10, max(σ, floor).
    OracleQuery(
      "a7_grouped_sigma",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"event_type")
          .agg(stddev_samp($"value").as("sd"), count(lit(1)).as("n"))
          .filter($"n" >= 10)
          .select(
            $"event_type",
            round(greatest($"sd", lit(1.0)), 4).as("sigma"),
            $"n")
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, round(greatest(stddev_samp(value), 1.0), 4) AS sigma,
             |  count(*) AS n
             |FROM events GROUP BY event_type HAVING count(*) >= 10
             |ORDER BY event_type""".stripMargin)
    ),

    // A8: exact quantile split points (np.percentile [25,75] regimes;
    // eval/slicing.py:146). Exact linear-interpolation percentile on both
    // sides; percentile_approx is the 100 TB path (see graft.ops).
    OracleQuery(
      "a8_percentile_regimes",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .agg(
            round(expr("percentile(value, 0.25)"), 4).as("p25"),
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.75)"), 4).as("p75"))
      },
      Some("""SELECT round(quantile_cont(value, 0.25), 4) AS p25,
             |  round(quantile_cont(value, 0.5), 4) AS p50,
             |  round(quantile_cont(value, 0.75), 4) AS p75
             |FROM events""".stripMargin)
    ),

    // A9: sliced metric fan-out as GROUPING SETS (eval/slicing.py:22-168
    // recomputes A4 per slice dimension; min-10 rule applied). Group keys
    // coalesced to 'ALL' so null-ordering differences cannot bite.
    OracleQuery(
      "a9_grouping_sets",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .withColumn("dow", (weekday($"ts") + 1).cast("int"))
        ev.createOrReplaceTempView("events_gs")
        s.sql("""
          SELECT coalesce(event_type, 'ALL') AS slice_type,
                 coalesce(CAST(dow AS STRING), 'ALL') AS slice_dow,
                 count(*) AS n,
                 round(avg(abs(value - 100.0)), 4) AS mae,
                 round(sqrt(avg((value - 100.0) * (value - 100.0))), 4) AS rmse
          FROM events_gs
          GROUP BY GROUPING SETS ((event_type), (dow), ())
          HAVING count(*) >= 10
          ORDER BY slice_type, slice_dow
        """)
      },
      Some("""WITH e AS (SELECT event_type, CAST(isodow(ts) AS INT) AS dow, value FROM events)
             |SELECT coalesce(event_type, 'ALL') AS slice_type,
             |  coalesce(CAST(dow AS VARCHAR), 'ALL') AS slice_dow,
             |  count(*) AS n,
             |  round(avg(abs(value - 100.0)), 4) AS mae,
             |  round(sqrt(avg((value - 100.0) * (value - 100.0))), 4) AS rmse
             |FROM e
             |GROUP BY GROUPING SETS ((event_type), (dow), ())
             |HAVING count(*) >= 10
             |ORDER BY slice_type, slice_dow""".stripMargin)
    ),

    // A9b: hierarchical ROLLUP (region → nation subtotals → grand total).
    OracleQuery(
      "a12_rollup",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val nat = broadcast(Tables.nation(s, d))
        val reg = broadcast(Tables.region(s, d))
        cust.join(nat, $"c_nationkey" === $"n_nationkey")
          .join(reg, $"n_regionkey" === $"r_regionkey")
          .rollup($"r_name", $"n_name")
          .agg(count(lit(1)).as("cnt"), round(sum($"c_acctbal"), 4).as("sum_bal"))
          .select(
            coalesce($"r_name", lit("ALL")).as("r_name"),
            coalesce($"n_name", lit("ALL")).as("n_name"),
            $"cnt", $"sum_bal")
          .orderBy($"r_name", $"n_name")
      },
      Some("""SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
             |  count(*) AS cnt, round(sum(c_acctbal), 4) AS sum_bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY r_name, n_name""".stripMargin)
    ),

    // Set operations (beyond the reference: INTERSECT/EXCEPT breadth).
    OracleQuery(
      "o6_set_operations",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val buyers = ev.filter($"event_type" === "purchase").select($"user_id").distinct()
        val erroring = ev.filter($"event_type" === "error").select($"user_id").distinct()
        val both = buyers.intersect(erroring).agg(count(lit(1)).as("c"))
          .select($"c".as("n_both"))
        val onlyBuy = buyers.except(erroring).agg(count(lit(1)).as("c"))
          .select($"c".as("n_only_buyers"))
        both.crossJoin(onlyBuy)
      },
      Some("""SELECT
             |  (SELECT count(*) FROM (
             |     SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
             |     INTERSECT
             |     SELECT DISTINCT user_id FROM events WHERE event_type = 'error')) AS n_both,
             |  (SELECT count(*) FROM (
             |     SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
             |     EXCEPT
             |     SELECT DISTINCT user_id FROM events WHERE event_type = 'error')) AS n_only_buyers""".stripMargin)
    ),

    // A11: model comparison + ranking (eval/report.py:239-283) — per-group
    // metric then rank ascending by MAE with deterministic tiebreak.
    OracleQuery(
      "a11_metric_ranking",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy($"mae", $"event_type")
        Tables.events(s, d)
          .groupBy($"event_type")
          .agg(round(avg(abs($"value" - 100.0)), 4).as("mae"),
            round(avg($"value" - 100.0), 4).as("bias"))
          .withColumn("rank", row_number().over(w))
          .orderBy($"rank")
      },
      Some("""WITH m AS (
             |  SELECT event_type, round(avg(abs(value - 100.0)), 4) AS mae,
             |    round(avg(value - 100.0), 4) AS bias
             |  FROM events GROUP BY event_type
             |)
             |SELECT event_type, mae, bias,
             |  CAST(row_number() OVER (ORDER BY mae, event_type) AS INT) AS rank
             |FROM m ORDER BY rank""".stripMargin)
    ),

    // Salted two-phase aggregation — the skew-mitigation pattern:
    // l_returnflag has only 3 values, so a single groupBy would funnel
    // 600k rows (6B at 100 TB) into 3 reducers. Phase 1 aggregates on
    // (key, salt) spreading each hot key over 8 partitions with map-side
    // combine; phase 2 merges the 8 partials per key — shuffle volume is
    // O(keys·salt), not O(rows). Decimal partial sums make the result
    // independent of summation order, so it equals the oracle's plain
    // GROUP BY exactly.
    OracleQuery(
      "a13_salted_agg",
      (s, d) => {
        import s.implicits._
        graft.ops.SaltedAgg.aggregate(
          Tables.lineitem(s, d)
            .withColumn("rev", $"l_extendedprice" * (lit(1) - $"l_discount")),
          keys = Seq("l_returnflag"), saltKey = $"l_orderkey", salts = 8,
          specs = Seq(
            graft.ops.SaltedAgg.sumDecimal($"l_quantity", "qty"),
            graft.ops.SaltedAgg.sumDecimal($"rev", "rev", precision = 30),
            graft.ops.SaltedAgg.countRows("n")))
          .select($"l_returnflag",
            round($"qty".cast("double"), 4).as("sum_qty"),
            round($"rev".cast("double"), 4).as("sum_revenue"),
            $"n".cast("long").as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(CAST(sum(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE), 4) AS sum_qty,
             |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE), 4) AS sum_revenue,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // Sketch-based distinct counting — the 100 TB cardinality path:
    // HyperLogLog++ (approx_count_distinct) is one pass, fixed memory
    // per group, mergeable across partitions; exact countDistinct
    // expands every distinct value through the shuffle. The sketch
    // value itself is engine-specific, so the DuckDB oracle cannot
    // replay it — instead the entry's output IS the accuracy contract:
    // `within_bound` = realized relative error ≤ 3× the requested rsd
    // (0.05). DuckDB computes exact_users INDEPENDENTLY and asserts
    // the contract as a TRUE literal, so a sketch that drifted out of
    // bound flips Spark's boolean and fails the hash gate — the
    // approximation contract is driver-checked, not just spec-pinned
    // (SketchBoundSpec still pins the realized error locally). The
    // raw sketch output stays OUT of the compared columns because GK/
    // HLL merge order is not contractually deterministic across runs.
    OracleQuery(
      "a14_approx_distinct",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"event_type")
          .agg(
            countDistinct($"user_id").as("exact_users"),
            approx_count_distinct($"user_id", 0.05).as("approx_users"))
          .select($"event_type", $"exact_users",
            (abs($"approx_users" - $"exact_users") / $"exact_users" <= 0.15)
              .as("within_bound"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             |  TRUE AS within_bound
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Quantile sketches — the other 100 TB sketch path: percentile_approx
    // (Greenwald-Khanna style) is one pass, bounded memory, mergeable
    // across partitions; exact percentile materializes every value per
    // group through the shuffle. Accuracy contract under the hash
    // gate (the a14 pattern): percentile_approx(accuracy=1000)
    // guarantees rank error ≤ 1/1000, so each approx quantile must lie
    // INSIDE the exact value band at rank p ± 0.01 (10× margin) —
    // Spark checks its own sketch against its exact percentiles,
    // DuckDB computes the exact quantiles independently and asserts
    // TRUE. Sketch values stay out of the compared columns (merge
    // order is not contractually deterministic); exact p50/p95 are
    // compared value-exactly (linear-interpolation parity with
    // quantile_cont, the a16/a17 recipe).
    OracleQuery(
      "a15_approx_quantile",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            expr("percentile(l_extendedprice, array(0.49, 0.5, 0.51, 0.94, 0.95, 0.96))")
              .as("exact_q"),
            expr("percentile_approx(l_extendedprice, array(0.5, 0.95), 1000)").as("approx_q"))
          .select($"l_returnflag",
            graft.core.Parity.floorRound4(element_at($"exact_q", 2)).as("exact_p50"),
            graft.core.Parity.floorRound4(element_at($"exact_q", 5)).as("exact_p95"),
            element_at($"approx_q", 1).between(
              element_at($"exact_q", 1), element_at($"exact_q", 3)).as("p50_within"),
            element_at($"approx_q", 2).between(
              element_at($"exact_q", 4), element_at($"exact_q", 6)).as("p95_within"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  floor(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5)
             |    / 10000 AS exact_p50,
             |  floor(quantile_cont(l_extendedprice, 0.95) * 10000 + 0.5)
             |    / 10000 AS exact_p95,
             |  TRUE AS p50_within, TRUE AS p95_within
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // A16: per-group winsorization — clip a value column to its group's
    // [p05, p95] band, the outlier-taming step before any scale-
    // sensitive model fit. This entry is the EXACT spelling (linear-
    // interpolation parity with DuckDB quantile_cont, like a8/a15) and
    // is oracle-pinned; its aggregation buffer holds every value per
    // group, so it is sf-scale only — a16b below is the fixed-memory
    // production twin. Body shared via ops.RobustStats.
    OracleQuery(
      "a16_winsorize_clip",
      (s, d) => graft.ops.RobustStats.winsorizeSummary(
        Tables.events(s, d), "event_type", "value", exact = true),
      Some("""WITH stats AS (
             |  SELECT event_type,
             |    quantile_cont(value, 0.05) AS p05,
             |    quantile_cont(value, 0.95) AS p95
             |  FROM events GROUP BY event_type
             |), clip AS (
             |  SELECT e.event_type, e.value,
             |    CASE WHEN e.value < s.p05 THEN s.p05
             |         WHEN e.value > s.p95 THEN s.p95
             |         ELSE e.value END AS clipped,
             |    CASE WHEN e.value < s.p05 OR e.value > s.p95 THEN 1 ELSE 0 END AS was_clipped
             |  FROM events e JOIN stats s USING (event_type)
             |)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(was_clipped) AS BIGINT) AS n_clipped,
             |  floor(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
             |    / count(value) * 10000 + 0.5) / 10000 AS raw_mean,
             |  floor(CAST(sum(CAST(clipped AS DECIMAL(28,10))) AS DOUBLE)
             |    / count(clipped) * 10000 + 0.5) / 10000 AS winsor_mean,
             |  floor(min(clipped) * 10000 + 0.5) / 10000 AS lo,
             |  floor(max(clipped) * 10000 + 0.5) / 10000 AS hi
             |FROM clip GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // A16b: the 100 TB winsorize — percentile_approx (GK sketch, fixed
    // memory per group, accuracy 10⁴ → rank error ≤ 1e-4) in place of
    // exact percentile. Accuracy contract under the hash gate (a14
    // pattern): the approx summary joins its exact twin and the entry
    // emits the sketch-independent stats (n, raw_mean — DuckDB
    // recomputes both) plus three booleans — winsorized mean within
    // 1% of exact, clipped count within max(5, 1% of n), and the
    // realized clip band inside the exact value band at rank
    // 0.05 ± 0.005 / 0.95 ± 0.005 (50× the sketch's rank bound).
    // DuckDB asserts TRUE independently; a drifting sketch flips the
    // booleans and fails the gate. RobustStatsSpec still pins the
    // numeric drift. The 2-pass exact twin exists only for the gate —
    // production callers use winsorizeSummary(exact = false) alone.
    OracleQuery(
      "a16b_winsorize_approx",
      (s, d) => {
        import s.implicits._
        val ap = graft.ops.RobustStats.winsorizeSummary(
          Tables.events(s, d), "event_type", "value", exact = false)
        val ex = graft.ops.RobustStats.winsorizeSummary(
          Tables.events(s, d), "event_type", "value", exact = true)
        val band = Tables.events(s, d).groupBy($"event_type")
          .agg(expr("percentile(value, array(0.045, 0.055, 0.945, 0.955))").as("b"))
        ap.as("a")
          .join(ex.select($"event_type", $"n_clipped".as("nc_x"),
            $"winsor_mean".as("wm_x")), "event_type")
          .join(band, "event_type")
          .select($"event_type", $"n", $"raw_mean",
            (abs($"winsor_mean" - $"wm_x") <= greatest(abs($"wm_x") * 0.01, lit(0.01)))
              .as("mean_ok"),
            (abs($"n_clipped" - $"nc_x") <= greatest($"n" * 0.01, lit(5.0))).as("clip_ok"),
            ($"lo".between(element_at($"b", 1), element_at($"b", 2)) &&
              $"hi".between(element_at($"b", 3), element_at($"b", 4))).as("band_ok"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  floor(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
             |    / count(value) * 10000 + 0.5) / 10000 AS raw_mean,
             |  TRUE AS mean_ok, TRUE AS clip_ok, TRUE AS band_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // A17: robust z-score outlier detection (Iglewicz–Hoaglin: 0.6745 ·
    // (x − median) / MAD, flag |z| > 3.5) — the outlier scorer that
    // survives the outliers themselves, unlike mean/σ. Two aggregate
    // passes by construction (median, then median absolute deviation);
    // both per-group stats tables broadcast, so the flagging stays
    // map-side on the fact. Exact-percentile spelling, oracle-pinned;
    // a17b is the fixed-memory twin. MAD=0 groups yield NULL z-scores
    // on BOTH sides (nullif in the oracle) — see RobustStats.
    OracleQuery(
      "a17_robust_zscore",
      (s, d) => graft.ops.RobustStats.robustZscoreSummary(
        Tables.events(s, d), "event_type", "value", exact = true),
      Some("""WITH med AS (
             |  SELECT event_type, quantile_cont(value, 0.5) AS med
             |  FROM events GROUP BY event_type
             |), mad AS (
             |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
             |  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
             |), rz AS (
             |  SELECT e.event_type, 0.6745 * (e.value - m.med) / nullif(d.mad, 0) AS rz
             |  FROM events e
             |  JOIN med m USING (event_type)
             |  JOIN mad d USING (event_type)
             |)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(CASE WHEN abs(rz) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             |  round(max(abs(rz)), 4) AS max_abs_rz
             |FROM rz GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // A17b: robust z-score on percentile_approx — same plan shape,
    // fixed memory. Accuracy contract under the hash gate (a14
    // pattern): outlier count within max(5, 1% of n) of the exact
    // twin's, max |robust z| within 5% relative — DuckDB recomputes n
    // and asserts TRUE; degenerate MAD=0 groups (NULL max_abs_rz on
    // both paths) count as in-bound only when both sides are NULL.
    // RobustStatsSpec pins the numeric drift; the exact twin exists
    // only for the gate.
    OracleQuery(
      "a17b_robust_zscore_approx",
      (s, d) => {
        import s.implicits._
        val ap = graft.ops.RobustStats.robustZscoreSummary(
          Tables.events(s, d), "event_type", "value", exact = false)
        val ex = graft.ops.RobustStats.robustZscoreSummary(
          Tables.events(s, d), "event_type", "value", exact = true)
        ap.as("a")
          .join(ex.select($"event_type", $"n_outliers".as("no_x"),
            $"max_abs_rz".as("mz_x")), "event_type")
          .select($"event_type", $"n",
            (abs($"n_outliers" - $"no_x") <= greatest($"n" * 0.01, lit(5.0)))
              .as("outliers_ok"),
            (($"max_abs_rz".isNull && $"mz_x".isNull) ||
              abs($"max_abs_rz" - $"mz_x") <= abs($"mz_x") * 0.05).as("maxrz_ok"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  TRUE AS outliers_ok, TRUE AS maxrz_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // A18: CUBE — the all-subsets companion to a9's GROUPING SETS and
    // a12's ROLLUP (2^k groupings in ONE expand+aggregate pass, same
    // single-shuffle plan class).
    OracleQuery(
      "a18_cube",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 4).as("sum_qty"))
          .select(
            coalesce($"l_returnflag", lit("ALL")).as("l_returnflag"),
            coalesce($"l_linestatus", lit("ALL")).as("l_linestatus"),
            $"cnt", $"sum_qty")
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
             |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
             |  count(*) AS cnt, round(sum(l_quantity), 4) AS sum_qty
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // A19 / V: per-segment distribution-drift profile between two
    // snapshots of the same table (here: first vs second half of the
    // month) — the data-validation shape (TFDV-style) a production
    // training pipeline runs before every ingest is admitted. Per
    // event_type: row counts, means, and a PSI (population stability
    // index) over 10 fixed-width value bins with additive smoothing.
    // ONE scan of the table: the slice label and bin id are row-local
    // expressions, the (event_type, bin, slice) counts are a hash
    // aggregate with map-side partials, and the per-type re-aggregation
    // runs over ≤|types|×10×2 rows — driver-free, bounded state, and at
    // 100 TB exactly one exchange of sketch-sized partials. Smoothed
    // proportions make PSI total (no empty-bin ±∞): p = (n + 0.5) /
    // (N + 5).
    OracleQuery(
      "a19_profile_drift",
      (s, d) => {
        import s.implicits._
        val binned = Tables.events(s, d)
          // explicit not-null: the inner joins downstream infer
          // isnotnull(event_type) into SOME branches' scans — spelling it
          // here makes every cell-aggregate subtree byte-identical, so
          // AQE collapses them into one ReusedExchange (one corpus scan)
          .filter($"event_type".isNotNull)
          .select($"event_type", $"value",
            when(to_date($"ts") < lit("2024-01-16"), lit("a")).otherwise(lit("b")).as("slice"),
            least(lit(9), floor($"value" / 50.0)).cast("int").as("bin"))
        // ONE corpus scan: every downstream total derives from the cell
        // aggregate (mean = Σsv/Σn). The cell table is sketch-sized
        // (≤ |types|×20 rows), so it is CHECKPOINTED — column pruning
        // would otherwise specialize each consumer's copy of the
        // aggregate subtree (one keeps sv, one drops it) and re-scan the
        // 100 TB table per branch; materializing the sketch severs that
        // lineage for the cost of a few hundred bytes. Pinned in
        // PlanSpec: the drift query's own plan contains NO events scan.
        val cells = binned.groupBy($"event_type", $"slice", $"bin")
          .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
          .localCheckpoint()
        val totals = cells.groupBy($"event_type", $"slice")
          .agg(sum($"n").as("tot"), (sum($"sv") / sum($"n")).as("mean"))
        // dense bin grid (10 bins × 2 slices per type) so both slices
        // contribute a smoothed term even where one slice is empty
        val grid = totals.select($"event_type", $"slice", $"tot", $"mean")
          .crossJoin(s.range(10).select($"id".cast("int").as("bin")))
        val p = grid.join(cells, Seq("event_type", "slice", "bin"), "left")
          .select($"event_type", $"slice", $"bin", $"tot", $"mean",
            ((coalesce($"n", lit(0L)) + 0.5) / ($"tot" + 5.0)).as("p"))
        val byBin = p.groupBy($"event_type", $"bin").agg(
          max(when($"slice" === "a", $"p")).as("pa"),
          max(when($"slice" === "b", $"p")).as("pb"))
        val psi = byBin.groupBy($"event_type")
          .agg(round(sum(($"pa" - $"pb") * log($"pa" / $"pb")), 6).as("psi"))
        val wide = totals.groupBy($"event_type").agg(
          max(when($"slice" === "a", $"tot")).as("n_a"),
          max(when($"slice" === "b", $"tot")).as("n_b"),
          round(max(when($"slice" === "a", $"mean")), 4).as("mean_a"),
          round(max(when($"slice" === "b", $"mean")), 4).as("mean_b"))
        wide.join(psi, Seq("event_type")).orderBy($"event_type")
      },
      Some("""WITH binned AS (
             |  SELECT event_type, value,
             |    CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 'a' ELSE 'b' END AS slice,
             |    CAST(least(9, floor(value / 50.0)) AS INT) AS bin
             |  FROM events
             |), cells AS (
             |  SELECT event_type, slice, bin, count(*) AS n, sum(value) AS sv
             |  FROM binned GROUP BY event_type, slice, bin
             |), totals AS (
             |  SELECT event_type, slice, CAST(sum(n) AS BIGINT) AS tot,
             |    sum(sv) / sum(n) AS mean
             |  FROM cells GROUP BY event_type, slice
             |), grid AS (
             |  SELECT t.event_type, t.slice, t.tot, b.bin
             |  FROM totals t CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) b
             |), p AS (
             |  SELECT g.event_type, g.slice, g.bin,
             |    (coalesce(c.n, 0) + 0.5) / (g.tot + 5.0) AS p
             |  FROM grid g LEFT JOIN cells c
             |    ON g.event_type = c.event_type AND g.slice = c.slice AND g.bin = c.bin
             |), by_bin AS (
             |  SELECT event_type, bin,
             |    max(CASE WHEN slice = 'a' THEN p END) AS pa,
             |    max(CASE WHEN slice = 'b' THEN p END) AS pb
             |  FROM p GROUP BY event_type, bin
             |), psi AS (
             |  SELECT event_type, round(sum((pa - pb) * ln(pa / pb)), 6) AS psi
             |  FROM by_bin GROUP BY event_type
             |), wide AS (
             |  SELECT event_type,
             |    max(CASE WHEN slice = 'a' THEN tot END) AS n_a,
             |    max(CASE WHEN slice = 'b' THEN tot END) AS n_b,
             |    round(max(CASE WHEN slice = 'a' THEN mean END), 4) AS mean_a,
             |    round(max(CASE WHEN slice = 'b' THEN mean END), 4) AS mean_b
             |  FROM totals GROUP BY event_type
             |)
             |SELECT w.event_type, w.n_a, w.n_b, w.mean_a, w.mean_b, s.psi
             |FROM wide w JOIN psi s ON w.event_type = s.event_type
             |ORDER BY w.event_type""".stripMargin)
    ),

    // A20: exact AUC via the Mann–Whitney rank-sum — the model-eval
    // metric ("do purchases score higher?") that naive spellings
    // compute with a GLOBAL row_number over the full fact (one-reducer
    // sort, dead at 100 TB). Scale spelling: collapse to DISTINCT
    // scores first (hash agg with map-side partials — ties handled
    // EXACTLY by construction: each distinct score carries its
    // pos/neg counts, contributing cum_neg_below + ½·n_neg, the
    // midrank correction), then the cumulative negative count comes
    // from ops/PrefixSum's bucketed prefix sum — the only window is
    // (group, bucket)-partitioned, 64-way parallel. Every term is an
    // integer or half-integer, so the sum is EXACT in double
    // regardless of partition order — no fp-drift hazard behind the
    // rounding.
    OracleQuery(
      "a20_auc_ranksum",
      (s, d) => {
        import s.implicits._
        val scored = Tables.events(s, d).select($"value".as("score"),
          when($"event_type" === "purchase", 1L).otherwise(0L).as("pos"))
        val perScore = scored.groupBy($"score").agg(
          sum($"pos").as("n_pos"), (count(lit(1)) - sum($"pos")).as("n_neg"))
          .withColumn("g", lit("all"))
        val cum = graft.ops.PrefixSum.withCumsum(
          perScore, "g", "score", "n_neg", "cum_neg")
        // the rank-sum numerator is summed DOUBLED as DECIMAL(38,0) —
        // exact integers at any scale — and halved once at the end:
        // the old double spelling stayed exact only while the running
        // sum of half-integers sat under 2⁵³ (~10⁸ rows), then drifted
        // silently; np·nn likewise multiplies in decimal
        cum.agg(
            sum($"n_pos".cast("decimal(38,0)")
              * (lit(2) * $"cum_neg" - $"n_neg")).as("num2"),
            sum($"n_pos").as("np"), sum($"n_neg").as("nn"))
          .select(
            round(($"num2".cast("double") / 2.0)
              / ($"np".cast("decimal(38,0)") * $"nn").cast("double"), 6).as("auc"),
            $"np".cast("long").as("n_pos"), $"nn".cast("long").as("n_neg"))
      },
      Some("""WITH scored AS (
             |  SELECT value AS score,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
             |  FROM events
             |), per_score AS (
             |  SELECT score, sum(pos) AS n_pos, count(*) - sum(pos) AS n_neg
             |  FROM scored GROUP BY score
             |), cum AS (
             |  SELECT n_pos, n_neg,
             |    sum(n_neg) OVER (ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_neg
             |  FROM per_score
             |)
             |SELECT round((CAST(sum(CAST(n_pos AS HUGEINT) * (2 * cum_neg - n_neg)) AS DOUBLE) / 2.0)
             |         / CAST(sum(CAST(n_pos AS HUGEINT)) * sum(n_neg) AS DOUBLE), 6) AS auc,
             |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
             |  CAST(sum(n_neg) AS BIGINT) AS n_neg
             |FROM cum""".stripMargin)
    ),

    // A22: SEGMENTED AUC — a20 per cohort (user_id mod 4), the "is the
    // model equally good for every segment" fairness/debugging cut.
    // Identical machinery, but the prefix sum now runs with a REAL
    // partition column: ops/PrefixSum's bucketed cumsum is per-group by
    // construction (the only window is (segment, bucket)-partitioned),
    // so segments never serialize through one reducer the way a
    // PARTITION BY segment window would for a hot segment.
    OracleQuery(
      "a22_auc_by_segment",
      (s, d) => {
        import s.implicits._
        val scored = Tables.events(s, d).select(
          ($"user_id" % 4).cast("int").as("seg"), $"value".as("score"),
          when($"event_type" === "purchase", 1L).otherwise(0L).as("pos"))
        val perScore = scored.groupBy($"seg", $"score").agg(
          sum($"pos").as("n_pos"), (count(lit(1)) - sum($"pos")).as("n_neg"))
        val cum = graft.ops.PrefixSum.withCumsum(
          perScore, "seg", "score", "n_neg", "cum_neg")
        // doubled-integer numerator in DECIMAL(38,0) — the a20 recipe
        // (half-integer double sums drift silently past ~10^8 rows)
        cum.groupBy($"seg").agg(
            sum($"n_pos".cast("decimal(38,0)")
              * (lit(2) * $"cum_neg" - $"n_neg")).as("num2"),
            sum($"n_pos").as("np"), sum($"n_neg").as("nn"))
          .select($"seg",
            round(($"num2".cast("double") / 2.0)
              / ($"np".cast("decimal(38,0)") * $"nn").cast("double"), 6).as("auc"),
            $"np".cast("long").as("n_pos"), $"nn".cast("long").as("n_neg"))
          .orderBy($"seg")
      },
      Some("""WITH scored AS (
             |  SELECT CAST(user_id % 4 AS INT) AS seg, value AS score,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
             |  FROM events
             |), per_score AS (
             |  SELECT seg, score, sum(pos) AS n_pos, count(*) - sum(pos) AS n_neg
             |  FROM scored GROUP BY seg, score
             |), cum AS (
             |  SELECT seg, n_pos, n_neg,
             |    sum(n_neg) OVER (PARTITION BY seg ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_neg
             |  FROM per_score
             |)
             |SELECT seg,
             |  round((CAST(sum(CAST(n_pos AS HUGEINT) * (2 * cum_neg - n_neg)) AS DOUBLE) / 2.0)
             |    / CAST(sum(CAST(n_pos AS HUGEINT)) * sum(n_neg) AS DOUBLE), 6) AS auc,
             |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
             |  CAST(sum(n_neg) AS BIGINT) AS n_neg
             |FROM cum GROUP BY seg ORDER BY seg""".stripMargin)
    ),

    // A21: calibration / reliability bins + ECE — AUC's companion
    // (a20 asks "does the score rank positives first?", this asks "does
    // a score of 0.7 mean 70%?"). Score = value scaled to [0,1], label
    // = purchase; 10 score deciles → per-bin mean predicted vs observed
    // rate, plus the one-row expected calibration error
    // Σ (n_b/N)·|acc_b − conf_b|. ONE scan, one hash agg keyed by bin
    // (map-side partials), ECE folds the ≤10 bin rows through a second
    // tiny agg broadcast back — nothing here is ever wider than the
    // bin table. The per-bin means round to 4 (fp sums), but n and the
    // bin ids are exact.
    OracleQuery(
      "a21_calibration_bins",
      (s, d) => {
        import s.implicits._
        val scored = Tables.events(s, d).select(
          least(lit(9), floor($"value" / 50.0)).cast("int").as("bin"),
          ($"value" / 500.0).as("conf"),
          when($"event_type" === "purchase", 1.0).otherwise(0.0).as("y"))
        val bins = scored.groupBy($"bin").agg(
          count(lit(1)).as("n"),
          avg($"conf").as("mean_conf"),
          avg($"y").as("obs_rate"))
        val ece = bins.agg(
          (sum($"n" * abs($"obs_rate" - $"mean_conf")) / sum($"n")).as("ece"))
        bins.crossJoin(broadcast(ece)) // 1-row scalar join (sanctioned)
          .select($"bin", $"n",
            round($"mean_conf", 4).as("mean_conf"),
            round($"obs_rate", 4).as("obs_rate"),
            round($"ece", 4).as("ece"))
          .orderBy($"bin")
      },
      Some("""WITH scored AS (
             |  SELECT CAST(least(9, floor(value / 50.0)) AS INT) AS bin,
             |    value / 500.0 AS conf,
             |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
             |  FROM events
             |), bins AS (
             |  SELECT bin, count(*) AS n, avg(conf) AS mean_conf, avg(y) AS obs_rate
             |  FROM scored GROUP BY bin
             |), e AS (
             |  SELECT sum(n * abs(obs_rate - mean_conf)) / sum(n) AS ece FROM bins
             |)
             |SELECT bin, n, round(mean_conf, 4) AS mean_conf,
             |  round(obs_rate, 4) AS obs_rate, round(e.ece, 4) AS ece
             |FROM bins CROSS JOIN e ORDER BY bin""".stripMargin)
    ),

    // A23: grouped top-k through the BOUNDED mergeable aggregate
    // (functions/BoundedTopK) instead of the row_number window. The
    // window spelling — which the ORACLE deliberately uses — shuffles
    // and sorts EVERY order of every priority group to keep 3; the
    // aggregate's map-side partial caps each buffer at 2k candidates,
    // so the exchange carries ≤ k rows per (mapper, group) and a hot
    // group never serializes its history through one task's sort.
    // Equality of the two spellings under the (score DESC, id ASC)
    // total order is exactly what the hash compare proves.
    OracleQuery(
      "a23_grouped_topk",
      (s, d) => {
        import s.implicits._
        val topk = graft.functions.BoundedTopK.udaf(3)
        Tables.orders(s, d)
          .groupBy($"o_orderpriority")
          .agg(topk($"o_totalprice", $"o_orderkey").as("tk"))
          .select($"o_orderpriority", posexplode($"tk"))
          .select($"o_orderpriority",
            ($"pos" + 1).cast("long").as("rank"),
            round($"col._1", 4).as("o_totalprice"),
            $"col._2".as("o_orderkey"))
          .orderBy($"o_orderpriority", $"rank")
      },
      Some("""SELECT o_orderpriority, rank, round(o_totalprice, 4) AS o_totalprice, o_orderkey
             |FROM (
             |  SELECT o_orderpriority, o_totalprice, o_orderkey,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
             |  FROM orders
             |)
             |WHERE rank <= 3
             |ORDER BY o_orderpriority, rank""".stripMargin)
    ),

    // A24: per-group closed-form OLS — slope/intercept/R² of
    // extendedprice on quantity within each returnflag, via the SQL
    // regression aggregates (regr_slope/regr_intercept/regr_r2). These
    // are moment aggregates (Σx, Σy, Σxy, Σx², n) with map-side partial
    // combine — ONE hash-agg pass, fixed memory per group, no per-group
    // driver loop: fitting a million per-key models costs the same
    // shuffle as counting them. The grouped generalization of
    // pipe_ridge_closed_form's global fit (eval/models.py:118-141 fits
    // one model on the driver; here the GROUP BY is the model axis).
    OracleQuery(
      "a24_grouped_regression",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            expr("regr_slope(l_extendedprice, l_quantity)").as("slope_raw"),
            expr("regr_intercept(l_extendedprice, l_quantity)").as("icept_raw"),
            expr("regr_r2(l_extendedprice, l_quantity)").as("r2_raw"),
            expr("regr_count(l_extendedprice, l_quantity)").as("n"))
          .select($"l_returnflag",
            round($"slope_raw", 4).as("slope"),
            round($"icept_raw", 4).as("intercept"),
            round($"r2_raw", 6).as("r2"),
            $"n".cast("long").as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
             |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
             |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // A25: equi-width histogram — 20 bins of extendedprice per
    // returnflag. Two passes: a 1-row global min/max aggregate
    // broadcast back (the sanctioned scalar-stat join), then a hash agg
    // keyed by (group, bin). Shuffle volume is O(groups × bins), never
    // O(rows) — the profiling primitive behind o20's histogram-descent
    // quantiles, exposed as a query. Bin arithmetic is explicit floor()
    // on doubles (not width_bucket) so Spark and DuckDB evaluate the
    // IDENTICAL IEEE expression — bucket ids are exact, no rounding
    // tolerance needed on the keys.
    OracleQuery(
      "a25_histogram",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val bounds = li.agg(
          min($"l_extendedprice").as("mn"), max($"l_extendedprice").as("mx"))
        li.crossJoin(broadcast(bounds))
          .withColumn("bin",
            least(lit(19), floor(($"l_extendedprice" - $"mn") * 20.0 / ($"mx" - $"mn")))
              .cast("int"))
          .groupBy($"l_returnflag", $"bin")
          .agg(count(lit(1)).as("n"),
            round(min($"l_extendedprice"), 4).as("bin_min"),
            round(max($"l_extendedprice"), 4).as("bin_max"))
          .orderBy($"l_returnflag", $"bin")
      },
      Some("""WITH b AS (
             |  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
             |  FROM lineitem
             |)
             |SELECT l_returnflag,
             |  CAST(least(19, floor((l_extendedprice - mn) * 20.0 / (mx - mn))) AS INT) AS bin,
             |  count(*) AS n,
             |  round(min(l_extendedprice), 4) AS bin_min,
             |  round(max(l_extendedprice), 4) AS bin_max
             |FROM lineitem CROSS JOIN b
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // A26: grouped closed-form RIDGE with two features — the million-
    // models-in-one-pass generalization of a24: per returnflag, fit
    // price ~ b0 + b1·quantity + b2·discount with an L2 penalty on the
    // slopes, entirely from ONE moment aggregate (n, Σx, Σx², Σxy per
    // feature pair) followed by row-local 2×2 normal-equation algebra
    // (explicit determinant inversion). No per-group driver loop, no
    // matrix library: the shuffle carries 10 doubles per group
    // whatever the fact size. Centered second moments are derived
    // algebraically (Sxx = Σx² − (Σx)²/n) — fine here because the
    // regressor scales (1–50, 0–0.1) keep the cancellation benign.
    OracleQuery(
      "a26_grouped_ridge",
      (s, d) => {
        import s.implicits._
        val lam = 1000.0
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            count(lit(1)).cast("double").as("n"),
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
          .withColumn("det",
            ($"cxx1" + lam) * ($"cxx2" + lam) - $"cx12" * $"cx12")
          .withColumn("b1", ($"cx1y" * ($"cxx2" + lam) - $"cx2y" * $"cx12") / $"det")
          .withColumn("b2", ($"cx2y" * ($"cxx1" + lam) - $"cx1y" * $"cx12") / $"det")
          .withColumn("b0", ($"sy" - $"b1" * $"s1" - $"b2" * $"s2") / $"n")
          .select($"l_returnflag",
            round($"b0", 4).as("b0"), round($"b1", 4).as("b1"),
            round($"b2", 4).as("b2"), $"n".cast("long").as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag,
             |    CAST(count(*) AS DOUBLE) AS n,
             |    sum(l_quantity) AS s1, sum(l_discount) AS s2,
             |    sum(l_extendedprice) AS sy,
             |    sum(l_quantity * l_quantity) AS s11,
             |    sum(l_discount * l_discount) AS s22,
             |    sum(l_quantity * l_discount) AS s12,
             |    sum(l_quantity * l_extendedprice) AS s1y,
             |    sum(l_discount * l_extendedprice) AS s2y
             |  FROM lineitem GROUP BY l_returnflag
             |), c AS (
             |  SELECT l_returnflag, n, s1, s2, sy,
             |    s11 - s1 * s1 / n AS cxx1,
             |    s22 - s2 * s2 / n AS cxx2,
             |    s12 - s1 * s2 / n AS cx12,
             |    s1y - s1 * sy / n AS cx1y,
             |    s2y - s2 * sy / n AS cx2y
             |  FROM m
             |), f AS (
             |  SELECT l_returnflag, n, s1, s2, sy, cx12, cx1y, cx2y,
             |    (cxx1 + 1000.0) * (cxx2 + 1000.0) - cx12 * cx12 AS det,
             |    cxx1, cxx2
             |  FROM c
             |), b AS (
             |  SELECT l_returnflag, n, s1, s2, sy,
             |    (cx1y * (cxx2 + 1000.0) - cx2y * cx12) / det AS b1,
             |    (cx2y * (cxx1 + 1000.0) - cx1y * cx12) / det AS b2
             |  FROM f
             |)
             |SELECT l_returnflag, round((sy - b1 * s1 - b2 * s2) / n, 4) AS b0,
             |  round(b1, 4) AS b1, round(b2, 4) AS b2,
             |  CAST(n AS BIGINT) AS n
             |FROM b ORDER BY l_returnflag""".stripMargin)
    ),

    // A27: daily conversion rate with a Wilson 95% interval — the
    // uncertainty-aware twin of a plain rate: at 100 TB some slices
    // still have 50 rows, and reporting p̂ without its interval invites
    // bad decisions on thin cells. One (day) hash agg (conversions are
    // a conditional sum), then the Wilson score bounds as row-local
    // arithmetic — identical IEEE formula text on both engines, z
    // pinned at the literal 1.96. The Wilson form (not normal approx)
    // stays inside [0,1] on extreme cells.
    OracleQuery(
      "a27_wilson_ci",
      (s, d) => {
        import s.implicits._
        val z = 1.96
        Tables.events(s, d)
          .groupBy(to_date($"ts").as("day"))
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(when($"event_type" === "purchase", 1.0).otherwise(0.0)).as("k"))
          .withColumn("p", $"k" / $"n")
          .withColumn("den", lit(1.0) + lit(z * z) / $"n")
          .withColumn("ctr", ($"p" + lit(z * z) / (lit(2.0) * $"n")) / $"den")
          .withColumn("hw",
            lit(z) * sqrt($"p" * (lit(1.0) - $"p") / $"n" +
              lit(z * z) / (lit(4.0) * $"n" * $"n")) / $"den")
          .select($"day".cast("timestamp").as("day"),
            $"n".cast("long").as("n"),
            round($"p", 4).as("conv"),
            round($"ctr" - $"hw", 4).as("ci_lo"),
            round($"ctr" + $"hw", 4).as("ci_hi"))
          .orderBy($"day")
      },
      Some("""WITH agg AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS DOUBLE) AS n,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS k
             |  FROM events GROUP BY 1
             |), w AS (
             |  SELECT day, n, k / n AS p,
             |    1.0 + (1.96 * 1.96) / n AS den
             |  FROM agg
             |), c AS (
             |  SELECT day, n, p, den,
             |    (p + (1.96 * 1.96) / (2.0 * n)) / den AS ctr,
             |    1.96 * sqrt(p * (1.0 - p) / n +
             |      (1.96 * 1.96) / (4.0 * n * n)) / den AS hw
             |  FROM w
             |)
             |SELECT CAST(day AS TIMESTAMP) AS day, CAST(n AS BIGINT) AS n,
             |  round(p, 4) AS conv,
             |  round(ctr - hw, 4) AS ci_lo, round(ctr + hw, 4) AS ci_hi
             |FROM c ORDER BY day""".stripMargin)
    ),

    // A28: lead–lag cross-correlation — corr(purchase value_t,
    // click value_{t+k}) for k ∈ [−3, 3] on the daily series: does one
    // series LEAD the other, and by how many days? One daily hash agg
    // builds both series as conditional means in a single pass; the
    // lag axis is a 7-element explode joined back on shifted day (an
    // equi-join on a date expression, never a cross product of days);
    // one corr aggregate per lag. The whole sweep is O(days × lags)
    // intermediate rows — adding lags widens the explode, not the
    // number of passes.
    OracleQuery(
      "a28_crosscorr_lags",
      (s, d) => {
        import s.implicits._
        val daily = Tables.events(s, d)
          .groupBy(to_date($"ts").as("day"))
          .agg(
            avg(when($"event_type" === "purchase", $"value")).as("x"),
            avg(when($"event_type" === "click", $"value")).as("y"))
        val a = daily.select($"day", $"x")
          .withColumn("lag", explode(array((-3 to 3).map(lit): _*)))
        val b = daily.select($"day".as("bday"), $"y")
        val c = corr($"x", $"y")
        a.join(b, $"bday" === date_add($"day", $"lag"))
          .groupBy($"lag")
          .agg(
            round(when(isnan(c), lit(null)).otherwise(c), 4).as("xcorr"),
            count(lit(1)).as("n_days"))
          .orderBy($"lag")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS x,
             |    avg(CASE WHEN event_type = 'click' THEN value END) AS y
             |  FROM events GROUP BY 1
             |), lags AS (
             |  SELECT CAST(unnest(generate_series(-3, 3)) AS INT) AS lag
             |)
             |SELECT l.lag, round(corr(a.x, b.y), 4) AS xcorr,
             |  count(*) AS n_days
             |FROM lags l
             |JOIN daily a ON true
             |JOIN daily b ON b.day = a.day + l.lag
             |GROUP BY l.lag ORDER BY l.lag""".stripMargin)
    ),

    // A29: A/B uplift with a pooled two-proportion z-test — the
    // experimentation readout: users split into arms by the engine-
    // agnostic md5-prefix hash (the o7/o21 pattern, so the oracle
    // replays the identical assignment), per-arm conversion from one
    // (arm) hash agg over the per-user collapse, then uplift and the
    // pooled z statistic as row-local arithmetic on the 2-row arm
    // table. Two keyed exchanges however large the event log; the
    // statistics cost nothing beyond the rates.
    OracleQuery(
      "a29_ab_uplift",
      (s, d) => {
        import s.implicits._
        val perUser = Tables.events(s, d)
          .groupBy($"user_id")
          // "converted" = any HIGH-VALUE purchase: rare enough that
          // 0 < pooled p < 1 (an every-user event would zero the
          // pooled variance — and be a pointless experiment anyway)
          .agg(max(when($"event_type" === "purchase" && $"value" > 300.0, 1.0)
            .otherwise(0.0)).as("converted"))
          .withColumn("arm",
            expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 2")
              .cast("int"))
        val arms = perUser.groupBy($"arm")
          .agg(count(lit(1)).cast("double").as("n"), sum($"converted").as("k"))
          .withColumn("p", $"k" / $"n")
        val a = arms.filter($"arm" === 0)
          .select($"n".as("n_a"), $"k".as("k_a"), $"p".as("p_a"))
        val b = arms.filter($"arm" === 1)
          .select($"n".as("n_b"), $"k".as("k_b"), $"p".as("p_b"))
        a.crossJoin(b)
          .withColumn("pp", ($"k_a" + $"k_b") / ($"n_a" + $"n_b"))
          .withColumn("se", sqrt($"pp" * (lit(1.0) - $"pp") *
            (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")))
          .select(
            $"n_a".cast("long").as("n_a"), round($"p_a", 4).as("conv_a"),
            $"n_b".cast("long").as("n_b"), round($"p_b", 4).as("conv_b"),
            round($"p_b" - $"p_a", 4).as("uplift"),
            // degenerate pooled variance (all or none converted) → no
            // test statistic; ANSI double-division would throw, DuckDB
            // would return ±inf — both sides agree on NULL instead
            round(when($"se" > 0.0, ($"p_b" - $"p_a") / $"se"), 4).as("z"))
      },
      Some("""WITH per_user AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase' AND value > 300.0
             |             THEN 1.0 ELSE 0.0 END) AS converted
             |  FROM events GROUP BY user_id
             |), armed AS (
             |  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS INT) AS arm,
             |    converted
             |  FROM per_user
             |), arms AS (
             |  SELECT arm, CAST(count(*) AS DOUBLE) AS n, sum(converted) AS k,
             |    sum(converted) / CAST(count(*) AS DOUBLE) AS p
             |  FROM armed GROUP BY arm
             |), ab AS (
             |  SELECT
             |    (SELECT n FROM arms WHERE arm = 0) AS n_a,
             |    (SELECT k FROM arms WHERE arm = 0) AS k_a,
             |    (SELECT p FROM arms WHERE arm = 0) AS p_a,
             |    (SELECT n FROM arms WHERE arm = 1) AS n_b,
             |    (SELECT k FROM arms WHERE arm = 1) AS k_b,
             |    (SELECT p FROM arms WHERE arm = 1) AS p_b
             |), st AS (
             |  SELECT n_a, p_a, n_b, p_b,
             |    (k_a + k_b) / (n_a + n_b) AS pp
             |  FROM ab
             |)
             |SELECT CAST(n_a AS BIGINT) AS n_a, round(p_a, 4) AS conv_a,
             |  CAST(n_b AS BIGINT) AS n_b, round(p_b, 4) AS conv_b,
             |  round(p_b - p_a, 4) AS uplift,
             |  round(CASE WHEN pp > 0.0 AND pp < 1.0 THEN (p_b - p_a) /
             |    sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) END, 4) AS z
             |FROM st""".stripMargin)
    ),

    // A30: weighted median — the robust location estimate when rows carry
    // a mass (here: price weighted by quantity). Spelled as "lowest value
    // whose cumulative weight reaches half the group total", with a RANGE
    // frame so every tie of a value sees the same cumulative weight — the
    // result is deterministic under any tie order. One exchange on the
    // group key; the two window functions and the final min share it.
    // l_quantity is integral, so the cumulative sums are exact in double
    // and the >= half-total predicate cannot flip on summation order.
    // 100 TB: per-group sort is the cost — for few fat groups route
    // through o20_exact_quantiles' histogram descent instead.
    OracleQuery(
      "a30_weighted_median",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val byVal = Window.partitionBy($"l_returnflag").orderBy($"l_extendedprice")
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val whole = Window.partitionBy($"l_returnflag")
        Tables.lineitem(s, d)
          .withColumn("cumw", sum($"l_quantity").over(byVal))
          .withColumn("totw", sum($"l_quantity").over(whole))
          .filter($"cumw" >= $"totw" / 2.0)
          .groupBy($"l_returnflag")
          .agg(round(min($"l_extendedprice"), 4).as("wmedian"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, round(min(l_extendedprice), 4) AS wmedian
             |FROM (
             |  SELECT l_returnflag, l_extendedprice,
             |    sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
             |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             |    sum(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
             |  FROM lineitem
             |)
             |WHERE cumw >= totw / 2.0
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)
    ),

    // A32: Gini coefficient of customer spend per nation — the standard
    // inequality/concentration metric for "how skewed is revenue across
    // accounts". Lorenz rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n on
    // ascending spend. Ranks within a tie block of equal x contribute
    // x·Σi regardless of permutation, so ties don't break determinism.
    // Per-customer spends are rounded to 4 dp and decimal-cast BEFORE
    // the rank products, so Σ(i·x) is exact integer-scaled arithmetic on
    // both engines — no parallel-summation ulp can flip the 4-dp hash.
    // Two keyed exchanges (customer collapse, nation window) at any SF.
    OracleQuery(
      "a32_gini_spend",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val spend = Tables.orders(s, d)
          .groupBy($"o_custkey")
          .agg(round(sum($"o_totalprice"), 4).cast("decimal(18,4)").as("x"))
          .join(Tables.customer(s, d).select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
        val byNation = Window.partitionBy($"c_nationkey").orderBy($"x", $"o_custkey")
        spend
          .withColumn("i", row_number().over(byNation).cast("decimal(18,0)"))
          .groupBy($"c_nationkey")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum($"x").cast("double").as("sx"),
            sum($"i" * $"x").cast("double").as("six"))
          .select($"c_nationkey".as("nationkey"),
            $"n".cast("bigint").as("n_customers"),
            round(lit(2.0) * $"six" / ($"n" * $"sx") - ($"n" + 1.0) / $"n", 4).as("gini"))
          .orderBy($"nationkey")
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey, CAST(round(sum(o_totalprice), 4) AS DECIMAL(18,4)) AS x
             |  FROM orders GROUP BY o_custkey
             |), ranked AS (
             |  SELECT c_nationkey, x,
             |    CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY x, o_custkey)
             |      AS DECIMAL(18,0)) AS i
             |  FROM spend JOIN customer ON o_custkey = c_custkey
             |), g AS (
             |  SELECT c_nationkey, CAST(count(*) AS DOUBLE) AS n,
             |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(i * x) AS DOUBLE) AS six
             |  FROM ranked GROUP BY c_nationkey
             |)
             |SELECT c_nationkey AS nationkey, CAST(n AS BIGINT) AS n_customers,
             |  round(2.0 * six / (n * sx) - (n + 1.0) / n, 4) AS gini
             |FROM g ORDER BY nationkey""".stripMargin)
    ),

    // Benford first-digit audit (a31) — the classic fraud/synthetic-data
    // screen: does the leading digit of order totals follow
    // log10(1 + 1/d)? Per-priority digit histogram + chi-square
    // statistic. The leading digit is extracted ARITHMETIC-FREE of
    // log10: prices are 2-decimal doubles, so round(x*100) is within
    // one ulp of an integer, never near a .5 boundary, and the first
    // character of that integer's decimal rendering is the significant
    // digit — engines can disagree on log10's last ulp at exact powers
    // of 10 (which would flip floor(log10) and misbin), but never on
    // integer-to-string. One (priority, digit) hash agg over row-local
    // digit extraction; expected counts and chi² are row-local algebra
    // on the ≤45-row histogram plus a per-priority window sum. Zero
    // joins; integer counts exact; doubles rounded to 4.
    OracleQuery(
      "a31_benford_digits",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"pri")
        Tables.orders(s, d)
          .select($"o_orderpriority".as("pri"),
            substring(round($"o_totalprice" * 100).cast("long").cast("string"), 1, 1)
              .cast("int").as("digit"))
          .groupBy($"pri", $"digit").agg(count(lit(1)).as("n"))
          .withColumn("n_pri", sum($"n").over(w))
          .withColumn("p_obs", round($"n" / $"n_pri".cast("double"), 4))
          .withColumn("p_benford", round((log(lit(1.0) + lit(1.0) / $"digit") / log(lit(10.0))), 4))
          .withColumn("chi2_term",
            ($"n" - $"n_pri" * (log(lit(1.0) + lit(1.0) / $"digit") / log(lit(10.0))))
              * ($"n" - $"n_pri" * (log(lit(1.0) + lit(1.0) / $"digit") / log(lit(10.0))))
              / ($"n_pri" * (log(lit(1.0) + lit(1.0) / $"digit") / log(lit(10.0)))))
          .withColumn("chi2", round(sum($"chi2_term").over(w), 4))
          .select($"pri", $"digit", $"n", $"p_obs", $"p_benford", $"chi2")
          .orderBy($"pri", $"digit")
      },
      Some("""WITH digits AS (
             |  SELECT o_orderpriority AS pri,
             |    CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
             |      AS INT) AS digit
             |  FROM orders
             |), hist AS (
             |  SELECT pri, digit, count(*) AS n FROM digits GROUP BY 1, 2
             |), win AS (
             |  SELECT pri, digit, n,
             |    sum(n) OVER (PARTITION BY pri) AS n_pri
             |  FROM hist
             |)
             |SELECT pri, digit, CAST(n AS BIGINT) AS n,
             |  round(n / CAST(n_pri AS DOUBLE), 4) AS p_obs,
             |  round((ln(1.0 + 1.0 / digit) / ln(10.0)), 4) AS p_benford,
             |  round(sum(
             |    (n - n_pri * (ln(1.0 + 1.0 / digit) / ln(10.0)))
             |    * (n - n_pri * (ln(1.0 + 1.0 / digit) / ln(10.0)))
             |    / (n_pri * (ln(1.0 + 1.0 / digit) / ln(10.0)))
             |  ) OVER (PARTITION BY pri), 4) AS chi2
             |FROM win ORDER BY pri, digit""".stripMargin)
    ),

    // Mutual information between two event dimensions (a33) — the
    // feature-relevance / drift screen: how much does time-of-day tell
    // you about event type? MI = ΣΣ p(x,y)·ln(p(x,y)/(p(x)p(y))),
    // estimated from ONE (x,y) hash agg over row-local bucketing; both
    // margins and the grand total re-aggregate the tiny joint table
    // (cells ≤ |x|·|y|, never corpus-sized), so the fact is scanned
    // once no matter how many dimension pairs share the pass. Counts
    // are exact integers; each cell's MI term divides exact integers
    // inside one ln (identical rational on both engines) and the ≤24
    // -term sum rounds to 4. Entropies H(x), H(y) ride along giving the
    // normalized MI (uncertainty coefficient) for free.
    OracleQuery(
      "a33_mutual_information",
      (s, d) => {
        import s.implicits._
        val joint = Tables.events(s, d)
          .select($"event_type".as("x"), (hour($"ts") / lit(6)).cast("int").as("y"))
          .groupBy($"x", $"y").agg(count(lit(1)).as("nxy"))
        val wx = org.apache.spark.sql.expressions.Window.partitionBy($"x")
        val wy = org.apache.spark.sql.expressions.Window.partitionBy($"y")
        val wall = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
        val terms = joint
          .withColumn("nx", sum($"nxy").over(wx))
          .withColumn("ny", sum($"nxy").over(wy))
          .withColumn("n", sum($"nxy").over(wall))
          .withColumn("mi_term",
            $"nxy" / $"n".cast("double")
              * log($"nxy".cast("double") * $"n" / ($"nx".cast("double") * $"ny")))
          // entropy terms counted ONCE per margin value: gate on being
          // the min-partner cell, so a sparse joint (missing cells)
          // still sums each margin exactly once
          .withColumn("hx_term",
            when($"y" === min($"y").over(wx),
              -($"nx" / $"n".cast("double")) * log($"nx" / $"n".cast("double")))
              .otherwise(lit(0.0)))
          .withColumn("hy_term",
            when($"x" === min($"x").over(wy),
              -($"ny" / $"n".cast("double")) * log($"ny" / $"n".cast("double")))
              .otherwise(lit(0.0)))
        terms.agg(
          round(sum($"mi_term"), 4).as("mi"),
          round(sum($"hx_term"), 4).as("hx"),
          round(sum($"hy_term"), 4).as("hy"),
          round(sum($"mi_term") / sum($"hy_term"), 4).as("uncertainty_coef"),
          sum($"nxy").cast("long").as("n_events"))
      },
      Some("""WITH joint AS (
             |  SELECT event_type AS x,
             |    CAST(hour(ts) // 6 AS INT) AS y, count(*) AS nxy
             |  FROM events GROUP BY 1, 2
             |), terms AS (
             |  SELECT x, y, nxy,
             |    sum(nxy) OVER (PARTITION BY x) AS nx,
             |    sum(nxy) OVER (PARTITION BY y) AS ny,
             |    sum(nxy) OVER () AS n
             |  FROM joint
             |), scored AS (
             |  SELECT x, y, nxy, nx, ny, n,
             |    nxy / CAST(n AS DOUBLE)
             |      * ln(CAST(nxy AS DOUBLE) * n / (CAST(nx AS DOUBLE) * ny)) AS mi_term,
             |    CASE WHEN y = min(y) OVER (PARTITION BY x)
             |      THEN -(nx / CAST(n AS DOUBLE)) * ln(nx / CAST(n AS DOUBLE))
             |      ELSE 0.0 END AS hx_term,
             |    CASE WHEN x = min(x) OVER (PARTITION BY y)
             |      THEN -(ny / CAST(n AS DOUBLE)) * ln(ny / CAST(n AS DOUBLE))
             |      ELSE 0.0 END AS hy_term
             |  FROM terms
             |)
             |SELECT round(sum(mi_term), 4) AS mi,
             |  round(sum(hx_term), 4) AS hx,
             |  round(sum(hy_term), 4) AS hy,
             |  round(sum(mi_term) / sum(hy_term), 4) AS uncertainty_coef,
             |  CAST(sum(nxy) AS BIGINT) AS n_events
             |FROM scored""".stripMargin)
    ),

    // Two-sample Kolmogorov–Smirnov test (a34) — the nonparametric
    // distribution-drift detector: D = sup|F₁−F₂| between two
    // segments' value distributions, with the α=0.05 decision. Scale
    // shape: the fact collapses FIRST to a per-distinct-value (a, b)
    // count histogram (one hash agg with map-side combine), so the
    // ECDF window runs over |distinct values| rows, not events; for
    // truly continuous 100 TB data you bin first (the a25 histogram
    // path) and this becomes a banded KS on bin edges — same plan, one
    // more floor(). ECDFs are cumulative INTEGER sums over the value
    // order (exact); D and the Smirnov critical value are row-local
    // IEEE algebra; sup is an order-insensitive max. The supremum of
    // |F₁−F₂| over all x is attained at sample points, i.e. on the
    // distinct-value grid — evaluating there is the exact statistic,
    // not an approximation.
    OracleQuery(
      "a34_ks_test",
      (s, d) => {
        import s.implicits._
        val hist = Tables.events(s, d)
          .filter($"event_type".isin("click", "error"))
          .groupBy($"value".as("v"))
          .agg(
            sum(when($"event_type" === "click", 1L).otherwise(0L)).as("a"),
            sum(when($"event_type" === "error", 1L).otherwise(0L)).as("b"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"v")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
        val cum = hist
          .withColumn("ca", sum($"a").over(w))
          .withColumn("cb", sum($"b").over(w))
          .withColumn("n1", sum($"a").over(wAll))
          .withColumn("n2", sum($"b").over(wAll))
        cum.agg(
          max($"n1").cast("long").as("n1"),
          max($"n2").cast("long").as("n2"),
          round(max(abs($"ca" / $"n1".cast("double") - $"cb" / $"n2".cast("double"))), 4)
            .as("d_stat"))
          .withColumn("d_crit",
            round(lit(1.3581) * sqrt(($"n1" + $"n2") / ($"n1" * $"n2".cast("double"))), 4))
          .select($"n1", $"n2", $"d_stat", $"d_crit",
            ($"d_stat" > $"d_crit").as("reject_h0"))
      },
      Some("""WITH hist AS (
             |  SELECT value AS v,
             |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
             |  FROM events WHERE event_type IN ('click', 'error')
             |  GROUP BY 1
             |), cum AS (
             |  SELECT v, a, b,
             |    sum(a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             |    sum(b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             |    sum(a) OVER () AS n1, sum(b) OVER () AS n2
             |  FROM hist
             |), agg AS (
             |  SELECT CAST(any_value(n1) AS BIGINT) AS n1,
             |    CAST(any_value(n2) AS BIGINT) AS n2,
             |    round(max(abs(ca / CAST(n1 AS DOUBLE) - cb / CAST(n2 AS DOUBLE))), 4) AS d_stat
             |  FROM cum
             |)
             |SELECT n1, n2, d_stat,
             |  round(1.3581 * sqrt((n1 + n2) / (n1 * CAST(n2 AS DOUBLE))), 4) AS d_crit,
             |  d_stat > round(1.3581 * sqrt((n1 + n2) / (n1 * CAST(n2 AS DOUBLE))), 4) AS reject_h0
             |FROM agg""".stripMargin)
    ),

    // Population Stability Index (a35) — the model-monitoring standard
    // for "has this feature's distribution moved since training":
    // PSI = Σ_b (p₂−p₁)·ln(p₂/p₁) between the first and second half of
    // the observation window, over a FIXED 11-bin grid (decile-width
    // bins, top-capped so the long tail lands in one bin). Scale shape:
    // one (half, bin) hash agg over row-local binning — the whole test
    // rides on a ≤22-row table; the fixed grid joins in as a literal
    // spine so empty bins exist explicitly rather than silently
    // vanishing, and Laplace smoothing ((n+0.5)/(N+0.5·B)) keeps
    // ln finite on them deterministically — no epsilon hand-tuning.
    // Counts exact; each term is one ln over identically-spelled
    // rationals; the ≤11-term sum rounds to 4.
    OracleQuery(
      "a35_psi",
      (s, d) => {
        import s.implicits._
        val b = 11
        val counts = Tables.events(s, d)
          .select(
            least(floor($"value" / 10.0), lit(10.0)).cast("int").as("bin"),
            when($"ts" < lit("2024-01-16").cast("timestamp"), 1).otherwise(0).as("h"))
          .groupBy($"bin")
          .agg(
            sum(when($"h" === 1, 1L).otherwise(0L)).as("c1"),
            sum(when($"h" === 0, 1L).otherwise(0L)).as("c2"))
        val spine = s.range(0, b).select($"id".cast("int").as("bin"))
        val tot = counts.agg(sum($"c1").as("t1"), sum($"c2").as("t2"))
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        spine.join(counts, Seq("bin"), "left")
          .select($"bin",
            coalesce($"c1", lit(0L)).as("n1"), coalesce($"c2", lit(0L)).as("n2"))
          .crossJoin(broadcast(tot))
          .withColumn("p1", ($"n1" + 0.5) / ($"t1" + 0.5 * b))
          .withColumn("p2", ($"n2" + 0.5) / ($"t2" + 0.5 * b))
          .withColumn("psi_term", ($"p2" - $"p1") * log($"p2" / $"p1"))
          .withColumn("psi", round(sum($"psi_term").over(wAll), 4))
          .select($"bin", $"n1", $"n2",
            round($"p1", 4).as("p1"), round($"p2", 4).as("p2"),
            round($"psi_term", 4).as("psi_term"), $"psi")
          .orderBy($"bin")
      },
      Some("""WITH counts AS (
             |  SELECT CAST(least(floor(value / 10.0), 10.0) AS INT) AS bin,
             |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS c2
             |  FROM events GROUP BY 1
             |), tot AS (
             |  SELECT sum(c1) AS t1, sum(c2) AS t2 FROM counts
             |), spine AS (
             |  SELECT CAST(t.b AS INT) AS bin FROM unnest(generate_series(0, 10)) AS t(b)
             |), filled AS (
             |  SELECT spine.bin,
             |    coalesce(c1, 0) AS n1, coalesce(c2, 0) AS n2,
             |    (coalesce(c1, 0) + 0.5) / (tot.t1 + 0.5 * 11) AS p1,
             |    (coalesce(c2, 0) + 0.5) / (tot.t2 + 0.5 * 11) AS p2
             |  FROM spine LEFT JOIN counts ON spine.bin = counts.bin CROSS JOIN tot
             |)
             |SELECT bin, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |  round(p1, 4) AS p1, round(p2, 4) AS p2,
             |  round((p2 - p1) * ln(p2 / p1), 4) AS psi_term,
             |  round(sum((p2 - p1) * ln(p2 / p1)) OVER (), 4) AS psi
             |FROM filled ORDER BY bin""".stripMargin)
    ),

    // Hill tail-index estimator (a36) — how heavy is the upper tail of
    // order totals per priority class: α̂ = [k⁻¹ Σᵢ₌₁..k (ln x₍ᵢ₎ −
    // ln x₍ₖ₊₁₎)]⁻¹ over the k=100 largest. α̂ ≈ 1–2 flags
    // Pareto-like concentration (a few whale orders dominate — the
    // sampling/budgeting hazard), large α̂ means thin tails. Scale
    // shape: only the top k+1 per segment survive the rank window —
    // at 100 TB the window swaps for the bounded per-segment top-k
    // (the o5/j5 pattern) and nothing else changes; the estimator
    // itself touches k·|segments| rows. Ranking ties break on the
    // order key so x₍ₖ₊₁₎ is the same row cross-engine; the ≤100-term
    // ln sum rounds to 4.
    OracleQuery(
      "a36_hill_tail",
      (s, d) => {
        import s.implicits._
        val k = 100
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"pri").orderBy($"x".desc, $"o_orderkey")
        val ranked = Tables.orders(s, d)
          .select($"o_orderpriority".as("pri"), $"o_totalprice".as("x"), $"o_orderkey")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= k + 1)
        val thresh = ranked.filter($"rn" === k + 1)
          .select($"pri", $"x".as("xt"))
        ranked.filter($"rn" <= k)
          .join(broadcast(thresh), "pri")
          .groupBy($"pri")
          .agg(
            count(lit(1)).cast("long").as("n_tail"),
            round(max($"xt"), 4).as("x_threshold"),
            round(lit(1.0) / (sum(log($"x") - log($"xt")) / k), 4).as("hill_alpha"))
          .orderBy($"pri")
      },
      Some("""WITH ranked AS (
             |  SELECT o_orderpriority AS pri, o_totalprice AS x,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders
             |), thresh AS (
             |  SELECT pri, x AS xt FROM ranked WHERE rn = 101
             |)
             |SELECT r.pri, CAST(count(*) AS BIGINT) AS n_tail,
             |  round(max(t.xt), 4) AS x_threshold,
             |  round(1.0 / (sum(ln(r.x) - ln(t.xt)) / 100), 4) AS hill_alpha
             |FROM ranked r JOIN thresh t USING (pri)
             |WHERE r.rn <= 100
             |GROUP BY r.pri ORDER BY r.pri""".stripMargin)
    ),

    // Spearman rank correlation (a37) — the monotone-association
    // measure that survives outliers and nonlinearity where Pearson
    // lies: ρ of quantity vs net price per return flag, on ranks with
    // a deterministic (value, key) tiebreak (documented tie-broken
    // variant, not average-rank). Numeric design: ranks are CENTERED
    // (r − (n+1)/2 — half-integer steps), so every sum of products is
    // a quarter-integer below 2⁵³ and therefore EXACT in double on
    // both engines regardless of summation order — no decimal casts,
    // no covar_pop implementation differences; only the final
    // ρ = Σab/(√Σa²·√Σb²) touches inexact arithmetic, identically
    // spelled. Two rank windows per group + one hash agg.
    OracleQuery(
      "a37_spearman",
      (s, d) => {
        import s.implicits._
        // order-grain collapse FIRST: (flag, orderkey) is a unique key,
        // so the rank tiebreak is total — (orderkey, linenumber) is NOT
        // unique in this corpus, and row_number over a non-total order
        // is nondeterministic (a latent cross-engine flake)
        val base = Tables.lineitem(s, d)
          .groupBy($"l_returnflag".as("flag"), $"l_orderkey")
          .agg(
            sum($"l_quantity").as("q"),
            sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(28,4)"))
              .cast("double").as("p"))
        val wq = org.apache.spark.sql.expressions.Window
          .partitionBy($"flag").orderBy($"q", $"l_orderkey")
        val wp = org.apache.spark.sql.expressions.Window
          .partitionBy($"flag").orderBy($"p", $"l_orderkey")
        val wn = org.apache.spark.sql.expressions.Window.partitionBy($"flag")
        base
          .withColumn("rq", row_number().over(wq).cast("double"))
          .withColumn("rp", row_number().over(wp).cast("double"))
          .withColumn("n", count(lit(1)).over(wn).cast("double"))
          .withColumn("a", $"rq" - ($"n" + 1) / 2)
          .withColumn("b", $"rp" - ($"n" + 1) / 2)
          .groupBy($"flag")
          .agg(
            count(lit(1)).as("n"),
            round(sum($"a" * $"b") / (sqrt(sum($"a" * $"a")) * sqrt(sum($"b" * $"b"))), 4)
              .as("spearman_rho"))
          .orderBy($"flag")
      },
      Some("""WITH base AS (
             |  SELECT l_returnflag AS flag, l_orderkey,
             |    sum(l_quantity) AS q,
             |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
             |      AS DOUBLE) AS p
             |  FROM lineitem GROUP BY 1, 2
             |), ranked AS (
             |  SELECT flag,
             |    CAST(row_number() OVER (PARTITION BY flag
             |      ORDER BY q, l_orderkey) AS DOUBLE) AS rq,
             |    CAST(row_number() OVER (PARTITION BY flag
             |      ORDER BY p, l_orderkey) AS DOUBLE) AS rp,
             |    CAST(count(*) OVER (PARTITION BY flag) AS DOUBLE) AS n
             |  FROM base
             |), centered AS (
             |  SELECT flag, rq - (n + 1) / 2 AS a, rp - (n + 1) / 2 AS b FROM ranked
             |)
             |SELECT flag, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))), 4) AS spearman_rho
             |FROM centered GROUP BY flag ORDER BY flag""".stripMargin)
    ),

    // Autocorrelation function + Ljung–Box portmanteau test (a39) —
    // the residual-whiteness diagnostic every forecasting pipeline
    // runs: r_k at lags 1..5 of the daily-revenue series and
    // Q = n(n+2)·Σ r_k²/(n−k), which under H₀ (white noise) is χ²₅ —
    // Q past ~11.07 flags structure the model missed. Scale shape:
    // the fact collapses to the day-grain series FIRST (decimal-exact
    // sums); the lag axis is a 5-element explode equi-joined on the
    // shifted day position (the a28 lead–lag pattern — more lags widen
    // the explode, not the pass count); r_k spelled as the standard
    // biased ACF Σ(x_t−x̄)(x_{t+k}−x̄)/Σ(x_t−x̄)² with the mean and
    // denominator from one whole-series window, so every r_k shares
    // identical operands cross-engine. Day positions are row_numbers
    // (small ints — the corr conditioning recipe).
    OracleQuery(
      "a39_ljung_box",
      (s, d) => {
        import s.implicits._
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        val wOrd = org.apache.spark.sql.expressions.Window.orderBy($"day")
        val daily = Tables.events(s, d)
          .groupBy(date_trunc("day", $"ts").as("day"))
          .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("v"))
          .withColumn("t", row_number().over(wOrd).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("xbar",
            (sum($"v".cast("decimal(28,10)")).over(wAll).cast("double") / $"n"))
          .withColumn("c", $"v" - $"xbar")
          .withColumn("den",
            sum(($"c" * $"c").cast("decimal(28,10)")).over(wAll).cast("double"))
        val lags = daily.crossJoin(
          s.range(1, 6).select($"id".cast("long").as("k")))
        val acf = lags.as("a")
          .join(daily.select($"t".as("t2"), $"c".as("c2")).as("b"),
            col("a.t") + col("a.k") === col("b.t2"))
          .groupBy(col("a.k").as("k"))
          .agg(
            max(col("a.n")).as("n"),
            (sum((col("a.c") * col("b.c2")).cast("decimal(28,10)")).cast("double")
              / max(col("a.den"))).as("r"))
        val wCum = org.apache.spark.sql.expressions.Window.orderBy($"k")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        acf
          .withColumn("q",
            $"n" * ($"n" + 2.0) * sum($"r" * $"r" / ($"n" - $"k")).over(wCum))
          .select($"k".cast("int").as("k"), round($"r", 4).as("acf"),
            round($"q", 4).as("ljung_box_q"),
            ($"q" > 11.0705).as("reject_white"))
          .orderBy($"k")
      },
      Some("""WITH daily AS (
             |  SELECT date_trunc('day', ts) AS day,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
             |  FROM events GROUP BY 1
             |), pos AS (
             |  SELECT day, v,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             |    count(*) OVER () AS n,
             |    CAST(sum(CAST(v AS DECIMAL(28,10))) OVER () AS DOUBLE)
             |      / count(*) OVER () AS xbar
             |  FROM daily
             |), cent AS (
             |  SELECT t, n, v - xbar AS c,
             |    CAST(sum(CAST((v - xbar) * (v - xbar) AS DECIMAL(28,10))) OVER ()
             |      AS DOUBLE) AS den
             |  FROM pos
             |), acf AS (
             |  SELECT k, max(a.n) AS n,
             |    CAST(sum(CAST(a.c * b.c AS DECIMAL(28,10))) AS DOUBLE) / max(a.den) AS r
             |  FROM cent a
             |  CROSS JOIN unnest(generate_series(1, 5)) AS ks(k)
             |  JOIN cent b ON a.t + ks.k = b.t
             |  GROUP BY k
             |)
             |SELECT CAST(k AS INT) AS k, round(r, 4) AS acf,
             |  round(n * (n + 2.0) * sum(r * r / (n - k)) OVER (ORDER BY k
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS ljung_box_q,
             |  (n * (n + 2.0) * sum(r * r / (n - k)) OVER (ORDER BY k
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) > 11.0705 AS reject_white
             |FROM acf ORDER BY k""".stripMargin)
    ),

    // Theil–Sen robust trend (a41) — the median of all pairwise slopes:
    // up to ~29% of the points can be arbitrarily corrupted before the
    // estimate moves (OLS breaks on one outlier), which is why it is
    // the monitoring-grade trend for noisy operational series. At the
    // day grain the C(T,2) pair set is exact and tiny (T² day-grain
    // pairs, NOT fact rows — the collapse runs first); for long series
    // the standard remedy is a hash-bounded pair sample, which changes
    // only the pair-generation predicate. The median is the EXACT
    // order statistic — a row_number pick over the per-key slope set
    // with the even-count midpoint averaged; slopes divide exact-
    // integer day gaps into decimal-exact daily sums, so every slope
    // is bit-identical cross-engine and the pick is deterministic
    // ((slope, i, j) total order).
    OracleQuery(
      "a41_theil_sen",
      (s, d) => {
        import s.implicits._
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"day")
        val daily = Tables.events(s, d)
          .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
          .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("v"))
          .withColumn("t", row_number().over(wOrd).cast("long"))
        val slopes = daily.as("a")
          .join(daily.as("b"),
            col("a.event_type") === col("b.event_type") && col("a.t") < col("b.t"))
          .select(col("a.event_type").as("event_type"),
            col("a.t").as("i"), col("b.t").as("j"),
            ((col("b.v") - col("a.v")) / (col("b.t") - col("a.t"))).as("slope"))
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"slope", $"i", $"j")
        val wN = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
        slopes
          .withColumn("rn", row_number().over(wRank))
          .withColumn("n", count(lit(1)).over(wN))
          // div, not /: Spark's / on longs is DOUBLE division, and
          // rn == 15.5 would never match on odd pair counts
          .filter($"rn" === expr("(n + 1) div 2") || $"rn" === expr("n div 2 + 1"))
          .groupBy($"event_type")
          .agg(
            max($"n").as("n_pairs"),
            round(sum($"slope") / count(lit(1)), 4).as("theil_sen_slope"))
          .orderBy($"event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, date_trunc('day', ts) AS day,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2
             |), pos AS (
             |  SELECT event_type, v,
             |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
             |      AS BIGINT) AS t
             |  FROM daily
             |), slopes AS (
             |  SELECT a.event_type, a.t AS i, b.t AS j,
             |    (b.v - a.v) / (b.t - a.t) AS slope
             |  FROM pos a JOIN pos b
             |    ON a.event_type = b.event_type AND a.t < b.t
             |), ranked AS (
             |  SELECT event_type, i, j, slope,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY slope, i, j) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM slopes
             |)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n_pairs,
             |  round(sum(slope) / count(*), 4) AS theil_sen_slope
             |FROM ranked
             |WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Sampled Theil–Sen (a41b) — the spelling that survives T ≫ the
    // day grain: the exact estimator above ranks ALL C(T,2) pairwise
    // slopes, which at a 10-year daily series is 6.6M pairs per key
    // and at minute grain is 1.4e13 — the pair sort, not the fact
    // scan, becomes the bottleneck. Remedy: a deterministic hash
    // predicate on the PAIR identity (the a42/o7 md5 recipe) keeps a
    // fixed p = 40% of pairs, so the ranked/sorted volume is p·C(T,2)
    // while the estimate stays a median over an unbiased pair sample
    // (Theil–Sen tolerates subsampling gracefully — the median of a
    // uniform pair sample converges to the pairwise-slope median;
    // RetrievalRulesSpec pins the deviation vs the exact entry).
    // Pair enumeration itself is still row-local join work; what the
    // sample removes is the exchange + total sort behind the order
    // statistic, which is the part that scales superlinearly. The
    // predicate hashes (event_type, i, j) — reproducible cross-engine
    // and independent of physical row order; the oracle applies the
    // identical predicate, so the driver gate covers the SAMPLED
    // estimator end-to-end, not a rows-only check.
    OracleQuery(
      "a41b_theil_sen_sampled",
      (s, d) => {
        import s.implicits._
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"day")
        val daily = Tables.events(s, d)
          .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
          .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("v"))
          .withColumn("t", row_number().over(wOrd).cast("long"))
        val pairHash = conv(substring(md5(concat(
          col("a.event_type"), lit(":"),
          col("a.t").cast("string"), lit(":"),
          col("b.t").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 10000
        val slopes = daily.as("a")
          .join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.t") < col("b.t") && pairHash < 4000)
          .select(col("a.event_type").as("event_type"),
            col("a.t").as("i"), col("b.t").as("j"),
            ((col("b.v") - col("a.v")) / (col("b.t") - col("a.t"))).as("slope"))
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"slope", $"i", $"j")
        val wN = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
        slopes
          .withColumn("rn", row_number().over(wRank))
          .withColumn("n", count(lit(1)).over(wN))
          .filter($"rn" === expr("(n + 1) div 2") || $"rn" === expr("n div 2 + 1"))
          .groupBy($"event_type")
          .agg(
            max($"n").as("n_pairs"),
            // floor spelling: the sampled median lands arbitrarily, so
            // round() would be one DuckDB-build boundary away from a
            // w15-style phantom hash fail
            (floor(sum($"slope") / count(lit(1)) * 10000 + 0.5) / 10000)
              .as("theil_sen_slope"))
          .orderBy($"event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, date_trunc('day', ts) AS day,
             |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2
             |), pos AS (
             |  SELECT event_type, v,
             |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
             |      AS BIGINT) AS t
             |  FROM daily
             |), slopes AS (
             |  SELECT a.event_type, a.t AS i, b.t AS j,
             |    (b.v - a.v) / (b.t - a.t) AS slope
             |  FROM pos a JOIN pos b
             |    ON a.event_type = b.event_type AND a.t < b.t
             |   AND ('0x' || substr(md5(a.event_type || ':' ||
             |     CAST(a.t AS VARCHAR) || ':' || CAST(b.t AS VARCHAR)), 1, 15))::BIGINT
             |     % 10000 < 4000
             |), ranked AS (
             |  SELECT event_type, i, j, slope,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY slope, i, j) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM slopes
             |)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n_pairs,
             |  floor(sum(slope) / count(*) * 10000 + 0.5) / 10000 AS theil_sen_slope
             |FROM ranked
             |WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Poisson-bootstrap confidence interval (a42) — distribution-free
    // inference for ANY statistic, in the spelling that actually works
    // at scale: instead of materializing B resamples (B index joins),
    // each row draws a deterministic pseudo-Poisson(1) WEIGHT per
    // replicate — one map-side explode by B, one (key, replicate) hash
    // agg, embarrassingly parallel, no data movement beyond the agg
    // (the Google "Poisson bootstrap" trick; Poisson(1) row counts
    // converge to multinomial resampling). Determinism: the per-(row,
    // replicate) uniform is the md5-prefix hash (the o7 recipe) pushed
    // through the exact Poisson(1) inverse CDF as CASE thresholds —
    // integer weights, identical cross-engine. Replicate means divide
    // DECIMAL-exact weighted sums by exact weight counts; the 95% CI
    // takes the EXACT 5th/195th order statistics of the B=200 means
    // ((mean, b) total order) — percentile picks, not a normal
    // approximation, which is the point of bootstrapping.
    OracleQuery(
      "a42_bootstrap_ci",
      (s, d) => {
        import s.implicits._
        val bReps = 200
        val weighted = Tables.events(s, d)
          .select($"event_type", $"event_id", $"value")
          .crossJoin(s.range(0, bReps).select($"id".cast("long").as("b")))
          .withColumn("u",
            expr("CAST(conv(substr(md5(concat(CAST(event_id AS STRING), ':', CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT) % 10000"))
          .withColumn("w",
            when($"u" < 3679, 0L).when($"u" < 7358, 1L).when($"u" < 9197, 2L)
              .when($"u" < 9810, 3L).when($"u" < 9963, 4L).otherwise(5L))
        // a replicate whose Poisson weights all drew 0 has mb = NULL,
        // and Spark ranks NULLs first ascending while DuckDB ranks them
        // last — filter sum(w) > 0 on BOTH sides so the rn=5/195 order-
        // statistic picks are null-free by construction
        val reps = weighted.groupBy($"event_type", $"b")
          .agg((sum(($"value" * $"w").cast("decimal(28,10)")).cast("double")
            / sum($"w")).as("mb"), sum($"w").as("sw"))
          .filter($"sw" > 0).drop("sw")
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"mb", $"b")
        val picks = reps.withColumn("rn", row_number().over(wRank))
          .filter($"rn" === 5 || $"rn" === 195)
        val base = Tables.events(s, d).groupBy($"event_type")
          .agg((sum($"value".cast("decimal(28,10)")).cast("double")
            / count(lit(1))).as("mean"))
        picks.groupBy($"event_type")
          .agg(min($"mb").as("lo"), max($"mb").as("hi"))
          .join(base, "event_type")
          .select($"event_type",
            (floor($"mean" * 10000 + 0.5) / 10000).as("mean"),
            (floor($"lo" * 10000 + 0.5) / 10000).as("ci_lo"),
            (floor($"hi" * 10000 + 0.5) / 10000).as("ci_hi"))
          .orderBy($"event_type")
      },
      Some("""WITH hashed AS (
             |  SELECT e.event_type, e.value, b.b,
             |    ('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':' ||
             |      CAST(b.b AS VARCHAR)), 1, 15))::BIGINT % 10000 AS u
             |  FROM events e
             |  CROSS JOIN (SELECT unnest(generate_series(0, 199)) AS b) b
             |), weighted AS (
             |  SELECT event_type, value, b,
             |    CASE
             |      WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1 WHEN u < 9197 THEN 2
             |      WHEN u < 9810 THEN 3 WHEN u < 9963 THEN 4 ELSE 5 END AS w
             |  FROM hashed
             |), reps AS (
             |  SELECT event_type, b,
             |    CAST(sum(CAST(value * w AS DECIMAL(28,10))) AS DOUBLE) / sum(w) AS mb
             |  FROM weighted GROUP BY 1, 2 HAVING sum(w) > 0
             |), ranked AS (
             |  SELECT event_type, mb,
             |    row_number() OVER (PARTITION BY event_type ORDER BY mb, b) AS rn
             |  FROM reps
             |), picks AS (
             |  SELECT event_type, min(mb) AS lo, max(mb) AS hi
             |  FROM ranked WHERE rn = 5 OR rn = 195 GROUP BY 1
             |), base AS (
             |  SELECT event_type,
             |    CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS mean
             |  FROM events GROUP BY 1
             |)
             |SELECT event_type, floor(mean * 10000 + 0.5) / 10000 AS mean,
             |  floor(lo * 10000 + 0.5) / 10000 AS ci_lo,
             |  floor(hi * 10000 + 0.5) / 10000 AS ci_hi
             |FROM picks JOIN base USING (event_type)
             |ORDER BY event_type""".stripMargin)
    ),

    // a42b: the PRODUCTION bootstrap — identical Poisson-weight
    // algebra, but the per-(row, replicate) uniform comes from
    // xxhash64 instead of the md5-hex-conv chain. The md5 spelling
    // above exists because DuckDB can replay it bit-exactly (the full
    // CI under the hash gate); its cost is real — 200M md5+conv
    // evaluations took 111 s at the 10× spot-bench, ~20× the rest of
    // the query — while xxhash64 is a native codegen'd hash (one
    // multiply-rotate pipeline per draw). DuckDB has no xxhash64, so
    // this entry is gated by the CONTRACT pattern (the a14 recipe):
    // the oracle recomputes the exact mean independently and asserts
    // the two CI booleans — brackets (lo < mean < hi) and width
    // inside a generous CLT envelope ([1/3, 3]× of 2·1.96·σ/√n) —
    // so a broken weight stream fails the driver gate even though the
    // draws themselves are engine-specific.
    OracleQuery(
      "a42b_bootstrap_ci_fast",
      (s, d) => {
        import s.implicits._
        val bReps = 200
        val weighted = Tables.events(s, d)
          .select($"event_type", $"event_id", $"value")
          .crossJoin(s.range(0, bReps).select($"id".cast("long").as("b")))
          .withColumn("u", pmod(xxhash64($"event_id", $"b"), lit(10000L)))
          .withColumn("w",
            when($"u" < 3679, 0L).when($"u" < 7358, 1L).when($"u" < 9197, 2L)
              .when($"u" < 9810, 3L).when($"u" < 9963, 4L).otherwise(5L))
        // replicate sums are PLAIN double — nothing downstream of mb is
        // hash-compared (the gated outputs are the DECIMAL-exact base
        // mean plus the contract booleans, which tolerate summation-
        // order noise), and the per-draw DECIMAL(28,10) adds were the
        // second cost center after the hash itself in the md5 spelling
        val reps = weighted.groupBy($"event_type", $"b")
          .agg((sum($"value" * $"w") / sum($"w")).as("mb"), sum($"w").as("sw"))
          .filter($"sw" > 0).drop("sw")
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"mb", $"b")
        val picks = reps.withColumn("rn", row_number().over(wRank))
          .filter($"rn" === 5 || $"rn" === 195)
        val base = Tables.events(s, d).groupBy($"event_type")
          .agg(
            (sum($"value".cast("decimal(28,10)")).cast("double")
              / count(lit(1))).as("mean"),
            stddev_pop($"value").as("sd"), count(lit(1)).as("n"))
        picks.groupBy($"event_type")
          .agg(min($"mb").as("lo"), max($"mb").as("hi"))
          .join(base, "event_type")
          // non-strict bracket: a degenerate all-equal group collapses
          // lo = mean = hi, which is a correct interval, not a miss
          .select($"event_type",
            (floor($"mean" * 10000 + 0.5) / 10000).as("mean"),
            ($"lo" <= $"mean" && $"mean" <= $"hi").as("brackets"),
            (($"hi" - $"lo") >= lit(2.0) * 1.96 * $"sd" / sqrt($"n") / 3.0 &&
              ($"hi" - $"lo") <= lit(2.0) * 1.96 * $"sd" / sqrt($"n") * 3.0)
              .as("width_ok"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
             |  floor(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
             |    / count(*) * 10000 + 0.5) / 10000 AS mean,
             |  TRUE AS brackets, TRUE AS width_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // First-order Markov transition matrix over per-user event
    // sequences (a43) — the user-journey / Sankey primitive: for every
    // (from, to) event-type pair, how often does a user's next event
    // follow, and with what conditional probability. Scale shape: ONE
    // (user_id) window sort produces the next-event pairing (the
    // sessionize exchange class — at 100 TB this is the same shuffle a
    // sessionization already pays, so journeys ride along free), then
    // a hash aggregate onto the |types|² transition matrix — a
    // sketch-sized result regardless of fact size. Row-normalization
    // divides exact integer counts; display rounding is the
    // build-proof floor spelling. Order ties inside a user's same
    // timestamp break on event_id — the total order both engines
    // replay identically.
    OracleQuery(
      "a43_markov_transitions",
      (s, d) => {
        import s.implicits._
        val wSeq = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        val wFrom = org.apache.spark.sql.expressions.Window
          .partitionBy($"from_type")
        Tables.events(s, d)
          .withColumn("to_type", lead($"event_type", 1).over(wSeq))
          .filter($"to_type".isNotNull)
          .groupBy($"event_type".as("from_type"), $"to_type")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("p",
            floor($"cnt" / sum($"cnt").over(wFrom).cast("double") * 10000 + 0.5)
              / 10000)
          .orderBy($"from_type", $"to_type")
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type AS from_type,
             |    lead(event_type, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM events
             |), cnts AS (
             |  SELECT from_type, to_type, count(*) AS cnt
             |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
             |)
             |SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
             |  floor(cnt / CAST(sum(cnt) OVER (PARTITION BY from_type) AS DOUBLE)
             |    * 10000 + 0.5) / 10000 AS p
             |FROM cnts ORDER BY from_type, to_type""".stripMargin)
    ),

    // Gini coefficient of per-group value concentration (a44) — the
    // inequality/concentration profile (how top-heavy is revenue per
    // event type?) that drives sampling and mixing decisions upstream
    // of training: G = (2·Σ i·x(i) − (n+1)·Σx) / (n·Σx) over the
    // ascending-sorted values. Scale shape: one per-group sort
    // (row_number window) and one hash aggregate — the i·x products
    // are row-local IEEE doubles cast to DECIMAL(28,10) so the big
    // reduction is summation-order-exact; equal values may permute
    // their ranks between engines but Σ i·x is invariant under
    // permutations within a tie class, so the statistic is
    // deterministic without a tiebreak column. Values are shifted
    // positive (Gini assumes x ≥ 0) by the documented min-shift.
    OracleQuery(
      "a44_gini",
      (s, d) => {
        import s.implicits._
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"x")
        val shifted = Tables.events(s, d)
          .groupBy($"event_type").agg(min($"value").as("vmin"))
          .join(Tables.events(s, d), "event_type")
          // shift so the support is nonnegative: x = value − min (per
          // group); identical arithmetic on both engines
          .select($"event_type", ($"value" - $"vmin").as("x"))
        shifted
          .withColumn("i", row_number().over(wRank).cast("double"))
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(($"i" * $"x").cast("decimal(28,10)")).cast("double").as("six"),
            sum($"x".cast("decimal(28,10)")).cast("double").as("sx"))
          .select($"event_type", $"n",
            // nullif guards the all-equal degenerate group (sx = 0):
            // Spark's non-ANSI divide yields NULL but DuckDB yields
            // ±inf — nullif makes both sides NULL
            (floor((lit(2.0) * $"six" - ($"n" + 1) * $"sx")
              / nullif($"n" * $"sx", lit(0.0)) * 10000 + 0.5) / 10000).as("gini"))
          .orderBy($"event_type")
      },
      Some("""WITH shifted AS (
             |  SELECT e.event_type, e.value - m.vmin AS x
             |  FROM events e
             |  JOIN (SELECT event_type, min(value) AS vmin
             |        FROM events GROUP BY 1) m USING (event_type)
             |), ranked AS (
             |  SELECT event_type, x,
             |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY x)
             |      AS DOUBLE) AS i
             |  FROM shifted
             |), agg AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(sum(CAST(i * x AS DECIMAL(28,10))) AS DOUBLE) AS six,
             |    CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx
             |  FROM ranked GROUP BY 1
             |)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |  floor((2.0 * six - (n + 1) * sx) / nullif(n * sx, 0) * 10000 + 0.5)
             |    / 10000 AS gini
             |FROM agg ORDER BY event_type""".stripMargin)
    ),

    // a44b: the 100 TB Gini — a44's per-group rank window feeds EVERY
    // row through one sort per group (the exact-percentile hazard
    // class: fine at eval scale, a single-group 100 TB sort at
    // production scale). This twin reads the Lorenz curve off a
    // 1024-bin LOG-SPACED histogram instead: two hash aggregates
    // (per-group min/max, then per-(group, bin) count + value mass —
    // both sketch-sized, both map-side-combinable), the trapezoid
    // formula G = 1 − Σ (nᵢ/n)(Lᵢ + Lᵢ₋₁) on the ≤1024-row frame, and
    // NO per-row sort anywhere. Bins are geometric in (1 + x) — bin =
    // ⌊1024·ln(1+x)/ln(1+range)⌋ — because an EQUAL-WIDTH histogram
    // silently fails on exactly the top-heavy distributions Gini is
    // for (a Pareto tail parks 99% of rows in bin 0 and the
    // piecewise-linear Lorenz erases all their inequality); log
    // spacing keeps every bin's RELATIVE width ~(1+r)^(1/1024) − 1,
    // so within-bin inequality is bounded for any tail shape (the
    // spec pins |binned − exact| on a synthetic Pareto-like series,
    // not just this corpus). Parity: bin ids are the identical
    // ln(1 + x)-ratio floor arithmetic on both engines, per-bin value
    // masses are DECIMAL-cast sums, trapezoid terms are DECIMAL-cast
    // before the per-group reduction so summation order is exact, and
    // nullif guards the all-equal group (sTot = 0) into NULL on both
    // sides — a REAL hash-gated oracle, not a contract row.
    OracleQuery(
      "a44b_gini_binned",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val stats = ev.groupBy($"event_type")
          .agg(min($"value").as("vmin"), max($"value").as("vmax"))
        val wCum = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"bin")
        val binned = ev.join(broadcast(stats), "event_type")
          .withColumn("x", $"value" - $"vmin")
          .withColumn("bin",
            when($"vmax" === $"vmin", lit(0)).otherwise(
              least(lit(1023),
                // ln is not correctly rounded (JVM Math.log vs libm can
                // differ in the last ulp), so the ratio is quantized to
                // 1e-12 BEFORE the bin floor — a sub-ulp ln difference
                // can then never flip a row across a bin boundary
                floor(floor(log(lit(1.0) + $"x") /
                    log(lit(1.0) + ($"vmax" - $"vmin")) * 1e12 + 0.5)
                  / 1e12 * 1024.0))).cast("int"))
          .groupBy($"event_type", $"bin")
          .agg(count(lit(1)).as("ni"),
            sum($"x".cast("decimal(28,10)")).cast("double").as("si"))
        val curves = binned
          .withColumn("cs", sum($"si".cast("decimal(28,10)")).over(wCum)
            .cast("double"))
        val tot = binned.groupBy($"event_type")
          .agg(sum($"ni").as("n"),
            sum($"si".cast("decimal(28,10)")).cast("double").as("stot"))
        curves.join(broadcast(tot), "event_type")
          .withColumn("ln_i", $"cs" / nullif($"stot", lit(0.0)))
          .withColumn("ln_prev", lag($"ln_i", 1, 0.0).over(wCum))
          .withColumn("term",
            (($"ni" / $"n".cast("double")) * ($"ln_i" + $"ln_prev"))
              .cast("decimal(28,14)"))
          .groupBy($"event_type")
          .agg(max($"n").as("n"), sum($"term").cast("double").as("tsum"))
          .select($"event_type", $"n",
            graft.core.Parity.floorRound4(lit(1.0) - $"tsum").as("gini"))
          .orderBy($"event_type")
      },
      Some("""WITH stats AS (
             |  SELECT event_type, min(value) AS vmin, max(value) AS vmax
             |  FROM events GROUP BY 1
             |), binned AS (
             |  SELECT e.event_type,
             |    CAST(CASE WHEN s.vmax = s.vmin THEN 0 ELSE
             |      least(1023, floor(floor(ln(1.0 + (e.value - s.vmin))
             |        / ln(1.0 + (s.vmax - s.vmin)) * 1e12 + 0.5)
             |        / 1e12 * 1024.0)) END AS INT) AS bin,
             |    count(*) AS ni,
             |    CAST(sum(CAST(e.value - s.vmin AS DECIMAL(28,10))) AS DOUBLE) AS si
             |  FROM events e JOIN stats s USING (event_type)
             |  GROUP BY 1, 2
             |), curves AS (
             |  SELECT event_type, bin, ni, si,
             |    CAST(sum(CAST(si AS DECIMAL(28,10))) OVER w AS DOUBLE) AS cs
             |  FROM binned
             |  WINDOW w AS (PARTITION BY event_type ORDER BY bin
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |), tot AS (
             |  SELECT event_type, CAST(sum(ni) AS BIGINT) AS n,
             |    CAST(sum(CAST(si AS DECIMAL(28,10))) AS DOUBLE) AS stot
             |  FROM binned GROUP BY 1
             |), terms AS (
             |  SELECT c.event_type, t.n,
             |    CAST((c.ni / CAST(t.n AS DOUBLE))
             |      * (c.cs / nullif(t.stot, 0)
             |         + coalesce(lag(c.cs / nullif(t.stot, 0), 1) OVER
             |             (PARTITION BY c.event_type ORDER BY c.bin), 0.0))
             |      AS DECIMAL(28,14)) AS term
             |  FROM curves c JOIN tot t USING (event_type)
             |)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             |  floor((1.0 - CAST(sum(term) AS DOUBLE)) * 10000 + 0.5) / 10000
             |    AS gini
             |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Pairwise Pearson correlation MATRIX over k numeric measures in ONE
    // scan and ONE aggregate: all k sums, k self-product sums and
    // k(k−1)/2 cross-product sums ride a single partial+final Aggregate
    // (O(k²) state per task, map-side combined), then the k(k−1)/2
    // correlations are pure arithmetic on the 1-row result — the
    // feature-screening shape for wide training tables, where the naive
    // corr-per-pair spelling re-scans the fact k(k−1)/2 times. No
    // Expand, no self-join, no second pass (plan-pinned in the spec).
    // Numeric parity AND speed share one spelling: measures are scaled
    // by a POWER OF TWO (exact in IEEE, correlation-invariant) so every
    // product stays ≤ ~2.5e3, then each summand is QUANTIZED to an
    // integer — floor(x·1e6 + 0.5) AS BIGINT — and summed as plain
    // longs. Exact integer algebra makes summation order irrelevant
    // (the decimal-cast goal) WITHOUT the double→BigDecimal cast, which
    // goes through Double.toString per value — 15 casts × every row was
    // ~5 s of the first cut's runtime at sf0.1; the long path stays in
    // whole-stage codegen. The 1e-6 absolute quantization perturbs a
    // correlation by ~1e-9 — invisible at the 4-dp gate — and
    // IDENTICALLY on both engines (floor is pure IEEE). Long overflow
    // headroom: 2.5e9/row quantized → 3.6e9 fact rows per executor sum;
    // beyond that, raise the power-of-two scale (shrinks the quantized
    // magnitude, costs quantization resolution corr does not need).
    OracleQuery(
      "a45_corr_matrix",
      (s, d) => {
        import s.implicits._
        val measures = Seq(
          "q" -> $"l_quantity",
          "p" -> ($"l_extendedprice" / 65536.0),
          "dc" -> $"l_discount",
          "t" -> $"l_tax")
        val names = measures.map(_._1)
        val byName = measures.toMap
        val pairs = for (i <- names.indices; j <- i until names.length)
          yield (names(i), names(j))
        def qsum(c: org.apache.spark.sql.Column) =
          sum(floor(c * 1000000.0 + 0.5).cast("long")).cast("double") / 1000000.0
        val aggs =
          measures.map { case (nm, c) => qsum(c).as(s"s_$nm") } ++
          pairs.map { case (a, b) =>
            qsum(byName(a) * byName(b)).as(s"s_${a}_$b") }
        val one = Tables.lineitem(s, d)
          .agg(count(lit(1)).cast("double").as("n"), aggs: _*)
        def corrOf(a: String, b: String) = graft.core.Parity.floorRound4(
          ($"n" * col(s"s_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
            (sqrt($"n" * col(s"s_${a}_$a") - col(s"s_$a") * col(s"s_$a")) *
             sqrt($"n" * col(s"s_${b}_$b") - col(s"s_$b") * col(s"s_$b"))))
        val rows = pairs.filter { case (a, b) => a != b }.map { case (a, b) =>
          struct(lit(s"${a}_$b").as("pair"), corrOf(a, b).as("corr_v"))
        }
        one.select(explode(array(rows: _*)).as("r"))
          .select($"r.pair", $"r.corr_v")
          .orderBy($"pair")
      },
      Some("""WITH m AS (
             |  SELECT l_quantity AS q, l_extendedprice / 65536.0 AS p,
             |    l_discount AS dc, l_tax AS t
             |  FROM lineitem
             |), s AS (
             |  SELECT CAST(count(*) AS DOUBLE) AS n,
             |    CAST(sum(CAST(floor((q) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_q,
             |    CAST(sum(CAST(floor((p) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_p,
             |    CAST(sum(CAST(floor((dc) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_dc,
             |    CAST(sum(CAST(floor((t) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_t,
             |    CAST(sum(CAST(floor((q * q) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_q_q,
             |    CAST(sum(CAST(floor((q * p) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_q_p,
             |    CAST(sum(CAST(floor((q * dc) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_q_dc,
             |    CAST(sum(CAST(floor((q * t) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_q_t,
             |    CAST(sum(CAST(floor((p * p) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_p_p,
             |    CAST(sum(CAST(floor((p * dc) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_p_dc,
             |    CAST(sum(CAST(floor((p * t) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_p_t,
             |    CAST(sum(CAST(floor((dc * dc) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_dc_dc,
             |    CAST(sum(CAST(floor((dc * t) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_dc_t,
             |    CAST(sum(CAST(floor((t * t) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_t_t
             |  FROM m
             |), c AS (
             |  SELECT 'q_p' AS pair, (n * s_q_p - s_q * s_p)
             |    / (sqrt(n * s_q_q - s_q * s_q) * sqrt(n * s_p_p - s_p * s_p)) AS r
             |  FROM s
             |  UNION ALL SELECT 'q_dc', (n * s_q_dc - s_q * s_dc)
             |    / (sqrt(n * s_q_q - s_q * s_q) * sqrt(n * s_dc_dc - s_dc * s_dc)) FROM s
             |  UNION ALL SELECT 'q_t', (n * s_q_t - s_q * s_t)
             |    / (sqrt(n * s_q_q - s_q * s_q) * sqrt(n * s_t_t - s_t * s_t)) FROM s
             |  UNION ALL SELECT 'p_dc', (n * s_p_dc - s_p * s_dc)
             |    / (sqrt(n * s_p_p - s_p * s_p) * sqrt(n * s_dc_dc - s_dc * s_dc)) FROM s
             |  UNION ALL SELECT 'p_t', (n * s_p_t - s_p * s_t)
             |    / (sqrt(n * s_p_p - s_p * s_p) * sqrt(n * s_t_t - s_t * s_t)) FROM s
             |  UNION ALL SELECT 'dc_t', (n * s_dc_t - s_dc * s_t)
             |    / (sqrt(n * s_dc_dc - s_dc * s_dc) * sqrt(n * s_t_t - s_t * s_t)) FROM s
             |)
             |SELECT pair, floor(r * 10000 + 0.5) / 10000 AS corr_v
             |FROM c ORDER BY pair""".stripMargin)
    ),

    // Chi-square independence test + Cramér's V (a48) — the categorical
    // association primitive (is market segment independent of nation?).
    // Scale shape: ONE hash aggregate over the fact builds the observed
    // contingency table; marginals and the full r×c grid (including
    // ZERO cells, which contribute (0−E)²/E and which a bare groupBy
    // would silently drop) are r+c-bounded broadcasts — nothing about
    // the statistic re-touches fact rows. Numeric design: every per-cell
    // contribution is quantized to a 1e-8 long BEFORE the cross-cell
    // sum, so the r×c summation is exact integer algebra regardless of
    // order; only the final sqrt (IEEE-exact) touches inexactness.
    OracleQuery(
      "a48_chi_square",
      (s, d) => {
        import s.implicits._
        val o = Tables.customer(s, d)
          .groupBy($"c_nationkey".as("nk"), $"c_mktsegment".as("seg"))
          .agg(count(lit(1)).as("obs"))
        val rt = o.groupBy($"nk").agg(sum($"obs").as("rt"))
        val ct = o.groupBy($"seg").agg(sum($"obs").as("ct"))
        val tot = o.agg(sum($"obs").cast("double").as("n"))
        val grid = rt.crossJoin(ct) // r×c rows — both sides broadcast-small
          .join(o, Seq("nk", "seg"), "left")
          .na.fill(0L, Seq("obs"))
          .crossJoin(broadcast(tot))
          .withColumn("e", $"rt".cast("double") * $"ct" / $"n")
          .withColumn("cellq",
            floor(($"obs" - $"e") * ($"obs" - $"e") / $"e" * 100000000.0 + 0.5)
              .cast("long"))
        grid.agg(
            max($"n").cast("long").as("n"),
            countDistinct($"nk").as("r"),
            countDistinct($"seg").as("c"),
            (sum($"cellq").cast("double") / 100000000.0).as("chi2_raw"))
          .select(
            $"n", $"r", $"c",
            (($"r" - 1) * ($"c" - 1)).as("dof"),
            graft.core.Parity.floorRound4($"chi2_raw").as("chi2"),
            graft.core.Parity.floorRound4(
              sqrt($"chi2_raw" / $"n" / (least($"r", $"c") - 1).cast("double")))
              .as("cramers_v"))
      },
      Some("""WITH o AS (
             |  SELECT c_nationkey AS nk, c_mktsegment AS seg, count(*) AS obs
             |  FROM customer GROUP BY 1, 2
             |), rt AS (SELECT nk, sum(obs) AS rt FROM o GROUP BY 1),
             |ct AS (SELECT seg, sum(obs) AS ct FROM o GROUP BY 1),
             |tot AS (SELECT CAST(sum(obs) AS DOUBLE) AS n FROM o),
             |grid AS (
             |  SELECT rt.nk, ct.seg, COALESCE(o.obs, 0) AS obs,
             |    CAST(rt.rt AS DOUBLE) * ct.ct / tot.n AS e, tot.n
             |  FROM rt CROSS JOIN ct CROSS JOIN tot
             |  LEFT JOIN o ON o.nk = rt.nk AND o.seg = ct.seg
             |), cells AS (
             |  SELECT n,
             |    CAST(floor((obs - e) * (obs - e) / e * 100000000.0 + 0.5) AS BIGINT)
             |      AS cellq,
             |    nk, seg
             |  FROM grid
             |), agg AS (
             |  SELECT CAST(max(n) AS BIGINT) AS n,
             |    CAST(count(DISTINCT nk) AS BIGINT) AS r,
             |    CAST(count(DISTINCT seg) AS BIGINT) AS c,
             |    CAST(sum(cellq) AS DOUBLE) / 100000000.0 AS chi2_raw
             |  FROM cells
             |)
             |SELECT n, r, c, (r - 1) * (c - 1) AS dof,
             |  floor(chi2_raw * 10000 + 0.5) / 10000 AS chi2,
             |  floor(sqrt(chi2_raw / n / CAST(least(r, c) - 1 AS DOUBLE))
             |    * 10000 + 0.5) / 10000 AS cramers_v
             |FROM agg""".stripMargin)
    ),

    // Mann–Whitney U rank-sum test (a47) — the nonparametric two-sample
    // location test (no normality assumption; the A/B workhorse when
    // revenue distributions are heavy-tailed). AVERAGE ranks for ties:
    // r̄(x) = min_rank(x) + (|ties(x)|−1)/2 — tiebreak-free, so the
    // statistic is deterministic without inventing a row order. Scale
    // shape: the global rank is DECOMPOSED — values hash into 1024
    // range buckets (bucket id is a monotone function of the value, so
    // equal values can never straddle buckets), within-bucket min-ranks
    // come from a window PARTITIONED BY bucket, and the global offset is
    // a prefix sum over the 1024-row bucket-count frame — no single-
    // reducer global sort anywhere (the W6 positional-split discipline).
    // The DuckDB twin spells the plain global rank(): same avg ranks.
    // Numeric design: avg ranks are half-integers, so rank sums are
    // exact in double; the tie correction Σ(t³−t) is exact BIGINT; the
    // only inexactness is the final z division and an IEEE-exact sqrt.
    OracleQuery(
      "a47_mann_whitney",
      (s, d) => {
        import s.implicits._
        val base = Tables.orders(s, d)
          .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
          .select($"o_orderpriority".as("g"), $"o_totalprice".as("x"))
        val stats = base.agg(min($"x").as("xmin"), max($"x").as("xmax"))
        val bucketed = base.crossJoin(broadcast(stats))
          // degenerate guard: an all-equal column makes the range 0 and
          // the division NaN — floor(NaN) is null and the bucket join
          // would silently drop every row; collapse to bucket 0 instead
          .withColumn("b",
            when($"xmax" === $"xmin", lit(0L))
              .otherwise(least(floor(($"x" - $"xmin") / ($"xmax" - $"xmin") * 1024.0),
                lit(1023.0)).cast("long")))
        val bCounts = bucketed.groupBy($"b").agg(count(lit(1)).as("bc"))
        val wPrefix = org.apache.spark.sql.expressions.Window
          .orderBy($"b").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val prefix = bCounts // ≤1024 rows — the only ordered window
          .withColumn("off", coalesce(sum($"bc").over(wPrefix), lit(0L)))
          .select($"b", $"off")
        val wIn = org.apache.spark.sql.expressions.Window
          .partitionBy($"b").orderBy($"x")
        val wEq = org.apache.spark.sql.expressions.Window.partitionBy($"x")
        val ranked = bucketed
          .withColumn("rin", rank().over(wIn))
          .withColumn("eq", count(lit(1)).over(wEq))
          .join(broadcast(prefix), "b")
          .withColumn("ravg",
            ($"off" + $"rin").cast("double") + ($"eq" - 1) / 2.0)
        val ties = base.groupBy($"x").agg(count(lit(1)).as("t"))
          // the cube rides DECIMAL(38,0) per TERM: t³ alone crosses 2⁶³
          // at t ≈ 2.1×10⁶ rows of one tied value (the a65/a74 ghost
          // class — DuckDB errors loudly on BIGINT overflow, Spark
          // under ANSI kills the job; decimal keeps both exact)
          .agg(sum($"t".cast("decimal(38,0)") * $"t" * $"t" - $"t").as("tie3"))
        ranked.groupBy()
          .agg(
            sum(when($"g" === "1-URGENT", lit(1L)).otherwise(0L)).as("n_a"),
            sum(when($"g" === "2-HIGH", lit(1L)).otherwise(0L)).as("n_b"),
            sum(when($"g" === "1-URGENT", $"ravg").otherwise(0.0)).as("r_a"))
          .crossJoin(broadcast(ties))
          .withColumn("u_a", $"r_a" - $"n_a" * ($"n_a" + 1) / 2.0)
          .withColumn("nn", ($"n_a" + $"n_b").cast("double"))
          .withColumn("varu",
            $"n_a" * $"n_b" / 12.0 *
              (($"nn" + 1) - $"tie3" / ($"nn" * ($"nn" - 1))))
          .select(
            $"n_a", $"n_b",
            graft.core.Parity.floorRound4($"u_a").as("u_a"),
            graft.core.Parity.floorRound4(
              ($"u_a" - $"n_a" * $"n_b" / 2.0) / sqrt($"varu")).as("z"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderpriority AS g, o_totalprice AS x FROM orders
             |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |), ranked AS (
             |  SELECT g,
             |    CAST(rank() OVER (ORDER BY x) AS DOUBLE)
             |      + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS ravg
             |  FROM base
             |), ties AS (
             |  SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS tie3
             |  FROM (SELECT count(*) AS t FROM base GROUP BY x)
             |), agg AS (
             |  SELECT
             |    CAST(sum(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN g = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    sum(CASE WHEN g = '1-URGENT' THEN ravg ELSE 0.0 END) AS r_a
             |  FROM ranked
             |), u AS (
             |  SELECT n_a, n_b, r_a - n_a * (n_a + 1) / 2.0 AS u_a,
             |    CAST(n_a + n_b AS DOUBLE) AS nn, tie3
             |  FROM agg CROSS JOIN ties
             |)
             |SELECT n_a, n_b,
             |  floor(u_a * 10000 + 0.5) / 10000 AS u_a,
             |  floor((u_a - n_a * n_b / 2.0)
             |    / sqrt(n_a * n_b / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1))))
             |    * 10000 + 0.5) / 10000 AS z
             |FROM u""".stripMargin)
    ),

    // Kaplan–Meier survival estimator (a46) — time-to-conversion with
    // ADMINISTRATIVE right censoring: duration = hours from a user's
    // first SIGNUP to first subsequent purchase, non-converters censored
    // at the corpus max ts (the study-end cutoff). Distinct estimand
    // from pipe_survival_km, which anchors at first activity and
    // censors at the user's own last event — the last-seen scheme is
    // the engagement-lifetime question, while censoring conversion at
    // last-seen is informative censoring (quitters look like short
    // observations) and biases S(t) — this entry is the textbook
    // conversion-study spelling, on the hour grain, with the ln terms
    // quantized instead of pipe's raw log/exp+round chain. Scale shape: the fact collapses to one row
    // per user (two hash aggregates + one join), then to the DURATION
    // grain, which is bounded by the time resolution (≤ hours-in-range
    // rows) — the KM product and at-risk window run on that bounded
    // frame, never on users. Numeric design: d_i and n_i(at-risk) are
    // exact integers under the hash gate; the survival curve
    // S(t)=Π(1−dᵢ/nᵢ) is spelled exp(Σ ln(·)) with each ln term
    // quantized to a 1e-12 long before the exact integer cumsum, so
    // cross-engine libm ulp drift cannot reorder or re-round the sum
    // (residual risk: a term landing within 1e-19 of the quantization
    // grid — the accepted a44b class).
    OracleQuery(
      "a46_kaplan_meier",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val su = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"ts").as("su"))
        val pu = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("pts"))
          .join(su, "user_id")
          .filter($"pts" >= $"su")
          .groupBy($"user_id").agg(min($"pts").as("pu"))
        val cutoff = ev.agg(max($"ts").as("cut"))
        val durations = su.join(pu, Seq("user_id"), "left")
          .crossJoin(broadcast(cutoff))
          .select(
            expr("(unix_micros(coalesce(pu, cut)) - unix_micros(su)) div 3600000000")
              .as("dur_hr"),
            when($"pu".isNotNull, lit(1L)).otherwise(0L).as("is_event"))
        val grain = durations.groupBy($"dur_hr")
          .agg(sum($"is_event").as("d_events"),
            sum(lit(1L) - $"is_event").as("c_censored"))
        val wPrev = org.apache.spark.sql.expressions.Window
          .orderBy($"dur_hr").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy($"dur_hr").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val total = durations.agg(count(lit(1)).as("n_total"))
        grain.crossJoin(broadcast(total)) // duration-grain frame: bounded
          .withColumn("n_risk",
            $"n_total" - coalesce(sum($"d_events" + $"c_censored").over(wPrev), lit(0L)))
          .withColumn("termq",
            when($"d_events" === 0 || $"n_risk" === $"d_events", lit(0L))
              .otherwise(floor(
                log(($"n_risk" - $"d_events").cast("double") / $"n_risk")
                  * 1000000000000.0 + 0.5).cast("long")))
          .withColumn("cum", sum($"termq").over(wCum))
          .filter($"d_events" > 0)
          .select($"dur_hr", $"n_risk", $"d_events", $"c_censored",
            when($"n_risk" === $"d_events", lit(0.0))
              .otherwise(graft.core.Parity.floorRound4(exp($"cum" / 1000000000000.0)))
              .as("survival"))
          .orderBy($"dur_hr")
      },
      Some("""WITH su AS (
             |  SELECT user_id, min(ts) AS su FROM events
             |  WHERE event_type = 'signup' GROUP BY 1
             |), pu AS (
             |  SELECT e.user_id, min(e.ts) AS pu
             |  FROM events e JOIN su ON e.user_id = su.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts >= su.su
             |  GROUP BY 1
             |), cutoff AS (SELECT max(ts) AS cut FROM events),
             |durations AS (
             |  SELECT (epoch_us(COALESCE(pu.pu, cutoff.cut)) - epoch_us(su.su))
             |      // 3600000000 AS dur_hr,
             |    CASE WHEN pu.pu IS NOT NULL THEN 1 ELSE 0 END AS is_event
             |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id
             |  CROSS JOIN cutoff
             |), grain AS (
             |  SELECT dur_hr, CAST(sum(is_event) AS BIGINT) AS d_events,
             |    CAST(sum(1 - is_event) AS BIGINT) AS c_censored
             |  FROM durations GROUP BY 1
             |), tot AS (SELECT count(*) AS n_total FROM durations),
             |risked AS (
             |  SELECT dur_hr, d_events, c_censored,
             |    n_total - COALESCE(sum(d_events + c_censored) OVER (
             |      ORDER BY dur_hr ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0) AS n_risk
             |  FROM grain CROSS JOIN tot
             |), termed AS (
             |  SELECT dur_hr, d_events, c_censored, n_risk,
             |    CASE WHEN d_events = 0 OR n_risk = d_events THEN 0
             |      ELSE CAST(floor(ln(CAST(n_risk - d_events AS DOUBLE) / n_risk)
             |        * 1000000000000.0 + 0.5) AS BIGINT) END AS termq
             |  FROM risked
             |), cumd AS (
             |  SELECT dur_hr, d_events, c_censored, n_risk,
             |    sum(termq) OVER (ORDER BY dur_hr
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM termed
             |)
             |SELECT dur_hr, CAST(n_risk AS BIGINT) AS n_risk, d_events, c_censored,
             |  CASE WHEN n_risk = d_events THEN 0.0
             |    ELSE floor(exp(cum / 1000000000000.0) * 10000 + 0.5) / 10000 END
             |    AS survival
             |FROM cumd WHERE d_events > 0 ORDER BY dur_hr""".stripMargin)
    ),

    // Partial correlation (a51) — the confound-screening companion to
    // a45's raw matrix: r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²))
    // tells whether x–y association survives controlling z (a raw
    // correlation driven entirely by a shared driver z collapses to ~0).
    // Same scale shape as a45: ONE scan, ONE hash aggregate carrying all
    // quantized-long pair sums; the 12 (pair, control) cells are pure
    // arithmetic on the 1-row result. Identical formula text on both
    // engines; output ordered on the (pair, control) string key.
    OracleQuery(
      "a51_partial_corr",
      (s, d) => {
        import s.implicits._
        val measures = Seq(
          "q" -> $"l_quantity",
          "p" -> ($"l_extendedprice" / 65536.0),
          "dc" -> $"l_discount",
          "t" -> $"l_tax")
        val names = measures.map(_._1)
        val byName = measures.toMap
        val allPairs = for (i <- names.indices; j <- i until names.length)
          yield (names(i), names(j))
        def qsum(c: org.apache.spark.sql.Column) =
          sum(floor(c * 1000000.0 + 0.5).cast("long")).cast("double") / 1000000.0
        val aggs =
          measures.map { case (nm, c) => qsum(c).as(s"s_$nm") } ++
          allPairs.map { case (a, b) => qsum(byName(a) * byName(b)).as(s"s_${a}_$b") }
        val one = Tables.lineitem(s, d)
          .agg(count(lit(1)).cast("double").as("n"), aggs: _*)
        def sOf(a: String, b: String) =
          if (names.indexOf(a) <= names.indexOf(b)) col(s"s_${a}_$b") else col(s"s_${b}_$a")
        def corrOf(a: String, b: String) =
          ($"n" * sOf(a, b) - col(s"s_$a") * col(s"s_$b")) /
            (sqrt($"n" * sOf(a, a) - col(s"s_$a") * col(s"s_$a")) *
             sqrt($"n" * sOf(b, b) - col(s"s_$b") * col(s"s_$b")))
        val cells = for {
          (a, b) <- allPairs if a != b
          z <- names if z != a && z != b
        } yield struct(
          lit(s"${a}_$b").as("pair"), lit(z).as("control"),
          graft.core.Parity.floorRound4(
            (corrOf(a, b) - corrOf(a, z) * corrOf(b, z)) /
              (sqrt(lit(1.0) - corrOf(a, z) * corrOf(a, z)) *
               sqrt(lit(1.0) - corrOf(b, z) * corrOf(b, z)))).as("partial_r"))
        one.select(explode(array(cells: _*)).as("r"))
          .select($"r.pair", $"r.control", $"r.partial_r")
          .orderBy($"pair", $"control")
      },
      Some {
        val names = Seq("q", "p", "dc", "t")
        val allPairs = for (i <- names.indices; j <- i until names.length)
          yield (names(i), names(j))
        def sName(a: String, b: String) =
          if (names.indexOf(a) <= names.indexOf(b)) s"s_${a}_$b" else s"s_${b}_$a"
        def corr(a: String, b: String) =
          s"((n * ${sName(a, b)} - s_$a * s_$b) / " +
            s"(sqrt(n * ${sName(a, a)} - s_$a * s_$a) * " +
            s"sqrt(n * ${sName(b, b)} - s_$b * s_$b)))"
        val sums = names.map(nm =>
          s"CAST(sum(CAST(floor((${nm}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_$nm") ++
          allPairs.map { case (a, b) =>
            s"CAST(sum(CAST(floor(($a * $b) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_${a}_$b" }
        val cells = (for {
          (a, b) <- allPairs if a != b
          z <- names if z != a && z != b
        } yield s"SELECT '${a}_$b' AS pair, '$z' AS control, " +
          s"floor((${corr(a, b)} - ${corr(a, z)} * ${corr(b, z)}) / " +
          s"(sqrt(1.0 - ${corr(a, z)} * ${corr(a, z)}) * " +
          s"sqrt(1.0 - ${corr(b, z)} * ${corr(b, z)})) * 10000 + 0.5) / 10000 AS partial_r FROM s")
          .mkString("\n  UNION ALL ")
        s"""WITH m AS (
           |  SELECT l_quantity AS q, l_extendedprice / 65536.0 AS p,
           |    l_discount AS dc, l_tax AS t
           |  FROM lineitem
           |), s AS (
           |  SELECT CAST(count(*) AS DOUBLE) AS n,
           |    ${sums.mkString(",\n    ")}
           |  FROM m
           |), cells AS (
           |  $cells
           |)
           |SELECT pair, control, partial_r FROM cells ORDER BY pair, control""".stripMargin
      }
    ),

    // Holm–Bonferroni multiple-testing correction (a54) — five
    // one-vs-rest mean tests run at once is the textbook way to mint
    // false positives; Holm's step-down controls FWER with more power
    // than plain Bonferroni and needs no independence assumption. Scale
    // shape: ONE quantized-long hash aggregate per group (n, Σx, Σx²);
    // rest-of-population stats are totals minus the group (no second
    // scan); z's quantize to 1e-4 longs so every rank and every
    // rejection is an EXACT INTEGER comparison against the literal
    // critical values z(α/2k)…z(α/2) both engines embed — ulp-proof.
    // The step-down rule (reject while all stronger ranks rejected) is
    // a running min over the 5-row frame.
    OracleQuery(
      "a54_holm_bonferroni",
      (s, d) => {
        import s.implicits._
        val x = $"o_totalprice" / 65536.0
        val g = Tables.orders(s, d)
          .groupBy($"o_orderpriority".as("grp"))
          .agg(
            count(lit(1)).as("n"),
            sum(floor(x * 1000000.0 + 0.5).cast("long")).as("sq"),
            sum(floor(x * x * 1000000.0 + 0.5).cast("long")).as("ssq"))
        val tot = g.agg(sum($"n").as("nt"), sum($"sq").as("sqt"), sum($"ssq").as("ssqt"))
        val z = g.crossJoin(broadcast(tot))
          .withColumn("nr", $"nt" - $"n")
          .withColumn("s1", $"sq".cast("double") / 1000000.0)
          .withColumn("ss1", $"ssq".cast("double") / 1000000.0)
          .withColumn("s2", ($"sqt" - $"sq").cast("double") / 1000000.0)
          .withColumn("ss2", ($"ssqt" - $"ssq").cast("double") / 1000000.0)
          .withColumn("se", sqrt(
            (($"ss1" - $"s1" * $"s1" / $"n") / ($"n" - 1)) / $"n" +
              (($"ss2" - $"s2" * $"s2" / $"nr") / ($"nr" - 1)) / $"nr"))
          .withColumn("zval", ($"s1" / $"n" - $"s2" / $"nr") / $"se")
          .withColumn("zq", floor(abs($"zval") * 10000.0 + 0.5).cast("long"))
        val wRank = org.apache.spark.sql.expressions.Window
          .orderBy($"zq".desc, $"grp")
        val wRun = wRank.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        // two-sided z criticals for α=0.05 step-down, k=5: α/(k−r+1)
        val crits = array(lit(25758L), lit(24977L), lit(23940L), lit(22414L), lit(19600L))
        z.withColumn("rank", row_number().over(wRank))
          // the critical table is k=5-specific; clamp the index so a
          // grouping column whose cardinality ever grows past 5 reuses
          // the rank-5 critical deterministically in BOTH engines
          // instead of element_at going out of bounds (NULL in DuckDB,
          // NULL/throw in Spark — a silent divergence)
          .withColumn("crit", element_at(crits, least($"rank", lit(5))))
          .withColumn("reject_raw", $"zq" > $"crit")
          .withColumn("reject_holm",
            min($"reject_raw".cast("int")).over(wRun) === 1)
          .select($"grp", $"n",
            graft.core.Parity.floorRound4($"zval").as("z"),
            $"rank", $"reject_raw", $"reject_holm")
          .orderBy($"rank")
      },
      Some("""WITH g AS (
             |  SELECT o_orderpriority AS grp, count(*) AS n,
             |    sum(CAST(floor((o_totalprice / 65536.0) * 1000000.0 + 0.5)
             |      AS BIGINT)) AS sq,
             |    sum(CAST(floor((o_totalprice / 65536.0) * (o_totalprice / 65536.0)
             |      * 1000000.0 + 0.5) AS BIGINT)) AS ssq
             |  FROM orders GROUP BY 1
             |), tot AS (
             |  SELECT sum(n) AS nt, sum(sq) AS sqt, sum(ssq) AS ssqt FROM g
             |), z AS (
             |  SELECT grp, n,
             |    ((CAST(sq AS DOUBLE) / 1000000.0) / n
             |      - (CAST(sqt - sq AS DOUBLE) / 1000000.0) / (nt - n))
             |    / sqrt(
             |      (((CAST(ssq AS DOUBLE) / 1000000.0)
             |        - (CAST(sq AS DOUBLE) / 1000000.0) * (CAST(sq AS DOUBLE) / 1000000.0) / n)
             |        / (n - 1)) / n
             |      + (((CAST(ssqt - ssq AS DOUBLE) / 1000000.0)
             |        - (CAST(sqt - sq AS DOUBLE) / 1000000.0) * (CAST(sqt - sq AS DOUBLE) / 1000000.0) / (nt - n))
             |        / ((nt - n) - 1)) / (nt - n)) AS zval
             |  FROM g CROSS JOIN tot
             |), q AS (
             |  SELECT grp, n, zval,
             |    CAST(floor(abs(zval) * 10000.0 + 0.5) AS BIGINT) AS zq
             |  FROM z
             |), ranked AS (
             |  SELECT grp, n, zval, zq,
             |    CAST(row_number() OVER (ORDER BY zq DESC, grp) AS INT) AS rank
             |  FROM q
             |), crit AS (
             |  SELECT r.*, ([25758, 24977, 23940, 22414, 19600])[least(rank, 5)] AS crit
             |  FROM ranked r
             |), flagged AS (
             |  SELECT grp, n, zval, rank, zq > crit AS reject_raw,
             |    min(CASE WHEN zq > crit THEN 1 ELSE 0 END)
             |      OVER (ORDER BY rank
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
             |      AS reject_holm
             |  FROM crit
             |)
             |SELECT grp, CAST(n AS BIGINT) AS n,
             |  floor(zval * 10000 + 0.5) / 10000 AS z,
             |  rank, reject_raw, reject_holm
             |FROM flagged ORDER BY rank""".stripMargin)
    ),

    // Benjamini–Hochberg FDR (a55) — the step-UP companion to a54's
    // step-down: Holm controls the family-wise error rate (any false
    // positive), BH controls the false-discovery RATE (share of false
    // positives among rejections) — the right knob when the five tests
    // are screening candidates rather than gating a launch. Same
    // one-aggregate z machinery as a54; criticals are z(α·r/(2k)) for
    // rank r, and the step-up rule rejects EVERY rank ≤ the largest
    // rank whose own z clears its critical — a rank whose z misses its
    // own bar is still rejected if a weaker rank clears (the property
    // that distinguishes BH from Holm, asserted in the spec). All
    // decisions are exact integer comparisons on 1e-4-quantized z.
    OracleQuery(
      "a55_bh_fdr",
      (s, d) => {
        import s.implicits._
        val x = $"o_totalprice" / 65536.0
        val g = Tables.orders(s, d)
          .groupBy($"o_orderpriority".as("grp"))
          .agg(
            count(lit(1)).as("n"),
            sum(floor(x * 1000000.0 + 0.5).cast("long")).as("sq"),
            sum(floor(x * x * 1000000.0 + 0.5).cast("long")).as("ssq"))
        val tot = g.agg(sum($"n").as("nt"), sum($"sq").as("sqt"), sum($"ssq").as("ssqt"))
        val z = g.crossJoin(broadcast(tot))
          .withColumn("nr", $"nt" - $"n")
          .withColumn("s1", $"sq".cast("double") / 1000000.0)
          .withColumn("ss1", $"ssq".cast("double") / 1000000.0)
          .withColumn("s2", ($"sqt" - $"sq").cast("double") / 1000000.0)
          .withColumn("ss2", ($"ssqt" - $"ssq").cast("double") / 1000000.0)
          .withColumn("se", sqrt(
            (($"ss1" - $"s1" * $"s1" / $"n") / ($"n" - 1)) / $"n" +
              (($"ss2" - $"s2" * $"s2" / $"nr") / ($"nr" - 1)) / $"nr"))
          .withColumn("zval", ($"s1" / $"n" - $"s2" / $"nr") / $"se")
          .withColumn("zq", floor(abs($"zval") * 10000.0 + 0.5).cast("long"))
        val wRank = org.apache.spark.sql.expressions.Window
          .orderBy($"zq".desc, $"grp")
        val wAll = org.apache.spark.sql.expressions.Window
          .orderBy($"rank").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        // two-sided z criticals for α=0.05 step-up, k=5: α·r/k at rank r
        val crits = array(lit(25758L), lit(23263L), lit(21701L), lit(20537L), lit(19600L))
        z.withColumn("rank", row_number().over(wRank))
          // same out-of-bounds guard as a54: the table is k=5-specific,
          // a 6th group must reuse the last critical in both engines
          // rather than turn hit/reject into NULLs
          .withColumn("crit", element_at(crits, least($"rank", lit(5))))
          .withColumn("hit", $"zq" > $"crit")
          .withColumn("kstar",
            coalesce(max(when($"hit", $"rank")).over(wAll), lit(0)))
          .select($"grp", $"n",
            graft.core.Parity.floorRound4($"zval").as("z"),
            $"rank", $"hit", ($"rank" <= $"kstar").as("reject_bh"))
          .orderBy($"rank")
      },
      Some("""WITH g AS (
             |  SELECT o_orderpriority AS grp, count(*) AS n,
             |    sum(CAST(floor((o_totalprice / 65536.0) * 1000000.0 + 0.5)
             |      AS BIGINT)) AS sq,
             |    sum(CAST(floor((o_totalprice / 65536.0) * (o_totalprice / 65536.0)
             |      * 1000000.0 + 0.5) AS BIGINT)) AS ssq
             |  FROM orders GROUP BY 1
             |), tot AS (
             |  SELECT sum(n) AS nt, sum(sq) AS sqt, sum(ssq) AS ssqt FROM g
             |), z AS (
             |  SELECT grp, n,
             |    ((CAST(sq AS DOUBLE) / 1000000.0) / n
             |      - (CAST(sqt - sq AS DOUBLE) / 1000000.0) / (nt - n))
             |    / sqrt(
             |      (((CAST(ssq AS DOUBLE) / 1000000.0)
             |        - (CAST(sq AS DOUBLE) / 1000000.0) * (CAST(sq AS DOUBLE) / 1000000.0) / n)
             |        / (n - 1)) / n
             |      + (((CAST(ssqt - ssq AS DOUBLE) / 1000000.0)
             |        - (CAST(sqt - sq AS DOUBLE) / 1000000.0) * (CAST(sqt - sq AS DOUBLE) / 1000000.0) / (nt - n))
             |        / ((nt - n) - 1)) / (nt - n)) AS zval
             |  FROM g CROSS JOIN tot
             |), q AS (
             |  SELECT grp, n, zval,
             |    CAST(floor(abs(zval) * 10000.0 + 0.5) AS BIGINT) AS zq
             |  FROM z
             |), ranked AS (
             |  SELECT grp, n, zval, zq,
             |    CAST(row_number() OVER (ORDER BY zq DESC, grp) AS INT) AS rank
             |  FROM q
             |), crit AS (
             |  SELECT r.*, ([25758, 23263, 21701, 20537, 19600])[least(rank, 5)] AS crit
             |  FROM ranked r
             |), flagged AS (
             |  SELECT grp, n, zval, rank, zq > crit AS hit,
             |    coalesce(max(CASE WHEN zq > crit THEN rank END) OVER (), 0) AS kstar
             |  FROM crit
             |)
             |SELECT grp, CAST(n AS BIGINT) AS n,
             |  floor(zval * 10000 + 0.5) / 10000 AS z,
             |  rank, hit, rank <= kstar AS reject_bh
             |FROM flagged ORDER BY rank""".stripMargin)
    ),

    // Kruskal–Wallis H (a56) — the K-group generalization of a47's
    // Mann–Whitney and the rank-based (distribution-free) twin of
    // a49's ANOVA F: "do the K groups share a location" without the
    // normality assumption ANOVA leans on. Scale shape: ranks are NEVER
    // a per-row global sort — the a20 recipe groups to per-value tie
    // counts first and takes ONE bucketed prefix sum over the (much
    // smaller) distinct-value frame via ops/PrefixSum, so average ranks
    // come from arithmetic on (cum_t, t), all exactly-representable
    // longs and .5-granular doubles. Per-group rank sums are
    // DECIMAL(38,1)-cast (exact at .5 granularity), the K-row Σ R²/n
    // reduction is DECIMAL-cast per a44b, and the tie correction
    // Σ(t³−t) is an exact integer sum. The rejection compares
    // 1e-4-quantized H against the embedded χ²(k−1, 0.95) critical.
    OracleQuery(
      "a56_kruskal_wallis",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).filter($"value".isNotNull)
          .select($"event_type".as("grp"), $"value".as("v"))
        val perVal = ev.groupBy($"v").agg(count(lit(1)).as("t"))
          .withColumn("g", lit("all"))
        val cum = graft.ops.PrefixSum
          .withCumsum(perVal, "g", "v", "t", "cum_t")
          .withColumn("avgrank", ($"cum_t" - $"t") + ($"t" + lit(1)) / 2.0)
        val perGV = ev.groupBy($"grp", $"v").agg(count(lit(1)).as("c"))
        val rg = perGV.join(cum.select($"v", $"avgrank"), "v")
          .groupBy($"grp")
          .agg(sum($"c").as("ng"),
            sum(($"c" * $"avgrank").cast("decimal(38,1)")).cast("double").as("rg"))
        val ties = perVal.agg(
          sum($"t").cast("double").as("nn"),
          // per-TERM decimal (the cast used to come after the long cube —
          // t³ alone wraps past t ≈ 2.1×10⁶ tied rows)
          sum($"t".cast("decimal(38,0)") * $"t" * $"t" - $"t").cast("double").as("t3"))
        val crits = array(lit(38415L), lit(59915L), lit(78147L),
          lit(94877L), lit(110705L), lit(125916L), lit(140671L))
        rg.crossJoin(broadcast(ties))
          .withColumn("term", ($"rg" * $"rg" / $"ng").cast("decimal(38,6)"))
          .groupBy()
          .agg(max($"nn").as("nn"), sum($"term").cast("double").as("sterm"),
            count(lit(1)).as("k"), max($"t3").as("t3"))
          .withColumn("h",
            lit(12.0) / ($"nn" * ($"nn" + 1.0)) * $"sterm" - lit(3.0) * ($"nn" + 1.0))
          .withColumn("cc",
            lit(1.0) - $"t3" / ($"nn" * $"nn" * $"nn" - $"nn"))
          .withColumn("hc", $"h" / nullif($"cc", lit(0.0)))
          // k = 1 (degenerate single-group input) ⟹ H ≡ 0 exactly, but
          // element_at's index would be 0 (Spark throws, DuckDB NULLs —
          // a crash AND a divergence): clamp to df ≥ 1; the comparison
          // against crit(1) then correctly reports reject = false
          // clamp BOTH ends: k = 1 degenerates to df 0 (low end), and a
          // 9th event_type would index past the 7-entry χ² table (high
          // end — NULL in DuckDB, NULL/throw in Spark); df > 7 reuses
          // the df-7 critical deterministically in both engines
          .withColumn("crit",
            element_at(crits,
              least(lit(7), greatest(lit(1), ($"k" - 1).cast("int")))))
          .select(
            $"nn".cast("long").as("n"), $"k".cast("long").as("k"),
            graft.core.Parity.floorRound4($"h").as("h"),
            graft.core.Parity.floorRound4($"hc").as("h_tie_corrected"),
            (floor(abs($"hc") * 10000.0 + 0.5).cast("long") > $"crit").as("reject_05"))
      },
      Some("""WITH pv AS (
             |  SELECT value AS v, count(*) AS t FROM events
             |  WHERE value IS NOT NULL GROUP BY 1
             |), cum AS (
             |  SELECT v, t, sum(t) OVER (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_t
             |  FROM pv
             |), r AS (
             |  SELECT v, (cum_t - t) + (t + 1) / 2.0 AS avgrank FROM cum
             |), gv AS (
             |  SELECT event_type AS grp, value AS v, count(*) AS c
             |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
             |), rg AS (
             |  SELECT grp, sum(c) AS ng,
             |    CAST(sum(CAST(c * avgrank AS DECIMAL(38,1))) AS DOUBLE) AS rg
             |  FROM gv JOIN r USING (v) GROUP BY grp
             |), ties AS (
             |  SELECT CAST(sum(t) AS DOUBLE) AS nn,
             |    CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS DOUBLE) AS t3
             |  FROM pv
             |), agg AS (
             |  SELECT max(nn) AS nn,
             |    CAST(sum(CAST(rg * rg / ng AS DECIMAL(38,6))) AS DOUBLE) AS sterm,
             |    count(*) AS k, max(t3) AS t3
             |  FROM rg CROSS JOIN ties
             |), hs AS (
             |  SELECT nn, k,
             |    12.0 / (nn * (nn + 1.0)) * sterm - 3.0 * (nn + 1.0) AS h,
             |    1.0 - t3 / (nn * nn * nn - nn) AS cc
             |  FROM agg
             |), hc AS (
             |  SELECT nn, k, h, h / nullif(cc, 0.0) AS hc FROM hs
             |)
             |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             |  floor(h * 10000 + 0.5) / 10000 AS h,
             |  floor(hc * 10000 + 0.5) / 10000 AS h_tie_corrected,
             |  CAST(floor(abs(hc) * 10000.0 + 0.5) AS BIGINT)
             |    > ([38415, 59915, 78147, 94877, 110705, 125916, 140671])[least(7, greatest(1, k - 1))]
             |    AS reject_05
             |FROM hc""".stripMargin)
    ),

    // McNemar paired test (a57) — the PAIRED member of the test family:
    // a48's chi-square treats two samples as independent, but "did the
    // SAME users convert in both halves of the month" is a
    // within-subject question, and the discordant-pair statistic
    // (b−c)²/(b+c) is its correct instrument (concordant pairs carry no
    // information about marginal change and drop out). Scale shape: one
    // hash aggregate to the user grain (two conditional maxes), one
    // 4-cell reduction. EXACTNESS: b, c are integers, so the rejection
    // is spelled as the cross-multiplied INTEGER comparison
    // (b−c)²·10⁴ > 38415·(b+c) — no division anywhere near the
    // verdict, immune to every float hazard; only the display
    // statistic divides, under the floor spelling.
    OracleQuery(
      "a57_mcnemar",
      (s, d) => {
        import s.implicits._
        val per = Tables.events(s, d)
          .groupBy($"user_id")
          .agg(
            max(when($"event_type" === "purchase" && dayofmonth($"ts") <= 15, 1)
              .otherwise(0)).as("a"),
            max(when($"event_type" === "purchase" && dayofmonth($"ts") >= 16, 1)
              .otherwise(0)).as("b"))
        per.agg(
            sum(when($"a" === 1 && $"b" === 0, 1L).otherwise(0L)).as("n10"),
            sum(when($"a" === 0 && $"b" === 1, 1L).otherwise(0L)).as("n01"),
            sum(when($"a" === 1 && $"b" === 1, 1L).otherwise(0L)).as("n11"),
            sum(when($"a" === 0 && $"b" === 0, 1L).otherwise(0L)).as("n00"))
          .select($"n10", $"n01", $"n11", $"n00",
            graft.core.Parity.floorRound4(
              (($"n10" - $"n01") * ($"n10" - $"n01")).cast("double")
                / nullif(($"n10" + $"n01").cast("double"), lit(0.0))).as("mcnemar"),
            (($"n10" - $"n01") * ($"n10" - $"n01") * lit(10000L)
              > lit(38415L) * ($"n10" + $"n01")).as("reject_05"))
      },
      Some("""WITH per AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase'
             |      AND date_part('day', ts) <= 15 THEN 1 ELSE 0 END) AS a,
             |    max(CASE WHEN event_type = 'purchase'
             |      AND date_part('day', ts) >= 16 THEN 1 ELSE 0 END) AS b
             |  FROM events GROUP BY user_id
             |), cells AS (
             |  SELECT
             |    sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n10,
             |    sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS n01,
             |    sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
             |    sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00
             |  FROM per
             |)
             |SELECT CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
             |  CAST(n11 AS BIGINT) AS n11, CAST(n00 AS BIGINT) AS n00,
             |  floor(CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
             |    / nullif(CAST(n10 + n01 AS DOUBLE), 0.0) * 10000 + 0.5) / 10000
             |    AS mcnemar,
             |  (n10 - n01) * (n10 - n01) * 10000 > 38415 * (n10 + n01)
             |    AS reject_05
             |FROM cells""".stripMargin)
    ),

    // Precision/recall/F1 threshold sweep (a58) — the confusion-matrix
    // family a20's AUC summarizes away: a deployment picks ONE
    // threshold, and the per-threshold (TP, FP, FN, TN) table is what
    // that decision reads. Scale shape: ONE value-grain aggregate
    // (score → pos/neg counts, the a20 recipe — at 100 TB quantize the
    // score to a grid first, the a21 bin discipline), then an 8-row
    // threshold fan-out over that tiny frame. All four cells are EXACT
    // integer sums; precision/recall/F1 are single IEEE divisions of
    // those longs (identical cross-engine), display-rounded by the
    // floor spelling; zero-denominator cells go NULL via nullif on both
    // sides.
    OracleQuery(
      "a58_pr_curve",
      (s, d) => {
        import s.implicits._
        val perScore = Tables.events(s, d)
          .select($"value".as("score"),
            when($"event_type" === "purchase", 1L).otherwise(0L).as("pos"))
          .groupBy($"score")
          .agg(sum($"pos").as("np"), (count(lit(1)) - sum($"pos")).as("nn"))
        val ths = explode(expr("sequence(25, 200, 25)")).as("th")
        perScore.select($"score", $"np", $"nn", ths)
          .groupBy($"th")
          .agg(
            sum(when($"score" >= $"th", $"np").otherwise(0L)).as("tp"),
            sum(when($"score" >= $"th", $"nn").otherwise(0L)).as("fp"),
            sum(when($"score" < $"th", $"np").otherwise(0L)).as("fn"),
            sum(when($"score" < $"th", $"nn").otherwise(0L)).as("tn"))
          .select($"th".cast("long").as("th"),
            $"tp".cast("long").as("tp"), $"fp".cast("long").as("fp"),
            $"fn".cast("long").as("fn"), $"tn".cast("long").as("tn"),
            graft.core.Parity.floorRound4($"tp".cast("double")
              / nullif(($"tp" + $"fp").cast("double"), lit(0.0))).as("precision"),
            graft.core.Parity.floorRound4($"tp".cast("double")
              / nullif(($"tp" + $"fn").cast("double"), lit(0.0))).as("recall"),
            graft.core.Parity.floorRound4(lit(2.0) * $"tp"
              / nullif((lit(2L) * $"tp" + $"fp" + $"fn").cast("double"), lit(0.0)))
              .as("f1"))
          .orderBy($"th")
      },
      Some("""WITH per_score AS (
             |  SELECT value AS score,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
             |    sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS nn
             |  FROM events GROUP BY value
             |), cells AS (
             |  SELECT th,
             |    sum(CASE WHEN score >= th THEN np ELSE 0 END) AS tp,
             |    sum(CASE WHEN score >= th THEN nn ELSE 0 END) AS fp,
             |    sum(CASE WHEN score < th THEN np ELSE 0 END) AS fn,
             |    sum(CASE WHEN score < th THEN nn ELSE 0 END) AS tn
             |  FROM per_score CROSS JOIN (
             |    SELECT unnest(generate_series(25, 200, 25)) AS th)
             |  GROUP BY th
             |)
             |SELECT CAST(th AS BIGINT) AS th,
             |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
             |  floor(CAST(tp AS DOUBLE) / nullif(CAST(tp + fp AS DOUBLE), 0.0)
             |    * 10000 + 0.5) / 10000 AS precision,
             |  floor(CAST(tp AS DOUBLE) / nullif(CAST(tp + fn AS DOUBLE), 0.0)
             |    * 10000 + 0.5) / 10000 AS recall,
             |  floor(2.0 * tp / nullif(CAST(2 * tp + fp + fn AS DOUBLE), 0.0)
             |    * 10000 + 0.5) / 10000 AS f1
             |FROM cells ORDER BY th""".stripMargin)
    ),

    // Power analysis / minimum detectable effect (a60) — the DESIGN
    // member of the A/B family (mSPRT/CUPED/DiD/TOST analyze a finished
    // experiment; power analysis sizes the next one): from the two
    // arms' quantized (n, Σx, Σx²), the pooled σ gives the smallest
    // absolute/relative lift detectable at α=0.05 two-sided with 80%
    // power — MDE = (z₀.₉₇₅+z₀.₈)·σ_p·√(1/n₁+1/n₂) — and the per-arm n
    // required to detect a 1% relative lift. One hash aggregate; all
    // downstream arithmetic is IEEE on the 1-row frame (sqrt IS
    // correctly rounded, unlike ln, so no quantization step is needed
    // before the display floor); the z-sum constant is a decimal
    // literal both engines parse to the identical double.
    OracleQuery(
      "a60_power_mde",
      (s, d) => {
        import s.implicits._
        val x = $"o_totalprice" / 65536.0
        val g = Tables.orders(s, d)
          .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
          .groupBy($"o_orderpriority".as("grp"))
          .agg(
            count(lit(1)).as("n"),
            sum(floor(x * 1000000.0 + 0.5).cast("long")).as("sq"),
            sum(floor(x * x * 1000000.0 + 0.5).cast("long")).as("ssq"))
          .select($"grp", $"n",
            ($"sq".cast("double") / 1000000.0).as("sx"),
            ($"ssq".cast("double") / 1000000.0).as("sxx"))
        g.groupBy()
          .agg(
            max(when($"grp" === "1-URGENT", $"n")).as("n1"),
            max(when($"grp" === "1-URGENT", $"sx")).as("s1"),
            max(when($"grp" === "1-URGENT", $"sxx")).as("ss1"),
            max(when($"grp" === "2-HIGH", $"n")).as("n2"),
            max(when($"grp" === "2-HIGH", $"sx")).as("s2"),
            max(when($"grp" === "2-HIGH", $"sxx")).as("ss2"))
          .withColumn("vp",
            ((($"ss1" - $"s1" * $"s1" / $"n1")
              + ($"ss2" - $"s2" * $"s2" / $"n2")) / ($"n1" + $"n2" - 2)))
          .withColumn("mu", ($"s1" + $"s2") / ($"n1" + $"n2"))
          .withColumn("mde",
            lit(2.801585) * sqrt($"vp") * sqrt(lit(1.0) / $"n1" + lit(1.0) / $"n2"))
          .withColumn("nreq",
            ceil(lit(2.0) * $"vp" * lit(2.801585) * lit(2.801585)
              / ((lit(0.01) * $"mu") * (lit(0.01) * $"mu"))).cast("long"))
          .select(
            $"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
            graft.core.Parity.floorRound4(sqrt($"vp")).as("sigma_pooled"),
            graft.core.Parity.floorRound4($"mde").as("mde_abs"),
            graft.core.Parity.floorRound4($"mde" / $"mu").as("mde_rel"),
            $"nreq".as("n_per_arm_1pct"))
      },
      Some("""WITH g AS (
             |  SELECT o_orderpriority AS grp, count(*) AS n,
             |    sum(CAST(floor((o_totalprice / 65536.0) * 1000000.0 + 0.5)
             |      AS BIGINT)) AS sq,
             |    sum(CAST(floor((o_totalprice / 65536.0) * (o_totalprice / 65536.0)
             |      * 1000000.0 + 0.5) AS BIGINT)) AS ssq
             |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |  GROUP BY 1
             |), wide AS (
             |  SELECT
             |    max(CASE WHEN grp = '1-URGENT' THEN n END) AS n1,
             |    max(CASE WHEN grp = '1-URGENT' THEN CAST(sq AS DOUBLE) / 1000000.0 END) AS s1,
             |    max(CASE WHEN grp = '1-URGENT' THEN CAST(ssq AS DOUBLE) / 1000000.0 END) AS ss1,
             |    max(CASE WHEN grp = '2-HIGH' THEN n END) AS n2,
             |    max(CASE WHEN grp = '2-HIGH' THEN CAST(sq AS DOUBLE) / 1000000.0 END) AS s2,
             |    max(CASE WHEN grp = '2-HIGH' THEN CAST(ssq AS DOUBLE) / 1000000.0 END) AS ss2
             |  FROM g
             |), t AS (
             |  SELECT n1, n2,
             |    (((ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2)) / (n1 + n2 - 2)) AS vp,
             |    (s1 + s2) / (n1 + n2) AS mu
             |  FROM wide
             |), m AS (
             |  SELECT n1, n2, vp, mu,
             |    2.801585 * sqrt(vp) * sqrt(1.0 / n1 + 1.0 / n2) AS mde
             |  FROM t
             |)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |  floor(sqrt(vp) * 10000 + 0.5) / 10000 AS sigma_pooled,
             |  floor(mde * 10000 + 0.5) / 10000 AS mde_abs,
             |  floor(mde / mu * 10000 + 0.5) / 10000 AS mde_rel,
             |  CAST(ceil(2.0 * vp * 2.801585 * 2.801585
             |    / ((0.01 * mu) * (0.01 * mu))) AS BIGINT) AS n_per_arm_1pct
             |FROM m""".stripMargin)
    ),

    // Intraclass correlation + design effect (a61) — the missing input
    // to a60 when randomization is CLUSTERED (by user, store, region):
    // users' repeated events are correlated, so an experiment
    // randomizing k clusters of size m has effective sample size
    // n/deff with deff = 1 + (m−1)·ICC — ignore it and a60's n looks
    // sufficient when the test is badly underpowered. ICC(1) from the
    // one-way random-effects decomposition over user clusters: ONE
    // quantized-long hash aggregate per user (n, Σx, Σx², and n² for
    // the unbalanced-size correction n₀), per-group SSW/SSB terms
    // RE-quantized to 1e-6 longs before the cross-group sum (the a49
    // discipline — no order-dependent double summation anywhere), all
    // final arithmetic IEEE on the 1-row frame.
    OracleQuery(
      "a61_icc_design_effect",
      (s, d) => {
        import s.implicits._
        val x = $"value" / 512.0
        // null values filtered BEFORE the cluster aggregate: count(1)
        // would count rows the sums skip, biasing n (and so SSW/n₀/ICC)
        // identically on both engines — the oracle could not catch it
        val g = Tables.events(s, d).filter($"value".isNotNull)
          .groupBy($"user_id")
          .agg(
            count(lit(1)).as("n"),
            sum(floor(x * 1000000.0 + 0.5).cast("long")).as("sq"),
            sum(floor(x * x * 1000000.0 + 0.5).cast("long")).as("ssq"))
          .select($"n", $"sq", $"ssq",
            ($"sq".cast("double") / 1000000.0).as("s"),
            ($"ssq".cast("double") / 1000000.0).as("ss"))
          .withColumn("wq",
            floor(($"ss" - $"s" * $"s" / $"n") * 1000000.0 + 0.5).cast("long"))
          .withColumn("bq",
            floor($"s" * $"s" / $"n" * 1000000.0 + 0.5).cast("long"))
        g.agg(
            count(lit(1)).as("k"),
            sum($"n").as("nt"),
            sum($"n" * $"n").as("nsq"),
            sum($"sq").as("sq_all"),
            (sum($"wq").cast("double") / 1000000.0).as("ssw"),
            (sum($"bq").cast("double") / 1000000.0).as("sb_groups"))
          .withColumn("ssb",
            $"sb_groups" - ($"sq_all" / 1000000.0) * ($"sq_all" / 1000000.0) / $"nt")
          .withColumn("msb", $"ssb" / ($"k" - 1))
          .withColumn("msw", $"ssw" / ($"nt" - $"k"))
          .withColumn("n0",
            ($"nt" - $"nsq".cast("double") / $"nt") / ($"k" - 1))
          .withColumn("icc",
            ($"msb" - $"msw") / ($"msb" + ($"n0" - 1.0) * $"msw"))
          .select(
            $"k".cast("long").as("k"), $"nt".cast("long").as("n_total"),
            graft.core.Parity.floorRound4($"n0").as("n0"),
            graft.core.Parity.floorRound4($"icc").as("icc"),
            graft.core.Parity.floorRound4(
              lit(1.0) + lit(49.0) * $"icc").as("deff_m50"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, count(*) AS n,
             |    sum(CAST(floor((value / 512.0) * 1000000.0 + 0.5) AS BIGINT)) AS sq,
             |    sum(CAST(floor((value / 512.0) * (value / 512.0) * 1000000.0 + 0.5)
             |      AS BIGINT)) AS ssq
             |  FROM events WHERE value IS NOT NULL GROUP BY 1
             |), t AS (
             |  SELECT n, sq,
             |    CAST(floor((CAST(ssq AS DOUBLE) / 1000000.0
             |      - (CAST(sq AS DOUBLE) / 1000000.0) * (CAST(sq AS DOUBLE) / 1000000.0) / n)
             |      * 1000000.0 + 0.5) AS BIGINT) AS wq,
             |    CAST(floor((CAST(sq AS DOUBLE) / 1000000.0) * (CAST(sq AS DOUBLE) / 1000000.0) / n
             |      * 1000000.0 + 0.5) AS BIGINT) AS bq
             |  FROM g
             |), a AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |    CAST(sum(n) AS BIGINT) AS nt,
             |    CAST(sum(n * n) AS BIGINT) AS nsq,
             |    CAST(sum(sq) AS DOUBLE) AS sq_all,
             |    CAST(sum(wq) AS DOUBLE) / 1000000.0 AS ssw,
             |    CAST(sum(bq) AS DOUBLE) / 1000000.0 AS sb_groups
             |  FROM t
             |), m AS (
             |  SELECT k, nt,
             |    (sb_groups - (sq_all / 1000000.0) * (sq_all / 1000000.0) / nt)
             |      / (k - 1) AS msb,
             |    ssw / (nt - k) AS msw,
             |    (nt - CAST(nsq AS DOUBLE) / nt) / (k - 1) AS n0
             |  FROM a
             |), i AS (
             |  SELECT k, nt, n0,
             |    (msb - msw) / (msb + (n0 - 1.0) * msw) AS icc
             |  FROM m
             |)
             |SELECT k, nt AS n_total,
             |  floor(n0 * 10000 + 0.5) / 10000 AS n0,
             |  floor(icc * 10000 + 0.5) / 10000 AS icc,
             |  floor((1.0 + 49.0 * icc) * 10000 + 0.5) / 10000 AS deff_m50
             |FROM i""".stripMargin)
    ),

    // TOST equivalence test (a53) — the inverse question of a47/a49:
    // not "do these groups differ" but "are they the SAME within a
    // margin" (launch gates are equivalence questions: a significant
    // t-test failure does NOT establish no-difference — absence of
    // evidence ≠ evidence of absence; TOST is the correct instrument).
    // Two one-sided Welch t-tests against ±δ (δ = 2% of the pooled
    // mean); equivalent ⟺ BOTH reject, i.e. min(t_lo, t_up) > z₀.₉₅.
    // Scale shape: ONE hash aggregate carrying quantized-long
    // (n, Σx, Σx²) per group (the a49 recipe); every downstream number
    // is arithmetic on the 2-row frame. The decision boolean compares
    // a 1e-4-quantized t against the constant, so a cross-engine ulp
    // cannot flip the verdict unless the t lands exactly on the grid
    // boundary (the accepted class).
    OracleQuery(
      "a53_tost_equivalence",
      (s, d) => {
        import s.implicits._
        val x = $"o_totalprice" / 65536.0
        val g = Tables.orders(s, d)
          .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
          .groupBy($"o_orderpriority".as("grp"))
          .agg(
            count(lit(1)).as("n"),
            sum(floor(x * 1000000.0 + 0.5).cast("long")).as("sq"),
            sum(floor(x * x * 1000000.0 + 0.5).cast("long")).as("ssq"))
          .select($"grp", $"n",
            ($"sq".cast("double") / 1000000.0).as("sx"),
            ($"ssq".cast("double") / 1000000.0).as("sxx"))
        val wide = g.groupBy()
          .agg(
            max(when($"grp" === "1-URGENT", $"n")).as("n1"),
            max(when($"grp" === "1-URGENT", $"sx")).as("s1"),
            max(when($"grp" === "1-URGENT", $"sxx")).as("ss1"),
            max(when($"grp" === "2-HIGH", $"n")).as("n2"),
            max(when($"grp" === "2-HIGH", $"sx")).as("s2"),
            max(when($"grp" === "2-HIGH", $"sxx")).as("ss2"))
          .withColumn("m1", $"s1" / $"n1")
          .withColumn("m2", $"s2" / $"n2")
          .withColumn("v1", ($"ss1" - $"s1" * $"s1" / $"n1") / ($"n1" - 1))
          .withColumn("v2", ($"ss2" - $"s2" * $"s2" / $"n2") / ($"n2" - 1))
          .withColumn("se", sqrt($"v1" / $"n1" + $"v2" / $"n2"))
          .withColumn("diff", $"m1" - $"m2")
          .withColumn("delta",
            (($"s1" + $"s2") / ($"n1" + $"n2")) * 0.02)
          .withColumn("t_lo_q",
            floor(($"diff" + $"delta") / $"se" * 10000.0 + 0.5).cast("long"))
          .withColumn("t_up_q",
            floor(($"delta" - $"diff") / $"se" * 10000.0 + 0.5).cast("long"))
        wide.select(
          $"n1", $"n2",
          graft.core.Parity.floorRound4($"diff").as("diff"),
          graft.core.Parity.floorRound4($"delta").as("delta"),
          ($"t_lo_q".cast("double") / 10000.0).as("t_lower"),
          ($"t_up_q".cast("double") / 10000.0).as("t_upper"),
          ($"t_lo_q" > 16449L && $"t_up_q" > 16449L).as("equivalent"))
      },
      Some("""WITH g AS (
             |  SELECT o_orderpriority AS grp, count(*) AS n,
             |    sum(CAST(floor((o_totalprice / 65536.0) * 1000000.0 + 0.5)
             |      AS BIGINT)) AS sq,
             |    sum(CAST(floor((o_totalprice / 65536.0) * (o_totalprice / 65536.0)
             |      * 1000000.0 + 0.5) AS BIGINT)) AS ssq
             |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |  GROUP BY 1
             |), wide AS (
             |  SELECT
             |    max(CASE WHEN grp = '1-URGENT' THEN n END) AS n1,
             |    max(CASE WHEN grp = '1-URGENT' THEN CAST(sq AS DOUBLE) / 1000000.0 END) AS s1,
             |    max(CASE WHEN grp = '1-URGENT' THEN CAST(ssq AS DOUBLE) / 1000000.0 END) AS ss1,
             |    max(CASE WHEN grp = '2-HIGH' THEN n END) AS n2,
             |    max(CASE WHEN grp = '2-HIGH' THEN CAST(sq AS DOUBLE) / 1000000.0 END) AS s2,
             |    max(CASE WHEN grp = '2-HIGH' THEN CAST(ssq AS DOUBLE) / 1000000.0 END) AS ss2
             |  FROM g
             |), t AS (
             |  SELECT n1, n2,
             |    s1 / n1 - s2 / n2 AS diff,
             |    ((s1 + s2) / (n1 + n2)) * 0.02 AS delta,
             |    sqrt(((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1
             |       + ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2) AS se
             |  FROM wide
             |), q AS (
             |  SELECT n1, n2, diff, delta,
             |    CAST(floor((diff + delta) / se * 10000.0 + 0.5) AS BIGINT) AS t_lo_q,
             |    CAST(floor((delta - diff) / se * 10000.0 + 0.5) AS BIGINT) AS t_up_q
             |  FROM t
             |)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |  floor(diff * 10000 + 0.5) / 10000 AS diff,
             |  floor(delta * 10000 + 0.5) / 10000 AS delta,
             |  CAST(t_lo_q AS DOUBLE) / 10000.0 AS t_lower,
             |  CAST(t_up_q AS DOUBLE) / 10000.0 AS t_upper,
             |  (t_lo_q > 16449 AND t_up_q > 16449) AS equivalent
             |FROM q""".stripMargin)
    ),

    // One-way ANOVA F-test (a49) — does mean revenue differ across
    // return-flag groups? The k-sample generalization of the t-test and
    // the first screen before any per-group modeling. Scale shape: ONE
    // hash aggregate per group collects (n, Σx, Σx²) as exact 1e-6
    // longs (the a45 quantized-sum recipe — codegen integer algebra,
    // order-free); SSW/SSB then assemble from the k-row frame with each
    // per-group term re-quantized to a 1e-6 long before the cross-group
    // sum, so nothing order-dependent ever touches doubles. Measures
    // scaled by 2¹⁶ (IEEE-exact, F-invariant) for long headroom.
    OracleQuery(
      "a49_anova_f",
      (s, d) => {
        import s.implicits._
        val x = $"l_extendedprice" / 65536.0
        val g = Tables.lineitem(s, d)
          .groupBy($"l_returnflag".as("flag"))
          .agg(
            count(lit(1)).as("n"),
            sum(floor(x * 1000000.0 + 0.5).cast("long")).as("sq"),
            sum(floor(x * x * 1000000.0 + 0.5).cast("long")).as("ssq"))
          .select($"n", $"sq", $"ssq",
            ($"sq".cast("double") / 1000000.0).as("s"),
            ($"ssq".cast("double") / 1000000.0).as("ss"))
          .withColumn("wq",
            floor(($"ss" - $"s" * $"s" / $"n") * 1000000.0 + 0.5).cast("long"))
          .withColumn("bq",
            floor($"s" * $"s" / $"n" * 1000000.0 + 0.5).cast("long"))
        g.agg(
            count(lit(1)).as("k"),
            sum($"n").as("n_total"),
            sum($"sq").as("sq_all"),
            (sum($"wq").cast("double") / 1000000.0).as("ssw"),
            (sum($"bq").cast("double") / 1000000.0).as("sb_groups"))
          .select(
            $"k", $"n_total",
            graft.core.Parity.floorRound4(
              $"sb_groups" - ($"sq_all" / 1000000.0) * ($"sq_all" / 1000000.0) / $"n_total")
              .as("ssb"),
            graft.core.Parity.floorRound4($"ssw").as("ssw"),
            graft.core.Parity.floorRound4(
              (($"sb_groups" - ($"sq_all" / 1000000.0) * ($"sq_all" / 1000000.0) / $"n_total") / ($"k" - 1))
                / ($"ssw" / ($"n_total" - $"k"))).as("f_stat"))
      },
      Some("""WITH g AS (
             |  SELECT l_returnflag AS flag, count(*) AS n,
             |    sum(CAST(floor((l_extendedprice / 65536.0) * 1000000.0 + 0.5)
             |      AS BIGINT)) AS sq,
             |    sum(CAST(floor((l_extendedprice / 65536.0) * (l_extendedprice / 65536.0)
             |      * 1000000.0 + 0.5) AS BIGINT)) AS ssq
             |  FROM lineitem GROUP BY 1
             |), t AS (
             |  SELECT n, sq, ssq,
             |    CAST(sq AS DOUBLE) / 1000000.0 AS s,
             |    CAST(ssq AS DOUBLE) / 1000000.0 AS ss
             |  FROM g
             |), q AS (
             |  SELECT n, sq,
             |    CAST(floor((ss - s * s / n) * 1000000.0 + 0.5) AS BIGINT) AS wq,
             |    CAST(floor(s * s / n * 1000000.0 + 0.5) AS BIGINT) AS bq
             |  FROM t
             |), a AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |    CAST(sum(n) AS BIGINT) AS n_total,
             |    CAST(sum(sq) AS DOUBLE) AS sq_all,
             |    CAST(sum(wq) AS DOUBLE) / 1000000.0 AS ssw,
             |    CAST(sum(bq) AS DOUBLE) / 1000000.0 AS sb_groups
             |  FROM q
             |)
             |SELECT k, n_total,
             |  floor((sb_groups - (sq_all / 1000000.0) * (sq_all / 1000000.0) / n_total)
             |    * 10000 + 0.5) / 10000 AS ssb,
             |  floor(ssw * 10000 + 0.5) / 10000 AS ssw,
             |  floor(((sb_groups - (sq_all / 1000000.0) * (sq_all / 1000000.0) / n_total)
             |    / (k - 1)) / (ssw / (n_total - k)) * 10000 + 0.5) / 10000 AS f_stat
             |FROM a""".stripMargin)
    ),

    // CUSUM changepoint LOCATION estimator (a50) — where did the
    // daily-revenue level shift? C_t = Σ_{i≤t}(x_i − x̄), changepoint =
    // argmax |C_t| (Page's statistic in its batch-retrospective form).
    // Complements w19_cusum_changepoint, the ONLINE one-sided alarm:
    // w19 answers "is something drifting NOW", a50 answers "when did
    // the level move" over a closed window — the post-mortem half. Numeric design: daily values quantized to 1e-6 longs at
    // the day-grain collapse; the recurrence is cleared of the
    // non-integer mean by multiplying through by n —
    // Cn_t = n·Σ_{i≤t}vq − t·Σvq — so every compared quantity is an
    // EXACT BIGINT; every day attaining the max |Cn| is flagged (exact
    // ties flag all maximal days, identically on both engines — a
    // symmetric series legitimately has several). Scale: fact
    // collapses to the day grain first; the window runs on that bounded
    // frame (the a39 discipline).
    OracleQuery(
      "a50_cusum_argmax",
      (s, d) => {
        import s.implicits._
        val wOrd = org.apache.spark.sql.expressions.Window.orderBy($"day")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        val daily = Tables.events(s, d)
          .groupBy(date_trunc("day", $"ts").as("day"))
          .agg(sum(floor($"value" * 1000000.0 + 0.5).cast("long")).as("vq"))
        daily
          .withColumn("t", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.orderBy($"day")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .withColumn("cum", sum($"vq").over(wOrd))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("tot", sum($"vq").over(wAll))
          .withColumn("cn", $"n" * $"cum" - $"t" * $"tot")
          .withColumn("cn_max", max(abs($"cn")).over(wAll))
          .select($"day",
            graft.core.Parity.floorRound4(
              $"cn".cast("double") / ($"n" * 1000000.0)).as("c_t"),
            ($"cn_max" === abs($"cn")).as("is_changepoint"))
          .orderBy($"day")
      },
      Some("""WITH daily AS (
             |  SELECT date_trunc('day', ts) AS day,
             |    sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS vq
             |  FROM events GROUP BY 1
             |), c AS (
             |  SELECT day, vq,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             |    sum(vq) OVER (ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    CAST(count(*) OVER () AS BIGINT) AS n,
             |    sum(vq) OVER () AS tot
             |  FROM daily
             |), cn AS (
             |  SELECT day, n * cum - t * tot AS cn, n FROM c
             |)
             |SELECT day,
             |  floor(CAST(cn AS DOUBLE) / (n * 1000000.0) * 10000 + 0.5) / 10000 AS c_t,
             |  (SELECT max(abs(cn)) FROM cn) = abs(cn) AS is_changepoint
             |FROM cn ORDER BY day""".stripMargin)
    ),

    // Spearman rank correlation (tie-aware) — the monotone-association
    // member the Pearson family (a45 matrix, a51 partial) misses:
    // Pearson on price↔quantity reads linearity, Spearman reads ANY
    // monotone link, and the gap between them is itself the
    // nonlinearity diagnostic. Ranks come from the a56 recipe — a
    // value-grain histogram + ops/PrefixSum bucketed running count,
    // never a global row sort: avg-rank(v) = (#smaller) + (ties+1)/2,
    // carried as DOUBLED ranks r2 = 2·#smaller + ties + 1 so every
    // rank is an exact INTEGER (the .5 grain vanishes) and all five
    // moment sums are exact longs (r2 ≤ 2n ⟹ Σr2·r2 ≤ 4n³ — inside
    // long headroom through sf1's 6e5 rows; past that the sums move to
    // DECIMAL, the a56 spelling). ρ combines the exact moments in
    // double with one sqrt — bit-deterministic cross-engine.
    OracleQuery(
      "a65_spearman",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select($"l_quantity".as("x"), $"l_extendedprice".as("y"))
        def r2Table(c: String) = {
          val hist = li.groupBy(col(c).as("v")).agg(count(lit(1)).as("t"))
            .withColumn("g", lit("all"))
          graft.ops.PrefixSum.withCumsum(hist, "g", "v", "t", "cum")
            .select(col("v"),
              (lit(2L) * (col("cum") - col("t")) + col("t") + 1L).as(s"r2_$c"))
        }
        val j = li
          .join(r2Table("x"), li("x") === col("v")).drop("v")
          .join(r2Table("y"), li("y") === col("v")).drop("v")
        // rank-moment sums ride DECIMAL(38,0): r2 ≤ 2n, so Σr2² ≈ 4n³
        // crosses 2⁶³ already at n ≈ 1.3×10⁶ (sf1's lineitem is 6×10⁶ —
        // the long spelling ANSI-failed there and its abort latency sat
        // in BENCH_sf1 as a ghost cell); DuckDB's BIGINT sum promotes
        // to HUGEINT, so decimal keeps the engines exact together
        j.agg(
            count(lit(1)).as("n"),
            sum($"r2_x".cast("decimal(38,0)")).as("sx"),
            sum($"r2_y".cast("decimal(38,0)")).as("sy"),
            sum($"r2_x".cast("decimal(38,0)") * $"r2_x").as("sxx"),
            sum($"r2_y".cast("decimal(38,0)") * $"r2_y").as("syy"),
            sum($"r2_x".cast("decimal(38,0)") * $"r2_y").as("sxy"))
          .withColumn("num",
            $"n".cast("double") * $"sxy" - $"sx".cast("double") * $"sy")
          .withColumn("den", sqrt(
            ($"n".cast("double") * $"sxx" - $"sx".cast("double") * $"sx") *
              ($"n".cast("double") * $"syy" - $"sy".cast("double") * $"sy")))
          .select($"n",
            graft.core.Parity.floorRound4($"num" / $"den").as("rho_spearman"))
      },
      Some("""WITH hx AS (
             |  SELECT l_quantity AS v, count(*) AS t FROM lineitem GROUP BY 1
             |), rx AS (
             |  SELECT v, 2 * (sum(t) OVER (ORDER BY v) - t) + t + 1 AS r2
             |  FROM hx
             |), hy AS (
             |  SELECT l_extendedprice AS v, count(*) AS t FROM lineitem GROUP BY 1
             |), ry AS (
             |  SELECT v, 2 * (sum(t) OVER (ORDER BY v) - t) + t + 1 AS r2
             |  FROM hy
             |), j AS (
             |  SELECT rx.r2 AS x, ry.r2 AS y
             |  FROM lineitem l
             |  JOIN rx ON rx.v = l.l_quantity
             |  JOIN ry ON ry.v = l.l_extendedprice
             |), m AS (
             |  SELECT count(*) AS n,
             |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x AS HUGEINT) * x) AS sxx,
             |    sum(CAST(y AS HUGEINT) * y) AS syy,
             |    sum(CAST(x AS HUGEINT) * y) AS sxy
             |  FROM j
             |)
             |SELECT n,
             |  floor(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
             |    * 10000 + 0.5) / 10000 AS rho_spearman
             |FROM m""".stripMargin)
    ),

    // Levene's test for variance homogeneity — the ASSUMPTION CHECK
    // behind a49's ANOVA F and a53's pooled-σ machinery (unequal
    // variances silently invalidate both; Levene is the gate you run
    // first). Mean-centered spelling: z_ij = |x_ij − x̄_g|, then the
    // one-way F statistic over the z's. Exactly TWO fact scans — pass
    // 1 collects per-group (n, Σxq) as exact longs for the means,
    // pass 2 re-scans with the k-row mean table broadcast back and
    // collects (n, Σzq, Σzq²) — the a49 quantized-sum recipe, so SSB/
    // SSW are exact integer algebra and W is one double expression.
    OracleQuery(
      "a66_levene",
      (s, d) => {
        import s.implicits._
        val x = $"o_totalprice" / 65536.0
        val xq = floor(x * 1000000.0 + 0.5).cast("long")
        val base = Tables.orders(s, d)
          .select($"o_orderpriority".as("grp"), xq.as("xq"))
        val means = base.groupBy($"grp")
          .agg(count(lit(1)).as("n"), sum($"xq").as("sq"))
          .select($"grp", $"n", ($"sq".cast("double") / 1000000.0 / $"n").as("m"))
        val zq = floor(abs($"xq".cast("double") / 1000000.0 - $"m") * 1000000.0 + 0.5)
          .cast("long")
        val g = base.join(broadcast(means.select($"grp", $"m")), "grp")
          .select($"grp", zq.as("zq"))
          .groupBy($"grp")
          .agg(count(lit(1)).as("ng"), sum($"zq").as("szq"),
            sum($"zq" * $"zq").as("szz"))
        g.agg(
            count(lit(1)).as("k"), sum($"ng").as("nn"),
            sum($"szq").as("s_all"),
            sum(($"szq".cast("double") * $"szq" / $"ng").cast("decimal(38,6)"))
              .cast("double").as("sb_groups"),
            sum($"szz").as("ss_all"))
          .withColumn("ssb",
            ($"sb_groups" - $"s_all".cast("double") * $"s_all" / $"nn") / 1e12)
          .withColumn("ssw",
            ($"ss_all".cast("double") - $"sb_groups") / 1e12)
          .select(
            $"k".cast("long").as("k"), $"nn".cast("long").as("n"),
            graft.core.Parity.floorRound4(
              ($"ssb" / ($"k" - 1)) / ($"ssw" / ($"nn" - $"k"))).as("w_levene"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderpriority AS grp,
             |    CAST(floor((o_totalprice / 65536.0) * 1000000.0 + 0.5) AS BIGINT) AS xq
             |  FROM orders
             |), means AS (
             |  SELECT grp, count(*) AS n,
             |    CAST(sum(xq) AS DOUBLE) / 1000000.0 / count(*) AS m
             |  FROM base GROUP BY 1
             |), z AS (
             |  SELECT b.grp,
             |    CAST(floor(abs(CAST(b.xq AS DOUBLE) / 1000000.0 - ms.m)
             |      * 1000000.0 + 0.5) AS BIGINT) AS zq
             |  FROM base b JOIN means ms ON ms.grp = b.grp
             |), g AS (
             |  SELECT grp, count(*) AS ng,
             |    CAST(sum(zq) AS BIGINT) AS szq,
             |    CAST(sum(zq * zq) AS BIGINT) AS szz
             |  FROM z GROUP BY 1
             |), a AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |    CAST(sum(ng) AS BIGINT) AS nn,
             |    CAST(sum(szq) AS BIGINT) AS s_all,
             |    CAST(sum(CAST(CAST(szq AS DOUBLE) * szq / ng AS DECIMAL(38,6)))
             |      AS DOUBLE) AS sb_groups,
             |    CAST(sum(szz) AS BIGINT) AS ss_all
             |  FROM g
             |), f AS (
             |  SELECT k, nn,
             |    (sb_groups - CAST(s_all AS DOUBLE) * s_all / nn) / 1e12 AS ssb,
             |    (CAST(ss_all AS DOUBLE) - sb_groups) / 1e12 AS ssw
             |  FROM a
             |)
             |SELECT k, nn AS n,
             |  floor(((ssb / (k - 1)) / (ssw / (nn - k))) * 10000 + 0.5) / 10000
             |    AS w_levene
             |FROM f""".stripMargin)
    ),

    // 1-D WASSERSTEIN (earth-mover) two-sample distance — the
    // magnitude-aware complement to a34's KS: KS reports the LARGEST
    // CDF gap, W₁ integrates ALL of it (W₁ = ∫|F₁−F₂|dx), so it ranks
    // "how far apart are these distributions" where KS only answers
    // "are they different" — the drift metric that decides whether a
    // new data source actually moved the value distribution. Same
    // VALUE-grain machinery as a34: the support is the quantized cent
    // grid (bounded — the grain is |support|, never |rows|, so the
    // ORDER BY v window is over ≤ ~50k rows at any corpus size and the
    // map-side histogram collapse does all the row-volume work). The
    // integral is EXACT integer algebra end-to-end: per distinct value
    // the term is |ca·n₂ − cb·n₁| · Δcents — a cross-multiplied CDF gap
    // (no per-row division) — summed as DECIMAL(38,0) (n₁·n₂·range
    // overflows BIGINT at sf1+), divided once at the end by n₁·n₂·100
    // to land in dollars, floorRound4 for display.
    OracleQuery(
      "a67_wasserstein",
      (s, d) => {
        import s.implicits._
        val hist = Tables.events(s, d)
          .filter($"event_type".isin("click", "error"))
          .groupBy(round($"value" * 100).cast("long").as("vc"))
          .agg(
            sum(when($"event_type" === "click", 1L).otherwise(0L)).as("a"),
            sum(when($"event_type" === "error", 1L).otherwise(0L)).as("b"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"vc")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        val wNext = org.apache.spark.sql.expressions.Window.orderBy($"vc")
        val cum = hist
          .withColumn("ca", sum($"a").over(w))
          .withColumn("cb", sum($"b").over(w))
          .withColumn("n1", sum($"a").over(wAll))
          .withColumn("n2", sum($"b").over(wAll))
          .withColumn("dvc", lead($"vc", 1).over(wNext) - $"vc")
          .filter($"dvc".isNotNull)
        cum.agg(
          max($"n1").cast("long").as("n1"),
          max($"n2").cast("long").as("n2"),
          // cast BEFORE the Δcents multiply: |ca·n₂| alone fits a long
          // to ~sf30 but the ×dvc product does not — decimal×long keeps
          // the term exact at any scale
          sum(abs($"ca" * $"n2" - $"cb" * $"n1").cast("decimal(38,0)") * $"dvc")
            .as("num"))
          .select($"n1", $"n2",
            graft.core.Parity.floorRound4(
              $"num".cast("double") / ($"n1" * $"n2").cast("double") / 100.0)
              .as("w1_dollars"))
      },
      Some("""WITH hist AS (
             |  SELECT CAST(round(value * 100) AS BIGINT) AS vc,
             |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
             |  FROM events WHERE event_type IN ('click', 'error')
             |  GROUP BY 1
             |), cum AS (
             |  SELECT vc, a, b,
             |    sum(a) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             |    sum(b) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             |    sum(a) OVER () AS n1, sum(b) OVER () AS n2,
             |    lead(vc) OVER (ORDER BY vc) - vc AS dvc
             |  FROM hist
             |)
             |SELECT CAST(any_value(n1) AS BIGINT) AS n1,
             |  CAST(any_value(n2) AS BIGINT) AS n2,
             |  floor(CAST(sum(CAST(abs(ca * n2 - cb * n1) * dvc AS DECIMAL(38,0)))
             |      AS DOUBLE)
             |    / CAST(any_value(n1) * any_value(n2) AS DOUBLE) / 100.0
             |    * 10000 + 0.5) / 10000 AS w1_dollars
             |FROM cum WHERE dvc IS NOT NULL""".stripMargin)
    ),

    // CRAMÉR–VON MISES two-sample test — the third CDF-distance member
    // (a34's KS = sup gap, a67's W₁ = ∫|gap|dx, CvM = Σ gap² over the
    // POOLED sample — more power than KS against distributed-everywhere
    // differences, less dominated by one crossing). Same value-grain
    // histogram; the statistic is exact integer algebra: per distinct
    // value the cross-multiplied gap d = ca·n₂ − cb·n₁ squares in
    // DECIMAL(19,0)² → DECIMAL(38,0) (d² overflows BIGINT from sf1 up),
    // weights by the pooled mass m = a + b, sums as DECIMAL, and
    // divides ONCE at display by n₁·n₂·N² (computed in double — the
    // product overflows BIGINT at scale, and IEEE parity holds because
    // both engines spell it identically). Rejection compares the
    // 1e-4-quantized T against the asymptotic α = 0.05 critical 0.461.
    OracleQuery(
      "a69_cramer_von_mises",
      (s, d) => {
        import s.implicits._
        val hist = Tables.events(s, d)
          .filter($"event_type".isin("click", "error"))
          .groupBy(round($"value" * 100).cast("long").as("vc"))
          .agg(
            sum(when($"event_type" === "click", 1L).otherwise(0L)).as("a"),
            sum(when($"event_type" === "error", 1L).otherwise(0L)).as("b"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"vc")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        val cum = hist
          .withColumn("ca", sum($"a").over(w))
          .withColumn("cb", sum($"b").over(w))
          .withColumn("n1", sum($"a").over(wAll))
          .withColumn("n2", sum($"b").over(wAll))
          .withColumn("dgap", ($"ca" * $"n2" - $"cb" * $"n1").cast("decimal(19,0)"))
        cum.agg(
          max($"n1").cast("long").as("n1"),
          max($"n2").cast("long").as("n2"),
          sum($"dgap" * $"dgap" * ($"a" + $"b")).as("num"))
          .select($"n1", $"n2",
            graft.core.Parity.floorRound4(
              $"num".cast("double")
                / ($"n1".cast("double") * $"n2" * ($"n1" + $"n2") * ($"n1" + $"n2")))
              .as("t_cvm"))
          .withColumn("reject_h0", $"t_cvm" > 0.461)
      },
      Some("""WITH hist AS (
             |  SELECT CAST(round(value * 100) AS BIGINT) AS vc,
             |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
             |  FROM events WHERE event_type IN ('click', 'error')
             |  GROUP BY 1
             |), cum AS (
             |  SELECT a, b,
             |    sum(a) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             |    sum(b) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             |    sum(a) OVER () AS n1, sum(b) OVER () AS n2
             |  FROM hist
             |), agg AS (
             |  SELECT CAST(any_value(n1) AS BIGINT) AS n1,
             |    CAST(any_value(n2) AS BIGINT) AS n2,
             |    sum(CAST(ca * n2 - cb * n1 AS DECIMAL(19,0))
             |      * CAST(ca * n2 - cb * n1 AS DECIMAL(19,0)) * (a + b)) AS num
             |  FROM cum
             |)
             |SELECT n1, n2,
             |  floor(CAST(num AS DOUBLE)
             |    / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2) * (n1 + n2))
             |    * 10000 + 0.5) / 10000 AS t_cvm,
             |  floor(CAST(num AS DOUBLE)
             |    / (CAST(n1 AS DOUBLE) * n2 * (n1 + n2) * (n1 + n2))
             |    * 10000 + 0.5) / 10000 > 0.461 AS reject_h0
             |FROM agg""".stripMargin)
    )
  )
}

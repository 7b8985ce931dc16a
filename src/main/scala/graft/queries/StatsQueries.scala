package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Parity, Tables}

/** Second-wave inferential statistics: rank-concordance correlation,
  * normality and residual-autocorrelation diagnostics, unit-root and
  * forecast-comparison tests, and the Anderson–Darling two-sample
  * distribution test — the battery a metrics platform runs AFTER the
  * first-wave tests (KS/CvM/Levene/ANOVA, AggQueries a34/a49/a66/a69)
  * say "something differs": HOW correlated, WHICH model forecasts
  * better, is the series stationary, are residuals independent.
  *
  * Shared scale discipline (the a34/a69 value-grain recipe): every
  * statistic collapses the fact table FIRST — to a distinct-value
  * histogram (a70, a73) or a per-day series (a72, w26, w27) — so the
  * expensive algebra runs on support-sized or calendar-sized frames,
  * never row-sized ones. Counts and quantized sums are exact integers
  * (DECIMAL where 100 TB row counts would overflow a long); the final
  * statistic is one row-local double expression, floor-rounded to 4
  * decimals identically on both engines.
  */
object StatsQueries {

  /** Recursive-CTE spelling of the additive Holt–Winters fold over the
    * per-flag daily revenue series — shared verbatim by the batch
    * entry (w28) and its streaming twin (stream_holt_winters), exactly
    * as kalmanLevelOracle is shared by w25 and stream_kalman_level:
    * one recursion, three gates. */
  private[queries] val holtWintersOracle: String =
    """WITH RECURSIVE daily AS (
      |  SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      / 100.0 AS y
      |  FROM lineitem GROUP BY 1, 2
      |), pos AS (
      |  SELECT flag, day, y,
      |    row_number() OVER (PARTITION BY flag ORDER BY day) AS rn
      |  FROM daily
      |), piv AS (
      |  SELECT flag,
      |    max(CASE WHEN rn = 1 THEN y END) AS v1,
      |    max(CASE WHEN rn = 2 THEN y END) AS v2,
      |    max(CASE WHEN rn = 3 THEN y END) AS v3,
      |    max(CASE WHEN rn = 4 THEN y END) AS v4,
      |    max(CASE WHEN rn = 5 THEN y END) AS v5,
      |    max(CASE WHEN rn = 6 THEN y END) AS v6,
      |    max(CASE WHEN rn = 7 THEN y END) AS v7
      |  FROM pos WHERE rn <= 7 GROUP BY flag HAVING count(*) = 7
      |), rec AS (
      |  SELECT p.flag, p.day, p.y, p.rn,
      |    CAST(NULL AS DOUBLE) AS yhat,
      |    (v1 + v2 + v3 + v4 + v5 + v6 + v7) / 7 AS l,
      |    CAST(0.0 AS DOUBLE) AS b,
      |    v1 - (v1 + v2 + v3 + v4 + v5 + v6 + v7) / 7 AS s1,
      |    v2 - (v1 + v2 + v3 + v4 + v5 + v6 + v7) / 7 AS s2,
      |    v3 - (v1 + v2 + v3 + v4 + v5 + v6 + v7) / 7 AS s3,
      |    v4 - (v1 + v2 + v3 + v4 + v5 + v6 + v7) / 7 AS s4,
      |    v5 - (v1 + v2 + v3 + v4 + v5 + v6 + v7) / 7 AS s5,
      |    v6 - (v1 + v2 + v3 + v4 + v5 + v6 + v7) / 7 AS s6,
      |    v7 - (v1 + v2 + v3 + v4 + v5 + v6 + v7) / 7 AS s7
      |  FROM pos p JOIN piv ON piv.flag = p.flag AND p.rn = 7
      |  UNION ALL
      |  SELECT n.flag, n.day, n.y, n.rn,
      |    r.l + r.b + r.s1 AS yhat,
      |    CAST(0.25 AS DOUBLE) * (n.y - r.s1)
      |      + CAST(0.75 AS DOUBLE) * (r.l + r.b) AS l,
      |    CAST(0.0625 AS DOUBLE) * ((CAST(0.25 AS DOUBLE) * (n.y - r.s1)
      |        + CAST(0.75 AS DOUBLE) * (r.l + r.b)) - r.l)
      |      + CAST(0.9375 AS DOUBLE) * r.b AS b,
      |    r.s2 AS s1, r.s3 AS s2, r.s4 AS s3, r.s5 AS s4,
      |    r.s6 AS s5, r.s7 AS s6,
      |    CAST(0.25 AS DOUBLE) * (n.y - (CAST(0.25 AS DOUBLE) * (n.y - r.s1)
      |        + CAST(0.75 AS DOUBLE) * (r.l + r.b)))
      |      + CAST(0.75 AS DOUBLE) * r.s1 AS s7
      |  FROM rec r JOIN pos n ON n.flag = r.flag AND n.rn = r.rn + 1
      |)
      |SELECT flag, day,
      |  floor(y * 10000 + 0.5) / 10000 AS y,
      |  floor(yhat * 10000 + 0.5) / 10000 AS yhat,
      |  floor(l * 10000 + 0.5) / 10000 AS level,
      |  floor(b * 10000 + 0.5) / 10000 AS trend
      |FROM rec WHERE rn >= 8 ORDER BY flag, day""".stripMargin

  def all: Seq[OracleQuery] = Seq(

    // Kendall's τ-b rank correlation (a70) — the concordance-based
    // sibling of a37/a65's Spearman ρ: for every pair of observations,
    // does y move the same way as x? Unlike Spearman it is a direct
    // probability statement (P[concordant] − P[discordant]) and is the
    // standard target for rank-aggregation / metric-agreement audits.
    // Naive computation is O(n²) over ROWS — unusable past 10⁵. The
    // scale spelling: both variables are (already / after bucketing)
    // discrete, so collapse to the JOINT FREQUENCY table first (one
    // hash agg, |support_x|·|support_y| cells — 50×105 here, and
    // bounded by the grid no matter how many rows feed it), then count
    // concordant/discordant PAIRS OF CELLS weighted by n₁·n₂. The
    // cell-pair join (x₁ < x₂) is a broadcast nested loop over a
    // support-sized frame — ~27M cheap comparisons, independent of row
    // count, the same deliberate support²-grain as dedup_lsh_eval. Tie
    // corrections n₁ (x-ties) and n₂ (y-ties) come from the margins of
    // the same cell table. All pair counts are exact integers summed
    // as DECIMAL(38,0) (C ≤ n²/2 overflows a long past ~4×10⁹ rows).
    OracleQuery(
      "a70_kendall_tau",
      (s, d) => {
        import s.implicits._
        val cells = Tables.lineitem(s, d)
          .select($"l_quantity".cast("long").as("x"),
            floor($"l_extendedprice" / 1000).cast("long").as("y"))
          .groupBy($"x", $"y").agg(count(lit(1)).as("nc"))
        val a = cells.as("a")
        val b = cells.as("b")
        // cell/margin counts are cast to DECIMAL(38,0) BEFORE their
        // products (not just before the sum): a long·long product wraps
        // silently past ~9.2×10¹⁸ while DuckDB promotes to HUGEINT —
        // the engines would diverge rather than fail loudly. The
        // decimal multiply keeps the whole pair algebra exact to 10³⁸.
        val pairs = a.join(b, $"a.x" < $"b.x")
          .agg(
            sum(when($"a.y" < $"b.y", $"a.nc".cast("decimal(38,0)") * $"b.nc")
              .otherwise(lit(0).cast("decimal(38,0)"))).as("c_pairs"),
            sum(when($"a.y" > $"b.y", $"a.nc".cast("decimal(38,0)") * $"b.nc")
              .otherwise(lit(0).cast("decimal(38,0)"))).as("d_pairs"))
        val tx = cells.groupBy($"x").agg(sum($"nc").as("t"))
          .agg(sum(($"t".cast("decimal(38,0)") * ($"t" - 1) / 2)
              .cast("decimal(38,0)")).as("n1"),
            sum($"t").cast("decimal(38,0)").as("n"))
        val ty = cells.groupBy($"y").agg(sum($"nc").as("t"))
          .agg(sum(($"t".cast("decimal(38,0)") * ($"t" - 1) / 2)
              .cast("decimal(38,0)")).as("n2"))
        pairs.crossJoin(tx).crossJoin(ty)
          .select(
            $"n".cast("long").as("n"),
            $"c_pairs".cast("long").as("c_pairs"),
            $"d_pairs".cast("long").as("d_pairs"),
            Parity.floorRound4(
              ($"c_pairs".cast("double") - $"d_pairs")
                / sqrt(
                  ($"n".cast("double") * ($"n" - 1) / 2 - $"n1")
                    * ($"n".cast("double") * ($"n" - 1) / 2 - $"n2")))
              .as("tau_b"))
      },
      Some("""WITH cells AS (
             |  SELECT CAST(l_quantity AS BIGINT) AS x,
             |    CAST(floor(l_extendedprice / 1000) AS BIGINT) AS y,
             |    count(*) AS nc
             |  FROM lineitem GROUP BY 1, 2
             |), pairs AS (
             |  SELECT
             |    CAST(sum(CASE WHEN a.y < b.y THEN a.nc * b.nc ELSE 0 END) AS DECIMAL(38,0)) AS c_pairs,
             |    CAST(sum(CASE WHEN a.y > b.y THEN a.nc * b.nc ELSE 0 END) AS DECIMAL(38,0)) AS d_pairs
             |  FROM cells a JOIN cells b ON a.x < b.x
             |), tx AS (
             |  SELECT CAST(sum(t * (t - 1) // 2) AS DECIMAL(38,0)) AS n1,
             |    CAST(sum(t) AS DECIMAL(38,0)) AS n
             |  FROM (SELECT x, sum(nc) AS t FROM cells GROUP BY 1)
             |), ty AS (
             |  SELECT CAST(sum(t * (t - 1) // 2) AS DECIMAL(38,0)) AS n2
             |  FROM (SELECT y, sum(nc) AS t FROM cells GROUP BY 1)
             |)
             |SELECT CAST(n AS BIGINT) AS n,
             |  CAST(c_pairs AS BIGINT) AS c_pairs,
             |  CAST(d_pairs AS BIGINT) AS d_pairs,
             |  floor((CAST(c_pairs AS DOUBLE) - CAST(d_pairs AS DOUBLE))
             |    / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2 - CAST(n1 AS DOUBLE))
             |         * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1) / 2 - CAST(n2 AS DOUBLE)))
             |    * 10000 + 0.5) / 10000 AS tau_b
             |FROM pairs, tx, ty""".stripMargin)
    ),

    // Jarque–Bera normality test (a71) — the assumption gate in front
    // of every z/t-based decision in the battery (a27 Wilson, a53
    // TOST, a60 power): JB = n/6·(g₁² + (g₂−3)²/4) from sample
    // skewness g₁ and kurtosis g₂, ~χ²₂ under normality. ONE scan
    // collecting the four raw power sums of the quantized value as
    // exact integers (grid = totalprice/65536 at 2 decimals, x⁴ ≤
    // 5×10¹¹ per row, so long sums survive to ~10⁷ rows and the
    // DECIMAL(38,0) spelling used here to ~10²⁶ rows); central
    // moments, g₁, g₂ and JB are one row of IEEE algebra from the
    // sums. Map-side combine does almost all the work — the shuffle
    // carries 32 partial sums.
    OracleQuery(
      "a71_jarque_bera",
      (s, d) => {
        import s.implicits._
        val xq = floor($"o_totalprice" / 65536.0 * 100.0 + 0.5).cast("long")
        val sums = Tables.orders(s, d)
          .select(xq.as("x"))
          .agg(
            count(lit(1)).as("n"),
            sum($"x".cast("decimal(38,0)")).as("s1"),
            sum(($"x" * $"x").cast("decimal(38,0)")).as("s2"),
            sum(($"x" * $"x" * $"x").cast("decimal(38,0)")).as("s3"),
            sum(($"x" * $"x" * $"x" * $"x").cast("decimal(38,0)")).as("s4"))
        sums
          .withColumn("mu", $"s1".cast("double") / $"n")
          .withColumn("m2",
            $"s2".cast("double") / $"n" - $"mu" * $"mu")
          .withColumn("m3",
            $"s3".cast("double") / $"n" - lit(3.0) * $"mu" * ($"s2".cast("double") / $"n")
              + lit(2.0) * $"mu" * $"mu" * $"mu")
          .withColumn("m4",
            $"s4".cast("double") / $"n" - lit(4.0) * $"mu" * ($"s3".cast("double") / $"n")
              + lit(6.0) * $"mu" * $"mu" * ($"s2".cast("double") / $"n")
              - lit(3.0) * $"mu" * $"mu" * $"mu" * $"mu")
          .withColumn("g1", $"m3" / ($"m2" * sqrt($"m2")))
          .withColumn("g2", $"m4" / ($"m2" * $"m2"))
          .withColumn("jb",
            $"n" / lit(6.0) * ($"g1" * $"g1" + ($"g2" - 3) * ($"g2" - 3) / 4))
          .select(
            $"n".cast("long").as("n"),
            Parity.floorRound4($"g1").as("skewness"),
            Parity.floorRound4($"g2").as("kurtosis"),
            Parity.floorRound4($"jb").as("jb"),
            ($"jb" > 5.991).as("reject_normal"))
      },
      Some("""WITH q AS (
             |  SELECT CAST(floor(o_totalprice / 65536.0 * 100.0 + 0.5) AS BIGINT) AS x
             |  FROM orders
             |), sums AS (
             |  SELECT count(*) AS n,
             |    CAST(sum(x) AS DECIMAL(38,0)) AS s1,
             |    CAST(sum(x * x) AS DECIMAL(38,0)) AS s2,
             |    CAST(sum(x * x * x) AS DECIMAL(38,0)) AS s3,
             |    CAST(sum(x * x * x * x) AS DECIMAL(38,0)) AS s4
             |  FROM q
             |), m AS (
             |  SELECT n,
             |    CAST(s1 AS DOUBLE) / n AS mu,
             |    CAST(s2 AS DOUBLE) / n AS r2,
             |    CAST(s3 AS DOUBLE) / n AS r3,
             |    CAST(s4 AS DOUBLE) / n AS r4
             |  FROM sums
             |), c AS (
             |  SELECT n, mu,
             |    r2 - mu * mu AS m2,
             |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
             |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 - 3.0 * mu * mu * mu * mu AS m4
             |  FROM m
             |), g AS (
             |  SELECT n, m3 / (m2 * sqrt(m2)) AS g1, m4 / (m2 * m2) AS g2 FROM c
             |), jbt AS (
             |  SELECT n, g1, g2,
             |    n / 6.0 * (g1 * g1 + (g2 - 3) * (g2 - 3) / 4) AS jb
             |  FROM g
             |)
             |SELECT CAST(n AS BIGINT) AS n,
             |  floor(g1 * 10000 + 0.5) / 10000 AS skewness,
             |  floor(g2 * 10000 + 0.5) / 10000 AS kurtosis,
             |  floor(jb * 10000 + 0.5) / 10000 AS jb,
             |  jb > 5.991 AS reject_normal
             |FROM jbt""".stripMargin)
    ),

    // Diebold–Mariano forecast-comparison test (a72) — the
    // SIGNIFICANCE layer over a11's raw metric ranking: "model B's
    // MSE is lower" means nothing without a test that the loss
    // differential d_t = e₁²_t − e₂²_t is nonzero beyond noise, and
    // because d_t is autocorrelated (forecast errors overlap), the
    // variance needs a HAC (Newey–West, Bartlett weights, h = 7)
    // correction — a plain t-test is anticonservative. Competitors:
    // lag-1 persistence vs the trailing-7-day mean, over the daily
    // revenue series. Scale shape: the fact collapses to |days| rows
    // in one agg (exact cent sums); errors are scaled ×7 so BOTH are
    // exact integers (7·y − Σ₇y), making d_t exact (DM is invariant
    // to common scaling); the 7 autocovariance sums run over the
    // calendar-sized series with DECIMAL-cast summands (order-exact;
    // ~2.2k rows, so the slow double→decimal path is immaterial).
    OracleQuery(
      "a72_diebold_mariano",
      (s, d) => {
        import s.implicits._
        val daily = Tables.lineitem(s, d)
          .groupBy(date_trunc("day", $"l_shipdate").as("day"))
          .agg(sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")).as("yq"))
        val wOrd = Window.orderBy($"day")
        val wTrail = wOrd.rowsBetween(-7, -1)
        val errs = daily
          .withColumn("t", row_number().over(wOrd))
          .withColumn("e1s", lit(7L) * ($"yq" - lag($"yq", 1).over(wOrd)))
          .withColumn("e2s", lit(7L) * $"yq" - sum($"yq").over(wTrail))
          .filter($"t" >= 8)
          .withColumn("dq",
            $"e1s".cast("decimal(38,0)") * $"e1s"
              - $"e2s".cast("decimal(38,0)") * $"e2s")
        val wAll = Window.partitionBy(lit(1))
        val u = errs
          .withColumn("dbar",
            sum($"dq").over(wAll).cast("double") / count(lit(1)).over(wAll))
          .withColumn("u", ($"dq".cast("double") - $"dbar") * lit(1e-12))
        val wU = Window.orderBy($"day")
        val lagged = u
          .withColumn("u1", lag($"u", 1).over(wU))
          .withColumn("u2", lag($"u", 2).over(wU))
          .withColumn("u3", lag($"u", 3).over(wU))
          .withColumn("u4", lag($"u", 4).over(wU))
          .withColumn("u5", lag($"u", 5).over(wU))
          .withColumn("u6", lag($"u", 6).over(wU))
        lagged.agg(
            count(lit(1)).as("n"),
            max($"dbar").as("dbar_raw"),
            sum(($"u" * $"u").cast("decimal(38,6)")).as("g0"),
            sum(($"u" * $"u1").cast("decimal(38,6)")).as("g1"),
            sum(($"u" * $"u2").cast("decimal(38,6)")).as("g2"),
            sum(($"u" * $"u3").cast("decimal(38,6)")).as("g3"),
            sum(($"u" * $"u4").cast("decimal(38,6)")).as("g4"),
            sum(($"u" * $"u5").cast("decimal(38,6)")).as("g5"),
            sum(($"u" * $"u6").cast("decimal(38,6)")).as("g6"))
          .withColumn("lrv",
            ($"g0".cast("double")
              + lit(2.0) * (lit(6.0 / 7) * $"g1".cast("double")
                + lit(5.0 / 7) * $"g2".cast("double")
                + lit(4.0 / 7) * $"g3".cast("double")
                + lit(3.0 / 7) * $"g4".cast("double")
                + lit(2.0 / 7) * $"g5".cast("double")
                + lit(1.0 / 7) * $"g6".cast("double"))) / $"n")
          .select(
            $"n".cast("long").as("n"),
            Parity.floorRound4($"dbar_raw" * lit(1e-12)
              / sqrt($"lrv" / $"n")).as("dm"),
            ($"dbar_raw" > 0).as("trailing7_better"))
      },
      Some("""WITH daily AS (
             |  SELECT date_trunc('day', l_shipdate) AS day,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yq
             |  FROM lineitem GROUP BY 1
             |), errs AS (
             |  SELECT day, yq,
             |    row_number() OVER (ORDER BY day) AS t,
             |    7 * (yq - lag(yq, 1) OVER (ORDER BY day)) AS e1s,
             |    7 * yq - sum(yq) OVER (ORDER BY day
             |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS e2s
             |  FROM daily
             |), dd AS (
             |  SELECT day,
             |    CAST(e1s AS HUGEINT) * e1s - CAST(e2s AS HUGEINT) * e2s AS dq
             |  FROM errs WHERE t >= 8
             |), ub AS (
             |  SELECT day, dq,
             |    CAST(sum(dq) OVER () AS DOUBLE) / count(*) OVER () AS dbar,
             |    (CAST(dq AS DOUBLE) - CAST(sum(dq) OVER () AS DOUBLE) / count(*) OVER ()) * 1e-12 AS u
             |  FROM dd
             |), lagged AS (
             |  SELECT dbar, u,
             |    lag(u, 1) OVER (ORDER BY day) AS u1,
             |    lag(u, 2) OVER (ORDER BY day) AS u2,
             |    lag(u, 3) OVER (ORDER BY day) AS u3,
             |    lag(u, 4) OVER (ORDER BY day) AS u4,
             |    lag(u, 5) OVER (ORDER BY day) AS u5,
             |    lag(u, 6) OVER (ORDER BY day) AS u6
             |  FROM ub
             |), agg AS (
             |  SELECT count(*) AS n, max(dbar) AS dbar_raw,
             |    CAST(sum(CAST(u * u AS DECIMAL(38,6))) AS DOUBLE) AS g0,
             |    CAST(sum(CAST(u * u1 AS DECIMAL(38,6))) AS DOUBLE) AS g1,
             |    CAST(sum(CAST(u * u2 AS DECIMAL(38,6))) AS DOUBLE) AS g2,
             |    CAST(sum(CAST(u * u3 AS DECIMAL(38,6))) AS DOUBLE) AS g3,
             |    CAST(sum(CAST(u * u4 AS DECIMAL(38,6))) AS DOUBLE) AS g4,
             |    CAST(sum(CAST(u * u5 AS DECIMAL(38,6))) AS DOUBLE) AS g5,
             |    CAST(sum(CAST(u * u6 AS DECIMAL(38,6))) AS DOUBLE) AS g6
             |  FROM lagged
             |), v AS (
             |  SELECT n, dbar_raw,
             |    (g0 + 2.0 * (6.0/7 * g1 + 5.0/7 * g2 + 4.0/7 * g3
             |      + 3.0/7 * g4 + 2.0/7 * g5 + 1.0/7 * g6)) / n AS lrv
             |  FROM agg
             |)
             |SELECT CAST(n AS BIGINT) AS n,
             |  floor(dbar_raw * 1e-12 / sqrt(lrv / n) * 10000 + 0.5) / 10000 AS dm,
             |  dbar_raw > 0 AS trailing7_better
             |FROM v""".stripMargin)
    ),

    // Anderson–Darling two-sample test (a73) — completes the a34 (KS:
    // largest CDF gap) / a67 (Wasserstein: integrated gap) / a69
    // (CvM: integrated squared gap) drift quartet with the
    // TAIL-SENSITIVE member: AD weights the squared gap by
    // 1/(F(1−F)), so divergence in the distribution tails — exactly
    // where quality filters and outlier gates act — counts most.
    // Scholz–Stephens k-sample statistic (k = 2), midrank version for
    // ties (their A²ₐ): on the distinct-value histogram, with pooled
    // midrank cumulative B̄ⱼ and per-sample M̄ᵢⱼ,
    //   A² = (N−1)/N² · Σᵢ (1/nᵢ) Σⱼ hⱼ·(N·M̄ᵢⱼ − nᵢ·B̄ⱼ)² / (B̄ⱼ(N−B̄ⱼ) − N·hⱼ/4).
    // Doubling clears the half-integers: with B2 = 2·cum(h) − h and
    // M2 = 2·cum(f) − f the per-value term is hⱼ(N·M2 − nᵢ·B2)² /
    // (B2(2N−B2) − N·hⱼ) — exact integers top and bottom (the square
    // via DECIMAL; it passes 2⁶³ around 10⁵ distinct values × 10⁹
    // rows). Per-value terms are quantized to 1e-6 before the global
    // sum, so summation order cannot move the hash. Grid grain =
    // |distinct values|, never |rows| — the a69 discipline.
    OracleQuery(
      "a73_anderson_darling",
      (s, d) => {
        import s.implicits._
        val hist = Tables.events(s, d)
          .filter($"event_type".isin("click", "error"))
          .groupBy(round($"value" * 100).cast("long").as("vc"))
          .agg(
            sum(when($"event_type" === "click", 1L).otherwise(0L)).as("a"),
            sum(when($"event_type" === "error", 1L).otherwise(0L)).as("b"))
        val w = Window.orderBy($"vc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(lit(1))
        val cum = hist
          .withColumn("h", $"a" + $"b")
          .withColumn("b2", lit(2L) * sum($"a" + $"b").over(w) - ($"a" + $"b"))
          .withColumn("m2a", lit(2L) * sum($"a").over(w) - $"a")
          .withColumn("m2b", lit(2L) * sum($"b").over(w) - $"b")
          .withColumn("n1", sum($"a").over(wAll))
          .withColumn("n2", sum($"b").over(wAll))
          .withColumn("nn", sum($"a" + $"b").over(wAll))
        val terms = cum
          .withColumn("den",
            ($"b2" * (lit(2L) * $"nn" - $"b2") - $"nn" * $"h").cast("double"))
          .withColumn("da",
            ($"nn" * $"m2a" - $"n1" * $"b2").cast("decimal(38,0)"))
          .withColumn("db",
            ($"nn" * $"m2b" - $"n2" * $"b2").cast("decimal(38,0)"))
          .withColumn("ta",
            floor($"h" * ($"da" * $"da").cast("double") / $"den" * 1e4 + 0.5)
              .cast("decimal(38,0)"))
          .withColumn("tb",
            floor($"h" * ($"db" * $"db").cast("double") / $"den" * 1e4 + 0.5)
              .cast("decimal(38,0)"))
        terms.agg(
            max($"n1").cast("long").as("n1"),
            max($"n2").cast("long").as("n2"),
            max($"nn").cast("double").as("nnd"),
            sum($"ta").as("sa"),
            sum($"tb").as("sb"))
          .select(
            $"n1", $"n2",
            Parity.floorRound4(
              (($"nnd" - 1) / ($"nnd" * $"nnd"))
                * ($"sa".cast("double") / 1e4 / $"n1"
                  + $"sb".cast("double") / 1e4 / $"n2"))
              .as("a2_akn"))
          // direction flag against the NULL MEAN E[A²|H₀] = k−1 = 1,
          // not a calibrated critical value: the Scholz–Stephens
          // rejection threshold standardizes by σ_N (an O(N) harmonic
          // double-sum); the statistic itself is the deliverable here
          .withColumn("above_null_mean", $"a2_akn" > 1.0)
      },
      Some("""WITH hist AS (
             |  SELECT CAST(round(value * 100) AS BIGINT) AS vc,
             |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
             |  FROM events WHERE event_type IN ('click', 'error')
             |  GROUP BY 1
             |), cum AS (
             |  SELECT vc, a, b, a + b AS h,
             |    2 * sum(a + b) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (a + b) AS b2,
             |    2 * sum(a) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - a AS m2a,
             |    2 * sum(b) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b AS m2b,
             |    sum(a) OVER () AS n1, sum(b) OVER () AS n2,
             |    sum(a + b) OVER () AS nn
             |  FROM hist
             |), terms AS (
             |  SELECT n1, n2, nn,
             |    CAST(b2 * (2 * nn - b2) - nn * h AS DOUBLE) AS den,
             |    CAST(nn * m2a - n1 * b2 AS HUGEINT) AS da,
             |    CAST(nn * m2b - n2 * b2 AS HUGEINT) AS db,
             |    h
             |  FROM cum
             |), q AS (
             |  SELECT n1, n2, nn,
             |    CAST(floor(h * CAST(da * da AS DOUBLE) / den * 1e4 + 0.5) AS HUGEINT) AS ta,
             |    CAST(floor(h * CAST(db * db AS DOUBLE) / den * 1e4 + 0.5) AS HUGEINT) AS tb
             |  FROM terms
             |), agg AS (
             |  SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
             |    CAST(max(nn) AS DOUBLE) AS nnd,
             |    sum(ta) AS sa, sum(tb) AS sb
             |  FROM q
             |)
             |SELECT n1, n2,
             |  floor(((nnd - 1) / (nnd * nnd))
             |    * (CAST(sa AS DOUBLE) / 1e4 / n1 + CAST(sb AS DOUBLE) / 1e4 / n2)
             |    * 10000 + 0.5) / 10000 AS a2_akn,
             |  floor(((nnd - 1) / (nnd * nnd))
             |    * (CAST(sa AS DOUBLE) / 1e4 / n1 + CAST(sb AS DOUBLE) / 1e4 / n2)
             |    * 10000 + 0.5) / 10000 > 1.0 AS above_null_mean
             |FROM agg""".stripMargin)
    ),

    // Durbin–Watson residual-autocorrelation diagnostic (w26) — the
    // check behind every per-series model in the battery (a24's
    // grouped regression, w21's Holt, M2 Ridge): DW = Σ(eₜ−eₜ₋₁)²/Σeₜ²
    // on residuals from the series mean; DW ≈ 2 ⟺ independent
    // residuals, < 2 ⟺ positive autocorrelation (the common case that
    // silently shrinks every naive standard error). Algebraic note
    // exploited for exactness: eₜ−eₜ₋₁ = yₜ−yₜ₋₁ (the mean cancels),
    // so the numerator is an exact integer window sum, and the
    // denominator Σe² = (nΣy²−S²)/n comes exactly from the raw sums —
    // DW = n·Σ(Δy)²/(nΣy²−S²) is exact integer algebra down to one
    // final double division. Per-series grain = |days| after the
    // one-pass daily agg.
    OracleQuery(
      "w26_durbin_watson",
      (s, d) => {
        import s.implicits._
        val daily = Tables.lineitem(s, d)
          .groupBy($"l_returnflag".as("flag"),
            date_trunc("day", $"l_shipdate").as("day"))
          .agg(sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")).as("yq"))
        val wOrd = Window.partitionBy($"flag").orderBy($"day")
        daily
          .withColumn("dy", $"yq" - lag($"yq", 1).over(wOrd))
          .groupBy($"flag")
          .agg(
            count(lit(1)).as("n_days"),
            sum($"dy".cast("decimal(38,0)") * $"dy").as("num"),
            sum($"yq".cast("decimal(38,0)") * $"yq").as("syy"),
            sum($"yq".cast("decimal(38,0)")).as("sy"))
          .select(
            $"flag",
            $"n_days".cast("long").as("n_days"),
            Parity.floorRound4(
              $"n_days" * $"num".cast("double")
                / ($"n_days" * $"syy".cast("double")
                  - $"sy".cast("double") * $"sy".cast("double")))
              .as("dw"))
          .withColumn("positive_autocorr", $"dw" < 1.5)
          .orderBy($"flag")
      },
      Some("""WITH daily AS (
             |  SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yq
             |  FROM lineitem GROUP BY 1, 2
             |), diffs AS (
             |  SELECT flag, yq,
             |    yq - lag(yq, 1) OVER (PARTITION BY flag ORDER BY day) AS dy
             |  FROM daily
             |), agg AS (
             |  SELECT flag, count(*) AS n_days,
             |    CAST(sum(CAST(dy AS HUGEINT) * dy) AS DOUBLE) AS num,
             |    CAST(sum(CAST(yq AS HUGEINT) * yq) AS DOUBLE) AS syy,
             |    CAST(sum(CAST(yq AS HUGEINT)) AS DOUBLE) AS sy
             |  FROM diffs GROUP BY 1
             |)
             |SELECT flag, CAST(n_days AS BIGINT) AS n_days,
             |  floor(n_days * num / (n_days * syy - sy * sy) * 10000 + 0.5) / 10000 AS dw,
             |  floor(n_days * num / (n_days * syy - sy * sy) * 10000 + 0.5) / 10000 < 1.5
             |    AS positive_autocorr
             |FROM agg ORDER BY flag""".stripMargin)
    ),

    // Dickey–Fuller unit-root test (w27) — the stationarity gate in
    // front of w21's Holt/EWMA smoothers and a72's DM comparison
    // (both assume the series' statistics are stable): regress
    // Δyₜ = α + ρ·yₜ₋₁ + εₜ and test t(ρ̂) against the DF critical
    // value −2.86 (5%, with-constant); failing to reject means the
    // series behaves as a random walk and any mean-reverting model is
    // misspecified. Per-series OLS in closed form from SIX exact
    // quantized sums (n, Σx, Σz, Σxx, Σzz, Σxz with x = yₜ₋₁ cents,
    // z = Δy cents, DECIMAL against 100 TB overflow) — the a24/M2
    // closed-form recipe; ρ̂, its standard error and the t-stat are
    // one row of double algebra per series. Calendar-grain after the
    // daily collapse.
    OracleQuery(
      "w27_dickey_fuller",
      (s, d) => {
        import s.implicits._
        val daily = Tables.lineitem(s, d)
          .groupBy($"l_returnflag".as("flag"),
            date_trunc("day", $"l_shipdate").as("day"))
          .agg(sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")).as("yq"))
        val wOrd = Window.partitionBy($"flag").orderBy($"day")
        val reg = daily
          .withColumn("x", lag($"yq", 1).over(wOrd))
          .filter($"x".isNotNull)
          .withColumn("z", $"yq" - $"x")
        reg.groupBy($"flag")
          .agg(
            count(lit(1)).as("n"),
            sum($"x".cast("decimal(38,0)")).as("sx"),
            sum($"z".cast("decimal(38,0)")).as("sz"),
            sum($"x".cast("decimal(38,0)") * $"x").as("sxx"),
            sum($"z".cast("decimal(38,0)") * $"z").as("szz"),
            sum($"x".cast("decimal(38,0)") * $"z").as("sxz"))
          .withColumn("nd", $"n".cast("double"))
          .withColumn("sxxc",
            $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double") / $"nd")
          .withColumn("sxzc",
            $"sxz".cast("double") - $"sx".cast("double") * $"sz".cast("double") / $"nd")
          .withColumn("szzc",
            $"szz".cast("double") - $"sz".cast("double") * $"sz".cast("double") / $"nd")
          .withColumn("rho", $"sxzc" / $"sxxc")
          .withColumn("s2",
            ($"szzc" - $"rho" * $"sxzc") / ($"nd" - 2))
          .withColumn("t_df", $"rho" / sqrt($"s2" / $"sxxc"))
          .select(
            $"flag",
            $"n".cast("long").as("n"),
            Parity.floorRound4($"rho").as("rho"),
            Parity.floorRound4($"t_df").as("t_df"),
            ($"t_df" > -2.86).as("unit_root"))
          .orderBy($"flag")
      },
      Some("""WITH daily AS (
             |  SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yq
             |  FROM lineitem GROUP BY 1, 2
             |), reg AS (
             |  SELECT flag,
             |    lag(yq, 1) OVER (PARTITION BY flag ORDER BY day) AS x,
             |    yq - lag(yq, 1) OVER (PARTITION BY flag ORDER BY day) AS z
             |  FROM daily
             |), f AS (
             |  SELECT flag, x, z FROM reg WHERE x IS NOT NULL
             |), sums AS (
             |  SELECT flag, count(*) AS n,
             |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             |    CAST(sum(CAST(z AS HUGEINT)) AS DOUBLE) AS sz,
             |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             |    CAST(sum(CAST(z AS HUGEINT) * z) AS DOUBLE) AS szz,
             |    CAST(sum(CAST(x AS HUGEINT) * z) AS DOUBLE) AS sxz
             |  FROM f GROUP BY 1
             |), cen AS (
             |  SELECT flag, n, CAST(n AS DOUBLE) AS nd,
             |    sxx - sx * sx / n AS sxxc,
             |    sxz - sx * sz / n AS sxzc,
             |    szz - sz * sz / n AS szzc
             |  FROM sums
             |), ols AS (
             |  SELECT flag, n, nd, sxxc, sxzc, szzc,
             |    sxzc / sxxc AS rho,
             |    (szzc - (sxzc / sxxc) * sxzc) / (nd - 2) AS s2
             |  FROM cen
             |)
             |SELECT flag, CAST(n AS BIGINT) AS n,
             |  floor(rho * 10000 + 0.5) / 10000 AS rho,
             |  floor(rho / sqrt(s2 / sxxc) * 10000 + 0.5) / 10000 AS t_df,
             |  rho / sqrt(s2 / sxxc) > -2.86 AS unit_root
             |FROM ols ORDER BY flag""".stripMargin)
    ),

    // Weight-of-evidence / information-value encoding (pipe_woe_iv) —
    // the credit-scoring-lineage feature transform a training pipeline
    // runs between raw features and a linear model: decile-bin the
    // numeric feature (deterministic ntile over a total order), score
    // each bin by WOE = ln((good_b/G)/(bad_b/B)) — the log-odds shift
    // the bin contributes — and the feature overall by
    // IV = Σ (good_b/G − bad_b/B)·WOE_b (rule of thumb: IV < 0.02
    // useless, > 0.5 suspicious). One scan to bin + count; the ln
    // argument is an exact integer rational (g·B)/(b·G), identical on
    // both engines; IV terms are quantized to 1e-8 before the
    // cross-bin sum so summation order is irrelevant. Bins = 10 rows
    // regardless of table size.
    //
    // The decile assignment keeps the oracle's EXACT ntile(10)
    // semantics (first n%10 tiles carry ⌈n/10⌉ rows) but derives it
    // from a bucketed global rank (ops/PrefixSum — the a56/a65/o10
    // recipe) instead of a window over the global total order: ntile
    // over an empty partitionBy is a single-reducer row-grain sort,
    // the one spelling this battery bans. The order key is the exact
    // integer cents(o_totalprice)·10¹⁰ + o_orderkey — a strictly
    // monotone injection of the oracle's (o_totalprice, o_orderkey)
    // ORDER BY while totalprice < ~9.2×10⁶ currency units and
    // orderkey < 10¹⁰ (TPC-H totalprice is bounded per order
    // independent of SF; orderkey crosses 10¹⁰ around SF ~1600, far
    // past this table's documented envelope). pipe_woe_iv_approx
    // remains the sketch-edge production twin.
    OracleQuery(
      "pipe_woe_iv",
      (s, d) => {
        import s.implicits._
        val base = Tables.orders(s, d)
          .select($"o_totalprice", $"o_orderkey",
            ($"o_orderstatus" === "F").as("is_bad"))
          .withColumn("ord",
            floor($"o_totalprice" * 100 + 0.5).cast("long")
              * lit(10000000000L) + $"o_orderkey")
        val n = base.count()
        val q = n / 10
        val rem = n % 10
        val ranked = graft.ops.PrefixSum.withCumsum(
          base.withColumn("g", lit(0)).withColumn("one", lit(1L)),
          "g", "ord", "one", outCol = "rnk", knownCount = Some(n))
        // ntile(10) from the 0-based rank r: tiles 1..rem have q+1
        // rows, the rest q — integer algebra only (`div`), with the
        // q=0 degenerate guarded (then r < rem·(q+1) always holds and
        // the otherwise-branch is never selected)
        val binned = ranked
          .withColumn("r0", $"rnk" - 1)
          .withColumn("bin",
            (when($"r0" < lit(rem * (q + 1)),
              expr(s"r0 div ${q + 1}"))
              .otherwise(lit(rem) + expr(s"(r0 - ${rem * (q + 1)}) div ${math.max(q, 1L)}"))
              + 1).cast("int"))
        val perBin = binned.groupBy($"bin")
          .agg(
            sum(when(!$"is_bad", 1L).otherwise(0L)).as("n_good"),
            sum(when($"is_bad", 1L).otherwise(0L)).as("n_bad"))
        val wAll = Window.partitionBy(lit(1))
        perBin
          .withColumn("gg", sum($"n_good").over(wAll))
          .withColumn("bb", sum($"n_bad").over(wAll))
          .withColumn("woe",
            log($"n_good".cast("double") * $"bb" / ($"n_bad".cast("double") * $"gg")))
          .withColumn("iv_term",
            floor(($"n_good".cast("double") / $"gg" - $"n_bad".cast("double") / $"bb")
              * $"woe" * 1e8 + 0.5))
          .withColumn("iv",
            Parity.floorRound4(sum($"iv_term").over(wAll) / lit(1e8)))
          .select($"bin", $"n_good".cast("long").as("n_good"),
            $"n_bad".cast("long").as("n_bad"),
            Parity.floorRound4($"woe").as("woe"), $"iv")
          .orderBy($"bin")
      },
      Some("""WITH binned AS (
             |  SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin,
             |    o_orderstatus = 'F' AS is_bad
             |  FROM orders
             |), per_bin AS (
             |  SELECT bin,
             |    sum(CASE WHEN NOT is_bad THEN 1 ELSE 0 END) AS n_good,
             |    sum(CASE WHEN is_bad THEN 1 ELSE 0 END) AS n_bad
             |  FROM binned GROUP BY 1
             |), scored AS (
             |  SELECT bin, n_good, n_bad,
             |    sum(n_good) OVER () AS gg, sum(n_bad) OVER () AS bb,
             |    ln(CAST(n_good AS DOUBLE) * sum(n_bad) OVER ()
             |      / (CAST(n_bad AS DOUBLE) * sum(n_good) OVER ())) AS woe
             |  FROM per_bin
             |), terms AS (
             |  SELECT bin, n_good, n_bad, woe,
             |    floor((CAST(n_good AS DOUBLE) / gg - CAST(n_bad AS DOUBLE) / bb)
             |      * woe * 1e8 + 0.5) AS iv_term
             |  FROM scored
             |)
             |SELECT bin, CAST(n_good AS BIGINT) AS n_good,
             |  CAST(n_bad AS BIGINT) AS n_bad,
             |  floor(woe * 10000 + 0.5) / 10000 AS woe,
             |  floor(sum(iv_term) OVER () / 1e8 * 10000 + 0.5) / 10000 AS iv
             |FROM terms ORDER BY bin""".stripMargin)
    ),

    // Wald–Wolfowitz runs test (a78) — the nonparametric randomness
    // check beside w26's Durbin–Watson (DW sees LINEAR lag-1
    // correlation; runs sees any above/below-mean clumping or
    // alternation, including what DW misses). The cut is the exact
    // MEAN compared in pure integers (yq·n vs Σy — no double ever
    // enters the sign), ties excluded as standard; the run count is
    // one lag() over the calendar-grain series; μ_R and σ_R are the
    // closed-form run-count moments, z against ±1.96. Fact collapses
    // to the daily grid first — the w26/w27 discipline.
    OracleQuery(
      "a78_runs_test",
      (s, d) => {
        import s.implicits._
        val daily = Tables.lineitem(s, d)
          .groupBy(date_trunc("day", $"l_shipdate").as("day"))
          .agg(sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")).as("yq"))
        val tot = daily.agg(
          count(lit(1)).as("n"), sum($"yq".cast("decimal(38,0)")).as("sy"))
        val signed = daily.crossJoin(broadcast(tot))
          .withColumn("sgn",
            when($"yq".cast("decimal(38,0)") * $"n" > $"sy", 1)
              .when($"yq".cast("decimal(38,0)") * $"n" < $"sy", -1)
              .otherwise(0))
          .filter($"sgn" =!= 0)
        val wOrd = Window.orderBy($"day")
        val runs = signed
          .withColumn("brk",
            when(lag($"sgn", 1).over(wOrd).isNull
              || lag($"sgn", 1).over(wOrd) =!= $"sgn", 1L).otherwise(0L))
        runs.agg(
            sum(when($"sgn" === 1, 1L).otherwise(0L)).as("n1"),
            sum(when($"sgn" === -1, 1L).otherwise(0L)).as("n2"),
            sum($"brk").as("r"))
          .withColumn("mu",
            lit(2.0) * $"n1" * $"n2" / ($"n1" + $"n2") + 1)
          .withColumn("v",
            lit(2.0) * $"n1" * $"n2" * (lit(2.0) * $"n1" * $"n2" - $"n1" - $"n2")
              / (($"n1" + $"n2") * ($"n1" + $"n2") * ($"n1" + $"n2" - 1)))
          .select(
            $"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
            $"r".cast("long").as("n_runs"),
            Parity.floorRound4(($"r" - $"mu") / sqrt($"v")).as("z_runs"),
            (abs(($"r" - $"mu") / sqrt($"v")) > 1.96).as("reject_random"))
      },
      Some("""WITH daily AS (
             |  SELECT date_trunc('day', l_shipdate) AS day,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yq
             |  FROM lineitem GROUP BY 1
             |), tot AS (
             |  SELECT count(*) AS n, CAST(sum(CAST(yq AS HUGEINT)) AS HUGEINT) AS sy
             |  FROM daily
             |), signed AS (
             |  SELECT day,
             |    CASE WHEN CAST(yq AS HUGEINT) * n > sy THEN 1
             |         WHEN CAST(yq AS HUGEINT) * n < sy THEN -1 ELSE 0 END AS sgn
             |  FROM daily CROSS JOIN tot
             |), kept AS (SELECT day, sgn FROM signed WHERE sgn <> 0),
             |runs AS (
             |  SELECT sgn,
             |    CASE WHEN lag(sgn, 1) OVER (ORDER BY day) IS NULL
             |      OR lag(sgn, 1) OVER (ORDER BY day) <> sgn THEN 1 ELSE 0 END AS brk
             |  FROM kept
             |), agg AS (
             |  SELECT CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(sum(brk) AS BIGINT) AS r
             |  FROM runs
             |), m AS (
             |  SELECT n1, n2, r,
             |    2.0 * n1 * n2 / (n1 + n2) + 1 AS mu,
             |    2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
             |      / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)) AS v
             |  FROM agg
             |)
             |SELECT n1, n2, r AS n_runs,
             |  floor((r - mu) / sqrt(v) * 10000 + 0.5) / 10000 AS z_runs,
             |  abs((r - mu) / sqrt(v)) > 1.96 AS reject_random
             |FROM m""".stripMargin)
    ),

    // Grid-cosine periodogram (w29) — WHICH seasonality does w28's
    // Holt–Winters need? The spectral answer: the fraction of series
    // variance at each candidate period p ∈ [2, 14],
    // power(p) = 2(C² + S²)/(n²σ²) with C = Σ ỹₜcos(2πtmod p/p).
    // Exactness: cos/sin live on the (p, k)-GRID (k = t mod p — only
    // Σp ≈ 100 distinct angles exist), quantized to 1e-9 longs ONCE,
    // so the projections are exact integer sums; mean-centering is
    // cleared by n-multiplication (A = n·Σyqᵢcᵢ − Σy·Σc — exact
    // DECIMAL algebra, no double until the final ratio). On this
    // corpus the spectrum is FLAT (~1e-3 everywhere) — the honest
    // negative: TPC-H ship dates carry no weekly cycle, and the
    // entry's value is that it would say so before anyone fits a
    // seasonal model. Calendar grain throughout.
    OracleQuery(
      "w29_periodogram",
      (s, d) => {
        import s.implicits._
        val daily = Tables.lineitem(s, d)
          .groupBy(date_trunc("day", $"l_shipdate").as("day"))
          .agg(sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")).as("yq"))
        val wOrd = Window.orderBy($"day")
        val series = daily
          .withColumn("t", row_number().over(wOrd) - 1)
        val grid = s.range(2, 15).select($"id".cast("int").as("p"))
          .select($"p", explode(sequence(lit(0), $"p" - 1)).as("k"))
          .withColumn("cq",
            floor(cos(lit(2.0) * lit(math.Pi) * $"k" / $"p") * 1e9 + 0.5)
              .cast("long"))
          .withColumn("sq",
            floor(sin(lit(2.0) * lit(math.Pi) * $"k" / $"p") * 1e9 + 0.5)
              .cast("long"))
        val tot = series.agg(
          count(lit(1)).as("n"),
          sum($"yq".cast("decimal(38,0)")).as("sy"),
          sum($"yq".cast("decimal(38,0)") * $"yq").as("syy"))
        val proj = series
          .join(broadcast(grid), $"k" === $"t" % $"p")
          .groupBy($"p")
          .agg(
            sum($"yq".cast("decimal(38,0)") * $"cq").as("syc"),
            sum($"yq".cast("decimal(38,0)") * $"sq").as("sys"),
            sum($"cq".cast("decimal(38,0)")).as("sc"),
            sum($"sq".cast("decimal(38,0)")).as("ss"))
        val scored = proj.crossJoin(broadcast(tot))
          .withColumn("a",
            ($"n" * $"syc" - $"sy" * $"sc").cast("double"))
          .withColumn("b",
            ($"n" * $"sys" - $"sy" * $"ss").cast("double"))
          .withColumn("v",
            ($"n" * $"syy" - $"sy" * $"sy").cast("double"))
          .withColumn("power_raw",
            lit(2.0) * ($"a" * $"a" + $"b" * $"b")
              / (lit(1e18) * $"n" * $"n" * $"v"))
        scored
          .withColumn("rk",
            row_number().over(Window.orderBy($"power_raw".desc, $"p")))
          .select($"p",
            Parity.floorRound4($"power_raw").as("power"),
            ($"rk" === 1).as("is_peak"))
          .orderBy($"p")
      },
      Some("""WITH daily AS (
             |  SELECT date_trunc('day', l_shipdate) AS day,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yq
             |  FROM lineitem GROUP BY 1
             |), series AS (
             |  SELECT yq, row_number() OVER (ORDER BY day) - 1 AS t FROM daily
             |), grid AS (
             |  SELECT p, k,
             |    CAST(floor(cos(2.0 * pi() * k / p) * 1e9 + 0.5) AS BIGINT) AS cq,
             |    CAST(floor(sin(2.0 * pi() * k / p) * 1e9 + 0.5) AS BIGINT) AS sq
             |  FROM (SELECT CAST(unnest(generate_series(2, 14)) AS INT) AS p),
             |    (SELECT CAST(unnest(generate_series(0, 13)) AS INT) AS k)
             |  WHERE k < p
             |), tot AS (
             |  SELECT count(*) AS n,
             |    CAST(sum(CAST(yq AS HUGEINT)) AS HUGEINT) AS sy,
             |    CAST(sum(CAST(yq AS HUGEINT) * yq) AS HUGEINT) AS syy
             |  FROM series
             |), proj AS (
             |  SELECT g.p,
             |    CAST(sum(CAST(s.yq AS HUGEINT) * g.cq) AS HUGEINT) AS syc,
             |    CAST(sum(CAST(s.yq AS HUGEINT) * g.sq) AS HUGEINT) AS sys,
             |    CAST(sum(CAST(g.cq AS HUGEINT)) AS HUGEINT) AS sc,
             |    CAST(sum(CAST(g.sq AS HUGEINT)) AS HUGEINT) AS ss
             |  FROM series s JOIN grid g ON g.k = s.t % g.p
             |  GROUP BY 1
             |), scored AS (
             |  SELECT p,
             |    CAST(n * syc - sy * sc AS DOUBLE) AS a,
             |    CAST(n * sys - sy * ss AS DOUBLE) AS b,
             |    CAST(n * syy - sy * sy AS DOUBLE) AS v,
             |    CAST(n AS DOUBLE) AS nd
             |  FROM proj CROSS JOIN tot
             |), pw AS (
             |  SELECT p,
             |    2.0 * (a * a + b * b) / (1e18 * nd * nd * v) AS power_raw
             |  FROM scored
             |), rk AS (
             |  SELECT p, power_raw,
             |    row_number() OVER (ORDER BY power_raw DESC, p) AS rk
             |  FROM pw
             |)
             |SELECT p,
             |  floor(power_raw * 10000 + 0.5) / 10000 AS power,
             |  rk = 1 AS is_peak
             |FROM rk ORDER BY p""".stripMargin)
    ),

    // Effect sizes (a76) — the magnitude report the A/B battery needs
    // BESIDE its yes/no answers (a29 uplift z, a53 TOST, a60 power all
    // consume a standardized effect; none reported one): Cohen's d
    // from the pooled SD, the small-sample-corrected Hedges g
    // (J = 1 − 3/(4N−9)), and the large-sample 95% CI
    // (se² = N/(n₁n₂) + d²/2N). ONE scan, six exact integers (per
    // group n, Σq, Σq² on the cent grid), one row of double algebra —
    // the shuffle carries 32 partials.
    OracleQuery(
      "a76_effect_sizes",
      (s, d) => {
        import s.implicits._
        val q = floor($"value" * 100 + 0.5).cast("long")
        val sums = Tables.events(s, d)
          .filter($"event_type".isin("click", "error") && $"value".isNotNull)
          .select(($"event_type" === "click").as("ga"), q.as("q"))
          .agg(
            // Σq² runs as DECIMAL(38,0): the per-row q·q product and
            // its sum would wrap a long silently past ~9.2×10¹⁸
            // (DuckDB promotes to HUGEINT — divergence, not an error)
            sum(when($"ga", 1L).otherwise(0L)).as("n1"),
            sum(when($"ga", $"q").otherwise(0L)).as("s1"),
            sum(when($"ga", $"q".cast("decimal(38,0)") * $"q")
              .otherwise(lit(0).cast("decimal(38,0)"))).as("ss1"),
            sum(when(!$"ga", 1L).otherwise(0L)).as("n2"),
            sum(when(!$"ga", $"q").otherwise(0L)).as("s2"),
            sum(when(!$"ga", $"q".cast("decimal(38,0)") * $"q")
              .otherwise(lit(0).cast("decimal(38,0)"))).as("ss2"))
        sums
          .withColumn("v1",
            ($"ss1".cast("double") - $"s1".cast("double") * $"s1" / $"n1") / ($"n1" - 1))
          .withColumn("v2",
            ($"ss2".cast("double") - $"s2".cast("double") * $"s2" / $"n2") / ($"n2" - 1))
          .withColumn("dd",
            ($"s1".cast("double") / $"n1" - $"s2".cast("double") / $"n2")
              / sqrt((($"n1" - 1) * $"v1" + ($"n2" - 1) * $"v2") / ($"n1" + $"n2" - 2)))
          .withColumn("se",
            // n1·n2 in double (exact to 2⁵³): the long product is the
            // same wrap hazard as the Σq² sums past ~4.3×10⁹ rows/arm
            sqrt(($"n1" + $"n2").cast("double")
              / ($"n1".cast("double") * $"n2")
              + $"dd" * $"dd" / (lit(2.0) * ($"n1" + $"n2"))))
          .select(
            $"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
            Parity.floorRound4($"dd").as("cohens_d"),
            Parity.floorRound4(
              $"dd" * (lit(1.0) - lit(3.0) / (lit(4.0) * ($"n1" + $"n2") - 9)))
              .as("hedges_g"),
            Parity.floorRound4($"dd" - lit(1.96) * $"se").as("ci_lo"),
            Parity.floorRound4($"dd" + lit(1.96) * $"se").as("ci_hi"))
      },
      Some("""WITH q AS (
             |  SELECT event_type = 'click' AS ga,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
             |  FROM events
             |  WHERE event_type IN ('click', 'error') AND value IS NOT NULL
             |), sums AS (
             |  SELECT
             |    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN ga THEN q ELSE 0 END) AS BIGINT) AS s1,
             |    CAST(sum(CASE WHEN ga THEN q * q ELSE 0 END) AS BIGINT) AS ss1,
             |    CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(sum(CASE WHEN NOT ga THEN q ELSE 0 END) AS BIGINT) AS s2,
             |    CAST(sum(CASE WHEN NOT ga THEN q * q ELSE 0 END) AS BIGINT) AS ss2
             |  FROM q
             |), v AS (
             |  SELECT n1, n2,
             |    (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1,
             |    (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) AS v2,
             |    CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS dm
             |  FROM sums
             |), dd AS (
             |  SELECT n1, n2,
             |    dm / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)) AS dd
             |  FROM v
             |), se AS (
             |  SELECT n1, n2, dd,
             |    sqrt(CAST(n1 + n2 AS DOUBLE) / (n1 * n2) + dd * dd / (2.0 * (n1 + n2))) AS se
             |  FROM dd
             |)
             |SELECT n1, n2,
             |  floor(dd * 10000 + 0.5) / 10000 AS cohens_d,
             |  floor(dd * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9)) * 10000 + 0.5) / 10000 AS hedges_g,
             |  floor((dd - 1.96 * se) * 10000 + 0.5) / 10000 AS ci_lo,
             |  floor((dd + 1.96 * se) * 10000 + 0.5) / 10000 AS ci_hi
             |FROM se""".stripMargin)
    ),

    // Breusch–Pagan heteroscedasticity test (a77) — the second
    // assumption gate for the OLS family (a24, w27, M2): a66's Levene
    // checks variance across GROUPS; BP checks variance along the
    // REGRESSOR (does spread grow with x?), which is what invalidates
    // OLS standard errors most often in practice. LM = n·R² of the
    // squared-residual-on-x auxiliary regression, ~χ²₁. Two passes
    // (the a66 recipe): pass 1 collects the five exact (x, y) sums and
    // closes the fit (â, b̂ as identically-spelled doubles on both
    // engines); pass 2 re-scans with the fitted line as literals,
    // quantizes each squared residual to the integer grid, and
    // collects the exact (x, u) moment sums; LM is one row of double
    // algebra. The 1-row collect is the bounded-scalar class.
    OracleQuery(
      "a77_breusch_pagan",
      (s, d) => {
        import s.implicits._
        val base = Tables.lineitem(s, d).select(
          $"l_quantity".cast("long").as("x"),
          floor($"l_extendedprice" / 1024.0 * 100 + 0.5).cast("long").as("yq"))
        val r = base.agg(
            count(lit(1)).as("n"),
            sum($"x").as("sx"),
            sum($"x".cast("decimal(38,0)") * $"x").as("sxx"),
            sum($"yq".cast("decimal(38,0)")).as("sy"),
            sum($"x".cast("decimal(38,0)") * $"yq").as("sxy"))
          .collect()(0)
        val n = r.getLong(0)
        val sx = r.getLong(1).toDouble
        val sxx = r.getDecimal(2).doubleValue()
        val sy = r.getDecimal(3).doubleValue()
        val sxy = r.getDecimal(4).doubleValue()
        val sxxc = sxx - sx * sx / n
        val bC = (sxy - sx * sy / n) / sxxc
        val aC = sy / n - bC * (sx / n)
        val u = ($"yq".cast("double") - lit(aC) - lit(bC) * $"x")
        val uq = floor(u * u + 0.5).cast("long")
        base.select($"x", uq.as("uq"))
          .agg(
            sum($"x" * $"uq".cast("decimal(38,0)")).as("sxu"),
            sum($"uq".cast("decimal(38,0)")).as("su"),
            sum($"uq".cast("decimal(38,0)") * $"uq").as("suu"))
          .withColumn("sxuc",
            $"sxu".cast("double") - lit(sx) * $"su".cast("double") / n)
          .withColumn("suuc",
            $"suu".cast("double")
              - $"su".cast("double") * $"su".cast("double") / n)
          .select(
            lit(n).as("n"),
            Parity.floorRound4(
              lit(n.toDouble) * $"sxuc" * $"sxuc" / (lit(sxxc) * $"suuc"))
              .as("bp_lm"))
          .withColumn("reject_homosced", $"bp_lm" > 3.841)
      },
      Some("""WITH base AS (
             |  SELECT CAST(l_quantity AS BIGINT) AS x,
             |    CAST(floor(l_extendedprice / 1024.0 * 100 + 0.5) AS BIGINT) AS yq
             |  FROM lineitem
             |), s1 AS (
             |  SELECT count(*) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             |    CAST(sum(CAST(yq AS HUGEINT)) AS HUGEINT) AS sy,
             |    CAST(sum(CAST(x AS HUGEINT) * yq) AS HUGEINT) AS sxy
             |  FROM base
             |), fit AS (
             |  SELECT n, CAST(sx AS DOUBLE) AS sx,
             |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS sxxc,
             |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS b
             |  FROM s1
             |), fit2 AS (
             |  SELECT n, sx, sxxc, b,
             |    (SELECT CAST(sy AS DOUBLE) FROM s1) / n - b * (sx / n) AS a
             |  FROM fit
             |), u AS (
             |  SELECT base.x,
             |    CAST(floor((CAST(base.yq AS DOUBLE) - fit2.a - fit2.b * base.x)
             |      * (CAST(base.yq AS DOUBLE) - fit2.a - fit2.b * base.x) + 0.5)
             |      AS BIGINT) AS uq
             |  FROM base CROSS JOIN fit2
             |), s2 AS (
             |  SELECT
             |    CAST(sum(CAST(x AS HUGEINT) * uq) AS DOUBLE) AS sxu,
             |    CAST(sum(CAST(uq AS HUGEINT)) AS DOUBLE) AS su,
             |    CAST(sum(CAST(uq AS HUGEINT) * uq) AS DOUBLE) AS suu
             |  FROM u
             |), c AS (
             |  SELECT f.n, f.sxxc,
             |    s2.sxu - f.sx * s2.su / f.n AS sxuc,
             |    s2.suu - s2.su * s2.su / f.n AS suuc
             |  FROM s2 CROSS JOIN fit2 f
             |)
             |SELECT n,
             |  floor(CAST(n AS DOUBLE) * sxuc * sxuc / (sxxc * suuc)
             |    * 10000 + 0.5) / 10000 AS bp_lm,
             |  CAST(n AS DOUBLE) * sxuc * sxuc / (sxxc * suuc) > 3.841
             |    AS reject_homosced
             |FROM c""".stripMargin)
    ),

    // Two-group log-rank test (a75) — the SIGNIFICANCE companion a46's
    // Kaplan–Meier curve was missing: "do the two cohorts' time-to-
    // convert distributions differ?" is a hypothesis, not a picture.
    // At each distinct event time the observed group-1 deaths compare
    // against the hypergeometric expectation d·n₁/n given the risk
    // sets, with the exact hypergeometric variance; χ² = (O−E)²/V ~
    // χ²₁. Equivalent to the Cox partial-likelihood score test at
    // β = 0 — the standard A/B test for censored durations. Scale
    // shape = a46's: one pass to per-user durations, collapse to the
    // DURATION-GRAIN grid, risk sets via cumulative integer windows
    // (per group: conditional sums in the same pass); E and V terms
    // quantize at 1e-8 before the exact cross-grid sum. Cohorts =
    // user parity (deterministic; production swaps in the experiment
    // arm).
    OracleQuery(
      "a75_logrank",
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
            ($"user_id" % 2).as("grp"),
            expr("(unix_micros(coalesce(pu, cut)) - unix_micros(su)) div 3600000000")
              .as("dur_hr"),
            when($"pu".isNotNull, lit(1L)).otherwise(0L).as("is_event"))
        val grain = durations.groupBy($"dur_hr")
          .agg(
            sum(when($"grp" === 1, $"is_event").otherwise(0L)).as("d1"),
            sum(when($"grp" === 1, lit(1L) - $"is_event").otherwise(0L)).as("c1"),
            sum($"is_event").as("d"),
            sum(lit(1L) - $"is_event").as("c"))
        val tot = durations.agg(
          sum(when($"grp" === 1, 1L).otherwise(0L)).as("n1_tot"),
          count(lit(1)).as("n_tot"))
        val wPrev = Window.orderBy($"dur_hr")
          .rowsBetween(Window.unboundedPreceding, -1)
        val risk = grain.crossJoin(broadcast(tot))
          .withColumn("n1",
            $"n1_tot" - coalesce(sum($"d1" + $"c1").over(wPrev), lit(0L)))
          .withColumn("n",
            $"n_tot" - coalesce(sum($"d" + $"c").over(wPrev), lit(0L)))
          .filter($"d" > 0)
        val terms = risk
          .withColumn("e1q",
            floor($"d".cast("double") * $"n1" / $"n" * 1e8 + 0.5).cast("long"))
          .withColumn("vq",
            when($"n" > 1,
              floor($"d".cast("double") * ($"n1".cast("double") / $"n")
                * (lit(1.0) - $"n1".cast("double") / $"n")
                * ($"n" - $"d") / ($"n" - 1) * 1e8 + 0.5).cast("long"))
              .otherwise(0L))
        val uExpr = sum($"d1").cast("double") - sum($"e1q") / 1e8
        terms.agg(
          sum($"d1").cast("long").as("o1"),
          Parity.floorRound4(sum($"e1q") / lit(1e8)).as("e1"),
          Parity.floorRound4(uExpr * uExpr / (sum($"vq") / 1e8))
            .as("chi2_logrank"),
          (uExpr * uExpr / (sum($"vq") / 1e8) > 3.841).as("reject_h0"))
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
             |  SELECT su.user_id % 2 AS grp,
             |    (epoch_us(COALESCE(pu.pu, cutoff.cut)) - epoch_us(su.su))
             |      // 3600000000 AS dur_hr,
             |    CASE WHEN pu.pu IS NOT NULL THEN 1 ELSE 0 END AS is_event
             |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id
             |  CROSS JOIN cutoff
             |), grain AS (
             |  SELECT dur_hr,
             |    CAST(sum(CASE WHEN grp = 1 THEN is_event ELSE 0 END) AS BIGINT) AS d1,
             |    CAST(sum(CASE WHEN grp = 1 THEN 1 - is_event ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(is_event) AS BIGINT) AS d,
             |    CAST(sum(1 - is_event) AS BIGINT) AS c
             |  FROM durations GROUP BY 1
             |), tot AS (
             |  SELECT CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_tot,
             |    count(*) AS n_tot
             |  FROM durations
             |), risk AS (
             |  SELECT dur_hr, d1, d,
             |    n1_tot - COALESCE(sum(d1 + c1) OVER (ORDER BY dur_hr
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
             |    n_tot - COALESCE(sum(d + c) OVER (ORDER BY dur_hr
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
             |  FROM grain CROSS JOIN tot
             |), terms AS (
             |  SELECT dur_hr, d1,
             |    CAST(floor(CAST(d AS DOUBLE) * n1 / n * 1e8 + 0.5) AS BIGINT) AS e1q,
             |    CASE WHEN n > 1 THEN CAST(floor(
             |      CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n) * (1 - CAST(n1 AS DOUBLE) / n)
             |        * (n - d) / (n - 1) * 1e8 + 0.5) AS BIGINT) ELSE 0 END AS vq
             |  FROM risk WHERE d > 0
             |)
             |SELECT CAST(sum(d1) AS BIGINT) AS o1,
             |  floor(sum(e1q) / 1e8 * 10000 + 0.5) / 10000 AS e1,
             |  floor((CAST(sum(d1) AS DOUBLE) - sum(e1q) / 1e8)
             |    * (CAST(sum(d1) AS DOUBLE) - sum(e1q) / 1e8) / (sum(vq) / 1e8)
             |    * 10000 + 0.5) / 10000 AS chi2_logrank,
             |  (CAST(sum(d1) AS DOUBLE) - sum(e1q) / 1e8)
             |    * (CAST(sum(d1) AS DOUBLE) - sum(e1q) / 1e8) / (sum(vq) / 1e8) > 3.841
             |    AS reject_h0
             |FROM terms""".stripMargin)
    ),

    // The 100 TB spelling of pipe_woe_iv (pipe_woe_iv_approx): bin
    // edges come from approx_percentile (fixed-memory KLL-class
    // sketch, map-side mergeable) and binning is a row-local
    // comparison chain — no sort, no single-partition window, the
    // plan a real corpus runs. Sketch edges are engine-specific ⟹
    // CONTRACT gate (the a16b/a17b discipline): Spark recomputes the
    // EXACT-ntile IV in-plan — via the same PrefixSum bucketed-rank
    // decile derivation as the exact twin, so even the contract arm
    // carries no unpartitioned global-order window — and asserts the
    // approx IV lands within tolerance, bins stay balanced, and edges
    // are strictly monotone; the oracle recomputes the exact row
    // counts and asserts the booleans TRUE.
    OracleQuery(
      "pipe_woe_iv_approx",
      (s, d) => {
        import s.implicits._
        val base = Tables.orders(s, d)
          .select($"o_totalprice", $"o_orderkey",
            ($"o_orderstatus" === "F").as("is_bad"))
        // NOT persisted: the several passes (sketch, approx agg,
        // contract-arm count + PrefixSum) each re-read a 3-column
        // pruned parquet scan, which measures CHEAPER at sf1 than
        // materializing the cache (3.0 s vs 3.5 s persisted)
        val edges = base
          .agg(expr("approx_percentile(o_totalprice, " +
            "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), 10000)"))
          .collect()(0).getSeq[Double](0) // 9 scalars — bounded driver state
        val bin = edges.foldLeft(lit(1)) { (acc, e) =>
          acc + when($"o_totalprice" > lit(e), 1).otherwise(0)
        }
        def ivOf(binned: org.apache.spark.sql.DataFrame) = {
          val wAll = Window.partitionBy(lit(1))
          binned.groupBy($"bin")
            .agg(
              sum(when(!$"is_bad", 1L).otherwise(0L)).as("g"),
              sum(when($"is_bad", 1L).otherwise(0L)).as("b"))
            .withColumn("gg", sum($"g").over(wAll))
            .withColumn("bb", sum($"b").over(wAll))
            .withColumn("iv_term",
              floor(($"g".cast("double") / $"gg" - $"b".cast("double") / $"bb")
                * log($"g".cast("double") * $"bb" / ($"b".cast("double") * $"gg"))
                * 1e8 + 0.5))
            .agg((sum($"iv_term") / 1e8).as("iv"),
              max($"g" + $"b").as("max_bin"), min($"g" + $"b").as("min_bin"))
        }
        val approxIv = ivOf(base.withColumn("bin", bin))
        // exact contract arm: the same PrefixSum-derived ntile(10) as
        // pipe_woe_iv (monotone cents·10¹⁰+orderkey key, bucketed
        // global rank) — NOT an ntile window, so the production twin's
        // whole plan is free of unpartitioned global-order sorts
        val nEx = base.count()
        val qEx = nEx / 10
        val remEx = nEx % 10
        val rankedEx = graft.ops.PrefixSum.withCumsum(
          base.withColumn("ord",
              floor($"o_totalprice" * 100 + 0.5).cast("long")
                * lit(10000000000L) + $"o_orderkey")
            .withColumn("g", lit(0)).withColumn("one", lit(1L)),
          "g", "ord", "one", outCol = "rnk", knownCount = Some(nEx))
        val binnedEx = rankedEx
          .withColumn("r0", $"rnk" - 1)
          .withColumn("bin",
            (when($"r0" < lit(remEx * (qEx + 1)),
              expr(s"r0 div ${qEx + 1}"))
              .otherwise(lit(remEx) + expr(s"(r0 - ${remEx * (qEx + 1)}) div ${math.max(qEx, 1L)}"))
              + 1).cast("int"))
        val exactIv = ivOf(binnedEx).select($"iv".as("iv_x"))
        val totals = base.agg(
          count(lit(1)).as("n"),
          sum(when(!$"is_bad", 1L).otherwise(0L)).as("n_good"),
          sum(when($"is_bad", 1L).otherwise(0L)).as("n_bad"))
        totals.crossJoin(approxIv).crossJoin(exactIv)
          .select(
            $"n".cast("long").as("n"),
            $"n_good".cast("long").as("n_good"),
            $"n_bad".cast("long").as("n_bad"),
            (abs($"iv" - $"iv_x") <= 0.01).as("iv_ok"),
            ($"max_bin" <= $"n" / 10 * 1.05 && $"min_bin" >= $"n" / 10 * 0.95)
              .as("bins_balanced"),
            lit(edges == edges.sorted && edges.distinct.length == 9)
              .as("edges_monotone"))
      },
      Some("""SELECT count(*) AS n,
             |  CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
             |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
             |  TRUE AS iv_ok, TRUE AS bins_balanced, TRUE AS edges_monotone
             |FROM orders""".stripMargin)
    ),

    // Additive Holt–Winters (w28) — the SEASONAL member of the
    // smoothing family (w8 EWMA: level; w21 Holt: level+trend; w25
    // Kalman: adaptive gain) and the one daily operational series
    // actually need — weekly shape dominates them. Three coupled
    // recursions + a 7-slot seasonal state per key (ops/HoltWinters:
    // the HoltLinear skeleton — one key exchange, local sort, forward
    // fold of m+2 doubles). Seed after 7 observations: L =
    // left-associated mean, B = 0, S = deviations; one-step forecasts
    // from observation 8. Dyadic coefficients (α=0.25, β=0.0625,
    // γ=0.25) and CAST-to-DOUBLE oracle literals make the recursive
    // CTE reproduce the fold bit-for-bit (the w21/w25 discipline);
    // the CTE carries the rotating seasonal state as 7 columns.
    OracleQuery(
      "w28_holt_winters",
      (s, d) => {
        import s.implicits._
        val daily = Tables.lineitem(s, d)
          .groupBy($"l_returnflag".as("flag"),
            date_trunc("day", $"l_shipdate").as("day"))
          .agg((sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")) / lit(100.0))
            .as("y"))
        graft.ops.HoltWinters.perKey(
            daily, "flag", Seq("day"), "y",
            m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
          .filter($"yhat".isNotNull)
          .select($"flag", $"day",
            Parity.floorRound4($"y").as("y"),
            Parity.floorRound4($"yhat").as("yhat"),
            Parity.floorRound4($"level").as("level"),
            Parity.floorRound4($"trend").as("trend"))
          .orderBy($"flag", $"day")
      },
      Some(holtWintersOracle)
    ),

    // Fisher's exact test (a74) — the small-cell replacement for a48's
    // χ² independence test: χ²'s asymptotics break when any expected
    // cell is small, exactly the regime of rare-segment × rare-outcome
    // audits; Fisher conditions on both margins and sums the exact
    // hypergeometric tail (two-sided by the DOUBLING convention
    // p = min(1, 2·min(P[X≤a], P[X≥a])) — inclusion is pure integer
    // comparison, immune to the cross-engine pmf-ordering ties the
    // "sum all pmf ≤ pmf(a)" convention would hinge on). Exactness
    // discipline: ln-factorials are cumulative sums of PRE-QUANTIZED
    // ln(i) (1e-12 grid, so the running sum is exact integer algebra
    // and engine libm ulp differences cannot accumulate); each pmf is
    // exp() of an identical integer-derived argument, quantized at
    // 1e-9 before the exact tail sum. Frame grains: the factorial
    // table is |N| rows (one narrow column; Fisher is a SMALL-SAMPLE
    // test — past ~10⁷ rows the a48 χ² is the right tool and this
    // entry's role is the small-margin audit), the k-support
    // min(r1,c1)−max(0,r1+c1−N) rows. The two 1-row collects are the
    // bounded-scalar class. The ln-factorial cumsum runs through
    // ops/PrefixSum (bucketed global prefix sum — the a56/a65/o10
    // recipe), never a single-reducer global window: even at the
    // "small-sample" grain this file's header pledge of no row-sized
    // one-partition frames holds, and the values are identical (a
    // prefix sum does not depend on how it is parallelized).
    OracleQuery(
      "a74_fisher_exact",
      (s, d) => {
        import s.implicits._
        val Array(av, r1v, c1v, nnv) = Tables.orders(s, d)
          .agg(
            sum(when($"o_orderpriority" === "1-URGENT" && $"o_orderstatus" === "F", 1L)
              .otherwise(0L)).as("a"),
            sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L)).as("r1"),
            sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("c1"),
            count(lit(1)).as("nn"))
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
        // the cumsum rides DECIMAL(38,0) (withCumsumDecimal): each
        // quantized ln fits a long but Σln(i)·10¹² crosses 2⁶³ already
        // at n ≈ 6.9×10⁵ (sf1's orders is 1.5×10⁶) — DuckDB's BIGINT
        // sum promotes to HUGEINT, so decimal is what keeps the two
        // engines byte-identical instead of wrapping or ANSI-failing
        val lf = graft.ops.PrefixSum.withCumsumDecimal(
            s.range(1, nnv + 1)
              .select($"id".as("i"), lit(0).as("g"),
                floor(log($"id".cast("double")) * 1e12 + 0.5).cast("long").as("li")),
            "g", "i", "li", outCol = "f", knownCount = Some(nnv))
          .select($"i", $"f")
        val lf0 = lf.unionByName(
            Seq(0L).toDF("i").withColumn("f", lit(0).cast("decimal(38,0)")))
          .persist()
        // the six margin ln-factorials — a 6-row bounded lookup
        val need = Seq(r1v, nnv - r1v, nnv, c1v, nnv - c1v).distinct
        val fmap = lf0.filter($"i".isin(need: _*))
          .collect().map(r => r.getLong(0) -> BigInt(r.getDecimal(1).toBigInteger))
          .toMap
        val lden = fmap(nnv) - fmap(c1v) - fmap(nnv - c1v)
        val cnum = fmap(r1v) + fmap(nnv - r1v) - lden
        val lo = math.max(0L, r1v + c1v - nnv)
        val hi = math.min(r1v, c1v)
        val ks = s.range(lo, hi + 1).select($"id".as("k"))
        val pmf = ks
          .join(lf0.select($"i".as("ik"), $"f".as("fk")), $"ik" === $"k")
          .join(lf0.select($"i".as("irk"), $"f".as("frk")), $"irk" === lit(r1v) - $"k")
          .join(lf0.select($"i".as("ick"), $"f".as("fck")), $"ick" === lit(c1v) - $"k")
          .join(lf0.select($"i".as("ink"), $"f".as("fnk")),
            $"ink" === lit(nnv - r1v - c1v) + $"k")
          .withColumn("lq",
            lit(new java.math.BigDecimal(cnum.bigInteger))
              - $"fk" - $"frk" - $"fck" - $"fnk")
          .withColumn("t",
            floor(exp($"lq".cast("double") / 1e12) * 1e9 + 0.5).cast("long"))
        val out = pmf.agg(
            (sum(when($"k" <= av, $"t").otherwise(0L)) / 1e9).as("p_le"),
            (sum(when($"k" >= av, $"t").otherwise(0L)) / 1e9).as("p_ge"))
          .select(
            lit(av).as("a"), lit(r1v).as("r1"), lit(c1v).as("c1"), lit(nnv).as("n"),
            Parity.floorRound4(least(lit(1.0), lit(2.0) * least($"p_le", $"p_ge")))
              .as("p_fisher"),
            (least(lit(1.0), lit(2.0) * least($"p_le", $"p_ge")) < 0.05)
              .as("reject_indep"))
        lf0.unpersist()
        out
      },
      Some("""WITH cells AS (
             |  SELECT
             |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS r1,
             |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    count(*) AS nn
             |  FROM orders
             |), nums AS (
             |  SELECT CAST(unnest(generate_series(1, (SELECT nn FROM cells))) AS BIGINT) AS i
             |), lf AS (
             |  SELECT i,
             |    sum(CAST(floor(ln(CAST(i AS DOUBLE)) * 1e12 + 0.5) AS BIGINT))
             |      OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
             |  FROM nums
             |), lf0 AS (
             |  SELECT i, f FROM lf UNION ALL SELECT 0, 0
             |), ks AS (
             |  SELECT CAST(unnest(generate_series(
             |      (SELECT greatest(0, r1 + c1 - nn) FROM cells),
             |      (SELECT least(r1, c1) FROM cells))) AS BIGINT) AS k
             |), pmf AS (
             |  SELECT k,
             |    ((SELECT f FROM lf0 WHERE i = (SELECT r1 FROM cells))
             |     - fk.f - frk.f
             |     + (SELECT f FROM lf0 WHERE i = (SELECT nn - r1 FROM cells))
             |     - fck.f - fnk.f
             |     - (SELECT f FROM lf0 WHERE i = (SELECT nn FROM cells))
             |     + (SELECT f FROM lf0 WHERE i = (SELECT c1 FROM cells))
             |     + (SELECT f FROM lf0 WHERE i = (SELECT nn - c1 FROM cells))) AS lq
             |  FROM ks
             |  JOIN lf0 fk ON fk.i = ks.k
             |  JOIN lf0 frk ON frk.i = (SELECT r1 FROM cells) - ks.k
             |  JOIN lf0 fck ON fck.i = (SELECT c1 FROM cells) - ks.k
             |  JOIN lf0 fnk ON fnk.i = (SELECT nn FROM cells) - (SELECT r1 FROM cells)
             |    - (SELECT c1 FROM cells) + ks.k
             |), q AS (
             |  SELECT k, CAST(floor(exp(CAST(lq AS DOUBLE) / 1e12) * 1e9 + 0.5) AS BIGINT) AS t
             |  FROM pmf
             |), tails AS (
             |  SELECT
             |    sum(CASE WHEN k <= (SELECT a FROM cells) THEN t ELSE 0 END) / 1e9 AS p_le,
             |    sum(CASE WHEN k >= (SELECT a FROM cells) THEN t ELSE 0 END) / 1e9 AS p_ge
             |  FROM q
             |)
             |SELECT (SELECT a FROM cells) AS a, (SELECT r1 FROM cells) AS r1,
             |  (SELECT c1 FROM cells) AS c1, (SELECT nn FROM cells) AS n,
             |  floor(least(1.0, 2 * least(p_le, p_ge)) * 10000 + 0.5) / 10000 AS p_fisher,
             |  least(1.0, 2 * least(p_le, p_ge)) < 0.05 AS reject_indep
             |FROM tails""".stripMargin)
    ),

    // CUPED variance reduction (a79) — the pre-experiment-covariate
    // adjustment every mature A/B platform applies before reading a
    // metric (Deng et al., WSDM'13): each user's pre-period activity X
    // explains away part of their post-period metric Y's variance, so
    // the adjusted metric Y − θ(X − X̄) (θ = cov(X,Y)/var(X), pooled
    // across arms — X is pre-assignment, so θ is treatment-independent)
    // needs ~(1−ρ²)× the sample for the same power. One scan to
    // user-grain (X, Y) cent sums (exact longs), one global moment agg
    // (Σx, Σy, Σx², Σy², Σxy as DECIMAL(38,0) — the a70/a76 overflow
    // discipline) plus per-arm totals, then closed-form double algebra
    // spelled operand-for-operand in the oracle. Arm = user_id % 2 —
    // deterministic and engine-identical. var_reduction = ρ², the
    // textbook identity for the optimal θ.
    OracleQuery(
      "a79_cuped",
      (s, d) => {
        import s.implicits._
        val perUser = Tables.events(s, d).filter($"value".isNotNull)
          .groupBy($"user_id")
          .agg(
            sum(when($"ts" < lit("2024-01-16").cast("timestamp"),
              floor($"value" * 100 + 0.5).cast("long")).otherwise(0L)).as("x"),
            sum(when($"ts" >= lit("2024-01-16").cast("timestamp"),
              floor($"value" * 100 + 0.5).cast("long")).otherwise(0L)).as("y"))
          .withColumn("arm", pmod($"user_id", lit(2)).cast("long"))
        val mom = perUser.agg(
          count(lit(1)).as("n"),
          sum($"x".cast("decimal(38,0)")).as("sx"),
          sum($"y".cast("decimal(38,0)")).as("sy"),
          sum($"x".cast("decimal(38,0)") * $"x").as("sxx"),
          sum($"y".cast("decimal(38,0)") * $"y").as("syy"),
          sum($"x".cast("decimal(38,0)") * $"y").as("sxy"))
        val arms = perUser.groupBy($"arm").agg(
          count(lit(1)).as("na"),
          sum($"x".cast("decimal(38,0)")).as("sxa"),
          sum($"y".cast("decimal(38,0)")).as("sya"))
        arms.crossJoin(mom)
          .withColumn("nd", $"n".cast("double"))
          .withColumn("cxy",
            $"sxy".cast("double") - $"sx".cast("double") * $"sy".cast("double") / $"nd")
          .withColumn("vx",
            $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double") / $"nd")
          .withColumn("vy",
            $"syy".cast("double") - $"sy".cast("double") * $"sy".cast("double") / $"nd")
          .withColumn("theta", $"cxy" / $"vx")
          .withColumn("mean_y", $"sya".cast("double") / $"na")
          .withColumn("mean_y_adj",
            $"sya".cast("double") / $"na"
              - $"theta" * ($"sxa".cast("double") / $"na" - $"sx".cast("double") / $"nd"))
          .select(
            $"arm",
            $"na".cast("long").as("n_users"),
            Parity.floorRound4($"mean_y").as("mean_y"),
            Parity.floorRound4($"mean_y_adj").as("mean_y_adj"),
            Parity.floorRound4($"theta").as("theta"),
            Parity.floorRound4($"cxy" * $"cxy" / ($"vx" * $"vy")).as("var_reduction"))
          .orderBy($"arm")
      },
      Some("""WITH per_user AS (
             |  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
             |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
             |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
             |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
             |), mom AS (
             |  SELECT count(*) AS n,
             |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
             |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
             |  FROM per_user
             |), arms AS (
             |  SELECT arm, count(*) AS na,
             |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sxa,
             |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sya
             |  FROM per_user GROUP BY 1
             |), alg AS (
             |  SELECT arm, na, CAST(n AS DOUBLE) AS nd,
             |    sxy - sx * sy / CAST(n AS DOUBLE) AS cxy,
             |    sxx - sx * sx / CAST(n AS DOUBLE) AS vx,
             |    syy - sy * sy / CAST(n AS DOUBLE) AS vy,
             |    sya, sxa, sx
             |  FROM arms, mom
             |)
             |SELECT arm, CAST(na AS BIGINT) AS n_users,
             |  floor(sya / na * 10000 + 0.5) / 10000 AS mean_y,
             |  floor((sya / na - (cxy / vx) * (sxa / na - sx / nd)) * 10000 + 0.5) / 10000 AS mean_y_adj,
             |  floor(cxy / vx * 10000 + 0.5) / 10000 AS theta,
             |  floor(cxy * cxy / (vx * vy) * 10000 + 0.5) / 10000 AS var_reduction
             |FROM alg ORDER BY arm""".stripMargin)
    ),

    // Mantel–Haenszel stratified odds ratio + CMH test (a80) — the
    // confounder-aware sibling of a48's pooled χ²: pooling 2×2 tables
    // across strata invites Simpson's paradox (a stratum-correlated
    // exposure flips the pooled direction), so the common odds ratio
    // is estimated WITHIN strata and combined with MH weights
    // (Mantel & Haenszel 1959): OR = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ); the CMH
    // statistic (no continuity correction) is (Σaᵢ − ΣE[aᵢ])²/ΣV[aᵢ]
    // with the hypergeometric E and V per stratum. One join
    // (orders⋈customer — the dimension broadcasts), one agg to K=5
    // 2×2 cells, then per-stratum terms quantized at 1e-8 BEFORE the
    // cross-stratum sum (double summation order never touches the
    // hash). The four-way product in V runs in double with operands
    // CAST identically on both engines.
    OracleQuery(
      "a80_mantel_haenszel",
      (s, d) => {
        import s.implicits._
        val cells = Tables.orders(s, d)
          .join(Tables.customer(s, d),
            $"o_custkey" === $"c_custkey")
          .groupBy($"o_orderpriority".as("k"))
          .agg(
            sum(when($"c_mktsegment" === "BUILDING" && $"o_orderstatus" === "F", 1L)
              .otherwise(0L)).as("a"),
            sum(when($"c_mktsegment" === "BUILDING" && $"o_orderstatus" =!= "F", 1L)
              .otherwise(0L)).as("b"),
            sum(when($"c_mktsegment" =!= "BUILDING" && $"o_orderstatus" === "F", 1L)
              .otherwise(0L)).as("c"),
            sum(when($"c_mktsegment" =!= "BUILDING" && $"o_orderstatus" =!= "F", 1L)
              .otherwise(0L)).as("dd"))
          .withColumn("nn", ($"a" + $"b" + $"c" + $"dd").cast("double"))
        val terms = cells.select(
          floor($"a".cast("double") * $"dd" / $"nn" * 1e8 + 0.5).cast("long").as("t_num"),
          floor($"b".cast("double") * $"c" / $"nn" * 1e8 + 0.5).cast("long").as("t_den"),
          $"a".as("t_a"),
          floor(($"a" + $"b").cast("double") * ($"a" + $"c") / $"nn" * 1e8 + 0.5)
            .cast("long").as("t_e"),
          floor(($"a" + $"b").cast("double") * ($"c" + $"dd") * ($"a" + $"c")
              * ($"b" + $"dd") / ($"nn" * $"nn" * ($"nn" - 1)) * 1e8 + 0.5)
            .cast("long").as("t_v"))
        terms.agg(
            count(lit(1)).as("n_strata"),
            (sum($"t_num") / 1e8).as("num"),
            (sum($"t_den") / 1e8).as("den"),
            sum($"t_a").cast("double").as("sa"),
            (sum($"t_e") / 1e8).as("se"),
            (sum($"t_v") / 1e8).as("sv"))
          .select(
            $"n_strata".cast("long").as("n_strata"),
            Parity.floorRound4($"num" / $"den").as("or_mh"),
            Parity.floorRound4(($"sa" - $"se") * ($"sa" - $"se") / $"sv")
              .as("chi2_cmh"),
            (($"sa" - $"se") * ($"sa" - $"se") / $"sv" > 3.841459).as("assoc"))
      },
      Some("""WITH cells AS (
             |  SELECT o.o_orderpriority AS k,
             |    CAST(sum(CASE WHEN c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |    CAST(sum(CASE WHEN c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |    CAST(sum(CASE WHEN c.c_mktsegment <> 'BUILDING' AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |    CAST(sum(CASE WHEN c.c_mktsegment <> 'BUILDING' AND o.o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS dd
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1
             |), terms AS (
             |  SELECT
             |    CAST(floor(CAST(a AS DOUBLE) * dd / CAST(a+b+c+dd AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS t_num,
             |    CAST(floor(CAST(b AS DOUBLE) * c / CAST(a+b+c+dd AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS t_den,
             |    a AS t_a,
             |    CAST(floor(CAST(a+b AS DOUBLE) * (a+c) / CAST(a+b+c+dd AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS t_e,
             |    CAST(floor(CAST(a+b AS DOUBLE) * (c+dd) * (a+c) * (b+dd)
             |      / (CAST(a+b+c+dd AS DOUBLE) * CAST(a+b+c+dd AS DOUBLE) * (CAST(a+b+c+dd AS DOUBLE) - 1)) * 1e8 + 0.5) AS BIGINT) AS t_v
             |  FROM cells
             |), sums AS (
             |  SELECT count(*) AS n_strata,
             |    sum(t_num) / 1e8 AS num, sum(t_den) / 1e8 AS den,
             |    CAST(sum(t_a) AS DOUBLE) AS sa,
             |    sum(t_e) / 1e8 AS se, sum(t_v) / 1e8 AS sv
             |  FROM terms
             |)
             |SELECT CAST(n_strata AS BIGINT) AS n_strata,
             |  floor(num / den * 10000 + 0.5) / 10000 AS or_mh,
             |  floor((sa - se) * (sa - se) / sv * 10000 + 0.5) / 10000 AS chi2_cmh,
             |  (sa - se) * (sa - se) / sv > 3.841459 AS assoc
             |FROM sums""".stripMargin)
    ),

    // Seasonal strength (w30) — the "does this series have a weekly
    // shape worth modeling?" gate that decides between w8's EWMA and
    // w28's Holt–Winters: classical STL-style decomposition reduced to
    // exact algebra. Trend = centered MA-7 (full 7-row frames only);
    // detrended D is carried as D7 = 7·y − Σ₇y — an EXACT long, so no
    // double sums ever cross the engines; the day-of-week factor's
    // explained share is then the one-way ANOVA identity
    // F_s = SS_between/SS_total over D7 (≡ 1 − Var(remainder)/Var(D),
    // the Hyndman seasonal-strength measure with the per-dow mean as
    // the seasonal component). Squared sums ride DECIMAL(38,0) (D7²
    // nears long range at sf1). Day-of-week is pure date arithmetic
    // (days since a fixed Monday, mod 7) — engine-neutral, no locale.
    // peak_dow breaks ties on the exact decimal ΣD7. On this synthetic
    // corpus F_s reads ~0 (no planted weekly shape) — an honest flat
    // finding, same stance as w29's spectrum; the gate pins the
    // algebra, and peak_dow/n_mid pin the frames.
    OracleQuery(
      "w30_seasonal_strength",
      (s, d) => {
        import s.implicits._
        val daily = Tables.lineitem(s, d)
          .groupBy($"l_returnflag".as("flag"),
            date_trunc("day", $"l_shipdate").as("day"))
          .agg(sum(floor($"l_extendedprice" * 100 + 0.5).cast("long")).as("yq"))
        val w7 = Window.partitionBy($"flag").orderBy($"day").rowsBetween(-3, 3)
        val mid = daily
          .withColumn("s7", sum($"yq").over(w7))
          .withColumn("c7", count(lit(1)).over(w7))
          .filter($"c7" === 7)
          .withColumn("d7", (lit(7) * $"yq" - $"s7").cast("decimal(38,0)"))
          .withColumn("dow",
            pmod(datediff($"day".cast("date"), lit("1994-12-26").cast("date")),
              lit(7)).cast("long"))
        val cells = mid.groupBy($"flag", $"dow")
          .agg(count(lit(1)).as("nd"),
            sum($"d7").as("sd"),
            sum($"d7" * $"d7").as("sqq"))
        // SS_between's 7 per-dow terms are doubles — their sum is
        // pinned to dow order on BOTH engines (sort_array fold here,
        // ORDER BY dow inside DuckDB's aggregate) so IEEE addition
        // order can never flip the 4th decimal
        val perFlag = cells.groupBy($"flag").agg(
          sum($"nd").as("n"),
          sum($"sd").as("st"),
          sum($"sqq").as("sq"),
          aggregate(
            sort_array(collect_list(struct($"dow".as("w"),
              ($"sd".cast("double") * $"sd".cast("double") / $"nd").as("t")))),
            lit(0.0), (acc, x) => acc + x.getField("t")).as("ssb_raw"))
        val wPeak = Window.partitionBy($"flag")
          .orderBy($"sd".desc, $"dow".asc)
        val peak = cells
          .withColumn("rk", row_number().over(wPeak))
          .filter($"rk" === 1)
          .select($"flag", $"dow".as("peak_dow"))
        perFlag.join(peak, "flag")
          .withColumn("cf",
            $"st".cast("double") * $"st".cast("double") / $"n")
          .withColumn("ssb", $"ssb_raw" - $"cf")
          .withColumn("sstot", $"sq".cast("double") - $"cf")
          .select(
            $"flag",
            $"n".cast("long").as("n_mid"),
            Parity.floorRound4(greatest(lit(0.0), $"ssb" / $"sstot"))
              .as("f_seasonal"),
            $"peak_dow")
          .orderBy($"flag")
      },
      Some("""WITH daily AS (
             |  SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
             |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS yq
             |  FROM lineitem GROUP BY 1, 2
             |), framed AS (
             |  SELECT flag, day, yq,
             |    sum(yq) OVER (PARTITION BY flag ORDER BY day
             |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             |    count(*) OVER (PARTITION BY flag ORDER BY day
             |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
             |  FROM daily
             |), mid AS (
             |  SELECT flag,
             |    CAST(7 * CAST(yq AS HUGEINT) - s7 AS HUGEINT) AS d7,
             |    CAST(datediff('day', DATE '1994-12-26', CAST(day AS DATE)) % 7 AS BIGINT) AS dow
             |  FROM framed WHERE c7 = 7
             |), cells AS (
             |  SELECT flag, dow, count(*) AS nd,
             |    sum(d7) AS sd, sum(d7 * d7) AS sqq
             |  FROM mid GROUP BY 1, 2
             |), per_flag AS (
             |  SELECT flag,
             |    sum(nd) AS n,
             |    CAST(sum(sd) AS DOUBLE) AS st,
             |    CAST(sum(sqq) AS DOUBLE) AS sq,
             |    sum(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / nd ORDER BY dow) AS ssb_raw
             |  FROM cells GROUP BY 1
             |), peak AS (
             |  SELECT flag, dow AS peak_dow
             |  FROM (SELECT flag, dow,
             |      row_number() OVER (PARTITION BY flag ORDER BY sd DESC, dow ASC) AS rk
             |    FROM cells) WHERE rk = 1
             |)
             |SELECT f.flag, CAST(f.n AS BIGINT) AS n_mid,
             |  floor(greatest(0.0, (f.ssb_raw - f.st * f.st / f.n) / (f.sq - f.st * f.st / f.n)) * 10000 + 0.5) / 10000 AS f_seasonal,
             |  p.peak_dow
             |FROM per_flag f JOIN peak p ON f.flag = p.flag
             |ORDER BY f.flag""".stripMargin)
    ),

    // Wald's SPRT (a81) — sequential A/B early stopping: instead of a
    // fixed-horizon test read once (a29/a53/a60), the log-likelihood
    // ratio is monitored as data arrives and the experiment STOPS the
    // first day it crosses ln((1−β)/α) (accept H1: p = p1) or
    // ln(β/(1−α)) (accept H0: p = p0) — Wald's guarantee bounds both
    // error rates at α = β = 0.05 with, on average, far fewer
    // observations than the fixed test. Everything is EXACT INTEGER
    // algebra: the per-observation increments ln(p1/p0), ln(q1/q0)
    // and both thresholds are pre-quantized 1e-12 grid constants
    // (embedded as the same integer literals in both engines — no
    // runtime ln anywhere), a day's increment is s·L1 + (n−s)·L0, and
    // the trajectory is a per-segment cumsum over the CALENDAR-grain
    // daily frame (≤ |days| rows per key — the same bounded-partition
    // argument as every daily window). First crossing = min over
    // (day, decision) structs; undecided segments report 'continue'
    // with a null decision day. p0 = 0.19 vs p1 = 0.21 straddles the
    // synthetic purchase rate (~0.186–0.208 per segment) so both
    // decisions occur.
    OracleQuery(
      "a81_sprt",
      (s, d) => {
        import s.implicits._
        // floor(ln(0.21/0.19)·1e12 + 0.5), floor(ln(0.79/0.81)·1e12 + 0.5),
        // floor(±ln(0.95/0.05)·1e12 + 0.5) — derivations pinned here so
        // the literals are auditable
        val l1 = 100083458557L
        val l0 = -25001302205L
        val aThr = 2944438979166L
        val bThr = -2944438979166L
        val daily = Tables.events(s, d)
          .groupBy(pmod($"user_id", lit(4)).cast("long").as("segment"),
            date_trunc("day", $"ts").as("day"))
          .agg(
            count(lit(1)).as("n"),
            sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("sv"))
          .withColumn("inc", $"sv" * l1 + ($"n" - $"sv") * l0)
        val w = Window.partitionBy($"segment").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = daily.withColumn("c", sum($"inc").over(w))
        val first = cum
          .withColumn("dec",
            when($"c" >= aThr, "h1").when($"c" <= bThr, "h0"))
          .filter($"dec".isNotNull)
          .groupBy($"segment")
          .agg(min(struct($"day", $"dec")).as("fst"))
          .select($"segment", $"fst.day".as("decision_day"),
            $"fst.dec".as("dec"))
        val summary = daily.groupBy($"segment")
          .agg(count(lit(1)).as("n_days"), sum($"n").as("n_obs"),
            sum($"sv").as("n_success"), sum($"inc").as("llr_final"))
        summary.join(first, Seq("segment"), "left")
          .select(
            $"segment",
            $"n_days".cast("long").as("n_days"),
            $"n_obs".cast("long").as("n_obs"),
            $"n_success".cast("long").as("n_success"),
            Parity.floorRound4($"llr_final" / 1e12).as("llr_final"),
            coalesce($"dec", lit("continue")).as("decision"),
            $"decision_day")
          .orderBy($"segment")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(user_id % 4 AS BIGINT) AS segment,
             |    date_trunc('day', ts) AS day,
             |    count(*) AS n,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS sv
             |  FROM events GROUP BY 1, 2
             |), inc AS (
             |  SELECT segment, day, n, sv,
             |    sv * 100083458557 + (n - sv) * (-25001302205) AS inc
             |  FROM daily
             |), cum AS (
             |  SELECT segment, day, inc,
             |    sum(inc) OVER (PARTITION BY segment ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
             |  FROM inc
             |), crossed AS (
             |  SELECT segment, day,
             |    CASE WHEN c >= 2944438979166 THEN 'h1'
             |         WHEN c <= -2944438979166 THEN 'h0' END AS dec,
             |    row_number() OVER (PARTITION BY segment ORDER BY day) AS rn0
             |  FROM cum
             |  WHERE c >= 2944438979166 OR c <= -2944438979166
             |), first AS (
             |  SELECT segment, day AS decision_day, dec FROM crossed WHERE rn0 = 1
             |), summary AS (
             |  SELECT segment, count(*) AS n_days,
             |    CAST(sum(n) AS BIGINT) AS n_obs,
             |    CAST(sum(sv) AS BIGINT) AS n_success,
             |    CAST(sum(inc) AS BIGINT) AS llr_final_i
             |  FROM inc GROUP BY 1
             |)
             |SELECT s.segment, s.n_days, s.n_obs, s.n_success,
             |  floor(s.llr_final_i / 1e12 * 10000 + 0.5) / 10000 AS llr_final,
             |  coalesce(f.dec, 'continue') AS decision,
             |  f.decision_day
             |FROM summary s LEFT JOIN first f USING (segment)
             |ORDER BY s.segment""".stripMargin)
    ),

    // Cochran–Armitage trend test (a82) — dose-response for PROPORTIONS
    // across K ordered groups (Cochran 1954; Armitage 1955): is failure
    // rate monotone in order priority? The chi-square independence test
    // (a48) spends K−1 df and misses ordered structure; CA spends ONE
    // df on the linear contrast Z = Σwᵢ(xᵢ − nᵢp̄) /
    // √(p̄(1−p̄)(Σwᵢ²nᵢ − (Σwᵢnᵢ)²/N)) with scores wᵢ = the priority
    // rank. Scale shape: the whole test is FIVE integer sums from one
    // scan (N, X, Σwn, Σw²n, Σwx) — a 1-row frame; both engines derive
    // identical doubles from identical exact integers, and the one
    // square root is IEEE-correctly-rounded on both. (Σwn)² would
    // outgrow a long near sf ~1000, so the quotient is spelled in
    // double on both sides — a statistic, not a count. Independently
    // validated against a closed-form recompute (z = −0.6329 at
    // sf0.01) before trusting cross-engine parity.
    OracleQuery(
      "a82_cochran_armitage",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select(
            substring($"o_orderpriority", 1, 1).cast("long").as("w"),
            ($"o_orderstatus" === "F").cast("long").as("x"))
          .agg(
            count(lit(1)).as("n"),
            sum($"x").as("xs"),
            sum($"w").as("swn"),
            sum($"w" * $"w").as("sw2n"),
            sum($"w" * $"x").as("swx"))
          .select(
            $"n", $"xs".as("x"), $"swn", $"sw2n", $"swx",
            Parity.floorRound4(
              ($"swx" - $"xs".cast("double") / $"n" * $"swn") /
                sqrt(($"xs".cast("double") / $"n") *
                  (lit(1.0) - $"xs".cast("double") / $"n") *
                  ($"sw2n" - $"swn".cast("double") * $"swn" / $"n")))
              .as("z"),
            (abs(($"swx" - $"xs".cast("double") / $"n" * $"swn") /
              sqrt(($"xs".cast("double") / $"n") *
                (lit(1.0) - $"xs".cast("double") / $"n") *
                ($"sw2n" - $"swn".cast("double") * $"swn" / $"n"))) > 1.96)
              .as("reject_h0"))
      },
      Some("""WITH cells AS (
             |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
             |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS x
             |  FROM orders
             |), sums AS (
             |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS xs,
             |    CAST(sum(w) AS BIGINT) AS swn,
             |    CAST(sum(w * w) AS BIGINT) AS sw2n,
             |    CAST(sum(w * x) AS BIGINT) AS swx
             |  FROM cells
             |)
             |SELECT n, xs AS x, swn, sw2n, swx,
             |  floor((swx - CAST(xs AS DOUBLE) / n * swn) /
             |    sqrt((CAST(xs AS DOUBLE) / n) * (1.0 - CAST(xs AS DOUBLE) / n)
             |      * (sw2n - CAST(swn AS DOUBLE) * swn / n)) * 10000 + 0.5) / 10000 AS z,
             |  abs((swx - CAST(xs AS DOUBLE) / n * swn) /
             |    sqrt((CAST(xs AS DOUBLE) / n) * (1.0 - CAST(xs AS DOUBLE) / n)
             |      * (sw2n - CAST(swn AS DOUBLE) * swn / n))) > 1.96 AS reject_h0
             |FROM sums""".stripMargin)
    ),

    // Poisson overdispersion gate (a83) — the COUNT-DATA diagnostic
    // the battery lacked: per-user event counts are Poisson only if
    // variance ≈ mean; real traffic is overdispersed (bursts, bots,
    // heavy users), and every Poisson-assuming model downstream (rate
    // CIs, a27's Wilson bounds on per-user rates, sample-size math)
    // silently understates variance when it is. The dispersion test:
    // χ² = (n−1)s²/x̄ against χ²_{n−1}, normal-approximated as
    // z = √(2χ²) − √(2(n−1)−1) (Wilson–Hilferty-adjacent; standard for
    // large df). Scale shape: user-grain collapse then THREE exact
    // integer sums (n, Σx, Σx²) to a 1-row frame — both engines derive
    // identical doubles from identical integers (Σx² of per-user
    // counts stays in long headroom: 1e9 users × (1e4)² = 1e17 < 2⁶³;
    // Σx·Σx is spelled in double — a statistic, not a count).
    // Validated against a closed-form recompute (D = 1.0652,
    // z = 0.5832 at sf0.01) before trusting cross-engine parity.
    OracleQuery(
      "a83_overdispersion",
      (s, d) => {
        import s.implicits._
        val counts = Tables.events(s, d)
          .groupBy($"user_id").agg(count(lit(1)).as("c"))
        val sums = counts.agg(
          count(lit(1)).as("n"),
          sum($"c").as("sx"),
          sum($"c" * $"c").as("sxx"))
        val mean = $"sx".cast("double") / $"n"
        val s2 = ($"sxx" - $"sx".cast("double") * $"sx" / $"n") / ($"n" - 1)
        val chi2 = ($"n" - 1).cast("double") * s2 / mean
        val z = sqrt(lit(2.0) * chi2) -
          sqrt(lit(2.0) * ($"n" - 1).cast("double") - 1.0)
        sums.select(
          $"n", $"sx", $"sxx",
          Parity.floorRound4(s2 / mean).as("dispersion"),
          Parity.floorRound4(z).as("z"),
          (z > 1.645).as("overdispersed"))
      },
      Some("""WITH counts AS (
             |  SELECT user_id, count(*) AS c FROM events GROUP BY 1
             |), sums AS (
             |  SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS sx,
             |    CAST(sum(c * c) AS BIGINT) AS sxx
             |  FROM counts
             |)
             |SELECT n, sx, sxx,
             |  floor(((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
             |    / (CAST(sx AS DOUBLE) / n) * 10000 + 0.5) / 10000 AS dispersion,
             |  floor((sqrt(2.0 * (n - 1) * ((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
             |      / (CAST(sx AS DOUBLE) / n))
             |    - sqrt(2.0 * (n - 1) - 1.0)) * 10000 + 0.5) / 10000 AS z,
             |  (sqrt(2.0 * (n - 1) * ((sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
             |      / (CAST(sx AS DOUBLE) / n))
             |    - sqrt(2.0 * (n - 1) - 1.0)) > 1.645 AS overdispersed
             |FROM sums""".stripMargin)
    )
  )
}

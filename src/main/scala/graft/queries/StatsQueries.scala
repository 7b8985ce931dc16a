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
        val pairs = a.join(b, $"a.x" < $"b.x")
          .agg(
            sum(when($"a.y" < $"b.y", $"a.nc" * $"b.nc").otherwise(0L)
              .cast("decimal(38,0)")).as("c_pairs"),
            sum(when($"a.y" > $"b.y", $"a.nc" * $"b.nc").otherwise(0L)
              .cast("decimal(38,0)")).as("d_pairs"))
        val tx = cells.groupBy($"x").agg(sum($"nc").as("t"))
          .agg(sum(($"t" * ($"t" - 1) / 2).cast("decimal(38,0)")).as("n1"),
            sum($"t").cast("decimal(38,0)").as("n"))
        val ty = cells.groupBy($"y").agg(sum($"nc").as("t"))
          .agg(sum(($"t" * ($"t" - 1) / 2).cast("decimal(38,0)")).as("n2"))
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
    OracleQuery(
      "pipe_woe_iv",
      (s, d) => {
        import s.implicits._
        val wNt = Window.orderBy($"o_totalprice", $"o_orderkey")
        val binned = Tables.orders(s, d)
          .select($"o_totalprice", $"o_orderkey",
            ($"o_orderstatus" === "F").as("is_bad"))
          .withColumn("bin", ntile(10).over(wNt))
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
    // bounded-scalar class.
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
        val w = Window.orderBy($"i")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val lf = s.range(1, nnv + 1).select($"id".as("i"))
          .withColumn("f",
            sum(floor(log($"i".cast("double")) * 1e12 + 0.5).cast("long")).over(w))
        val lf0 = lf.unionByName(Seq((0L, 0L)).toDF("i", "f")).persist()
        // the six margin ln-factorials — a 6-row bounded lookup
        val need = Seq(r1v, nnv - r1v, nnv, c1v, nnv - c1v).distinct
        val fmap = lf0.filter($"i".isin(need: _*))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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
          .withColumn("lq", lit(cnum) - $"fk" - $"frk" - $"fck" - $"fnk")
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
    )
  )
}

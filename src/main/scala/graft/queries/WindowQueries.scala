package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Window / time-series operators — SURVEY §2.7 W1–W6.
  *
  * All trailing frames end at -1 (shift(1) semantics): the current row
  * never contributes to its own feature — the reference's strict
  * causality contract (features/rolling_stats.py:1-8).
  *
  * Scale notes: every window here partitions by user_id — no global
  * window, so state is bounded per key and the shuffle is one exchange
  * on the partition key reused by all the frame functions over it.
  */
object WindowQueries {

  /** Shared by w25 (batch) and stream_kalman_level (the streaming twin
    * must reproduce the batch output bit-for-bit, so it gates against
    * the IDENTICAL oracle). */
  private[queries] val kalmanLevelOracle: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
      |), pos AS (
      |  SELECT event_type, day, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM daily
      |), rec AS (
      |  SELECT event_type, day, y, rn, y AS x,
      |    CAST(4.0 AS DOUBLE) AS p, CAST(1.0 AS DOUBLE) AS k
      |  FROM pos WHERE rn = 1
      |  UNION ALL
      |  SELECT n.event_type, n.day, n.y, n.rn,
      |    r.x + ((r.p + CAST(0.5 AS DOUBLE))
      |      / ((r.p + CAST(0.5 AS DOUBLE)) + CAST(4.0 AS DOUBLE)))
      |      * (n.y - r.x) AS x,
      |    (1 - ((r.p + CAST(0.5 AS DOUBLE))
      |      / ((r.p + CAST(0.5 AS DOUBLE)) + CAST(4.0 AS DOUBLE))))
      |      * (r.p + CAST(0.5 AS DOUBLE)) AS p,
      |    ((r.p + CAST(0.5 AS DOUBLE))
      |      / ((r.p + CAST(0.5 AS DOUBLE)) + CAST(4.0 AS DOUBLE))) AS k
      |  FROM rec r JOIN pos n
      |    ON n.event_type = r.event_type AND n.rn = r.rn + 1
      |)
      |SELECT event_type, day, round(y, 4) AS y,
      |  floor(x * 10000 + 0.5) / 10000 AS level,
      |  floor(k * 10000 + 0.5) / 10000 AS gain,
      |  floor(p * 10000 + 0.5) / 10000 AS variance
      |FROM rec ORDER BY event_type, day""".stripMargin

  def all: Seq[OracleQuery] = {
    // Shared partition/order: (user_id) ordered by (ts, event_id) — the
    // event_id tiebreak makes frames deterministic under equal timestamps.
    def w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    Seq(
      // W1: trailing mean over 7 prior rows (rolling_stats.py:16-53) —
      // avg over an empty frame is null, matching min_periods=1 + shift(1).
      OracleQuery(
        "w1_trailing_mean",
        (s, d) => {
          import s.implicits._
          Tables.events(s, d)
            .withColumn("bias_7", round(avg($"value").over(w.rowsBetween(-7, -1)), 4))
            .select($"event_id", $"user_id", $"bias_7")
            .orderBy($"user_id", $"event_id")
        },
        Some("""SELECT event_id, user_id,
               |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 4) AS bias_7
               |FROM events ORDER BY user_id, event_id""".stripMargin)
      ),

      // W2: trailing RMSE over 14 prior rows (rolling_stats.py:56-99).
      OracleQuery(
        "w2_trailing_rmse",
        (s, d) => {
          import s.implicits._
          Tables.events(s, d)
            .withColumn("rmse_14",
              round(sqrt(avg($"value" * $"value").over(w.rowsBetween(-14, -1))), 4))
            .select($"event_id", $"user_id", $"rmse_14")
            .orderBy($"user_id", $"event_id")
        },
        Some("""SELECT event_id, user_id,
               |  round(sqrt(avg(value * value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |    ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)), 4) AS rmse_14
               |FROM events ORDER BY user_id, event_id""".stripMargin)
      ),

      // W3: expanding sample-std of all prior rows (rolling_stats.py:102-135;
      // ddof=1 — stddev_samp of <2 rows is null, matching min_periods=2).
      OracleQuery(
        "w3_expanding_std",
        (s, d) => {
          import s.implicits._
          Tables.events(s, d)
            .withColumn("sigma_exp",
              round(stddev_samp($"value").over(w.rowsBetween(Window.unboundedPreceding, -1)), 4))
            .select($"event_id", $"user_id", $"sigma_exp")
            .orderBy($"user_id", $"event_id")
        },
        Some("""SELECT event_id, user_id,
               |  round(stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 4) AS sigma_exp
               |FROM events ORDER BY user_id, event_id""".stripMargin)
      ),

      // W4: lag-1 persistence feature (eval/data.py:230-236) + lead.
      OracleQuery(
        "w4_lag_lead",
        (s, d) => {
          import s.implicits._
          Tables.events(s, d)
            .withColumn("value_lag1", round(lag($"value", 1).over(w), 4))
            .withColumn("value_lead1", round(lead($"value", 1).over(w), 4))
            .withColumn("persistence", round(coalesce(lag($"value", 1).over(w), lit(0.0)), 4))
            .select($"event_id", $"user_id", $"value_lag1", $"value_lead1", $"persistence")
            .orderBy($"user_id", $"event_id")
        },
        Some("""SELECT event_id, user_id,
               |  round(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS value_lag1,
               |  round(lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS value_lead1,
               |  round(coalesce(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 4) AS persistence
               |FROM events ORDER BY user_id, event_id""".stripMargin)
      ),

      // W5: first-difference spike detection (clean_hourly.py:117-142),
      // generalized with per-station partitioning as SURVEY §4 notes.
      OracleQuery(
        "w5_spike_detect",
        (s, d) => {
          import s.implicits._
          Tables.events(s, d)
            .withColumn("diff", abs($"value" - lag($"value", 1).over(w)))
            .withColumn("is_spike", when($"diff" > 100.0, 1).otherwise(0))
            .groupBy($"user_id")
            .agg(
              sum($"is_spike").cast("long").as("n_spikes"),
              round(max($"diff"), 4).as("max_jump"),
              count(lit(1)).as("n"))
            .orderBy($"user_id")
        },
        Some("""WITH diffs AS (
               |  SELECT user_id,
               |    abs(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS diff
               |  FROM events
               |)
               |SELECT user_id,
               |  CAST(sum(CASE WHEN diff > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_spikes,
               |  round(max(diff), 4) AS max_jump, count(*) AS n
               |FROM diffs GROUP BY user_id ORDER BY user_id""".stripMargin)
      ),

      // W6 extras: ranking family over per-user value ordering.
      OracleQuery(
        "w6_ranking_family",
        (s, d) => {
          import s.implicits._
          val wv = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
          Tables.events(s, d)
            .withColumn("rn", row_number().over(wv))
            .withColumn("rk", rank().over(wv))
            .withColumn("drk", dense_rank().over(wv))
            .withColumn("quartile", ntile(4).over(wv))
            .filter($"rn" <= 3)
            .select($"user_id", $"rn", $"rk", $"drk", $"quartile", round($"value", 4).as("value"))
            .orderBy($"user_id", $"rn")
        },
        Some("""WITH ranked AS (
               |  SELECT user_id, value,
               |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS rn,
               |    CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS rk,
               |    CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS drk,
               |    CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS quartile
               |  FROM events
               |)
               |SELECT user_id, rn, rk, drk, quartile, round(value, 4) AS value
               |FROM ranked WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin)
      ),

      // Analytic family: first/last value frames, percent_rank, cume_dist.
      OracleQuery(
        "w7_analytic_family",
        (s, d) => {
          import s.implicits._
          val wv = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          Tables.events(s, d)
            .withColumn("first_v", round(first($"value").over(wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
            .withColumn("running_last", round(last($"value").over(wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
            .withColumn("pr", round(percent_rank().over(wv), 4))
            .withColumn("cd", round(cume_dist().over(wv), 4))
            .select($"event_id", $"user_id", $"first_v", $"running_last", $"pr", $"cd")
            .orderBy($"user_id", $"event_id")
        },
        Some("""SELECT event_id, user_id,
               |  round(first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS first_v,
               |  round(last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_last,
               |  round(percent_rank() OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS pr,
               |  round(cume_dist() OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS cd
               |FROM events ORDER BY user_id, event_id""".stripMargin)
      ),

      // D1: keyed dedup keep-first (clean_hourly.py:40-62) — row_number
      // over (key) ordered by arrival with explicit tiebreak, keep rn=1.
      OracleQuery(
        "d1_dedup_keepfirst",
        (s, d) => {
          import s.implicits._
          val wk = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
          Tables.events(s, d)
            .withColumn("rn", row_number().over(wk))
            .filter($"rn" === 1)
            .select($"user_id", $"event_type", $"event_id", round($"value", 4).as("value"))
            .orderBy($"user_id", $"event_type")
        },
        Some("""WITH ranked AS (
               |  SELECT user_id, event_type, event_id, value,
               |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
               |  FROM events
               |)
               |SELECT user_id, event_type, event_id, round(value, 4) AS value
               |FROM ranked WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)
      ),

      // W8: per-key recursive EWMA (pandas ewm(alpha, adjust=False)) —
      // routed through ops/Ewma: key-clustered repartition + local sort
      // + one linear mapPartitions pass, the right plan for a linear
      // recurrence no window sum can weight. The oracle replays the
      // recurrence in closed form (y_i = (1-α)^(i-1)·x_1 +
      // α·Σ_{j=2..i} (1-α)^(i-j)·x_j) via a bounded positional
      // self-join — O(n²) per user, fine at oracle scale, which is why
      // the Spark side, not this SQL, is the production spelling.
      OracleQuery(
        "w8_ewma",
        (s, d) => {
          import s.implicits._
          val ev = Tables.events(s, d).filter($"user_id" < 8)
            .select($"user_id", $"ts", $"event_id", $"value")
          graft.ops.Ewma
            .perKey(ev, "user_id", Seq("ts", "event_id"), "value", alpha = 0.3)
            .select($"user_id", $"event_id", round($"ewma", 4).as("ewma"))
            .orderBy($"user_id", $"event_id")
        },
        Some("""WITH pos AS (
               |  SELECT user_id, event_id, value,
               |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               |  FROM events WHERE user_id < 8
               |)
               |SELECT a.user_id, a.event_id,
               |  round(sum(CASE WHEN b.rn = 1 THEN power(0.7, a.rn - 1) * b.value
               |                 ELSE 0.3 * power(0.7, a.rn - b.rn) * b.value END), 4) AS ewma
               |FROM pos a JOIN pos b ON a.user_id = b.user_id AND b.rn <= a.rn
               |GROUP BY a.user_id, a.event_id
               |ORDER BY a.user_id, a.event_id""".stripMargin)
      ),

      // W9: ntile — positional quartiles per user (train-time binning /
      // per-entity cohorting). Same single (user) exchange+sort as any
      // ranking window; both engines assign the extra rows of an uneven
      // split to the earlier tiles, so the unique (ts, event_id) order
      // makes assignment deterministic.
      OracleQuery(
        "w9_ntile_quartiles",
        (s, d) => {
          import s.implicits._
          val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          Tables.events(s, d)
            .withColumn("q", ntile(4).over(w))
            .groupBy($"user_id", $"q")
            // sum, not avg: the inputs sit on a 0.01 grid, so the sum
            // never lands near a 4-decimal round boundary — an avg
            // (sum/16 = …375 exactly) flips on cross-engine ulp drift
            .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
            .orderBy($"user_id", $"q")
        },
        Some("""WITH t AS (
               |  SELECT user_id, value,
               |    ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS q
               |  FROM events
               |)
               |SELECT user_id, q, count(*) AS n, round(sum(value), 4) AS sum_value
               |FROM t GROUP BY user_id, q ORDER BY user_id, q""".stripMargin)
      ),

      // W10: TIME-range trailing window — the frame is "everything in
      // the 24 h before this event", not "the N prior rows": RANGE
      // frames are the only correct spelling when event cadence is
      // irregular (rolling('24h') in the reference's pandas idiom).
      // Ordered on unix_micros(ts) so the frame arithmetic is exact
      // integer microseconds on both engines (the events carry
      // sub-second timestamps; epoch-SECOND ordering would disagree
      // with DuckDB's INTERVAL arithmetic at the boundary).
      // Scale: same single exchange on user_id as every other frame
      // here; RANGE state is bounded by rows-in-24h per key, not by
      // total history.
      OracleQuery(
        "w10_time_range_window",
        (s, d) => {
          import s.implicits._
          val wr = Window.partitionBy("user_id")
            .orderBy(unix_micros($"ts"))
            .rangeBetween(-86400000000L, 0L) // 24 h in microseconds
          Tables.events(s, d)
            .withColumn("n_24h", count(lit(1)).over(wr))
            .withColumn("sum_24h", round(sum($"value").over(wr), 4))
            .select($"event_id", $"user_id", $"n_24h", $"sum_24h")
            .orderBy($"user_id", $"event_id")
        },
        Some("""SELECT event_id, user_id,
               |  count(*) OVER w AS n_24h,
               |  round(sum(value) OVER w, 4) AS sum_24h
               |FROM events
               |WINDOW w AS (PARTITION BY user_id ORDER BY ts
               |  RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
               |ORDER BY user_id, event_id""".stripMargin)
      ),

      // W11: time-weighted average (TWAP) — the irregular-sampling mean
      // a plain avg() gets wrong: each event's value holds until the
      // next event (step interpolation), the day's last value holds to
      // midnight, so sparse-but-long-lived readings carry their true
      // duration. ONE window pass per (user, day) computes each step's
      // holding time in exact integer microseconds (lead − ts; no fp
      // until the final ratio); the weighted sum collapses through a
      // hash agg on the same (user, day) key — one shuffle+sort total,
      // state bounded per key, same plan class as W1.
      OracleQuery(
        "w11_time_weighted_avg",
        (s, d) => {
          import s.implicits._
          val wd = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
          Tables.events(s, d)
            .filter($"user_id" < 40) // partition-key predicate: reaches the scan
            .withColumn("day", date_trunc("day", $"ts"))
            .withColumn("hold_us",
              coalesce(unix_micros(lead($"ts", 1).over(wd)),
                unix_micros($"day" + expr("INTERVAL 1 DAY"))) - unix_micros($"ts"))
            .groupBy($"user_id", $"day")
            .agg(
              count(lit(1)).as("n_events"),
              round(avg($"value"), 4).as("naive_avg"),
              round(sum($"value" * $"hold_us") / sum($"hold_us"), 4).as("twap"))
            .orderBy($"user_id", $"day")
        },
        Some("""WITH stepped AS (
               |  SELECT user_id, date_trunc('day', ts) AS day, value,
               |    coalesce(
               |      epoch_us(lead(ts, 1) OVER (PARTITION BY user_id, date_trunc('day', ts)
               |        ORDER BY ts, event_id)),
               |      epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY)) - epoch_us(ts) AS hold_us
               |  FROM events
               |)
               |SELECT user_id, day, count(*) AS n_events,
               |  round(avg(value), 4) AS naive_avg,
               |  round(sum(value * hold_us) / sum(hold_us), 4) AS twap
               |FROM stepped WHERE user_id < 40
               |GROUP BY user_id, day ORDER BY user_id, day""".stripMargin)
      ),

      // W12: gaps-and-islands — merge each user's 5-minute activity
      // intervals into maximal overlapping runs (the classic "merge
      // overlapping intervals" at scale: uptime stitching, session
      // coverage, sensor-online spans). The island boundary is a
      // running-max-of-end over one per-user window (strictly prior
      // rows, so a row starting inside ANY earlier interval — not just
      // its neighbor — continues the island; the tie goes to "merge"
      // via >=); the island id is the running sum of boundary flags
      // over the SAME window spec, so both functions share one
      // shuffle+sort. Exact integer microseconds throughout; the final
      // per-user rollup is an ordinary hash agg.
      OracleQuery(
        "w12_interval_islands",
        (s, d) => {
          import s.implicits._
          val wu = Window.partitionBy($"user_id").orderBy($"start_us", $"event_id")
          val iv = Tables.events(s, d)
            .select($"user_id", $"event_id", unix_micros($"ts").as("start_us"),
              (unix_micros($"ts") + 300000000L).as("end_us"))
          val islands = iv
            .withColumn("prior_max_end",
              max($"end_us").over(wu.rowsBetween(Window.unboundedPreceding, -1)))
            .withColumn("boundary",
              when($"prior_max_end".isNull || $"start_us" > $"prior_max_end", 1L)
                .otherwise(0L))
            .withColumn("island", sum($"boundary").over(wu))
          islands.groupBy($"user_id", $"island")
            .agg(min($"start_us").as("s_us"), max($"end_us").as("e_us"))
            .groupBy($"user_id")
            .agg(count(lit(1)).as("n_intervals"),
              // integer DIV: exact floor, no double rounding in the way
              expr("sum(e_us - s_us) DIV 1000000").as("covered_sec"))
            .orderBy($"user_id")
        },
        Some("""WITH iv AS (
               |  SELECT user_id, event_id, epoch_us(ts) AS start_us,
               |    epoch_us(ts) + 300000000 AS end_us
               |  FROM events
               |), flagged AS (
               |  SELECT user_id, event_id, start_us, end_us,
               |    CASE WHEN max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, event_id
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               |         OR start_us > max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, event_id
               |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               |      THEN 1 ELSE 0 END AS boundary
               |  FROM iv
               |), isl AS (
               |  SELECT user_id, start_us, end_us,
               |    sum(boundary) OVER (PARTITION BY user_id ORDER BY start_us, event_id
               |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
               |  FROM flagged
               |), merged AS (
               |  SELECT user_id, island, min(start_us) AS s_us, max(end_us) AS e_us
               |  FROM isl GROUP BY user_id, island
               |)
               |SELECT user_id, count(*) AS n_intervals,
               |  CAST(sum(e_us - s_us) // 1000000 AS BIGINT) AS covered_sec
               |FROM merged GROUP BY user_id ORDER BY user_id""".stripMargin)
      ),

      // W13: rolling median / p90 over a bounded row frame — the
      // robust-trend twin of W1's trailing mean (spike-resistant
      // monitoring thresholds, robust feature windows). The frame is
      // the point: an exact percentile over ROWS BETWEEN 29 PRECEDING
      // buffers at most 30 values per row — O(frame) memory, safe at
      // any scale — unlike the whole-group exact percentile family
      // (a8/a16/a17), which buffers the entire group and is sf-pinned
      // with percentile_approx twins. Both quantiles ride the same
      // window spec: one (user_id) exchange, one sort.
      OracleQuery(
        "w13_rolling_median",
        (s, d) => {
          import s.implicits._
          val wf = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
            .rowsBetween(-29, Window.currentRow)
          Tables.events(s, d)
            .filter($"user_id" < 40)
            .select($"user_id", $"event_id", $"ts", $"value")
            .withColumn("med30", round(expr("percentile(value, 0.5)").over(wf), 4))
            .withColumn("p90_30", round(expr("percentile(value, 0.9)").over(wf), 4))
            .select($"user_id", $"event_id", $"med30", $"p90_30")
            .orderBy($"user_id", $"event_id")
        },
        Some("""SELECT user_id, event_id,
               |  round(quantile_cont(value, 0.5) OVER w, 4) AS med30,
               |  round(quantile_cont(value, 0.9) OVER w, 4) AS p90_30
               |FROM events WHERE user_id < 40
               |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               |  ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
               |ORDER BY user_id, event_id""".stripMargin)
      ),

      // W14: gap-fill / resample — the time-series regularization step
      // every downstream window op assumes: project a sparse daily
      // series onto a dense per-key calendar spine and linearly
      // interpolate interior gaps (edges carry the nearest observation).
      // Spine = sequence(min_day, max_day) per key, exploded map-side —
      // no generator shuffle; the carry columns are two IGNORE NULLS
      // window passes (last-before / first-after) over ONE (key)
      // exchange. Interpolation is pure row-local arithmetic on the
      // carried (day, value) pairs. Spine size is O(keys × span-days),
      // independent of the observation count — at 100 TB the spine is
      // the SMALL side of this plan.
      OracleQuery(
        "w14_gap_fill",
        (s, d) => {
          import s.implicits._
          val ev = Tables.events(s, d)
          // sparse series: daily mean, but the "sensor" only reports
          // every third calendar day — structural gaps at every sf
          val daily = ev
            .groupBy($"event_type", to_date($"ts").as("day"))
            .agg(avg($"value").as("v"))
            .filter(dayofmonth($"day") % 3 === 0)
          // dense spine: every key's full [min_day, max_day] calendar
          // (from the unfiltered table, so the fill covers edge gaps too)
          val spine = ev.groupBy($"event_type")
            .agg(min(to_date($"ts")).as("d0"), max(to_date($"ts")).as("d1"))
            .select($"event_type",
              explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
          graft.ops.Resample.dailyLinear(daily,
              "event_type", "day", "v", spine = Some(spine))
            .select($"event_type", $"day".cast("timestamp").as("day"),
              round($"filled", 4).as("filled"), $"observed")
            .orderBy($"event_type", $"day")
        },
        Some("""WITH daily AS (
               |  SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS v
               |  FROM events GROUP BY 1, 2
               |  HAVING CAST(date_part('day', day) AS INT) % 3 = 0
               |), spine AS (
               |  SELECT event_type,
               |    CAST(unnest(generate_series(min(CAST(ts AS DATE)),
               |      max(CAST(ts AS DATE)), INTERVAL 1 DAY)) AS DATE) AS day
               |  FROM events GROUP BY event_type
               |), joined AS (
               |  SELECT s.event_type, s.day, d.v,
               |    last_value(d.v IGNORE NULLS) OVER wp AS pv,
               |    last_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS) OVER wp AS pd,
               |    first_value(d.v IGNORE NULLS) OVER wn AS nv,
               |    first_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS) OVER wn AS nd
               |  FROM spine s LEFT JOIN daily d
               |    ON s.event_type = d.event_type AND s.day = d.day
               |  WINDOW wp AS (PARTITION BY s.event_type ORDER BY s.day
               |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               |  wn AS (PARTITION BY s.event_type ORDER BY s.day
               |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               |)
               |SELECT event_type, day,
               |  round(CASE WHEN v IS NOT NULL THEN v
               |    WHEN pv IS NULL THEN nv
               |    WHEN nv IS NULL THEN pv
               |    ELSE pv + (nv - pv) * date_diff('day', pd, day)
               |      / date_diff('day', pd, nd) END, 4) AS filled,
               |  v IS NOT NULL AS observed
               |FROM joined ORDER BY event_type, day""".stripMargin)
      ),

      // W15: rolling correlation — corr(value, arrival-position) over a
      // trailing 20-row frame per event_type: the local-trend-strength
      // detector (|corr| near 1 = monotone drift, near 0 = noise).
      // corr is a moment aggregate, so each frame is O(1) state in one
      // ordered pass — the row_number and the frame corr share ONE
      // (event_type) exchange. The x-axis is the row position, not raw
      // epoch time: position is a small exact integer, so the stable
      // central-moment update loses nothing to cancellation (epoch-
      // micros at ~1.7e15 would burn half the mantissa before the
      // 20-row variance even forms — same answer in spirit, far worse
      // conditioning). Spark returns NaN on a zero-variance frame where
      // DuckDB returns NULL, so NaN is normalized before rounding;
      // emitted only once the frame is full (rn ≥ 20) — partial-frame
      // correlations would differ by min_periods convention anyway.
      // 4-dp display rounding is spelled floor(c·10⁴ + 0.5)/10⁴ on BOTH
      // engines — pure IEEE ops, bit-deterministic across DuckDB builds
      // (round() disagrees at shortest-repr …5000 boundaries because
      // Spark rounds the decimal string while DuckDB rounds the exact
      // binary; the corr co-moment folds differ in last-ulp between
      // engines, so those boundaries genuinely occur here).
      OracleQuery(
        "w15_rolling_corr",
        (s, d) => {
          import s.implicits._
          val wf = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
          val frame = Window.partitionBy($"event_type").orderBy($"rn")
            .rowsBetween(-19, Window.currentRow)
          // corr spelled as covar/(σ·σ) with an explicit zero-variance
          // guard, NOT corr().over(frame): Spark's Corr evaluates
          // ck / sqrt(xMk·yMk) for n > 1, and a frame whose 20 values
          // are all equal (real at sf1: replicated ties) makes that a
          // divide-by-zero ABORT under ANSI — while DuckDB's corr
          // returns NULL there. The guarded spelling is the same
          // co-moment algebra (identical to fp rounding) and yields
          // null on the degenerate frame, matching the oracle.
          val cov = covar_samp($"value", $"rn".cast("double")).over(frame)
          val sdv = stddev_samp($"value").over(frame)
          val sdr = stddev_samp($"rn".cast("double")).over(frame)
          val c = when(sdv === 0.0 || sdr === 0.0, lit(null))
            .otherwise(cov / (sdv * sdr))
          Tables.events(s, d)
            .withColumn("rn", row_number().over(wf))
            .withColumn("c", c)
            .filter($"rn" >= 20)
            .select($"event_type", $"event_id",
              (floor(when(isnan($"c"), lit(null)).otherwise($"c") * 10000 + 0.5) / 10000)
                .as("trend_corr"))
            .orderBy($"event_type", $"event_id")
        },
        Some("""SELECT event_type, event_id, floor(c * 10000 + 0.5) / 10000 AS trend_corr
               |FROM (
               |  SELECT event_type, event_id, rn,
               |    corr(value, CAST(rn AS DOUBLE)) OVER
               |      (PARTITION BY event_type ORDER BY rn
               |       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS c
               |  FROM (
               |    SELECT event_type, event_id, value,
               |      row_number() OVER (PARTITION BY event_type
               |        ORDER BY ts, event_id) AS rn
               |    FROM events
               |  )
               |)
               |WHERE rn >= 20
               |ORDER BY event_type, event_id""".stripMargin)
      ),

      // W16: seasonal-naive backtest with MASE — the forecasting-eval
      // primitive: score the "same value as 7 days ago" baseline on
      // each key's daily series, scaled by the naive one-step error
      // (MASE = mean|v − v[t−7]| / mean|v[t] − v[t−1]|, Hyndman &
      // Koehler 2006). One daily hash agg, then lag(1)/lag(7) sharing
      // one per-key window spec, then a per-key reduce — the whole
      // backtest is two exchanges regardless of fact size, and adding
      // horizons means adding lag columns, not passes. Scored only on
      // rows where both lags exist, so numerator and denominator cover
      // the same evaluation span.
      OracleQuery(
        "w16_seasonal_mase",
        (s, d) => {
          import s.implicits._
          val daily = Tables.events(s, d)
            .groupBy($"event_type", to_date($"ts").as("day"))
            .agg(avg($"value").as("v"))
          val wd = Window.partitionBy($"event_type").orderBy($"day")
          daily
            .withColumn("l1", lag($"v", 1).over(wd))
            .withColumn("l7", lag($"v", 7).over(wd))
            .filter($"l1".isNotNull && $"l7".isNotNull)
            .groupBy($"event_type")
            .agg(
              round(avg(abs($"v" - $"l7")), 4).as("mae_seasonal"),
              round(avg(abs($"v" - $"l7")) / avg(abs($"v" - $"l1")), 4).as("mase"),
              count(lit(1)).as("n_days"))
            .orderBy($"event_type")
        },
        Some("""WITH daily AS (
               |  SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS v
               |  FROM events GROUP BY 1, 2
               |), lagged AS (
               |  SELECT event_type, v,
               |    lag(v, 1) OVER w AS l1, lag(v, 7) OVER w AS l7
               |  FROM daily
               |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
               |)
               |SELECT event_type,
               |  round(avg(abs(v - l7)), 4) AS mae_seasonal,
               |  round(avg(abs(v - l7)) / avg(abs(v - l1)), 4) AS mase,
               |  count(*) AS n_days
               |FROM lagged WHERE l1 IS NOT NULL AND l7 IS NOT NULL
               |GROUP BY event_type ORDER BY event_type""".stripMargin)
      ),

      // W17: rolling 7-day distinct users per day — the WAU/MAU
      // pattern. COUNT(DISTINCT) is not a window function in either
      // engine, and the naive per-day self-join re-scans the fact once
      // per day. Spark-first spelling: each event explodes map-side
      // into the ≤7 report days its activity covers (the interval-join
      // bin trick pointed at a sliding window), then ONE (day, user)
      // distinct + ONE per-day count — two exchanges total for the
      // whole rolling series, shuffle volume O(events × window/step),
      // independent of the day count. Report days clamp to the
      // observed span so no partial-window edge days are emitted with
      // inflated-looking zeros. The oracle spells the semantics as the
      // day-spine range join.
      OracleQuery(
        "w17_rolling_distinct",
        (s, d) => {
          import s.implicits._
          val ev = Tables.events(s, d)
            .select(to_date($"ts").as("day"), $"user_id")
          val bounds = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
          ev.crossJoin(broadcast(bounds))
            // full windows only (a span under 7 days has no report day,
            // and the guard keeps the clamped sequence ascending)
            .filter(date_add($"d0", 6) <= $"d1")
            // event on day D is visible to report days D .. D+6,
            // clamped to the observed span
            .withColumn("rday", explode(sequence(
              greatest($"day", date_add($"d0", 6)),
              least(date_add($"day", 6), $"d1"))))
            .select($"rday", $"user_id").distinct()
            .groupBy($"rday")
            .agg(countDistinct($"user_id").as("wau"))
            .select($"rday".cast("timestamp").as("rday"), $"wau")
            .orderBy($"rday")
        },
        Some("""WITH ev AS (
               |  SELECT CAST(ts AS DATE) AS day, user_id FROM events
               |), b AS (
               |  SELECT min(day) AS d0, max(day) AS d1 FROM ev
               |), spine AS (
               |  SELECT CAST(unnest(generate_series(d0 + 6, d1, INTERVAL 1 DAY)) AS DATE) AS rday
               |  FROM b
               |)
               |SELECT s.rday, count(DISTINCT e.user_id) AS wau
               |FROM spine s JOIN ev e
               |  ON e.day BETWEEN s.rday - 6 AND s.rday
               |GROUP BY s.rday ORDER BY s.rday""".stripMargin)
      ),

      // W18: behavioral transition matrix — P(next event type | current)
      // per user stream: ONE lead() pass over the (user) exchange pairs
      // each event with its successor, a (from, to) hash agg counts
      // transitions, and the row-normalization joins back the ≤|types|
      // per-source totals (broadcast — the matrix side is tiny however
      // large the fact is). The Markov-chain summary every product-
      // analytics and session-modeling pipeline wants, at two
      // exchanges + one broadcast.
      OracleQuery(
        "w18_event_transitions",
        (s, d) => {
          import s.implicits._
          val wu = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          val pairs = Tables.events(s, d)
            .withColumn("next_type", lead($"event_type", 1).over(wu))
            .filter($"next_type".isNotNull)
            .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
            .agg(count(lit(1)).as("n"))
          val totals = pairs.groupBy($"from_type")
            .agg(sum($"n").as("tot"))
          pairs.join(broadcast(totals), Seq("from_type"))
            .select($"from_type", $"to_type", $"n",
              round($"n" / $"tot", 4).as("p"))
            .orderBy($"from_type", $"to_type")
        },
        Some("""WITH pairs AS (
               |  SELECT event_type AS from_type,
               |    lead(event_type, 1) OVER
               |      (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
               |  FROM events
               |), counted AS (
               |  SELECT from_type, to_type, count(*) AS n
               |  FROM pairs WHERE to_type IS NOT NULL
               |  GROUP BY 1, 2
               |)
               |SELECT from_type, to_type, n,
               |  round(n / sum(n) OVER (PARTITION BY from_type), 4) AS p
               |FROM counted
               |ORDER BY from_type, to_type""".stripMargin)
      ),

      // W19: CUSUM change-point detection on each key's daily metric —
      // the classic drift alarm (Page 1954): standardize the series,
      // then S⁺_t = max(0, S⁺_{t-1} + z_t − k). The recursion is NOT a
      // plain window sum, but it has a closed window form:
      //   S_t = P_t − min(0, min_{j≤t} P_j),  P = prefix sum of (z − k)
      // so the whole detector is one exchange on the key and three
      // window functions sharing the (key ORDER BY day) sort — no
      // mapPartitions recurrence needed (contrast w8_ewma, where the
      // multiplicative decay admits no such prefix trick). k=0.5σ drift
      // allowance, h=4σ alarm threshold — the textbook ARL settings.
      // 100 TB: state is one day-grain row per key — the daily collapse
      // happens first, so the window sort sees |keys|×|days| rows only.
      OracleQuery(
        "w19_cusum_changepoint",
        (s, d) => {
          import s.implicits._
          val daily = Tables.events(s, d)
            .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
            .agg(round(avg($"value"), 4).as("v"))
          val whole = Window.partitionBy($"event_type")
          val run = Window.partitionBy($"event_type").orderBy($"day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          daily
            .withColumn("z", ($"v" - avg($"v").over(whole)) / stddev_samp($"v").over(whole))
            .withColumn("pu", sum($"z" - 0.5).over(run))
            .withColumn("pd", sum(-$"z" - 0.5).over(run))
            .withColumn("s_up", $"pu" - least(lit(0.0), min($"pu").over(run)))
            .withColumn("s_dn", $"pd" - least(lit(0.0), min($"pd").over(run)))
            .select($"event_type", $"day", $"v",
              round($"z", 4).as("zscore"),
              round($"s_up", 4).as("s_up"),
              round($"s_dn", 4).as("s_dn"),
              ($"s_up" > 4.0 || $"s_dn" > 4.0).as("alarm"))
            .orderBy($"event_type", $"day")
        },
        Some("""WITH daily AS (
               |  SELECT event_type, date_trunc('day', ts) AS day,
               |    round(avg(value), 4) AS v
               |  FROM events GROUP BY 1, 2
               |), z AS (
               |  SELECT event_type, day, v,
               |    (v - avg(v) OVER (PARTITION BY event_type)) /
               |      stddev_samp(v) OVER (PARTITION BY event_type) AS z
               |  FROM daily
               |), p AS (
               |  SELECT event_type, day, v, z,
               |    sum(z - 0.5) OVER w AS pu,
               |    sum(-z - 0.5) OVER w AS pd
               |  FROM z
               |  WINDOW w AS (PARTITION BY event_type ORDER BY day
               |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               |), m AS (
               |  SELECT event_type, day, v, z, pu, pd,
               |    min(pu) OVER w AS mu, min(pd) OVER w AS md
               |  FROM p
               |  WINDOW w AS (PARTITION BY event_type ORDER BY day
               |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               |), su AS (
               |  SELECT event_type, day, v, z,
               |    pu - least(0.0, mu) AS s_up, pd - least(0.0, md) AS s_dn
               |  FROM m
               |)
               |SELECT event_type, day, v, round(z, 4) AS zscore,
               |  round(s_up, 4) AS s_up, round(s_dn, 4) AS s_dn,
               |  (s_up > 4.0 OR s_dn > 4.0) AS alarm
               |FROM su ORDER BY event_type, day""".stripMargin)
      ),

      // W20: STL-style seasonal decomposition + anomaly flag on each
      // key's daily series: trend = centered 7-day moving average (only
      // where the frame is full — edges stay null, like statsmodels'
      // two-sided filter), seasonal = day-of-week mean of the detrended
      // remainder, residual = detrended − seasonal, anomaly = |residual|
      // beyond 2 sample-σ of the key's residuals. Everything after the
      // daily collapse is windows over day-grain rows: the trend/rank
      // windows share one (key, day) sort; the seasonal component is a
      // second exchange on (key, dow). The day-of-week label is internal
      // only, so the engines' dow numbering conventions never surface.
      OracleQuery(
        "w20_stl_anomaly",
        (s, d) => {
          import s.implicits._
          val daily = Tables.events(s, d)
            .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
            .agg(round(avg($"value"), 4).as("v"))
          val byDay = Window.partitionBy($"event_type").orderBy($"day")
          val frame = byDay.rowsBetween(-3, 3)
          val season = Window.partitionBy($"event_type", dayofweek($"day"))
          val whole = Window.partitionBy($"event_type")
          daily
            .withColumn("trend",
              when(count($"v").over(frame) === 7, avg($"v").over(frame)))
            .withColumn("detr", $"v" - $"trend")
            .withColumn("seasonal", avg($"detr").over(season))
            .withColumn("resid", $"detr" - $"seasonal")
            .withColumn("sd", stddev_samp($"resid").over(whole))
            .select($"event_type", $"day", $"v",
              round($"trend", 4).as("trend"),
              round($"seasonal", 4).as("seasonal"),
              round($"resid", 4).as("resid"),
              (abs($"resid") > lit(2.0) * $"sd").as("anomaly"))
            .orderBy($"event_type", $"day")
        },
        Some("""WITH daily AS (
               |  SELECT event_type, date_trunc('day', ts) AS day,
               |    round(avg(value), 4) AS v
               |  FROM events GROUP BY 1, 2
               |), t AS (
               |  SELECT event_type, day, v,
               |    CASE WHEN count(v) OVER f = 7 THEN avg(v) OVER f END AS trend
               |  FROM daily
               |  WINDOW f AS (PARTITION BY event_type ORDER BY day
               |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               |), se AS (
               |  SELECT event_type, day, v, trend, v - trend AS detr,
               |    avg(v - trend) OVER (PARTITION BY event_type, dayofweek(day)) AS seasonal
               |  FROM t
               |), r AS (
               |  SELECT event_type, day, v, trend, seasonal, detr - seasonal AS resid
               |  FROM se
               |)
               |SELECT event_type, day, v, round(trend, 4) AS trend,
               |  round(seasonal, 4) AS seasonal, round(resid, 4) AS resid,
               |  (abs(resid) > 2.0 * stddev_samp(resid) OVER (PARTITION BY event_type))
               |    AS anomaly
               |FROM r ORDER BY event_type, day""".stripMargin)
      ),

      // W21: Holt double exponential smoothing (level + linear trend)
      // per key — the forecasting workhorse one notch above EWMA, and
      // the 2-STATE coupled recurrence that separates the recurrence
      // family: CUSUM (w19) had a prefix-min closed form, EWMA (w8) a
      // power-weighted sum, but a coupled vector recurrence admits no
      // window spelling at all — ops/HoltLinear runs it as one key
      // exchange + local sort + a forward fold with two doubles of
      // state (and the Ewma.perKeyBlocked affine-carry decomposition as
      // the giant-key escape, since the step is affine in (l, b)).
      // Day-grain: the daily collapse (decimal-exact sums) runs first,
      // so the fold sees |keys|×|days| rows. The oracle replays the
      // recursion with a RECURSIVE CTE over the row-number axis —
      // identical IEEE expression text in kernel and SQL. α=0.3, β=0.1.
      OracleQuery(
        "w21_holt_linear",
        (s, d) => {
          import s.implicits._
          val daily = Tables.events(s, d)
            .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
            .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("y"))
          // floor(x·10⁴ + 0.5)/10⁴, NOT round(): the smoothed values
          // land arbitrarily (e.g. …65254999…), and Spark's round goes
          // through Double.toString ("….65255" → up) while DuckDB
          // rounds the exact binary (down) — this spelling is pure
          // IEEE, so identical input bits give identical output bits
          def r4(c: org.apache.spark.sql.Column) =
            floor(c * 10000 + 0.5) / 10000
          graft.ops.HoltLinear
            .perKey(daily, "event_type", Seq("day"), "y", alpha = 0.3, beta = 0.1)
            .select($"event_type", $"day", round($"y", 4).as("y"),
              r4($"level").as("level"), r4($"trend").as("trend"),
              r4($"level" + $"trend").as("forecast1"))
            .orderBy($"event_type", $"day")
        },
        Some("""WITH RECURSIVE daily AS (
               |  SELECT event_type, date_trunc('day', ts) AS day,
               |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
               |  FROM events GROUP BY 1, 2
               |), pos AS (
               |  SELECT event_type, day, y,
               |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
               |  FROM daily
               |), rec AS (
               |  SELECT event_type, day, y, rn, y AS l, CAST(0.0 AS DOUBLE) AS b
               |  FROM pos WHERE rn = 1
               |  UNION ALL
               |  -- α/β as DOUBLE literals: a bare 0.3 is DECIMAL here,
               |  -- making (1 - 0.3) exactly 0.7 where the kernel's
               |  -- IEEE 1-0.3 is not — a 4th-decimal flip at day 3
               |  SELECT p.event_type, p.day, p.y, p.rn,
               |    CAST(0.3 AS DOUBLE) * p.y
               |      + (1 - CAST(0.3 AS DOUBLE)) * (r.l + r.b) AS l,
               |    CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * p.y
               |        + (1 - CAST(0.3 AS DOUBLE)) * (r.l + r.b)) - r.l)
               |      + (1 - CAST(0.1 AS DOUBLE)) * r.b AS b
               |  FROM rec r JOIN pos p
               |    ON p.event_type = r.event_type AND p.rn = r.rn + 1
               |)
               |SELECT event_type, day, round(y, 4) AS y,
               |  floor(l * 10000 + 0.5) / 10000 AS level,
               |  floor(b * 10000 + 0.5) / 10000 AS trend,
               |  floor((l + b) * 10000 + 0.5) / 10000 AS forecast1
               |FROM rec ORDER BY event_type, day""".stripMargin)
      ),

      // W22: rolling maximum drawdown per key — the risk/health metric
      // for any monotone-hoped series (revenue, throughput, model
      // score): dd_t = (peak_t − y_t)/peak_t against the running peak,
      // and the worst drawdown so far. Pure running-max windows — one
      // key exchange + sort shared by all three window functions, no
      // recurrence (contrast w21: max composes, coupled smoothing does
      // not). Day-grain decimal-exact sums; peak is an exact max;
      // drawdowns are IEEE divisions rounded by the floor(x·10⁴+0.5)
      // spelling since their values land arbitrarily.
      OracleQuery(
        "w22_max_drawdown",
        (s, d) => {
          import s.implicits._
          def r4(c: org.apache.spark.sql.Column) =
            floor(c * 10000 + 0.5) / 10000
          val run = Window.partitionBy($"event_type").orderBy($"day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          Tables.events(s, d)
            .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
            .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("y"))
            .withColumn("peak", max($"y").over(run))
            .withColumn("dd", ($"peak" - $"y") / $"peak")
            .withColumn("max_dd", max($"dd").over(run))
            .select($"event_type", $"day", round($"y", 4).as("y"),
              round($"peak", 4).as("peak"),
              r4($"dd").as("dd"), r4($"max_dd").as("max_dd"))
            .orderBy($"event_type", $"day")
        },
        Some("""WITH daily AS (
               |  SELECT event_type, date_trunc('day', ts) AS day,
               |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
               |  FROM events GROUP BY 1, 2
               |), runs AS (
               |  SELECT event_type, day, y,
               |    max(y) OVER w AS peak
               |  FROM daily
               |  WINDOW w AS (PARTITION BY event_type ORDER BY day
               |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               |), dds AS (
               |  SELECT event_type, day, y, peak, (peak - y) / peak AS dd,
               |    max((peak - y) / peak) OVER (PARTITION BY event_type ORDER BY day
               |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_dd
               |  FROM runs
               |)
               |SELECT event_type, day, round(y, 4) AS y, round(peak, 4) AS peak,
               |  floor(dd * 10000 + 0.5) / 10000 AS dd,
               |  floor(max_dd * 10000 + 0.5) / 10000 AS max_dd
               |FROM dds ORDER BY event_type, day""".stripMargin)
      ),

      // W23: Holt one-step-ahead backtest vs the seasonal-naive
      // baseline — the honest question about any smoother: does its
      // forecast beat lag-7 copying? Forecast for day t is level+trend
      // at t−1 (strictly out-of-sample: one lag() on the w21 frame),
      // scored MAE against realized y wherever BOTH predictors exist
      // (identical eval span, so the comparison is apples-to-apples);
      // the seasonal-naive error reuses the same frame's lag(7). The
      // fold costs what w21 costs; the backtest adds one window pass
      // and a per-key reduce. Absolute errors are DECIMAL-cast so the
      // MAE sums are summation-order-exact; the ratio is one division
      // on those exact-derived doubles.
      OracleQuery(
        "w23_holt_backtest",
        (s, d) => {
          import s.implicits._
          val daily = Tables.events(s, d)
            .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
            .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("y"))
          val w = Window.partitionBy($"event_type").orderBy($"day")
          val fitted = graft.ops.HoltLinear
            .perKey(daily, "event_type", Seq("day"), "y", alpha = 0.3, beta = 0.1)
            .withColumn("fc_holt", lag($"level" + $"trend", 1).over(w))
            .withColumn("fc_snaive", lag($"y", 7).over(w))
            .filter($"fc_holt".isNotNull && $"fc_snaive".isNotNull)
          fitted.groupBy($"event_type")
            .agg(
              count(lit(1)).as("n_eval"),
              (sum(abs($"y" - $"fc_holt").cast("decimal(28,10)")).cast("double")
                / count(lit(1))).as("mh"),
              (sum(abs($"y" - $"fc_snaive").cast("decimal(28,10)")).cast("double")
                / count(lit(1))).as("ms"))
            .select($"event_type", $"n_eval",
              round($"mh", 4).as("mae_holt"),
              round($"ms", 4).as("mae_snaive"),
              round($"mh" / $"ms", 4).as("mae_ratio"))
            .orderBy($"event_type")
        },
        Some("""WITH RECURSIVE daily AS (
               |  SELECT event_type, date_trunc('day', ts) AS day,
               |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
               |  FROM events GROUP BY 1, 2
               |), pos AS (
               |  SELECT event_type, day, y,
               |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
               |  FROM daily
               |), rec AS (
               |  SELECT event_type, day, y, rn, y AS l, CAST(0.0 AS DOUBLE) AS b
               |  FROM pos WHERE rn = 1
               |  UNION ALL
               |  SELECT p.event_type, p.day, p.y, p.rn,
               |    CAST(0.3 AS DOUBLE) * p.y
               |      + (1 - CAST(0.3 AS DOUBLE)) * (r.l + r.b) AS l,
               |    CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * p.y
               |        + (1 - CAST(0.3 AS DOUBLE)) * (r.l + r.b)) - r.l)
               |      + (1 - CAST(0.1 AS DOUBLE)) * r.b AS b
               |  FROM rec r JOIN pos p
               |    ON p.event_type = r.event_type AND p.rn = r.rn + 1
               |), lagged AS (
               |  SELECT event_type, day, y,
               |    lag(l + b, 1) OVER w AS fc_holt,
               |    lag(y, 7) OVER w AS fc_snaive
               |  FROM rec
               |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
               |), scored AS (
               |  SELECT event_type, count(*) AS n_eval,
               |    CAST(sum(CAST(abs(y - fc_holt) AS DECIMAL(28,10))) AS DOUBLE)
               |      / count(*) AS mh,
               |    CAST(sum(CAST(abs(y - fc_snaive) AS DECIMAL(28,10))) AS DOUBLE)
               |      / count(*) AS ms
               |  FROM lagged
               |  WHERE fc_holt IS NOT NULL AND fc_snaive IS NOT NULL
               |  GROUP BY event_type
               |)
               |SELECT event_type, CAST(n_eval AS BIGINT) AS n_eval,
               |  round(mh, 4) AS mae_holt, round(ms, 4) AS mae_snaive,
               |  round(mh / ms, 4) AS mae_ratio
               |FROM scored ORDER BY event_type""".stripMargin)
      ),

      // W24: lead–lag cross-correlation — which daily series LEADS
      // which (does signup activity today predict purchases in k
      // days?): for every ordered pair of event types and every lag in
      // [-3, 3], corr(a(t), b(t + lag)) over the aligned day range.
      // Scale shape: the fact collapses to the day grain FIRST (one
      // hash agg — the pair analysis never touches fact rows), then
      // the lag alignment is a self-join of the tiny daily frame on
      // the day key shifted by each lag (explode over 7 lags — a
      // bounded map-side fan-out), and each (pair, lag) correlation is
      // one moment aggregate over ≤31 aligned rows. Output is keyed by
      // (a, b, lag) — a pure key order, so no value-ordering
      // fragility; corr co-moments differ in last-ulp between engines,
      // so display rounding is the build-proof floor spelling (the w15
      // recipe), with NaN (zero-variance alignment) normalized to NULL
      // on both sides.
      OracleQuery(
        "w24_lead_lag",
        (s, d) => {
          import s.implicits._
          val daily = Tables.events(s, d)
            .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
            .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("v"))
          val a = daily.select($"event_type".as("a"), $"day", $"v".as("va"))
            // row-local lag fan-out: explode(sequence) keeps the ×7
            // entirely map-side (a crossJoin of a 7-row range would
            // plan as a broadcast nested-loop — same rows, one more
            // broadcast than needed)
            .withColumn("lag", explode(sequence(lit(-3), lit(3))))
          val b = daily.select($"event_type".as("b"),
            $"day".as("bday"), $"v".as("vb"))
          val c = corr($"va", $"vb")
          a.join(b, $"bday" === expr("day + make_interval(0, 0, 0, lag)")
              && $"a" =!= $"b")
            .groupBy($"a", $"b", $"lag")
            .agg(count(lit(1)).as("n_days"), c.as("c"))
            .select($"a", $"b", $"lag", $"n_days",
              (floor(when(isnan($"c"), lit(null)).otherwise($"c") * 10000 + 0.5)
                / 10000).as("xcorr"))
            .orderBy($"a", $"b", $"lag")
        },
        Some("""WITH daily AS (
               |  SELECT event_type, date_trunc('day', ts) AS day,
               |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
               |  FROM events GROUP BY 1, 2
               |), lags AS (SELECT unnest(generate_series(-3, 3)) AS lag)
               |SELECT a.event_type AS a, b.event_type AS b, CAST(l.lag AS INT) AS lag,
               |  count(*) AS n_days,
               |  floor(corr(a.v, b.v) * 10000 + 0.5) / 10000 AS xcorr
               |FROM daily a
               |CROSS JOIN lags l
               |JOIN daily b ON b.day = a.day + to_days(CAST(l.lag AS INTEGER))
               |  AND a.event_type <> b.event_type
               |GROUP BY 1, 2, 3
               |ORDER BY a, b, lag""".stripMargin)
      ),

      // W25: per-key local-level Kalman filter (ops/KalmanLevel) — the
      // adaptive-gain member of the smoothing family: w8's EWMA takes a
      // fixed α on faith, the Kalman recursion DERIVES the per-step
      // gain from stated noise variances (q = level drift, r = obs
      // noise) and converges to the steady-state gain — early
      // observations move the level more while uncertainty is high,
      // exactly what a cold-start metric series needs. Same scale shape
      // as w21 (one key exchange + local sort + 2-double state fold);
      // the oracle replays the identical IEEE recursion as a recursive
      // CTE (q=0.5, r=4.0 are dyadic, so the literals are exact in both
      // engines); gains are data-independent so the gain column doubles
      // as a convergence probe.
      OracleQuery(
        "w25_kalman_level",
        (s, d) => {
          import s.implicits._
          def r4(c: org.apache.spark.sql.Column) =
            floor(c * 10000 + 0.5) / 10000
          // null values are filtered BEFORE the day aggregate (not
          // inside the fold): an all-null day would make the oracle's
          // recursion propagate NULL into x/p forever where the kernel
          // skips-and-continues — filtering upstream keeps y non-null
          // and the two spellings identical on every input
          val daily = Tables.events(s, d).filter($"value".isNotNull)
            .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
            .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("y"))
          graft.ops.KalmanLevel
            .perKey(daily, "event_type", Seq("day"), "y", q = 0.5, r = 4.0)
            .select($"event_type", $"day", round($"y", 4).as("y"),
              r4($"level").as("level"), r4($"gain").as("gain"),
              r4($"variance").as("variance"))
            .orderBy($"event_type", $"day")
        },
        Some(kalmanLevelOracle)
      )
    )
  }
}

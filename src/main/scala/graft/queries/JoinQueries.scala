package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Parity, Tables}

/** Join operators — SURVEY §2.5 J1–J4, plus the semi/anti/outer shapes a
  * complete engine needs.
  *
  * Scale notes: dimension joins (nation/region/supplier) carry explicit
  * broadcast() hints — at 100 TB the fact side never shuffles for them.
  * Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE handles
  * skew. Aggregations after joins keep partial (map-side) combine.
  */
object JoinQueries {

  def all: Seq[OracleQuery] = Seq(
    // J1/J2: the forecast↔truth inner equi-join shape
    // (features/build_train_daily_tmax.py:27-94) — fact⋈fact on key,
    // residual-style derived column, aggregate.
    OracleQuery(
      "j1_inner_equijoin",
      (s, d) => {
        import s.implicits._
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        ord.join(cust, $"o_custkey" === $"c_custkey", "inner")
          .groupBy($"c_mktsegment")
          .agg(
            count(lit(1)).as("cnt"),
            round(sum($"o_totalprice"), 4).as("sum_price"),
            round(avg($"o_totalprice" - $"c_acctbal"), 4).as("avg_residual"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS cnt,
             |  round(sum(o_totalprice), 4) AS sum_price,
             |  round(avg(o_totalprice - c_acctbal), 4) AS avg_residual
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    ),

    // J3: dimension lookup via explicit broadcast (stations.csv dict →
    // broadcast join; noaa_hourly.py:60-87).
    OracleQuery(
      "j3_dim_broadcast",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val nat = broadcast(Tables.nation(s, d))
        val reg = broadcast(Tables.region(s, d))
        cust
          .join(nat, $"c_nationkey" === $"n_nationkey")
          .join(reg, $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(count(lit(1)).as("cnt"), round(avg($"c_acctbal"), 4).as("avg_bal"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name, count(*) AS cnt, round(avg(c_acctbal), 4) AS avg_bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)
    ),

    // J4: range-bucket assignment (lead_hours → sigma bucket [lo,hi);
    // eval/uncertainty.py:160-165) as a small when-chain.
    OracleQuery(
      "j4_range_bucket",
      (s, d) => {
        import s.implicits._
        val q = $"l_quantity"
        Tables.lineitem(s, d)
          .withColumn("bucket",
            when(q >= 0 && q < 10, "[0,10)")
              .when(q >= 10 && q < 25, "[10,25)")
              .when(q >= 25 && q < 40, "[25,40)")
              .otherwise("[40,inf)"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("cnt"), round(avg($"l_extendedprice"), 4).as("avg_price"))
          .orderBy($"bucket")
      },
      Some("""SELECT CASE WHEN l_quantity >= 0 AND l_quantity < 10 THEN '[0,10)'
             |            WHEN l_quantity >= 10 AND l_quantity < 25 THEN '[10,25)'
             |            WHEN l_quantity >= 25 AND l_quantity < 40 THEN '[25,40)'
             |            ELSE '[40,inf)' END AS bucket,
             |  count(*) AS cnt, round(avg(l_extendedprice), 4) AS avg_price
             |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin)
    ),

    // Multi-way fact join (TPC-H Q3 shape): filter → join → join → agg →
    // top-k. Exercises join reordering + pushdown through joins.
    OracleQuery(
      "j5_multiway_topk",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        val ord = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        cust.join(ord, $"c_custkey" === $"o_custkey")
          .join(li, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderkey", $"o_orderdate")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_orderdate,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
    ),

    // Left semi + anti join: customers with / without orders.
    OracleQuery(
      "j6_semi_anti",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d).select($"o_custkey")
        val withOrders = cust.join(ord, $"c_custkey" === $"o_custkey", "left_semi")
          .agg(count(lit(1)).as("c")).select($"c".as("n_with_orders"))
        val withoutOrders = cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
          .agg(count(lit(1)).as("c")).select($"c".as("n_without_orders"))
        withOrders.crossJoin(withoutOrders)
      },
      Some("""SELECT
             |  (SELECT count(*) FROM customer WHERE EXISTS
             |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
             |  (SELECT count(*) FROM customer WHERE NOT EXISTS
             |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders""".stripMargin)
    ),

    // As-of join (graft.ops.AsofJoin): each error event picks up the
    // most recent purchase by the same user at or before its timestamp —
    // union-and-carry window implementation (one shuffle, bounded state)
    // vs DuckDB's native ASOF JOIN as the oracle.
    OracleQuery(
      "j8_asof_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val errors = ev.filter($"event_type" === "error")
        val purchases = ev.filter($"event_type" === "purchase")
        graft.ops.AsofJoin(errors, purchases,
            keyCols = Seq("user_id"), tsCol = "ts", payload = Seq("value"))
          .select($"event_id", $"user_id", round($"asof_value", 4).as("asof_value"))
          .orderBy($"event_id")
      },
      Some("""WITH errors AS (SELECT * FROM events WHERE event_type = 'error'),
             |purchases AS (SELECT * FROM events WHERE event_type = 'purchase')
             |SELECT e.event_id, e.user_id, round(p.value, 4) AS asof_value
             |FROM errors e ASOF LEFT JOIN purchases p
             |  ON e.user_id = p.user_id AND e.ts >= p.ts
             |ORDER BY e.event_id""".stripMargin)
    ),

    // Native as-of join (graft.plans.AsofJoinNative): the same
    // most-recent-purchase alignment as j8, but through the custom
    // whole-operator path — AsofJoinPlan logical node, planner strategy,
    // AsofJoinExec sort-merge with O(1) per-key state — instead of the
    // union-and-carry window. Same oracle (DuckDB native ASOF LEFT
    // JOIN); AsofJoinNativeSpec additionally pins equivalence with the
    // composed spelling and the two-exchange physical plan.
    OracleQuery(
      "j10_asof_native",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val errors = ev.filter($"event_type" === "error")
        val purchases = ev.filter($"event_type" === "purchase")
        graft.plans.AsofJoinNative(errors, purchases,
            keyCols = Seq("user_id"), leftTsCol = "ts", rightTsCol = "ts")
          .select($"event_id", $"user_id", round($"value_r", 4).as("asof_value"))
          .orderBy($"event_id")
      },
      Some("""WITH errors AS (SELECT * FROM events WHERE event_type = 'error'),
             |purchases AS (SELECT * FROM events WHERE event_type = 'purchase')
             |SELECT e.event_id, e.user_id, round(p.value, 4) AS asof_value
             |FROM errors e ASOF LEFT JOIN purchases p
             |  ON e.user_id = p.user_id AND e.ts >= p.ts
             |ORDER BY e.event_id""".stripMargin)
    ),

    // Left outer join with null-aware aggregation: order count per
    // customer including zero-order customers.
    OracleQuery(
      "j7_left_outer",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
        cust.join(ord, $"c_custkey" === $"o_custkey", "left_outer")
          .groupBy($"c_custkey")
          .agg(
            count($"o_orderkey").as("n_orders"),
            round(coalesce(sum($"o_totalprice"), lit(0.0)), 4).as("sum_price"))
          .groupBy($"n_orders")
          .agg(count(lit(1)).as("n_customers"), round(sum($"sum_price"), 4).as("total_price"))
          .orderBy($"n_orders")
      },
      Some("""WITH per_cust AS (
             |  SELECT c_custkey, count(o_orderkey) AS n_orders,
             |    round(coalesce(sum(o_totalprice), 0.0), 4) AS sum_price
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey
             |)
             |SELECT n_orders, count(*) AS n_customers,
             |  round(sum(sum_price), 4) AS total_price
             |FROM per_cust GROUP BY n_orders ORDER BY n_orders""".stripMargin)
    ),

    // True range join: point-in-interval — each lineitem row lands in the
    // calendar quarter whose [start, end) contains its ship timestamp.
    // Physical shape: intervals are bucketed by a coarse equi-key (the
    // year they fall in), so the join is a BROADCAST HASH join on year
    // with the range predicate as a residual filter — each fact row
    // probes one hash bucket and checks ≤4 intervals, instead of a
    // nested-loop over all 28 (measured 4× at sf0.1; the gap widens
    // with the interval count). Intervals spanning bucket boundaries
    // would be replicated into each overlapped bucket — quarters never
    // span years, so here it's one row per bucket. The fact side never
    // shuffles. Decimal sums keep the result order-independent.
    OracleQuery(
      "j9_range_join",
      (s, d) => {
        import s.implicits._
        val quarters = (1995 to 2001).flatMap { y =>
          (1 to 4).map { q =>
            val startM = (q - 1) * 3 + 1
            val (endY, endM) = if (q == 4) (y + 1, 1) else (y, q * 3 + 1)
            (s"${y}Q$q", y,
              java.sql.Timestamp.valueOf(f"$y-$startM%02d-01 00:00:00"),
              java.sql.Timestamp.valueOf(f"$endY-$endM%02d-01 00:00:00"))
          }
        }.toDF("quarter", "q_year", "q_start", "q_end")
        Tables.lineitem(s, d)
          .join(broadcast(quarters),
            year($"l_shipdate") === $"q_year" &&
              $"l_shipdate" >= $"q_start" && $"l_shipdate" < $"q_end")
          .groupBy($"quarter")
          .agg(
            count(lit(1)).as("n"),
            round(sum($"l_quantity".cast("decimal(25,8)")).cast("double"), 4).as("sum_qty"))
          .orderBy($"quarter")
      },
      Some("""WITH quarters AS (
             |  SELECT CAST(y AS VARCHAR) || 'Q' || CAST(q AS VARCHAR) AS quarter,
             |    make_date(y, (q - 1) * 3 + 1, 1)::TIMESTAMP AS q_start,
             |    (CASE WHEN q = 4 THEN make_date(y + 1, 1, 1)
             |          ELSE make_date(y, q * 3 + 1, 1) END)::TIMESTAMP AS q_end
             |  FROM (SELECT unnest(generate_series(1995, 2001)) AS y) ys
             |  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS q) qs
             |)
             |SELECT quarter, count(*) AS n,
             |  round(CAST(sum(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE), 4) AS sum_qty
             |FROM lineitem JOIN quarters
             |  ON l_shipdate >= q_start AND l_shipdate < q_end
             |GROUP BY quarter ORDER BY quarter""".stripMargin)
    ),

    // Sketch-driven skew join (ops/SkewJoin): a synthetic hot key (every
    // user below 30 collapses to key 0 — ~2% of users, ~2% of rows on
    // one key) joins a derived dimension. A Count-Min pass over the
    // fact finds the hot keys, the dimension's HOT SLICE broadcasts,
    // cold keys take the ordinary shuffle join — physically split,
    // semantically the plain inner join, which is exactly what the
    // oracle states (regime equality is the checked property; the
    // broadcast+shuffle plan split is pinned in SkewJoinSpec).
    OracleQuery(
      "j11_skew_join",
      (s, d) => {
        import s.implicits._
        val fact = Tables.events(s, d)
          .withColumn("k", when($"user_id" < 30, 0L).otherwise($"user_id"))
        val dim = fact.select($"k").distinct()
          .withColumn("label", concat(lit("u"), $"k"))
        graft.ops.SkewJoin.inner(fact, dim, "k", hotThreshold = 500)
          .groupBy($"k", $"label")
          .agg(count(lit(1)).as("n"),
            round(sum($"value"), 4).as("sum_value"))
          .orderBy($"k")
      },
      Some("""WITH fact AS (
             |  SELECT CASE WHEN user_id < 30 THEN 0 ELSE user_id END AS k, value
             |  FROM events
             |), dim AS (
             |  SELECT DISTINCT k, 'u' || CAST(k AS VARCHAR) AS label FROM fact
             |)
             |SELECT f.k, d.label, count(*) AS n, round(sum(f.value), 4) AS sum_value
             |FROM fact f JOIN dim d ON f.k = d.k
             |GROUP BY f.k, d.label ORDER BY f.k""".stripMargin)
    ),

    // Salted skew join, left-outer, with a PRE-BUILT sketch: the
    // one-scan/one-shuffle spelling of j11 — the fact-key Count-Min
    // rides in from a prior stage (built once here, as that stage
    // would), hot keys spread across 8 salted reducers while hot dim
    // rows replicate 8×, and the fact source appears in the plan
    // exactly once (pinned in SkewJoinSpec). The dimension drops every
    // fifth key so the left-outer's null-extension is hash-checked
    // (labels coalesce to 'none' — Spark and DuckDB order nulls
    // differently, values must not rely on null ordering).
    OracleQuery(
      "j12_skew_join_salted",
      (s, d) => {
        import s.implicits._
        val fact = Tables.events(s, d)
          .withColumn("k", when($"user_id" < 30, 0L).otherwise($"user_id"))
        val dim = fact.select($"k").distinct()
          .filter($"k" % 5 =!= 3)
          .withColumn("label", concat(lit("u"), $"k"))
        val cms = graft.ops.SkewJoin.sketch(fact, "k")
        graft.ops.SkewJoin
          .leftOuterSalted(fact, dim, "k", hotThreshold = 500, nSalts = 8,
            cms = Some(cms))
          .groupBy($"k", coalesce($"label", lit("none")).as("label"))
          .agg(count(lit(1)).as("n"),
            round(sum($"value"), 4).as("sum_value"))
          .orderBy($"k")
      },
      Some("""WITH fact AS (
             |  SELECT CASE WHEN user_id < 30 THEN 0 ELSE user_id END AS k, value
             |  FROM events
             |), dim AS (
             |  SELECT DISTINCT k, 'u' || CAST(k AS VARCHAR) AS label FROM fact
             |  WHERE k % 5 != 3
             |)
             |SELECT f.k, coalesce(d.label, 'none') AS label,
             |  count(*) AS n, round(sum(f.value), 4) AS sum_value
             |FROM fact f LEFT JOIN dim d ON f.k = d.k
             |GROUP BY f.k, coalesce(d.label, 'none') ORDER BY f.k""".stripMargin)
    ),

    // J13: full-outer reconciliation — both sides filtered so each has
    // keys the other lacks (the ledger-diff shape: which snapshot rows
    // vanished, which feed rows are new). Shuffles on the join key like
    // any fact⋈fact equi-join; the three-way disposition then collapses
    // map-side into a 1-row aggregate. At scale full outer preserves the
    // shuffle partitioning, so the disposition agg adds no extra
    // exchange.
    OracleQuery(
      "j13_full_outer",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
          .filter($"c_acctbal" > 5000).select($"c_custkey", $"c_acctbal")
        val big = Tables.orders(s, d)
          .filter($"o_totalprice" > 150000)
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_big"), sum($"o_totalprice").as("sum_big"))
        cust.join(big, $"c_custkey" === $"o_custkey", "full_outer")
          .agg(
            sum(when($"c_custkey".isNotNull && $"o_custkey".isNotNull, 1).otherwise(0))
              .cast("long").as("n_both"),
            sum(when($"o_custkey".isNull, 1).otherwise(0)).cast("long").as("n_cust_only"),
            sum(when($"c_custkey".isNull, 1).otherwise(0)).cast("long").as("n_orders_only"),
            round(sum(when($"c_custkey".isNull, $"sum_big")), 4).as("unmatched_value"))
      },
      Some("""WITH cust AS (
             |  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000
             |), big AS (
             |  SELECT o_custkey, count(*) AS n_big, sum(o_totalprice) AS sum_big
             |  FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey
             |)
             |SELECT
             |  CAST(sum(CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
             |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cust_only,
             |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orders_only,
             |  round(sum(CASE WHEN c_custkey IS NULL THEN sum_big END), 4) AS unmatched_value
             |FROM cust FULL OUTER JOIN big ON c_custkey = o_custkey""".stripMargin)
    ),

    // TPC-H Q5 shape (local supplier volume): a SIX-way join where the
    // two dim chains (customer→nation→region and supplier→nation) must
    // agree on the nation — the classic join-order stress test. The
    // year filter is pushed to the orders scan; nation/region (25 and
    // 5 rows at any sf) broadcast so the fact side never shuffles for
    // them; the c_nationkey = s_nationkey condition rides the
    // lineitem⋈supplier equi-join rather than a post-join filter of a
    // wider intermediate. One hash aggregate on n_name ends the plan.
    OracleQuery(
      "j14_tpch_q5",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("date") &&
            $"o_orderdate" < lit("1997-01-01").cast("date"))
        val li = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d)
        val nat = Tables.nation(s, d)
        val reg = Tables.region(s, d).filter($"r_name" === "ASIA")
        cust.join(ord, $"c_custkey" === $"o_custkey")
          .join(li, $"o_orderkey" === $"l_orderkey")
          .join(sup, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some(tpchQ5Oracle)
    ),

    // TPC-H Q10 shape (returned-item reporting): fact⋈fact⋈dim⋈dim with
    // a selective lineitem-side predicate (returnflag = 'R'), grouped by
    // the full customer tuple, top-20 by lost revenue. The returnflag
    // filter reaches the lineitem scan (PushedFilters), nation
    // broadcasts, and the final top-k is TakeOrderedAndProject — no
    // global sort materializes.
    OracleQuery(
      "j15_tpch_q10",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-10-01").cast("date") &&
            $"o_orderdate" < lit("1997-01-01").cast("date"))
        val li = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
        val nat = Tables.nation(s, d)
        cust.join(ord, $"c_custkey" === $"o_custkey")
          .join(li, $"o_orderkey" === $"l_orderkey")
          .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= DATE '1996-10-01'
             |  AND o_orderdate < DATE '1997-01-01'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
    ),

    // J16: TPC-H Q17 shape — a CORRELATED scalar subquery ("lineitems
    // below 20% of this part's average quantity"), decorrelated by hand
    // into a grouped aggregate + equi-join: the per-part avg is computed
    // ONCE over the semi-joined lineitem subset, then broadcast back.
    // Spark's own subquery decorrelation produces the same two-scan
    // plan from the SQL spelling; writing the decorrelated form in the
    // DataFrame API keeps the join explicitly broadcast (the per-part
    // aggregate is |parts-in-brand| rows — tiny — while lineitem is the
    // 100 TB side, which must never be the build side).
    OracleQuery(
      "j16_tpch_q17",
      (s, d) => {
        import s.implicits._
        val parts = Tables.part(s, d)
          .filter($"p_brand" === "Brand#23" && $"p_size" <= 15)
          .select($"p_partkey")
        val li = Tables.lineitem(s, d)
          .join(broadcast(parts), $"l_partkey" === $"p_partkey")
        val avgQty = li.groupBy($"l_partkey".as("ap_partkey"))
          .agg((avg($"l_quantity") * 0.2).as("qty_cut"))
        li.join(broadcast(avgQty), $"l_partkey" === $"ap_partkey")
          .filter($"l_quantity" < $"qty_cut")
          .agg(round(sum($"l_extendedprice") / 7.0, 4).as("avg_yearly"))
          .select(coalesce($"avg_yearly", lit(0.0)).as("avg_yearly"))
      },
      Some("""SELECT coalesce(round(sum(l_extendedprice) / 7.0, 4), 0.0) AS avg_yearly
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#23' AND p_size <= 15
             |  AND l_quantity < (
             |    SELECT 0.2 * avg(l_quantity) FROM lineitem WHERE l_partkey = p_partkey
             |  )""".stripMargin)
    ),

    // TPC-H Q18 (large-volume customers): the HAVING-filtered aggregate
    // becomes the driver of the whole plan. The per-order quantity sum is
    // ONE hash aggregation over lineitem (map-side partial — the shuffle
    // carries one row per (mapper, orderkey)); the >300 filter leaves
    // ~0.1% of orders, so the surviving aggregate — which already carries
    // sum_qty, making a second lineitem pass unnecessary — is broadcast
    // into orders, and that tiny join result is broadcast again into
    // customer. At 100 TB: lineitem is scanned exactly once, and neither
    // orders nor customer ever shuffles. The canonical SQL's
    // `o_orderkey IN (subquery)` + re-join-lineitem spelling would scan
    // lineitem twice; the DataFrame spelling fuses the semi-join and the
    // final sum into the same aggregate.
    OracleQuery(
      "j17_tpch_q18",
      (s, d) => {
        import s.implicits._
        val bigOrders = Tables.lineitem(s, d)
          .groupBy($"l_orderkey")
          .agg(sum($"l_quantity").as("sum_qty"))
          .filter($"sum_qty" > 300)
        val hotOrders = Tables.orders(s, d)
          .join(broadcast(bigOrders), $"o_orderkey" === $"l_orderkey")
        Tables.customer(s, d)
          .join(broadcast(hotOrders), $"o_custkey" === $"c_custkey")
          .select($"c_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice",
            round($"sum_qty", 4).as("sum_qty"))
          .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
          .limit(100)
      },
      Some("""SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  round(sum(l_quantity), 4) AS sum_qty
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
             |HAVING sum(l_quantity) > 300
             |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
             |LIMIT 100""".stripMargin)
    ),

    // TPC-H Q6 (forecast revenue change): the degenerate-but-diagnostic
    // shape — a single scan whose THREE selective predicates must ALL
    // reach the parquet reader (shipdate year, discount band, quantity
    // cap) and whose projection must prune to the two arithmetic
    // columns. No joins, no window: if this query reads more than
    // (l_shipdate, l_discount, l_quantity, l_extendedprice) or scans a
    // row group outside 1996, the pushdown layer regressed — PlanSpec
    // asserts both.
    OracleQuery(
      "j19_tpch_q6",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
            $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
          .agg(round(sum($"l_extendedprice" * $"l_discount"), 4).as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)
    ),

    // TPC-H Q14 (promotion effect): conditional aggregation over a
    // broadcast dimension join — the month's promo revenue share. The
    // part dimension broadcasts (it is the small side even at TPC-H
    // scale ratios), the shipdate month prunes the fact scan, and the
    // CASE folds into the same single hash aggregate — one scan, zero
    // fact shuffles.
    OracleQuery(
      "j20_tpch_q14",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
            $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
        li.join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
          .agg(round(
            sum(when($"p_type" === "PROMO", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
              .otherwise(0.0)) * 100.0 /
              sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
            .as("promo_revenue_pct"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT round(
             |    100.0 * sum(CASE WHEN p_type = 'PROMO'
             |                     THEN l_extendedprice * (1.0 - l_discount)
             |                     ELSE 0.0 END)
             |    / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue_pct,
             |  count(*) AS n_rows
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin)
    ),

    // J18: runtime Bloom-filter join pruning — the semi-join-reduction
    // pattern for fact⋈dim joins where the dim's key set is too big to
    // broadcast as a hash set but its Bloom image (~1 byte/key,
    // ops/Bloom) still fits. The fact side is pruned MAP-SIDE before
    // its shuffle: only lineitems whose order key might match ship to
    // the exchange, so at 100 TB the join's shuffle volume tracks the
    // dim's selectivity instead of the fact's size. False positives
    // cost one shuffled row each and are cleared by the exact join;
    // false negatives cannot happen, so the result is IDENTICAL to the
    // plain join — which is exactly what the oracle runs. (Spark's own
    // spark.sql.optimizer.runtimeFilter does this adaptively; spelling
    // it explicitly keeps the filter size and hash under test and
    // makes the pattern available to CLI pipelines on any plan.)
    OracleQuery(
      "j18_bloom_pruned_join",
      (s, d) => {
        import s.implicits._
        val mBits = 1 << 14
        // the Bloom image is PHYSICAL state — the oracle runs the plain
        // join, so any strong hash yields the identical result; 60 bits
        // of xxhash64 whole-stage-codegens where an md5-conv chain costs
        // more than the join it prunes (the ops/SkewJoin lesson)
        def h60(c: org.apache.spark.sql.Column) =
          xxhash64(c).bitwiseAND(lit(0x0FFFFFFFFFFFFFFFL))
        val sel = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 150000.0)
          .select($"o_orderkey", $"o_orderdate")
        val words = graft.ops.Bloom.build(
          sel.select(h60($"o_orderkey").as("kh")), "kh", mBits)
        val li = Tables.lineitem(s, d)
          .filter(graft.ops.Bloom.mightContain(words, mBits, h60($"l_orderkey")))
        li.join(sel, $"l_orderkey" === $"o_orderkey")
          .groupBy(date_trunc("month", $"o_orderdate").as("month"))
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
          .orderBy($"month")
      },
      Some("""SELECT date_trunc('month', o_orderdate) AS month,
             |  count(*) AS n_items,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // TPC-H Q13 shape (customer order-count distribution): the LEFT
    // OUTER fact join whose aggregate feeds a SECOND aggregate — the
    // histogram-of-group-sizes pattern. The orders-side predicate must
    // stay in the JOIN CONDITION (not a WHERE), or customers whose only
    // orders are filtered out silently leave the zero bucket. The first
    // aggregate shuffles on c_custkey; the second is tiny (|distinct
    // counts| rows) and hash-aggregates with map-side combine.
    OracleQuery(
      "j21_tpch_q13",
      (s, d) => {
        import s.implicits._
        val ords = Tables.orders(s, d)
          .filter($"o_orderpriority" =!= "3-MEDIUM")
          .select($"o_custkey", $"o_orderkey")
        Tables.customer(s, d)
          .join(ords, $"c_custkey" === $"o_custkey", "left_outer")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '3-MEDIUM'
             |  GROUP BY c_custkey
             |)
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)
    ),

    // TPC-H Q22 shape (dormant high-balance customers): ANTI join
    // against a filtered fact subset ("no urgent order since 1999" —
    // the testdata has no phone column, so the country code comes from
    // the customer-name digits) plus a 1-row scalar-stat gate (balance
    // above the global positive-balance mean). The scalar aggregate
    // broadcasts as a 1-row crossJoin — the sanctioned scalar-subquery
    // spelling — and the anti join is a shuffled left_anti on the
    // customer key (the filtered orders side carries only o_custkey,
    // so AQE typically converts it to a broadcast anti join).
    OracleQuery(
      "j22_tpch_q22",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
          .withColumn("cntrycode", expr("right(c_name, 2)"))
        val avgBal = cust.filter($"c_acctbal" > 0.0)
          .agg(avg($"c_acctbal").as("avg_bal"))
        val recent = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT" &&
            $"o_orderdate" >= lit("1999-01-01").cast("date"))
          .select($"o_custkey")
        cust
          .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
          .crossJoin(broadcast(avgBal))
          .filter($"c_acctbal" > $"avg_bal")
          .groupBy($"cntrycode")
          .agg(count(lit(1)).as("numcust"),
            round(sum($"c_acctbal"), 4).as("totacctbal"))
          .orderBy($"cntrycode")
      },
      Some("""WITH avgbal AS (
             |  SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
             |)
             |SELECT right(c_name, 2) AS cntrycode,
             |  count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
             |FROM customer, avgbal
             |WHERE c_acctbal > avg_bal
             |  AND NOT EXISTS (
             |    SELECT 1 FROM orders
             |    WHERE o_custkey = c_custkey
             |      AND o_orderpriority = '1-URGENT'
             |      AND o_orderdate >= DATE '1999-01-01')
             |GROUP BY cntrycode
             |ORDER BY cntrycode""".stripMargin)
    ),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    // EXISTS + NOT-EXISTS double correlation — "another supplier on the
    // same order, but no OTHER supplier shipped late" — decorrelated
    // into stacked grouped aggregates per order: collapse to (order,
    // supplier, was-late) grain, then count suppliers and late
    // suppliers per order; when exactly one is late, max() recovers
    // which one. That aggregate pair replaces Q21's textbook two extra
    // lineitem self-joins — at 100 TB two fewer scans and shuffles of
    // the fact. "Late" is adapted to
    // this schema as shipping >60 days after the order date (the
    // testdata carries no commit/receipt dates). Supplier names attach
    // by broadcast at the end, on the tiny blamed-supplier aggregate.
    OracleQuery(
      "j23_tpch_q21",
      (s, d) => {
        import s.implicits._
        // two stacked hash aggregates instead of countDistinct: a
        // multi-distinct aggregate Expands the fact 2× (one replica per
        // distinct spec) before its shuffle; collapsing to (order,
        // supplier) grain first keeps partials map-side and measured
        // 2.6× faster at the 10× spot-bench scale (11.2 s → 4.3 s)
        val isLate = $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")
        val perSupp = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select($"o_orderkey", $"o_orderdate"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_orderkey", $"l_suppkey")
          .agg(max(when(isLate, lit(1)).otherwise(lit(0))).as("late"))
        val per = perSupp
          .groupBy($"l_orderkey")
          .agg(
            count(lit(1)).as("n_supp"),
            sum($"late").as("n_late"),
            max(when($"late" === 1, $"l_suppkey")).as("late_supp"))
          .filter($"n_supp" >= 2 && $"n_late" === 1)
        per.groupBy($"late_supp")
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(Tables.supplier(s, d)), $"late_supp" === $"s_suppkey")
          .select($"s_name", $"numwait")
          .orderBy($"numwait".desc, $"s_name")
          .limit(20)
      },
      Some("""WITH per AS (
             |  SELECT l_orderkey,
             |    count(DISTINCT l_suppkey) AS n_supp,
             |    count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             |                        THEN l_suppkey END) AS n_late,
             |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             |             THEN l_suppkey END) AS late_supp
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  GROUP BY l_orderkey
             |)
             |SELECT s_name, count(*) AS numwait
             |FROM per JOIN supplier ON late_supp = s_suppkey
             |WHERE n_supp >= 2 AND n_late = 1
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name
             |LIMIT 20""".stripMargin)
    ),

    // TPC-H Q4 shape (order priority checking): EXISTS as a LEFT SEMI
    // join with a compound condition — the correlated predicate
    // (shipped >30 days after THIS order's date; the testdata carries
    // no commit/receipt dates) rides the join, so lineitem contributes
    // at most one match probe per order and never widens the output.
    // The orders date filter prunes the scan; the aggregate is tiny.
    OracleQuery(
      "j24_tpch_q4",
      (s, d) => {
        import s.implicits._
        val ords = Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-07-01").cast("date") &&
            $"o_orderdate" < lit("1996-10-01").cast("date"))
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate")
        ords.join(li,
            $"l_orderkey" === $"o_orderkey" &&
              $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
             |FROM orders
             |WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),

    // TPC-H Q7 shape (volume shipping between a nation pair): the same
    // 25-row nation dim joins TWICE under different roles (supplier's
    // vs customer's), with the pair predicate as an OR of the two
    // directions. Both nation joins broadcast; the pair filter applies
    // to the joined roles, and supplier — small at TPC-H ratios —
    // broadcasts too, so only orders⋈lineitem shuffles. Grouped by the
    // (direction, shipment year) tuple.
    OracleQuery(
      "j25_tpch_q7",
      (s, d) => {
        import s.implicits._
        val n1 = Tables.nation(s, d).select($"n_nationkey".as("nk1"), $"n_name".as("supp_nation"))
        val n2 = Tables.nation(s, d).select($"n_nationkey".as("nk2"), $"n_name".as("cust_nation"))
        Tables.supplier(s, d)
          .join(Tables.lineitem(s, d), $"s_suppkey" === $"l_suppkey")
          .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
            $"o_orderkey" === $"l_orderkey")
          .join(Tables.customer(s, d), $"c_custkey" === $"o_custkey")
          .join(broadcast(n1), $"s_nationkey" === $"nk1")
          .join(broadcast(n2), $"c_nationkey" === $"nk2")
          .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
            ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
          .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      },
      Some("""SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |    year(l_shipdate) AS l_year,
             |    l_extendedprice * (1 - l_discount) AS volume
             |  FROM supplier
             |  JOIN lineitem ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
             |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |)
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
    ),

    // TPC-H Q8 shape (national market share): the deepest standard-form
    // join tree expressible on this schema — part⋈lineitem⋈orders⋈
    // customer⋈nation⋈region on the demand side, supplier⋈nation on the
    // supply side — with the share computed as a conditional-over-total
    // ratio inside ONE hash aggregate per year. Every dimension
    // broadcasts; the part p_type filter prunes the fact via the join;
    // only orders⋈lineitem exchanges.
    OracleQuery(
      "j26_tpch_q8",
      (s, d) => {
        import s.implicits._
        val n1 = Tables.nation(s, d).select($"n_nationkey".as("nk1"), $"n_regionkey".as("rk1"))
        val n2 = Tables.nation(s, d).select($"n_nationkey".as("nk2"), $"n_name".as("nation"))
        val reg = Tables.region(s, d).filter($"r_name" === "AMERICA")
        Tables.part(s, d).filter($"p_type" === "ECONOMY")
          .join(Tables.lineitem(s, d), $"p_partkey" === $"l_partkey")
          .join(Tables.orders(s, d)
              .filter($"o_orderdate" >= lit("1996-01-01").cast("date") &&
                $"o_orderdate" < lit("1998-01-01").cast("date")),
            $"l_orderkey" === $"o_orderkey")
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(n1), $"c_nationkey" === $"nk1")
          .join(broadcast(reg), $"rk1" === $"r_regionkey")
          .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(n2), $"s_nationkey" === $"nk2")
          .groupBy(year($"o_orderdate").as("o_year"))
          .agg(round(
            sum(when($"nation" === "NATION_5", $"l_extendedprice" * (lit(1) - $"l_discount"))
              .otherwise(0.0)) /
              sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("mkt_share"))
          .orderBy($"o_year")
      },
      Some("""WITH all_nations AS (
             |  SELECT year(o_orderdate) AS o_year,
             |    l_extendedprice * (1 - l_discount) AS volume,
             |    n2.n_name AS nation
             |  FROM part
             |  JOIN lineitem ON p_partkey = l_partkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |  JOIN region ON n1.n_regionkey = r_regionkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
             |    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
             |)
             |SELECT o_year,
             |  round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
             |    / sum(volume), 4) AS mkt_share
             |FROM all_nations GROUP BY o_year ORDER BY o_year""".stripMargin)
    ),

    // TPC-H Q12 shape (shipping-priority audit): fact⋈fact join whose
    // aggregate is a pair of conditional counts — both CASE branches
    // fold into the same hash aggregate, one pass, no second scan.
    // Lateness is the row-local shipdate-vs-orderdate comparison
    // (adapted: no receipt/commit dates), the mode axis is returnflag.
    OracleQuery(
      "j27_tpch_q12",
      (s, d) => {
        import s.implicits._
        val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
        Tables.orders(s, d).select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
          .join(Tables.lineitem(s, d)
              .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                $"l_shipdate" < lit("1997-01-01").cast("timestamp")),
            $"o_orderkey" === $"l_orderkey")
          .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
          .groupBy($"l_returnflag")
          .agg(
            sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
             |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // TPC-H Q15 shape (top supplier): an aggregate VIEW consumed twice —
    // once for the per-supplier revenue, once for its max. The view is
    // MATERIALIZED (cache — |suppliers| rows, the thing a real pipeline
    // would write out) so lineitem is scanned exactly once; the max
    // then broadcasts back as a 1-row scalar join, and supplier
    // attaches by broadcast at the end. Without the materialization
    // Catalyst plans two full fact scans — AQE's exchange reuse does
    // NOT unify them here because the broadcast side's exchange sits
    // inside a separate broadcast stage. The revenue is rounded BEFORE
    // the max/equality so the winner set is decided on the same
    // 4-decimal values in both engines.
    OracleQuery(
      "j28_tpch_q15",
      (s, d) => {
        import s.implicits._
        val rev = Tables.lineitem(s, d)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
          .groupBy($"l_suppkey".as("supplier_no"))
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("total_revenue"))
          .cache()
        val top = rev.agg(max($"total_revenue").as("max_revenue"))
        rev.crossJoin(broadcast(top))
          .filter($"total_revenue" === $"max_revenue")
          .join(broadcast(Tables.supplier(s, d)), $"supplier_no" === $"s_suppkey")
          .select($"s_suppkey", $"s_name", $"total_revenue")
          .orderBy($"s_suppkey")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey AS supplier_no,
             |    round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY l_suppkey
             |)
             |SELECT s_suppkey, s_name, total_revenue
             |FROM supplier JOIN rev ON s_suppkey = supplier_no
             |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)
    ),

    // TPC-H Q19 shape (discounted revenue): the OR-of-ANDs predicate
    // diagnostic — three conjunctive branches over mixed part/lineitem
    // columns. The optimizer must factor the lineitem-only bounds out
    // of the disjunction far enough to keep the join a plain equi-join
    // (no nested loop), and the part dim broadcasts; the residual OR
    // evaluates post-join as one codegen'd predicate.
    OracleQuery(
      "j29_tpch_q19",
      (s, d) => {
        import s.implicits._
        def branch(brand: String, sizeHi: Int, qLo: Double, qHi: Double) =
          $"p_brand" === brand && $"p_size".between(1, sizeHi) &&
            $"l_quantity".between(qLo, qHi)
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), $"p_partkey" === $"l_partkey")
          .filter(branch("Brand#12", 15, 1, 11) ||
            branch("Brand#23", 20, 10, 20) ||
            branch("Brand#15", 25, 20, 30))
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             |  CAST(count(*) AS BIGINT) AS n_rows
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
    ),

    // J30: interval-overlap join — which urgent-order service windows
    // does each shipment interval intersect? The interval-interval
    // generalization of j9's point-in-range join, and a shape Spark
    // would otherwise plan as a cartesian theta-join. Routed through
    // ops.IntervalJoin: both sides explode into the fixed-width
    // (7-day) time bins they cover — an interval of length L lands in
    // O(L/7 + 1) bins, map-side — then a plain hash equi-join ON the
    // bin brings together only temporally-close candidates and a
    // residual predicate keeps true overlaps. Pairs meeting in several
    // bins survive exactly once via the first-overlap-bin guard (no
    // distinct, no dedup exchange). Candidate volume is Σ overlaps +
    // bin collisions, NEVER |ships|×|windows|: the same plan at 100 TB
    // shuffles each row a handful of times regardless of table sizes.
    // The oracle states the semantics directly as the non-equi join.
    OracleQuery(
      "j30_interval_overlap",
      (s, d) => {
        import s.implicits._
        val ships = Tables.lineitem(s, d)
          .filter($"l_returnflag" === "R" && $"l_quantity" <= 2.0)
          .select($"l_orderkey", $"l_linenumber",
            to_date($"l_shipdate").as("s0"),
            date_add(to_date($"l_shipdate"), ($"l_quantity" * 7).cast("int")).as("s1"))
        val wins = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey",
            to_date($"o_orderdate").as("w0"),
            date_add(to_date($"o_orderdate"), 6).as("w1"))
        graft.ops.IntervalJoin.overlap(ships, wins, "s0", "s1", "w0", "w1", binDays = 7)
          .groupBy($"l_orderkey", $"l_linenumber")
          .agg(count(lit(1)).as("n_overlaps"),
            min($"w0").cast("timestamp").as("first_window"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""WITH ships AS (
             |  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS s0,
             |    CAST(l_shipdate AS DATE) + CAST(l_quantity * 7 AS INT) AS s1
             |  FROM lineitem WHERE l_returnflag = 'R' AND l_quantity <= 2.0
             |), wins AS (
             |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS w0,
             |    CAST(o_orderdate AS DATE) + 6 AS w1
             |  FROM orders WHERE o_orderpriority = '1-URGENT'
             |)
             |SELECT s.l_orderkey, s.l_linenumber,
             |  count(*) AS n_overlaps, min(w.w0) AS first_window
             |FROM ships s JOIN wins w ON s.s0 <= w.w1 AND w.w0 <= s.s1
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // J31: numeric band join — for each purchase, how many click
    // events landed within ±0.25 of its value (value-similarity
    // matching, the 1-D numeric sibling of j30). ops.BandJoin buckets
    // both sides at the band width; the left side explodes into
    // bucket ± 1 (exactly 3 rows), the right keeps one bucket, and the
    // hash equi-join on the bucket plus the exact |Δ| residual
    // replaces the O(|L|·|R|) nested loop. The oracle states the
    // semantics as the direct inequality join.
    OracleQuery(
      "j31_band_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("pid"), $"value".as("pv"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id".as("cid"), $"value".as("cv"))
        graft.ops.BandJoin.band(purchases, clicks, "pv", "cv", delta = 0.25)
          .groupBy($"pid")
          .agg(count(lit(1)).as("n_close"),
            round(min(abs($"pv" - $"cv")), 4).as("min_gap"))
          .orderBy($"pid")
      },
      Some("""WITH p AS (
             |  SELECT event_id AS pid, value AS pv FROM events
             |  WHERE event_type = 'purchase'
             |), c AS (
             |  SELECT event_id AS cid, value AS cv FROM events
             |  WHERE event_type = 'click'
             |)
             |SELECT pid, count(*) AS n_close,
             |  round(min(abs(pv - cv)), 4) AS min_gap
             |FROM p JOIN c ON abs(pv - cv) <= 0.25
             |GROUP BY pid ORDER BY pid""".stripMargin)
    ),

    // TPC-H Q3 (shipping priority) — the classic 3-way join + top-k:
    // customer segment filter broadcast into orders, orders⋈lineitem
    // co-keyed on orderkey, revenue agg, top-10 by revenue. Date
    // literals against the testdata's 1995–2001 span. Revenue
    // DECIMAL-cast (2-decimal prices × 2-decimal discounts = exact at
    // scale 4) so the sum is order-exact; top-10 cutoff on the ROUNDED
    // revenue with (orderkey) tiebreak.
    OracleQuery(
      "j32_tpch_q3",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey")
        val ord = Tables.orders(s, d)
          .filter($"o_orderdate" < lit("1996-03-15").cast("timestamp"))
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        val li = Tables.lineitem(s, d)
          .filter($"l_shipdate" > lit("1996-03-15").cast("timestamp"))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(round(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast("decimal(28,4)")).cast("double"), 4).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
          .select($"l_orderkey", $"revenue", $"o_orderdate", $"o_orderpriority")
      },
      Some("""SELECT l_orderkey,
             |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
             |    AS DOUBLE), 4) AS revenue,
             |  o_orderdate, o_orderpriority
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1996-03-15'
             |  AND l_shipdate > TIMESTAMP '1996-03-15'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    )
  ) ++ partsuppQueries

  // ---------------------------------------------------------------------
  // Derived partsupp: /root/testdata ships no partsupp table, so the five
  // partsupp-dependent TPC-H shapes (Q2/Q9/Q11/Q16/Q20) run against a
  // DETERMINISTIC in-query derivation both engines replay exactly — pure
  // integer arithmetic, no hashing, no RNG:
  //   for each part, 4 suppliers  ps_suppkey  = (p_partkey + k) % |supplier|
  //   availability                ps_availqty = (p_partkey·37 + k·101) % 9991 + 10
  //   cost                        ps_supplycost = ((p_partkey·73 + k·151) % 92001)/100 + 1
  // (suppkeys are 0-based in this testdata). |supplier| is computed
  // in-query (it scales with sf), carried as a broadcast 1-row scalar.
  // Scale shape: partsupp is 4·|part| rows — dimension-sized here, but at
  // TPC-H-proportioned 100 TB part is ~0.2× lineitem rows, so NOTHING
  // below force-broadcasts part/partsupp; only the constant-sized
  // nation/region get hints and AQE picks the strategy for the rest.
  // Lineitem's (l_partkey, l_suppkey) pairs were generated independently
  // of this derivation, so Q9/Q20's partsupp⋈lineitem joins keep ~4/|S| of
  // the fact — the join SHAPE (the prize) is unchanged.

  private def derivedPartsupp(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val sCnt = Tables.supplier(s, d).agg(count(lit(1)).as("s_cnt"))
    Tables.part(s, d).select($"p_partkey")
      .crossJoin(broadcast(sCnt)) // 1-row scalar
      .withColumn("k", explode(sequence(lit(0L), lit(3L))))
      .select(
        $"p_partkey".as("ps_partkey"),
        (($"p_partkey" + $"k") % $"s_cnt").as("ps_suppkey"),
        (($"p_partkey" * 37L + $"k" * 101L) % 9991L + 10L).cast("int").as("ps_availqty"),
        ((($"p_partkey" * 73L + $"k" * 151L) % 92001L).cast("double") / 100.0 + 1.0)
          .as("ps_supplycost"))
  }

  /** The same derivation as a DuckDB CTE prefix (`WITH scnt …, partsupp …`).
    * Every oracle below starts from this string so the two engines read
    * one shared definition. */
  private val PartsuppCte: String =
    """WITH scnt AS (SELECT CAST(count(*) AS BIGINT) AS s_cnt FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey + k) % s_cnt AS ps_suppkey,
      |    CAST((p_partkey * 37 + k * 101) % 9991 + 10 AS INT) AS ps_availqty,
      |    CAST((p_partkey * 73 + k * 151) % 92001 AS DOUBLE)
      |      / CAST(100.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) AS ps_supplycost
      |  FROM part CROSS JOIN scnt
      |  CROSS JOIN (SELECT unnest([CAST(0 AS BIGINT), 1, 2, 3]) AS k)
      |)""".stripMargin

  private def partsuppQueries: Seq[OracleQuery] = Seq(
    // TPC-H Q2 shape (minimum-cost supplier): the classic correlated
    // min-subquery, decorrelated by hand (the j16/Q17 recipe) — the
    // region-filtered candidate set is built ONCE, its per-part min
    // re-joins by (part, exact cost) equality. Cost equality on doubles
    // is sound here because both sides derive bit-identical values from
    // integer arithmetic. Predicates (size ≤ 15, type LARGE, EUROPE)
    // adapt dbgen's BRASS/size=15 to this testdata's columns.
    OracleQuery(
      "j33_tpch_q2",
      (s, d) => {
        import s.implicits._
        val nat = Tables.nation(s, d)
        val reg = Tables.region(s, d).filter($"r_name" === "EUROPE")
        val parts = Tables.part(s, d)
          .filter($"p_size" <= 15 && $"p_type" === "LARGE")
        val cand = derivedPartsupp(s, d)
          .join(parts, $"ps_partkey" === $"p_partkey")
          .join(Tables.supplier(s, d), $"ps_suppkey" === $"s_suppkey")
          .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .select($"p_partkey", $"p_brand", $"ps_supplycost",
            $"s_name", $"s_acctbal", $"n_name")
          .persist() // selective candidate set, read twice (min + re-join)
        val mins = cand.groupBy($"p_partkey".as("mk"))
          .agg(min($"ps_supplycost").as("min_cost"))
        cand.join(mins, $"p_partkey" === $"mk" && $"ps_supplycost" === $"min_cost")
          .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_brand",
            Parity.floorRound4($"ps_supplycost").as("supply_cost"))
          .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
          .limit(100)
      },
      Some(PartsuppCte + """
             |, cand AS (
             |  SELECT p.p_partkey, p.p_brand, ps.ps_supplycost, s.s_suppkey,
             |    s.s_name, s.s_acctbal, n.n_name
             |  FROM partsupp ps
             |  JOIN part p ON ps.ps_partkey = p.p_partkey
             |  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
             |  JOIN nation n ON s.s_nationkey = n.n_nationkey
             |  JOIN region r ON n.n_regionkey = r.r_regionkey
             |  WHERE r.r_name = 'EUROPE' AND p.p_size <= 15 AND p.p_type = 'LARGE'
             |), mins AS (
             |  SELECT p_partkey, min(ps_supplycost) AS min_cost FROM cand GROUP BY 1
             |)
             |SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_brand,
             |  floor(c.ps_supplycost * 10000 + 0.5) / 10000 AS supply_cost
             |FROM cand c
             |JOIN mins m ON c.p_partkey = m.p_partkey AND c.ps_supplycost = m.min_cost
             |ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey
             |LIMIT 100""".stripMargin)
    ),

    // TPC-H Q9 shape (product-type profit): the 6-table join — lineitem
    // against partsupp on the COMPOSITE (partkey, suppkey) key, part-name
    // filter, orders for the year, nation via supplier — grouped by
    // nation × year. Plan prize: ONE lineitem scan; the only fact-fact
    // exchange is the orders⋈lineitem orderkey shuffle (AQE); profit sums
    // ride the DECIMAL-cast recipe so summation order can't move the
    // 4-dp display value.
    OracleQuery(
      "j34_tpch_q9",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val parts = Tables.part(s, d).filter($"p_name".like("%gear%"))
        li.join(derivedPartsupp(s, d),
            $"l_partkey" === $"ps_partkey" && $"l_suppkey" === $"ps_suppkey")
          .join(parts, $"p_partkey" === $"l_partkey")
          .join(Tables.supplier(s, d), $"s_suppkey" === $"l_suppkey")
          .join(Tables.orders(s, d), $"o_orderkey" === $"l_orderkey")
          .join(broadcast(Tables.nation(s, d)), $"n_nationkey" === $"s_nationkey")
          .groupBy($"n_name".as("nation"),
            year($"o_orderdate").cast("int").as("o_year"))
          .agg(Parity.floorRound4(
            sum(($"l_extendedprice" * (lit(1) - $"l_discount")
              - $"ps_supplycost" * $"l_quantity").cast("decimal(28,10)"))
              .cast("double")).as("sum_profit"))
          .orderBy($"nation", $"o_year".desc)
      },
      Some(PartsuppCte + """
             |SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
             |  floor(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
             |      - ps.ps_supplycost * l.l_quantity AS DECIMAL(28,10))) AS DOUBLE)
             |    * 10000 + 0.5) / 10000 AS sum_profit
             |FROM lineitem l
             |JOIN partsupp ps
             |  ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
             |JOIN part p ON p.p_partkey = l.l_partkey
             |JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |JOIN orders o ON o.o_orderkey = l.l_orderkey
             |JOIN nation n ON n.n_nationkey = s.s_nationkey
             |WHERE p.p_name LIKE '%gear%'
             |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)
    ),

    // TPC-H Q11 shape (important stock): grouped value per part for one
    // nation's suppliers, HAVING against a GLOBAL scalar. The total is
    // the COLUMN SUM of the per-part frame (the text_term_drift recipe —
    // one scan, the per-part aggregate persisted and read twice; a second
    // aggregate over partsupp would never ReuseExchange), carried as a
    // broadcast 1-row cross join.
    OracleQuery(
      "j35_tpch_q11",
      (s, d) => {
        import s.implicits._
        val natF = Tables.nation(s, d).filter($"n_name" === "NATION_7")
        val byPart = derivedPartsupp(s, d)
          .join(Tables.supplier(s, d), $"ps_suppkey" === $"s_suppkey")
          .join(broadcast(natF), $"s_nationkey" === $"n_nationkey")
          .groupBy($"ps_partkey")
          .agg(sum(($"ps_supplycost" * $"ps_availqty").cast("decimal(28,10)"))
            .cast("double").as("val"))
          .persist() // part-sized; feeds both the total and the filter
        val tot = byPart.agg(sum($"val".cast("decimal(28,10)")).cast("double").as("tval"))
        byPart.crossJoin(broadcast(tot))
          .filter($"val" > $"tval" * lit(0.001))
          .select($"ps_partkey", Parity.floorRound4($"val").as("value"))
          .orderBy($"value".desc, $"ps_partkey")
      },
      Some(PartsuppCte + """
             |, bypart AS (
             |  SELECT ps.ps_partkey,
             |    CAST(sum(CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(28,10)))
             |      AS DOUBLE) AS val
             |  FROM partsupp ps
             |  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
             |  JOIN nation n ON s.s_nationkey = n.n_nationkey
             |  WHERE n.n_name = 'NATION_7'
             |  GROUP BY 1
             |), tot AS (
             |  SELECT CAST(sum(CAST(val AS DECIMAL(28,10))) AS DOUBLE) AS tval
             |  FROM bypart
             |)
             |SELECT ps_partkey, floor(val * 10000 + 0.5) / 10000 AS value
             |FROM bypart CROSS JOIN tot
             |WHERE val > tval * CAST(0.001 AS DOUBLE)
             |ORDER BY value DESC, ps_partkey""".stripMargin)
    ),

    // TPC-H Q16 shape (supplier relationship): distinct-supplier counts
    // per (brand, type, size) with a NOT-IN supplier exclusion — spelled
    // as a LEFT ANTI join in Spark (null-safe by construction; NOT IN's
    // three-valued trap never arises because s_suppkey is a key). The
    // exclusion list (acctbal < 1000 stands in for dbgen's
    // customer-complaints comment scan) is tiny and broadcast.
    OracleQuery(
      "j36_tpch_q16",
      (s, d) => {
        import s.implicits._
        val parts = Tables.part(s, d)
          .filter($"p_brand" =!= "Brand#5" && $"p_type" =!= "PROMO" &&
            $"p_size".isin(1, 4, 9, 14, 19, 23, 36, 45))
        val excl = Tables.supplier(s, d).filter($"s_acctbal" < 1000)
          .select($"s_suppkey")
        derivedPartsupp(s, d)
          .join(broadcast(excl), $"ps_suppkey" === $"s_suppkey", "left_anti")
          .join(parts, $"p_partkey" === $"ps_partkey")
          .groupBy($"p_brand", $"p_type", $"p_size")
          .agg(countDistinct($"ps_suppkey").as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
      },
      Some(PartsuppCte + """
             |SELECT p.p_brand, p.p_type, p.p_size,
             |  CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
             |FROM partsupp ps
             |JOIN part p ON p.p_partkey = ps.ps_partkey
             |WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
             |  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
             |  AND ps.ps_suppkey NOT IN
             |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    ),

    // TPC-H Q20 shape (potential part promotion): suppliers holding
    // excess stock (availqty > half the year's shipped quantity) of a
    // name-filtered part, restricted to one region. The correlated
    // half-sum decorrelates into ONE grouped lineitem aggregate joined
    // on the composite key (the j16 recipe); the comparison is spelled
    // availqty·2 > Σqty so no 0.5 multiply touches the boundary, and the
    // quantity sum is DECIMAL-cast — a summation-order flip can't move a
    // row across the strict inequality.
    OracleQuery(
      "j37_tpch_q20",
      (s, d) => {
        import s.implicits._
        val halfq = Tables.lineitem(s, d)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(sum($"l_quantity".cast("decimal(28,10)")).cast("double").as("qty_sum"))
        val oldParts = Tables.part(s, d).filter($"p_name".like("old %"))
          .select($"p_partkey")
        val eligible = derivedPartsupp(s, d)
          .join(broadcast(oldParts), $"p_partkey" === $"ps_partkey")
          .join(halfq,
            $"l_partkey" === $"ps_partkey" && $"l_suppkey" === $"ps_suppkey")
          .filter($"ps_availqty" * 2 > $"qty_sum")
          .select($"ps_suppkey").distinct()
        Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(Tables.region(s, d).filter($"r_name" === "EUROPE")),
            $"n_regionkey" === $"r_regionkey")
          .join(eligible, $"ps_suppkey" === $"s_suppkey")
          .select($"s_name", Parity.floorRound4($"s_acctbal").as("s_acctbal"))
          .orderBy($"s_name")
      },
      Some(PartsuppCte + """
             |, halfq AS (
             |  SELECT l_partkey, l_suppkey,
             |    CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS qty_sum
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-01-01'
             |  GROUP BY 1, 2
             |), eligible AS (
             |  SELECT DISTINCT ps.ps_suppkey
             |  FROM partsupp ps
             |  JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'old %'
             |  JOIN halfq h
             |    ON h.l_partkey = ps.ps_partkey AND h.l_suppkey = ps.ps_suppkey
             |  WHERE ps.ps_availqty * 2 > h.qty_sum
             |)
             |SELECT s.s_name, floor(s.s_acctbal * 10000 + 0.5) / 10000 AS s_acctbal
             |FROM supplier s
             |JOIN nation n ON s.s_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |JOIN eligible e ON e.ps_suppkey = s.s_suppkey
             |WHERE r.r_name = 'EUROPE'
             |ORDER BY s_name""".stripMargin)
    ),

    // Incremental JOIN-view maintenance — the delta algebra that keeps a
    // materialized join view fresh without re-joining the base tables:
    // with A = A₀ ∪ ΔA and B = B₀ ∪ ΔB, the refreshed view is
    //   V(A,B) = V(A₀,B₀) ⊕ V(ΔA,B₀) ⊕ V(A₀,ΔB) ⊕ V(ΔA,ΔB)
    // where ⊕ is partial-aggregate merge (counts add; revenue partials
    // are DECIMAL sums, so the merge is exact integer algebra and the
    // incremental result equals the full recompute BIT-FOR-BIT — which
    // is precisely what the oracle states: DuckDB computes the full
    // join from scratch, Spark assembles it incrementally from the
    // stored snapshot plus three delta terms). Both orders AND lineitem
    // change (date-split deltas); an old order's new lineitem lands in
    // the A₀⋈ΔB cross term, the case single-sided maintenance misses.
    // Scale: V(A₀,B₀) is READ (localCheckpoint stands in for the stored
    // MV — lineage provably cut), never recomputed; the delta terms
    // shuffle O(|Δ|·fanout), not O(|base|) — nightly refresh cost is
    // proportional to the night's data, the entire point of IVM.
    OracleQuery(
      "j38_incremental_join_refresh",
      (s, d) => {
        import s.implicits._
        val cutoff = lit("1997-01-01").cast("date")
        val ord = Tables.orders(s, d)
          .select($"o_orderkey", $"o_orderpriority", $"o_orderdate")
        val li = Tables.lineitem(s, d)
          .select($"l_orderkey", $"l_returnflag", $"l_shipdate",
            $"l_extendedprice", $"l_discount")
        val aOld = ord.filter($"o_orderdate" < cutoff)
        val aNew = ord.filter($"o_orderdate" >= cutoff)
        val bOld = li.filter($"l_shipdate" < cutoff)
        val bNew = li.filter($"l_shipdate" >= cutoff)
        def partial(a: org.apache.spark.sql.DataFrame,
            b: org.apache.spark.sql.DataFrame) =
          a.join(b, $"o_orderkey" === $"l_orderkey")
            .groupBy($"o_orderpriority", $"l_returnflag")
            .agg(count(lit(1)).as("cnt"),
              sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
                .cast("decimal(38,6)")).as("rev"))
        val snapshot = partial(aOld, bOld).localCheckpoint(true)
        snapshot
          .unionByName(partial(aNew, bOld))
          .unionByName(partial(aOld, bNew))
          .unionByName(partial(aNew, bNew))
          .groupBy($"o_orderpriority", $"l_returnflag")
          .agg(sum($"cnt").as("n_rows"),
            round(sum($"rev").cast("double"), 4).as("revenue"))
          .orderBy($"o_orderpriority", $"l_returnflag")
      },
      Some("""SELECT o_orderpriority, l_returnflag, count(*) AS n_rows,
             |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
             |    AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)
    ),

    // Longest-prefix-match join — the routing/geo-IP lookup shape (match
    // each address to the MOST SPECIFIC CIDR rule covering it), which a
    // naive spelling writes as a range theta-join per rule. The scalable
    // spelling is the BandJoin recipe applied to a hierarchy: the
    // prefix-length set is tiny and FIXED (/8, /16, /24), so each
    // address explodes into exactly 3 (len, prefix) candidates —
    // integer floor-division by a power of two, exact in IEEE — and a
    // plain hash equi-join on (len, prefix) meets the rule table;
    // longest-match-wins is then a per-address max_by over ≤ 3 hit rows
    // (unique per length, since rules are deduped per (len, prefix)).
    // Work is O(3·|addrs| + |rules|) through one shuffle — never
    // |addrs|×|rules|. The rule table is deterministic arithmetic both
    // engines replay (anchor addresses guarantee matches at every
    // length, so the longest-prefix override genuinely exercises);
    // divisors are literal per-length constants, not pow() (libm-free).
    OracleQuery(
      "j39_lpm_join",
      (s, d) => {
        import s.implicits._
        def ipOf(c: org.apache.spark.sql.Column) =
          (c * 2654435761L + 12345L) % 4294967296L
        val ips = Tables.events(s, d).select($"user_id".as("u")).distinct()
          .withColumn("ip", ipOf($"u"))
        val rules = Tables.supplier(s, d)
          .select($"s_suppkey",
            (lit(8) + lit(8) * ($"s_suppkey" % 3)).as("len"),
            ipOf($"s_suppkey" * 7).as("aip"))
          .withColumn("dv",
            when($"len" === 8, 16777216.0)
              .when($"len" === 16, 65536.0).otherwise(256.0))
          .select($"len", floor($"aip" / $"dv").cast("long").as("prefix"),
            $"s_suppkey")
          .groupBy($"len", $"prefix").agg(min($"s_suppkey").as("rule_id"))
        val cand = ips
          .select($"u", $"ip", explode(array(
            struct(lit(8).as("len"), lit(16777216.0).as("dv")),
            struct(lit(16).as("len"), lit(65536.0).as("dv")),
            struct(lit(24).as("len"), lit(256.0).as("dv")))).as("l"))
          .select($"u", $"l.len".as("len"),
            floor($"ip" / $"l.dv").cast("long").as("pfx"))
        cand.join(broadcast(rules),
            cand("len") === rules("len") && $"pfx" === $"prefix")
          .select($"u", cand("len").as("len"), $"rule_id")
          .groupBy($"u")
          .agg(max_by($"rule_id", $"len").as("rule_id"),
            max($"len").as("match_len"))
          .groupBy($"match_len", $"rule_id")
          .agg(count(lit(1)).as("n_users"),
            min($"u").as("min_user"), max($"u").as("max_user"))
          .orderBy($"match_len", $"rule_id")
      },
      Some("""WITH users AS (
             |  SELECT DISTINCT user_id AS u FROM events
             |), ips AS (
             |  SELECT u, (u * 2654435761 + 12345) % 4294967296 AS ip FROM users
             |), rules0 AS (
             |  SELECT s_suppkey,
             |    8 + 8 * (s_suppkey % 3) AS len,
             |    ((s_suppkey * 7) * 2654435761 + 12345) % 4294967296 AS aip,
             |    CASE 8 + 8 * (s_suppkey % 3)
             |      WHEN 8 THEN 16777216.0 WHEN 16 THEN 65536.0
             |      ELSE 256.0 END AS dv
             |  FROM supplier
             |), rules AS (
             |  SELECT len, CAST(floor(aip / dv) AS BIGINT) AS prefix,
             |    min(s_suppkey) AS rule_id
             |  FROM rules0 GROUP BY 1, 2
             |), cand AS (
             |  SELECT i.u, l.len, CAST(floor(i.ip / l.dv) AS BIGINT) AS pfx
             |  FROM ips i,
             |    (VALUES (8, 16777216.0), (16, 65536.0), (24, 256.0)) l(len, dv)
             |), hit AS (
             |  SELECT c.u, c.len, r.rule_id
             |  FROM cand c JOIN rules r ON r.len = c.len AND r.prefix = c.pfx
             |), best AS (
             |  SELECT u, arg_max(rule_id, len) AS rule_id, max(len) AS match_len
             |  FROM hit GROUP BY u
             |)
             |SELECT match_len, rule_id, count(*) AS n_users,
             |  min(u) AS min_user, max(u) AS max_user
             |FROM best GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // One-big-table materialization (j40) — the join-at-write vs
    // join-at-read trade every BI/serving layer makes: the 6-table Q5
    // star join is paid ONCE into a denormalized fact (lineitem grain,
    // pruned to the serving columns, time-sorted for row-group
    // pruning), and the query becomes a filtered SCAN — no joins at
    // read time, filters pushed to the parquet footer. The gate is the
    // point: the aggregate over the materialized+read-back OBT must
    // hash-match j14's star-join oracle VERBATIM, which proves the
    // denormalization (join conditions, grain, column carry) loses
    // nothing. 100 TB: storage fans out to fact grain and updates must
    // rebuild slices (the known OBT costs) — in exchange every slice
    // query drops 5 joins; the obtScan BENCH cells measure the
    // read-side delta.
    OracleQuery(
      "j40_obt_q5",
      (s, d) => {
        import s.implicits._
        val tmp = graft.core.Scratch.dir("obt", d)
        graft.sources.Sinks.writeSortedBy(
          buildObtQ5(s, d), tmp, Seq("o_orderdate"), numFiles = 4)
        s.read.parquet(tmp)
          .filter($"r_name" === "ASIA" &&
            $"o_orderdate" >= lit("1996-01-01").cast("date") &&
            $"o_orderdate" < lit("1997-01-01").cast("date"))
          .groupBy($"n_name")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some(tpchQ5Oracle)
    ),

    // The SCD2 READ path — as-of enrichment against the versioned
    // dimension the o18/stream_scd2 machinery WRITES: every event joins
    // the version of its own user that was valid at its timestamp
    // (valid_from ≤ ts < valid_to, open tail = null valid_to). The
    // point-in-time-correct feature join every training pipeline needs
    // (joining TODAY's dimension row onto historical events leaks the
    // future). Plan shape: the version table is per-user TINY (≤ tens
    // of rows), so the join is a plain equi-join ON user_id with the
    // interval condition as a RESIDUAL predicate — both sides hash on
    // the same uniform key, fan-out bounded by |versions per user|,
    // and every event matches EXACTLY once (the versions partition
    // each user's timeline) — a dropped or doubled match moves
    // n_events and fails the hash. At 100 TB the dimension side is
    // still ~|keys| rows: exactly the side a broadcast or storage
    // bucketing on user_id absorbs.
    OracleQuery(
      "j41_scd2_asof_enrich",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        val ev = Tables.events(s, d).filter($"user_id" < 50)
        val dim = ev
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
          .select($"user_id",
            row_number().over(w).as("version"),
            $"event_type".as("attr"),
            $"ts".as("valid_from"),
            lead($"ts", 1).over(w).as("valid_to"))
        ev.select($"user_id", $"ts", $"event_type")
          .join(dim, Seq("user_id"))
          .filter($"ts" >= $"valid_from" &&
            ($"valid_to".isNull || $"ts" < $"valid_to"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            countDistinct($"version").as("n_versions_touched"),
            max($"version").cast("long").as("max_version"),
            // the enrichment is consistent iff the joined version's
            // attr equals the event's own type at every event
            sum(when($"event_type" === $"attr", 1L).otherwise(0L)).as("n_attr_match"))
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, ts, event_id, event_type FROM events WHERE user_id < 50
             |), ordered AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |  FROM ev
             |), changes AS (
             |  SELECT user_id, ts, event_id, event_type FROM ordered
             |  WHERE prev_type IS NULL OR prev_type <> event_type
             |), dim AS (
             |  SELECT user_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
             |    event_type AS attr,
             |    ts AS valid_from,
             |    lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
             |  FROM changes
             |)
             |SELECT e.user_id, count(*) AS n_events,
             |  CAST(count(DISTINCT version) AS BIGINT) AS n_versions_touched,
             |  CAST(max(version) AS BIGINT) AS max_version,
             |  CAST(sum(CASE WHEN e.event_type = d.attr THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_attr_match
             |FROM ev e JOIN dim d ON e.user_id = d.user_id
             |  AND e.ts >= d.valid_from
             |  AND (d.valid_to IS NULL OR e.ts < d.valid_to)
             |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin)
    )
  )

  /** The denormalized Q5 serving fact: the UNFILTERED 6-table join at
    * lineitem grain, pruned to the columns the slice queries read.
    * Shared by j40_obt_q5 and the obtScan bench A/B. */
  private[graft] def buildObtQ5(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name"), col("o_orderdate"),
        col("l_extendedprice"), col("l_discount"))
  }

  /** Shared by j14 (live star join) and j40 (materialized OBT) — the
    * two spellings must answer identically, so they gate against the
    * SAME SQL. */
  private[queries] val tpchQ5Oracle: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1996-01-01'
      |  AND o_orderdate < DATE '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin
}

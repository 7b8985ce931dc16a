package graft.plans

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.AsofJoin

class AsofJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def tsOfMin(m: Int) = new Timestamp(1719792000000L + m * 60000L) // 2024-07-01 UTC + m min

  test("attaches most recent right row at or before left ts, per key") {
    val left = Seq(
      (1L, ts("2024-07-01 10:00:00"), 7L),
      (1L, ts("2024-07-01 12:00:00"), 8L),
      (2L, ts("2024-07-01 12:00:00"), 9L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-07-01 09:00:00"), 100.0),
      (1L, ts("2024-07-01 11:00:00"), 200.0),
      (2L, ts("2024-07-01 13:00:00"), 300.0)) // after left → never matched
      .toDF("user_id", "ts", "value")
    val out = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts")
      .orderBy("event_id").collect()
    assert(Option(out(0).getAs[java.lang.Double]("value")).map(_.toDouble).contains(100.0))
    assert(Option(out(1).getAs[java.lang.Double]("value")).map(_.toDouble).contains(200.0))
    assert(out(2).isNullAt(out(2).fieldIndex("value"))) // no prior right row
    // collided names from the right get the _r suffix
    assert(out(0).schema.fieldNames.toSeq ==
      Seq("user_id", "ts", "event_id", "user_id_r", "ts_r", "value"))
  }

  test("equal timestamps match (<= semantics); equality is per-key") {
    val left = Seq((1L, ts("2024-07-01 10:00:00"), 1L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-07-01 10:00:00"), 42.0),
      (2L, ts("2024-07-01 09:00:00"), 99.0)) // other key
      .toDF("user_id", "ts", "value")
    val out = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts").collect()
    assert(out(0).getAs[Double]("value") == 42.0)
  }

  test("null keys and null times never match, on either side") {
    val left = Seq(
      (Option(1L), Option(ts("2024-07-01 10:00:00")), 1L),
      (None: Option[Long], Option(ts("2024-07-01 10:00:00")), 2L), // null key
      (Option(1L), None: Option[Timestamp], 3L)) // null time
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (None: Option[Long], Option(ts("2024-07-01 09:00:00")), 7.0), // null key: skipped
      (Option(1L), None: Option[Timestamp], 8.0), // null time: skipped
      (Option(1L), Option(ts("2024-07-01 09:00:00")), 9.0))
      .toDF("user_id", "ts", "value")
    val out = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts")
      .orderBy("event_id").collect()
    assert(out(0).getAs[Double]("value") == 9.0)
    assert(out(1).isNullAt(out(1).fieldIndex("value")))
    assert(out(2).isNullAt(out(2).fieldIndex("value")))
  }

  test("tolerance bounds the lookback window (µs for timestamps)") {
    val left = Seq((1L, ts("2024-07-01 10:00:00"), 1L)).toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts("2024-07-01 08:00:00"), 5.0)).toDF("user_id", "ts", "value")
    val hourUs = 3600L * 1000000L
    val near = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts",
      tolerance = Some(3 * hourUs)).collect()
    assert(near(0).getAs[Double]("value") == 5.0)
    val far = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts",
      tolerance = Some(1 * hourUs)).collect()
    assert(far(0).isNullAt(far(0).fieldIndex("value")))
  }

  test("self-join on the same source resolves unambiguously") {
    val ev = Seq(
      (1L, ts("2024-07-01 09:00:00"), "purchase", 10.0),
      (1L, ts("2024-07-01 10:00:00"), "error", 0.0),
      (1L, ts("2024-07-01 11:00:00"), "purchase", 20.0),
      (1L, ts("2024-07-01 12:00:00"), "error", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = AsofJoinNative(
      ev.filter($"event_type" === "error"),
      ev.filter($"event_type" === "purchase"),
      Seq("user_id"), "ts", "ts")
      .orderBy("ts").collect()
    assert(out(0).getAs[Double]("value_r") == 10.0)
    assert(out(1).getAs[Double]("value_r") == 20.0)
  }

  test("matches the composed union-and-carry spelling on a randomized frame") {
    val rnd = new scala.util.Random(42)
    // right (key, ts) kept unique per key: time ties between right rows
    // are the one place the two spellings may legitimately differ
    val leftRows = Seq.tabulate(400) { i =>
      (rnd.nextInt(8).toLong, tsOfMin(rnd.nextInt(2000)), i.toLong)
    }
    val rightRows = (0 until 8).flatMap { k =>
      rnd.shuffle((0 until 2000).toList).take(40).map { m =>
        (k.toLong, tsOfMin(m), rnd.nextDouble())
      }
    }
    // key 7 never appears on the right: exercises never-matched keys
    val left = leftRows.toDF("user_id", "ts", "event_id")
    val right = rightRows.filter(_._1 != 7L).toDF("user_id", "ts", "value")

    val composed = AsofJoin(left, right, Seq("user_id"), "ts", Seq("value"))
      .select($"event_id", $"asof_value".as("value"))
    val native = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"value")
    val c = composed.orderBy("event_id").collect().map(r => (r.getLong(0), Option(r.get(1))))
    val n = native.orderBy("event_id").collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(c.length == n.length)
    c.zip(n).foreach { case (a, b) => assert(a == b, s"composed $a != native $b") }
  }

  test("forward and nearest directions") {
    val left = Seq(
      (1L, ts("2024-07-01 10:00:00"), 1L),  // between 09 and 12: nearer 09
      (1L, ts("2024-07-01 11:30:00"), 2L),  // between 09 and 12: nearer 12
      (1L, ts("2024-07-01 13:00:00"), 3L))  // after the last right row
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-07-01 09:00:00"), 9.0),
      (1L, ts("2024-07-01 12:00:00"), 12.0))
      .toDF("user_id", "ts", "value")
    def run(dir: String) = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts",
        direction = dir)
      .orderBy("event_id").collect()
      .map(r => if (r.isNullAt(r.fieldIndex("value"))) None
        else Some(r.getAs[Double]("value")))
    assert(run("backward").toSeq == Seq(Some(9.0), Some(9.0), Some(12.0)))
    assert(run("forward").toSeq == Seq(Some(12.0), Some(12.0), None))
    assert(run("nearest").toSeq == Seq(Some(9.0), Some(12.0), Some(12.0)))
    // exact tie prefers backward: a right row AT the left ts wins for all
    val tied = AsofJoinNative(
      Seq((1L, ts("2024-07-01 09:00:00"), 1L)).toDF("user_id", "ts", "event_id"),
      right, Seq("user_id"), "ts", "ts", direction = "nearest").collect()
    assert(tied(0).getAs[Double]("value") == 9.0)
    // forward honors its own tolerance side
    val farFwd = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts",
      tolerance = Some(3600L * 1000000L), direction = "forward")
      .orderBy("event_id").collect()
    assert(farFwd(0).isNullAt(farFwd(0).fieldIndex("value"))) // 2h gap > 1h tol
    assert(farFwd(1).getAs[Double]("value") == 12.0) // 30min gap
  }

  test("optimizer: left-only filters push below the join; right-side filters do not") {
    val left = Seq(
      (1L, ts("2024-07-01 10:00:00"), 1L),
      (2L, ts("2024-07-01 10:00:00"), 2L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-07-01 09:00:00"), 5.0),
      (1L, ts("2024-07-01 08:00:00"), 99.0))
      .toDF("user_id", "ts", "value")

    def asofPlanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectFirst { case a: AsofJoinPlan => a }.get

    // left-only predicate: lands inside the join's left child
    val pushed = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts")
      .filter($"event_id" === 1L)
    val aj = asofPlanOf(pushed)
    assert(aj.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }.nonEmpty,
      pushed.queryExecution.optimizedPlan.toString)
    assert(pushed.queryExecution.optimizedPlan.collectFirst {
      case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(_, _: AsofJoinPlan) => f
    }.isEmpty, "left-only filter must not remain above the join")
    assert(pushed.collect().map(_.getAs[Long]("event_id")).toSeq == Seq(1L))

    // right-side predicate: must stay ABOVE the join — pushing it down
    // would change which right row matches
    val keptAbove = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts")
      .filter($"value" > 50.0)
    val aj2 = asofPlanOf(keptAbove)
    assert(aj2.right.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }.isEmpty,
      "right-side filter must never push into the right child")
    // semantics check: the 09:00 row (value 5.0) is the match; the filter
    // rejects it post-join — NOT falls back to the 08:00 row
    assert(keptAbove.count() == 0)

    // projection prunes unused columns out of both children
    val pruned = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts")
      .select($"event_id")
    val aj3 = asofPlanOf(pruned)
    // right columns here are (user_id_r, ts_r, value) — only colliding
    // names get the suffix; the unused payload column is "value"
    assert(!aj3.right.output.map(_.name).contains("value"),
      aj3.right.output.map(_.name).mkString(","))
    assert(!aj3.left.output.map(_.name).contains("ts") ||
      aj3.left.output.map(_.name).toSet == Set("user_id", "ts", "event_id"))
  }

  test("plan: AsofJoinExec, no window, two exchanges; downstream per-key agg reuses the partitioning") {
    val left = Seq((1L, ts("2024-07-01 10:00:00"), 1L)).toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts("2024-07-01 09:00:00"), 5.0)).toDF("user_id", "ts", "value")
    val out = AsofJoinNative(left, right, Seq("user_id"), "ts", "ts")
      .groupBy("user_id").count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), plan)
    // two shuffles to co-partition the sides; the aggregation rides the
    // advertised outputPartitioning — no third exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }
}

package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IntervalJoinRewrite: the naive overlap theta-join, written as a user
  * would write it, plans as a hash equi-join once the rule is enabled —
  * with identical results (multiplicity and null semantics included). */
class IntervalJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def ships = Seq(
    (1L, d("2024-01-01"), d("2024-01-20")),
    (2L, d("2024-02-01"), d("2024-02-03")),
    (2L, d("2024-02-01"), d("2024-02-03")), // duplicate row
    (3L, null.asInstanceOf[java.sql.Date], d("2024-03-05")) // null start
  ).toDF("sid", "s0", "s1")

  private def wins = Seq(
    (10L, d("2024-01-15"), d("2024-01-25")),
    (11L, d("2024-02-03"), d("2024-02-10")), // end-touch with sid 2
    (12L, d("2024-03-01"), d("2024-03-09"))  // would match 3 but for null
  ).toDF("wid", "w0", "w1")

  private def naive: DataFrame =
    ships.join(wins, $"s0" <= $"w1" && $"w0" <= $"s1")

  private def withRule[A](binDays: Int = 7)(body: => A): A = {
    IntervalJoinRewrite.register(spark)
    spark.conf.set(IntervalJoinRewrite.ENABLED, "true")
    spark.conf.set(IntervalJoinRewrite.BIN_DAYS, binDays.toString)
    try body
    finally {
      spark.conf.set(IntervalJoinRewrite.ENABLED, "false")
      spark.conf.unset(IntervalJoinRewrite.BIN_DAYS)
    }
  }

  test("rule off: the shape is the nested-loop join this rewrite exists to kill") {
    val p = naive.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"), p)
  }

  test("rule on: same rows (multiplicity + nulls), hash join plan") {
    val expected = naive.collect().map(_.toString).sorted.toSeq
    withRule() {
      val rewritten = naive
      val p = rewritten.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("HashJoin"), p)
      val got = rewritten.collect().map(_.toString).sorted.toSeq
      assert(got == expected)
      // the duplicate left row matched twice; the null-start row never
      assert(rewritten.filter($"sid" === 2).count() == 2)
      assert(rewritten.filter($"sid" === 3).isEmpty)
    }
  }

  test("bin width does not change the answer") {
    val expected = naive.collect().map(_.toString).sorted.toSeq
    for (bd <- Seq(1, 30, 365)) withRule(bd) {
      assert(naive.collect().map(_.toString).sorted.toSeq == expected, s"binDays=$bd")
    }
  }

  test("point-in-interval probes rewrite too (degenerate one-day interval)") {
    val points = Seq((100L, d("2024-01-18"))).toDF("pid", "p")
    withRule() {
      val q = points.join(wins, $"p" >= $"w0" && $"p" <= $"w1")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
      assert(q.select($"wid").as[Long].collect().toSeq == Seq(10L))
    }
  }

  test("joins without the overlap shape are untouched") {
    withRule() {
      val eq = ships.join(wins, $"s0" === $"w0")
      assert(eq.count() == 0) // no equal start dates — but more to the
      // point: the plan must not contain the generated bin explode
      assert(!eq.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }
  }
}

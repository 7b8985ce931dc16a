package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resample: hand-computed interpolation ground truth. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  // key "a": obs on day 1 (10.0) and day 5 (30.0) → linear 15/20/25
  // key "b": single obs → every spine day (just one) observed
  private val obs = Seq(
    ("a", d("2024-01-01"), 10.0),
    ("a", d("2024-01-05"), 30.0),
    ("b", d("2024-02-01"), 7.0)
  ).toDF("k", "day", "v")

  test("linear: interior gaps interpolate exactly, observations pass through") {
    val out = Resample.dailyLinear(obs, "k", "day", "v")
      .orderBy($"k", $"day")
      .select($"k", $"day", $"filled", $"observed")
      .as[(String, java.sql.Date, Double, Boolean)].collect()
    assert(out.toSeq == Seq(
      ("a", d("2024-01-01"), 10.0, true),
      ("a", d("2024-01-02"), 15.0, false),
      ("a", d("2024-01-03"), 20.0, false),
      ("a", d("2024-01-04"), 25.0, false),
      ("a", d("2024-01-05"), 30.0, true),
      ("b", d("2024-02-01"), 7.0, true)))
  }

  test("linear with explicit spine: edges clamp to the nearest observation") {
    val spine = Seq.tabulate(8)(i => ("a", d(f"2024-01-0${i + 1}%s")))
      .toDF("k", "day")
    val out = Resample.dailyLinear(obs.filter($"k" === "a"), "k", "day", "v",
        spine = Some(spine))
      .orderBy($"day").select($"filled").as[Double].collect()
    // days 6-8 sit after the last obs → clamp to 30.0
    assert(out.toSeq == Seq(10.0, 15.0, 20.0, 25.0, 30.0, 30.0, 30.0, 30.0))
  }

  test("ffill: steps hold until the next observation; pre-first days stay null") {
    val spine = Seq.tabulate(6)(i => ("a", d(f"2024-01-0${i + 1}%s"))).toDF("k", "day")
    val shifted = Seq(("a", d("2024-01-03"), 5.0), ("a", d("2024-01-05"), 9.0))
      .toDF("k", "day", "v")
    val out = Resample.dailyFfill(shifted, "k", "day", "v", spine = Some(spine))
      .orderBy($"day").select($"filled").as[java.lang.Double].collect()
    assert(out.toSeq == Seq(null, null, 5.0, 5.0, 9.0, 9.0))
  }

  test("one WindowExec carries both directions (single exchange for the fill)") {
    val p = Resample.dailyLinear(obs, "k", "day", "v")
      .queryExecution.executedPlan.toString
    // both IGNORE NULLS passes share the (k, day) spec: at most 2
    // Window operators (Spark splits opposite frame directions), and
    // exactly one hash exchange on the key for the window work
    assert("hashpartitioning\\(k".r.findAllIn(p).length <= 2, p)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Holt–Winters fold beyond the shared oracle: hand-recursion
  * replay, exact-seasonal recovery (a pure L + weekly pattern with
  * zero-sum seasonals is forecast EXACTLY from observation m+1 on),
  * warmup nulls, key-boundary reset, and short-key null passthrough. */
class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).atStartOfDay())

  test("hand recursion replay on a mixed series") {
    val ys = Seq(10.0, 12.0, 11.0, 13.0, 9.0, 10.5, 11.5, 12.5, 10.25, 11.75)
    val df = ys.zipWithIndex.map { case (y, i) => ("A", day(i), y) }
      .toDF("k", "d", "y")
    val got = HoltWinters.perKey(df, "k", Seq("d"), "y",
        m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
      .orderBy($"d").select($"yhat", $"level", $"trend")
      .as[(Option[Double], Option[Double], Option[Double])].collect().toSeq
    // hand fold
    var l = 0.0; var b = 0.0
    var acc = 0.0; (0 until 7).foreach(i => acc += ys(i)); l = acc / 7
    val sea = Array.tabulate(7)(i => ys(i) - l)
    var idx = 0
    val want = Seq.fill(7)((None, None, None)) ++ ys.drop(7).map { y =>
      val sTm = sea(idx)
      val yhat = l + b + sTm
      val lN = 0.25 * (y - sTm) + 0.75 * (l + b)
      val bN = 0.0625 * (lN - l) + 0.9375 * b
      sea(idx) = 0.25 * (y - lN) + 0.75 * sTm
      idx = (idx + 1) % 7
      l = lN; b = bN
      (Some(yhat), Some(l), Some(b))
    }
    assert(got == want, s"got $got want $want")
  }

  test("a pure level + zero-sum weekly pattern is forecast exactly") {
    val pat = Seq(3.0, -1.0, 2.0, -4.0, 1.0, -2.0, 1.0) // sums to 0
    val ys = (0 until 21).map(i => 100.0 + pat(i % 7))
    val df = ys.zipWithIndex.map { case (y, i) => ("A", day(i), y) }
      .toDF("k", "d", "y")
    val scored = HoltWinters.perKey(df, "k", Seq("d"), "y",
        m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
      .filter($"yhat".isNotNull)
      .select($"y", $"yhat").as[(Double, Double)].collect()
    assert(scored.length == 14)
    // zero-sum pattern ⟹ seed L = 100 exactly, S = pattern exactly,
    // and the recursion reproduces every later observation verbatim
    assert(scored.forall { case (y, yhat) => y == yhat },
      s"forecast drifted: ${scored.filter(t => t._1 != t._2).take(3).toSeq}")
  }

  test("keys reset; short keys stay null") {
    val rows =
      (0 until 9).map(i => ("A", day(i), 10.0 + i)) ++
        (0 until 3).map(i => ("B", day(i), 5.0))
    val got = HoltWinters.perKey(rows.toDF("k", "d", "y"), "k", Seq("d"), "y",
        m = 7, alpha = 0.25, beta = 0.0625, gamma = 0.25)
      .select($"k", $"yhat")
    assert(got.filter($"k" === "B" && $"yhat".isNotNull).count() == 0)
    assert(got.filter($"k" === "A" && $"yhat".isNotNull).count() == 2)
  }
}

package graft.ops

import graft.SparkSpec

/** Pins KalmanLevel.perKey: exact hand-recursion replay per key, the
  * filter-theory invariants (gain monotone decreasing and converging to
  * the steady state, variance bounded by the steady-state fixed point),
  * key-boundary state isolation, and the Ewma null contract. */
class KalmanLevelSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, Long, java.lang.Double)]) = {
    import spark.implicits._
    rows.map { case (k, o, v) => (k, o, Option(v).map(_.doubleValue)) }
      .toDF("k", "o", "v")
  }

  private def replay(ys: Seq[Double], q: Double, r: Double): Seq[(Double, Double, Double)] = {
    var x = ys.head; var p = r
    (x, 1.0, p) +: ys.tail.map { y =>
      val pPred = p + q
      val kg = pPred / (pPred + r)
      x = x + kg * (y - x)
      p = (1 - kg) * pPred
      (x, kg, p)
    }
  }

  test("fold matches the hand recursion per key; gain decreases to steady state") {
    val ys = Seq(10.0, 14.0, 9.0, 12.0, 11.0, 13.0, 10.5, 11.5)
    val df = frame(ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, java.lang.Double.valueOf(y)) }
      ++ Seq((2L, 1L, java.lang.Double.valueOf(5.0)), (2L, 2L, java.lang.Double.valueOf(7.0))))
    val got = KalmanLevel.perKey(df, "k", Seq("o"), "v", q = 0.5, r = 4.0)
      .orderBy("k", "o").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val want = replay(ys, 0.5, 4.0).map { case (x, g, p) => (1L, x, g, p) } ++
      replay(Seq(5.0, 7.0), 0.5, 4.0).map { case (x, g, p) => (2L, x, g, p) }
    assert(got.toSeq == want, s"got=${got.toSeq}")
    // gains after the init step are data-independent, strictly
    // decreasing, and converge toward the steady-state fixed point
    // k∞ = p∞'/(p∞'+r) where p∞' solves p = (1−p/(p+r))·p + q pre-update
    val gains = got.filter(_._1 == 1L).map(_._3).drop(1)
    gains.sliding(2).foreach(w => assert(w(1) < w(0), s"gain rose: ${w(0)} -> ${w(1)}"))
    // steady state for q=0.5, r=4.0: p⁻∞ = (q + sqrt(q² + 4qr))/2
    val pPredInf = (0.5 + math.sqrt(0.5 * 0.5 + 4 * 0.5 * 4.0)) / 2
    val kInf = pPredInf / (pPredInf + 4.0)
    assert(gains.last > kInf && gains.last - kInf < 0.06,
      s"gain ${gains.last} not near steady state $kInf")
    // variance starts at the prior r, contracts monotonically toward the
    // post-update fixed point p∞ = (1−k∞)·p⁻∞, and never crosses it
    val pInf = (1 - kInf) * pPredInf
    val ps = got.filter(_._1 == 1L).map(_._4)
    assert(ps.head == 4.0)
    ps.sliding(2).foreach(w => assert(w(1) < w(0), s"variance rose: ${w(0)} -> ${w(1)}"))
    ps.foreach(p => assert(p > pInf - 1e-12 && p <= 4.0))
  }

  test("key boundaries reset state; nulls pass through untouched") {
    val df = frame(Seq(
      (5L, 1L, 100.0), (5L, 2L, 110.0),
      (6L, 1L, 1.0), (6L, 2L, null), (6L, 3L, 2.0)))
      .coalesce(1)
    val got = KalmanLevel.perKey(df, "k", Seq("o"), "v", q = 0.5, r = 4.0)
      .orderBy("k", "o").collect()
    assert(got(2).getDouble(3) == 1.0 && got(2).getDouble(4) == 1.0,
      "key 6 must not inherit key 5's state")
    assert(got(3).isNullAt(3) && got(3).isNullAt(4) && got(3).isNullAt(5))
    // the null row left state untouched: row 3 continues from row 1's state
    val cont = replay(Seq(1.0, 2.0), 0.5, 4.0)
    assert(got(4).getDouble(3) == cont(1)._1 && got(4).getDouble(4) == cont(1)._2)
  }

  test("oracle-grain smoke: w25 query is deterministic across partitionings") {
    val a = graft.queries.Registry.queries("w25_kalman_level")(
      spark, "/root/testdata/sf0.001").collect().toSeq
    val b = graft.queries.Registry.queries("w25_kalman_level")(
      spark, "/root/testdata/sf0.001").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}

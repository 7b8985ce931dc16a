package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-vs-approx drift bounds for the a16b/a17b production spellings,
  * and the MAD=0 degenerate-group contract shared with the a17 oracle. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("approx winsorize band stays within the exact rank-error envelope") {
    val ev = graft.core.Tables.events(spark, sf)
    // GK rank error at accuracy 10000 is 1e-4; an envelope of ±0.01 in
    // rank space is two orders of magnitude of headroom plus the
    // value-vs-interpolation discreteness gap
    val envelope = ev.groupBy($"event_type").agg(
      expr("percentile(value, 0.04)").as("lo_min"),
      expr("percentile(value, 0.06)").as("lo_max"),
      expr("percentile(value, 0.94)").as("hi_min"),
      expr("percentile(value, 0.96)").as("hi_max"))
    val approx = ev.groupBy($"event_type").agg(
      expr("percentile_approx(value, 0.05, 10000)").as("p_lo"),
      expr("percentile_approx(value, 0.95, 10000)").as("p_hi"))
    val joined = approx.join(envelope, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (pLo, pHi) = (r.getAs[Double]("p_lo"), r.getAs[Double]("p_hi"))
      assert(pLo >= r.getAs[Double]("lo_min") && pLo <= r.getAs[Double]("lo_max"),
        s"${r.get(0)}: approx p05 $pLo outside [p04, p06]")
      assert(pHi >= r.getAs[Double]("hi_min") && pHi <= r.getAs[Double]("hi_max"),
        s"${r.get(0)}: approx p95 $pHi outside [p94, p96]")
    }
  }

  test("approx winsorize summary tracks the exact summary per group") {
    val ev = graft.core.Tables.events(spark, sf)
    def keyed(exact: Boolean) =
      RobustStats.winsorizeSummary(ev, "event_type", "value", exact = exact)
        .collect().map(r => r.getString(0) -> r).toMap
    val ex = keyed(exact = true)
    val ap = keyed(exact = false)
    assert(ex.keySet == ap.keySet && ex.nonEmpty)
    ex.foreach { case (k, e) =>
      val a = ap(k)
      val range = e.getAs[Double]("hi") - e.getAs[Double]("lo")
      // means move by at most the band shift; bound generously at 2% of
      // the clipped range
      assert(math.abs(e.getAs[Double]("winsor_mean") - a.getAs[Double]("winsor_mean")) <= 0.02 * range,
        s"$k winsor_mean drift")
      assert(e.getAs[Long]("n") == a.getAs[Long]("n"))
    }
  }

  test("approx robust z-score tracks exact per group") {
    val ev = graft.core.Tables.events(spark, sf)
    def keyed(exact: Boolean) =
      RobustStats.robustZscoreSummary(ev, "event_type", "value", exact = exact)
        .collect().map(r => r.getString(0) -> r).toMap
    val ex = keyed(exact = true)
    val ap = keyed(exact = false)
    assert(ex.keySet == ap.keySet && ex.nonEmpty)
    ex.foreach { case (k, e) =>
      val a = ap(k)
      assert(math.abs(e.getAs[Double]("max_abs_rz") - a.getAs[Double]("max_abs_rz"))
        <= 0.05 * math.max(1.0, e.getAs[Double]("max_abs_rz")), s"$k max_abs_rz drift")
      // outlier counts may differ only by rows whose |rz| straddles the
      // threshold under the slightly different med/MAD — keep it tight
      assert(math.abs(e.getAs[Long]("n_outliers") - a.getAs[Long]("n_outliers"))
        <= math.max(2L, e.getAs[Long]("n_outliers") / 10), s"$k n_outliers drift")
    }
  }

  test("MAD=0 group: NULL z-scores, zero outliers, NULL max_abs_rz (oracle contract)") {
    // 'deg': three of four values equal the median → MAD 0 → rz NULL
    // for every row (including the 9.0 that a naive divide would send
    // to ±inf on DuckDB and NULL on Spark — the silent-divergence bug)
    val df = Seq(
      ("deg", 5.0), ("deg", 5.0), ("deg", 5.0), ("deg", 9.0),
      ("ok", 1.0), ("ok", 2.0), ("ok", 3.0), ("ok", 100.0))
      .toDF("g", "v")
    val out = RobustStats.robustZscoreSummary(df, "g", "v", exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val deg = out("deg")
    assert(deg.getAs[Long]("n") == 4L)
    assert(deg.getAs[Long]("n_outliers") == 0L)
    assert(deg.isNullAt(deg.fieldIndex("max_abs_rz")))
    val ok = out("ok")
    assert(ok.getAs[Long]("n_outliers") == 1L, "the 100.0 must flag")
    assert(!ok.isNullAt(ok.fieldIndex("max_abs_rz")))
  }
}

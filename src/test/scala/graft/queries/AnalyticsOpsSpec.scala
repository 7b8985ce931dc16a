package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-9 analytics additions, beyond the DuckDB
  * oracle: the CUSUM prefix-trick is replayed against the textbook
  * recursion, Kaplan–Meier against a direct driver computation, the
  * Newton steps against an exact driver replay, and the decomposition /
  * profiling invariants that the hash compare alone wouldn't explain.
  */
class AnalyticsOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a30: weighted median matches a direct driver computation per group") {
    import spark.implicits._
    val got = Registry.queries("a30_weighted_median")(spark, sf)
      .as[(String, Double)].collect().toMap
    val rows = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
      .as[(String, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val sorted = rs.sortBy(_._2)
      val half = rs.map(_._3).sum / 2.0
      var cum = 0.0
      val expect = sorted.find { r => cum += r._3; cum >= half }.get._2
      assert(math.abs(got(flag) - expect) < 1e-9, s"flag=$flag")
    }
  }

  test("a32: Gini matches the direct Lorenz computation and sits in [0,1)") {
    import spark.implicits._
    val got = Registry.queries("a32_gini_spend")(spark, sf)
      .select($"nationkey", $"gini").as[(Long, Double)].collect().toMap
    val spend = Tables.orders(spark, sf).groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 4).as("x"))
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey", $"x").as[(Long, Double)].collect()
    spend.groupBy(_._1).foreach { case (nk, rs) =>
      val xs = rs.map(_._2).sorted
      val n = xs.length.toDouble
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val expect = 2.0 * six / (n * xs.sum) - (n + 1.0) / n
      assert(got(nk) >= 0.0 - 1e-9 && got(nk) < 1.0)
      assert(math.abs(got(nk) - expect) < 1e-3, s"nation=$nk got=${got(nk)} want=$expect")
    }
  }

  test("w19: the prefix-sum spelling equals the textbook CUSUM recursion") {
    import spark.implicits._
    val out = Registry.queries("w19_cusum_changepoint")(spark, sf)
      .select($"event_type", $"day", $"zscore", $"s_up", $"s_dn")
      .as[(String, java.sql.Timestamp, Double, Double, Double)]
      .collect().groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2.getTime)
      var su = 0.0
      var sd = 0.0
      sorted.foreach { case (_, _, z, gotUp, gotDn) =>
        su = math.max(0.0, su + z - 0.5)
        sd = math.max(0.0, sd - z - 0.5)
        // rows carry round-4 values; the recursion replay accumulates
        // round-4 z's, so agreement is to ~1e-3 after 30 steps
        assert(math.abs(gotUp - su) < 5e-3, s"s_up $gotUp vs $su")
        assert(math.abs(gotDn - sd) < 5e-3, s"s_dn $gotDn vs $sd")
      }
    }
  }

  test("w20: decomposition identity v = trend + seasonal + resid on interior rows") {
    import spark.implicits._
    val out = Registry.queries("w20_stl_anomaly")(spark, sf).cache()
    try {
      val interior = out.filter($"trend".isNotNull)
      assert(interior.count() > 0)
      val bad = interior
        .filter(abs($"v" - ($"trend" + $"seasonal" + $"resid")) > lit(5e-4))
      assert(bad.isEmpty, bad.collect().mkString("; "))
      // edges (first/last 3 days per key) have no full centered frame
      assert(out.filter($"trend".isNull).count() > 0)
    } finally { out.unpersist(); () }
  }

  test("pipe_survival_km: monotone curve, shrinking risk set, direct KM replay") {
    import spark.implicits._
    val got = Registry.queries("pipe_survival_km")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.nonEmpty && got.head._5 <= 1.0 + 1e-9)
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._5 <= a._5 + 1e-9, "survival must be non-increasing")
        assert(b._2 < a._2, "risk set must shrink")
      case _ =>
    }
    // direct replay from the per-duration counts the query itself reports
    var s = 1.0
    got.foreach { case (_, nRisk, dd, _, gotS) =>
      if (dd > 0) s *= 1.0 - dd.toDouble / nRisk.toDouble
      assert(math.abs(gotS - s) < 1e-3, s"S=$gotS vs replay=$s")
    }
  }

  test("pipe_logistic_newton: exact driver replay of two Newton steps") {
    import spark.implicits._
    val row = Registry.queries("pipe_logistic_newton")(spark, sf).collect()(0)
    val (gotW, gotB) = (row.getDouble(0), row.getDouble(1))
    val logloss = row.getDouble(3)
    val acc = row.getDouble(4)
    val xy = Tables.events(spark, sf)
      .select($"value".cast("double"),
        when($"event_type" === "purchase", 1.0).otherwise(0.0))
      .as[(Double, Double)].collect()
    val n = xy.length.toDouble
    val mx = xy.map(_._1).sum / n
    val sdx = math.sqrt(xy.map(t => (t._1 - mx) * (t._1 - mx)).sum / n)
    val data = xy.map { case (x, y) => ((x - mx) / sdx, y) }
    def newtonStep(w: Double, b: Double): (Double, Double) = {
      var gw = 0.0; var gb = 0.0; var hww = 0.0; var hwb = 0.0; var hbb = 0.0
      data.foreach { case (x, y) =>
        val p = 1.0 / (1.0 + math.exp(-(w * x + b)))
        gw += (p - y) * x; gb += p - y
        val q = p * (1.0 - p)
        hww += q * x * x; hwb += q * x; hbb += q
      }
      val det = hww * hbb - hwb * hwb
      (w - (hbb * gw - hwb * gb) / det, b - (hww * gb - hwb * gw) / det)
    }
    val (w1, b1) = newtonStep(0.0, 0.0)
    val (w2, b2) = newtonStep(w1, b1)
    assert(math.abs(gotW - w2) < 1e-3, s"w $gotW vs $w2")
    assert(math.abs(gotB - b2) < 1e-3, s"b $gotB vs $b2")
    // two Newton steps must beat the uninformed start (ln 2) and hold
    // majority-class accuracy
    assert(logloss < math.log(2.0))
    assert(acc >= 0.7)
  }

  test("o23: profile counts agree with direct scans") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val got = Registry.queries("o23_table_profile")(spark, sf)
      .select($"column_name", $"n_rows", $"n_distinct").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val total = li.count()
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").foreach { c =>
      assert(got(c)._1 == total)
      assert(got(c)._2 == li.select(col(c)).na.drop().distinct().count(), c)
    }
  }

  test("text_zipf_slope: negative slope with a meaningful fit per source") {
    import spark.implicits._
    val rows = Registry.queries("text_zipf_slope")(spark, sf)
      .select($"source", $"zipf_slope", $"r2").as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, slope, r2) =>
      assert(slope < 0.0, s"$src slope=$slope")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$src r2=$r2")
    }
  }
}

package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Behavioral pins beyond the DuckDB oracle for the classical-test
  * family (a46 Kaplan–Meier, a47 Mann–Whitney, a48 chi-square): exact
  * driver-side replays of each statistic from first principles, the
  * invariants the theory promises (monotone survival, U_a+U_b = n_a·n_b,
  * V ∈ [0,1]), and the scale-shape pin that a47's rank window is
  * partitioned by range bucket, never a single global sort.
  */
class StatTestsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a48_chi_square: driver replay incl. zero cells; V in [0,1]; dof") {
    import spark.implicits._
    val r = Registry.queries("a48_chi_square")(spark, sf).collect()(0)
    val (n, nr, nc, dof, chi2, v) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5))
    assert(dof == (nr - 1) * (nc - 1))
    assert(chi2 >= 0.0 && v >= 0.0 && v <= 1.0, s"chi2=$chi2 v=$v")
    // replay from the raw table, iterating the FULL r×c grid so zero
    // cells contribute (0−E)²/E — the groupBy-only shortcut would skip
    // them and understate the statistic
    val cells = Tables.customer(spark, sf)
      .groupBy($"c_nationkey", $"c_mktsegment").agg(count(lit(1)).as("o"))
      .as[(Int, String, Long)].collect()
    val rowT = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colT = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tot = cells.map(_._3).sum.toDouble
    assert(n == tot.toLong && nr == rowT.size && nc == colT.size)
    val obs = cells.map(c => (c._1, c._2) -> c._3).toMap
    var acc = 0L
    for (rk <- rowT.keys; ck <- colT.keys) {
      val e = rowT(rk) * colT(ck) / tot
      val o = obs.getOrElse((rk, ck), 0L)
      acc += math.floor((o - e) * (o - e) / e * 1e8 + 0.5).toLong
    }
    val want = math.floor(acc / 1e8 * 10000 + 0.5) / 10000
    assert(math.abs(chi2 - want) < 1e-9, s"chi2 $chi2 vs replay $want")
    val wantV = math.floor(math.sqrt(acc / 1e8 / tot / (math.min(nr, nc) - 1))
      * 10000 + 0.5) / 10000
    assert(math.abs(v - wantV) < 1e-9, s"v $v vs replay $wantV")
  }

  test("a47_mann_whitney: driver replay of average ranks; U_a + U_b = n_a·n_b") {
    import spark.implicits._
    val r = Registry.queries("a47_mann_whitney")(spark, sf).collect()(0)
    val (na, nb, ua, z) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val xs = Tables.orders(spark, sf)
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_orderpriority", $"o_totalprice")
      .as[(String, Double)].collect()
    assert(na == xs.count(_._1 == "1-URGENT") && nb == xs.count(_._1 == "2-HIGH"))
    // average ranks: min-rank + (ties−1)/2, computed by sorting
    val sorted = xs.map(_._2).sorted
    val minRank = sorted.zipWithIndex.reverse.toMap.map { case (v, i) => v -> (i + 1) }
    val tieCnt = sorted.groupBy(identity).view.mapValues(_.length).toMap
    val rA = xs.filter(_._1 == "1-URGENT")
      .map(t => minRank(t._2) + (tieCnt(t._2) - 1) / 2.0).sum
    val wantU = rA - na * (na + 1) / 2.0
    assert(math.abs(ua - math.floor(wantU * 10000 + 0.5) / 10000) < 1e-9,
      s"U_a $ua vs replay $wantU")
    // U_a + U_b = n_a·n_b (rank-sum identity)
    val rB = xs.filter(_._1 == "2-HIGH")
      .map(t => minRank(t._2) + (tieCnt(t._2) - 1) / 2.0).sum
    val uB = rB - nb * (nb + 1) / 2.0
    assert(math.abs(wantU + uB - na.toDouble * nb) < 1e-6)
    // z replay with tie correction
    val n = (na + nb).toDouble
    val tie3 = tieCnt.values.map(t => t.toLong * t * t - t).sum
    val varU = na.toDouble * nb / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    val wantZ = math.floor((wantU - na.toDouble * nb / 2.0) / math.sqrt(varU)
      * 10000 + 0.5) / 10000
    assert(math.abs(z - wantZ) < 1e-9, s"z $z vs replay $wantZ")
  }

  test("a47_mann_whitney: rank window is bucket-partitioned, not one global sort") {
    val p = Registry.queries("a47_mann_whitney")(spark, sf)
      .queryExecution.executedPlan.toString
    // the rank over the full base frame must carry the bucket key in its
    // window partition spec; only the ≤1024-row bucket-count prefix sum
    // may sort globally
    assert(p.contains("windowspecdefinition(b#"),
      s"expected the value rank to be partitioned by bucket b:\n$p")
  }

  test("a46_kaplan_meier: exact driver replay; survival monotone non-increasing") {
    import spark.implicits._
    val out = Registry.queries("a46_kaplan_meier")(spark, sf).collect()
    assert(out.nonEmpty)
    // monotone, bounded
    out.map(_.getDouble(4)).foldLeft(1.0) { (prev, s) =>
      assert(s <= prev + 1e-12 && s >= 0.0 && s <= 1.0, s"survival not monotone: $s > $prev")
      s
    }
    // replay from raw events
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
    val cut = ev.map(_._2.getTime).max
    val su = ev.filter(_._3 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._2.getTime).min).toMap
    val durs = su.toSeq.map { case (u, s0) =>
      val pu = ev.filter(e => e._1 == u && e._3 == "purchase" && e._2.getTime >= s0)
        .map(_._2.getTime).sorted.headOption
      // ms→hours floor-div matches the micros div in-plan (ts are µs-grain)
      (math.floorDiv(pu.getOrElse(cut) - s0, 3600000L), pu.isDefined)
    }
    val total = durs.size.toLong
    val grain = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (dur, g) =>
      (dur, g.count(_._2).toLong, g.count(!_._2).toLong)
    }
    var atRisk = total
    var surv = 1.0
    val want = grain.flatMap { case (dur, d, c) =>
      val row = if (d > 0) {
        surv *= (atRisk - d).toDouble / atRisk
        Some((dur, atRisk, d, c, surv))
      } else None
      atRisk -= d + c
      row
    }
    assert(out.length == want.length, s"${out.length} vs ${want.length} event rows")
    out.zip(want).foreach { case (r, (dur, nr, d, c, s)) =>
      assert(r.getLong(0) == dur && r.getLong(1) == nr &&
        r.getLong(2) == d && r.getLong(3) == c,
        s"integer cols at dur=$dur: got (${r.getLong(0)},${r.getLong(1)},${r.getLong(2)},${r.getLong(3)}) want ($dur,$nr,$d,$c)")
      assert(math.abs(r.getDouble(4) - s) < 2e-4, s"survival at dur=$dur: ${r.getDouble(4)} vs $s")
    }
    // conservation: every signup user is accounted once (event or censor)
    assert(grain.map(g => g._2 + g._3).sum == total)
  }
}

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

  test("a66_levene: W nonnegative; k and n match the group census") {
    import spark.implicits._
    val r = Registry.queries("a66_levene")(spark, sf).collect()(0)
    val (k, n, w) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(w >= 0.0, s"Levene W must be nonnegative, got $w")
    val g = Tables.orders(spark, sf).groupBy($"o_orderpriority").count().collect()
    assert(k == g.length.toLong && n == g.map(_.getLong(1)).sum)
  }

  test("a65_spearman: driver replay via sort-based average ranks; rho in [-1,1]") {
    import spark.implicits._
    val r = Registry.queries("a65_spearman")(spark, sf).collect()(0)
    val (n, rho) = (r.getLong(0), r.getDouble(1))
    assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
    val xs = Tables.lineitem(spark, sf)
      .select($"l_quantity".cast("double"), $"l_extendedprice")
      .as[(Double, Double)].collect()
    assert(n == xs.length.toLong)
    def avgRanks(v: Array[Double]): Array[Double] = {
      val idx = v.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](v.length)
      var i = 0
      while (i < idx.length) {
        var j = i
        while (j + 1 < idx.length && idx(j + 1)._1 == idx(i)._1) j += 1
        val avg = (i + 1 + j + 1) / 2.0
        for (k <- i to j) out(idx(k)._2) = avg
        i = j + 1
      }
      out
    }
    val rx = avgRanks(xs.map(_._1)); val ry = avgRanks(xs.map(_._2))
    val mx = rx.sum / rx.length; val my = ry.sum / ry.length
    val num = rx.indices.map(i => (rx(i) - mx) * (ry(i) - my)).sum
    val den = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum *
      ry.map(a => (a - my) * (a - my)).sum)
    val want = math.floor(num / den * 10000 + 0.5) / 10000
    assert(math.abs(rho - want) < 2e-4, s"rho $rho vs replay $want")
  }

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

  test("a49_anova_f: driver replay from group sums; partition of total SS") {
    import spark.implicits._
    val r = Registry.queries("a49_anova_f")(spark, sf).collect()(0)
    val (k, n, ssb, ssw, f) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val xs = Tables.lineitem(spark, sf)
      .select($"l_returnflag", ($"l_extendedprice" / 65536.0))
      .as[(String, Double)].collect()
    assert(k == xs.map(_._1).distinct.length && n == xs.length)
    // replay with the same 1e-6 quantization chain
    val byG = xs.groupBy(_._1).values.map { g =>
      val sq = g.map(t => math.floor(t._2 * 1e6 + 0.5).toLong).sum
      val ssq = g.map(t => math.floor(t._2 * t._2 * 1e6 + 0.5).toLong).sum
      (g.length.toLong, sq, ssq)
    }.toSeq
    val wq = byG.map { case (ng, sq, ssq) =>
      val s = sq.toDouble / 1e6; val ss = ssq.toDouble / 1e6
      math.floor((ss - s * s / ng) * 1e6 + 0.5).toLong
    }.sum
    val bq = byG.map { case (ng, sq, _) =>
      val s = sq.toDouble / 1e6
      math.floor(s * s / ng * 1e6 + 0.5).toLong
    }.sum
    val sqAll = byG.map(_._2).sum.toDouble
    val wantSsb = bq / 1e6 - (sqAll / 1e6) * (sqAll / 1e6) / n
    val wantSsw = wq / 1e6
    assert(math.abs(ssb - math.floor(wantSsb * 1e4 + 0.5) / 1e4) < 1e-9)
    assert(math.abs(ssw - math.floor(wantSsw * 1e4 + 0.5) / 1e4) < 1e-9)
    val wantF = (wantSsb / (k - 1)) / (wantSsw / (n - k))
    assert(math.abs(f - math.floor(wantF * 1e4 + 0.5) / 1e4) < 1e-9, s"F $f vs $wantF")
    assert(ssb >= 0 && ssw > 0 && f >= 0)
  }

  test("a50_cusum_argmax: C ends at ~0, argmax day replays, exactly the max rows flagged") {
    import spark.implicits._
    val out = Registry.queries("a50_cusum_argmax")(spark, sf).collect()
    assert(out.nonEmpty)
    // Σ(x − x̄) over the whole series is identically 0 — the last
    // cumulative value must be 0 up to the 4dp display floor
    assert(math.abs(out.last.getDouble(1)) <= 1e-4, s"C_n = ${out.last.getDouble(1)}")
    val flagged = out.filter(_.getBoolean(2))
    assert(flagged.nonEmpty)
    val maxAbs = out.map(r => math.abs(r.getDouble(1))).max
    flagged.foreach(r => assert(math.abs(math.abs(r.getDouble(1)) - maxAbs) <= 2e-4))
    // replay: day-grain quantized sums, integer-cleared recurrence
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(sum(floor($"value" * 1000000.0 + 0.5).cast("long")).as("vq"))
      .as[(java.sql.Timestamp, Long)].collect().sortBy(_._1.getTime)
    val n = daily.length.toLong
    val tot = daily.map(_._2).sum
    var cum = 0L
    val cns = daily.zipWithIndex.map { case ((_, vq), i) =>
      cum += vq; n * cum - (i + 1) * tot
    }
    val wantArgmax = cns.zipWithIndex.maxBy(t => (math.abs(t._1), -t._2))._2
    assert(flagged.map(_.getTimestamp(0)).contains(daily(wantArgmax)._1),
      s"argmax day ${daily(wantArgmax)._1} not flagged")
  }

  test("a51_partial_corr: one-scan plan; recursion-formula replay from a45's matrix") {
    val df = Registry.queries("a51_partial_corr")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1,
      s"all pair sums must share one scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    val out = df.collect()
    assert(out.length == 12)
    out.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, r.toString))
    // replay from the raw corr matrix (a45 on the same dir), applying
    // r_xy.z = (r_xy − r_xz r_yz)/sqrt((1−r_xz²)(1−r_yz²)); a45 rounds
    // its output to 4dp so the replay tolerance is the propagated 4dp
    val corr = Registry.queries("a45_corr_matrix")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def c(a: String, b: String): Double =
      if (a == b) 1.0
      else corr.getOrElse(s"${a}_$b", corr(s"${b}_$a"))
    out.foreach { r =>
      val Array(a, b) = r.getString(0).split('_')
      val z = r.getString(1)
      val want = (c(a, b) - c(a, z) * c(b, z)) /
        (math.sqrt(1.0 - c(a, z) * c(a, z)) * math.sqrt(1.0 - c(b, z) * c(b, z)))
      assert(math.abs(r.getDouble(2) - want) < 5e-3,
        s"${r.getString(0)}.$z: ${r.getDouble(2)} vs replay $want")
    }
  }

  test("a53_tost_equivalence: Welch replay; verdict consistent with the emitted t's") {
    import spark.implicits._
    val r = Registry.queries("a53_tost_equivalence")(spark, sf).collect()(0)
    val (n1, n2, diff, delta, tLo, tUp, eq) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))
    val xs = Tables.orders(spark, sf)
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_orderpriority", $"o_totalprice" / 65536.0)
      .as[(String, Double)].collect()
    def q6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    def stats(g: String) = {
      val v = xs.filter(_._1 == g).map(_._2)
      (v.length.toLong, v.map(q6).sum / 1e6, v.map(x => q6(x * x)).sum / 1e6)
    }
    val (wn1, s1, ss1) = stats("1-URGENT"); val (wn2, s2, ss2) = stats("2-HIGH")
    assert(n1 == wn1 && n2 == wn2)
    val m1 = s1 / wn1; val m2 = s2 / wn2
    val v1 = (ss1 - s1 * s1 / wn1) / (wn1 - 1); val v2 = (ss2 - s2 * s2 / wn2) / (wn2 - 1)
    val se = math.sqrt(v1 / wn1 + v2 / wn2)
    val d = m1 - m2
    val del = (s1 + s2) / (wn1 + wn2) * 0.02
    def f4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(math.abs(diff - f4(d)) < 1e-9 && math.abs(delta - f4(del)) < 1e-9)
    val wLo = math.floor((d + del) / se * 1e4 + 0.5) / 1e4
    val wUp = math.floor((del - d) / se * 1e4 + 0.5) / 1e4
    assert(math.abs(tLo - wLo) < 1e-9 && math.abs(tUp - wUp) < 1e-9,
      s"t=($tLo,$tUp) vs replay ($wLo,$wUp)")
    // verdict must be exactly the conjunction on the emitted quantized t's
    assert(eq == (tLo > 1.6449 && tUp > 1.6449))
  }

  test("a54_holm_bonferroni: step-down is a rank prefix; z replay from group sums") {
    import spark.implicits._
    val out = Registry.queries("a54_holm_bonferroni")(spark, sf).collect()
    assert(out.length == 5)
    // holm rejections form a prefix of the rank order, and imply raw
    val holmFlags = out.sortBy(_.getInt(3)).map(_.getBoolean(5))
    assert(!holmFlags.dropWhile(identity).contains(true), holmFlags.mkString(","))
    out.foreach(r => assert(!r.getBoolean(5) || r.getBoolean(4), r.toString))
    // z replay (one-vs-rest Welch z from the quantized chain)
    val xs = Tables.orders(spark, sf)
      .select($"o_orderpriority", $"o_totalprice" / 65536.0)
      .as[(String, Double)].collect()
    def q6(v: Double) = math.floor(v * 1e6 + 0.5).toLong
    val by = xs.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(t => q6(t._2)).sum, g.map(t => q6(t._2 * t._2)).sum)
    }.toMap
    val (nt, sqt, ssqt) = by.values.foldLeft((0L, 0L, 0L)) {
      case ((a, b, c), (x, y, z)) => (a + x, b + y, c + z)
    }
    out.foreach { r =>
      val (n, sq, ssq) = by(r.getString(0))
      val nr = nt - n
      val s1 = sq / 1e6; val ss1 = ssq / 1e6
      val s2 = (sqt - sq) / 1e6; val ss2 = (ssqt - ssq) / 1e6
      val se = math.sqrt(((ss1 - s1 * s1 / n) / (n - 1)) / n +
        ((ss2 - s2 * s2 / nr) / (nr - 1)) / nr)
      val z = (s1 / n - s2 / nr) / se
      assert(math.abs(r.getDouble(2) - math.floor(z * 1e4 + 0.5) / 1e4) < 1e-9,
        s"${r.getString(0)}: z ${r.getDouble(2)} vs replay $z")
    }
  }

  test("a55_bh_fdr: step-up rejects the prefix through the largest hit; ⊇ Holm") {
    val bh = Registry.queries("a55_bh_fdr")(spark, sf).collect()
    val holm = Registry.queries("a54_holm_bonferroni")(spark, sf).collect()
    assert(bh.length == 5 && holm.length == 5)
    // step-up semantics: reject_bh ⟺ rank ≤ k* = max rank whose own z
    // clears its critical (ranks BELOW k* are rejected even on a miss)
    val kstar = bh.filter(_.getBoolean(4)).map(_.getInt(3))
      .foldLeft(0)(math.max)
    bh.foreach { r =>
      assert(r.getBoolean(5) == (r.getInt(3) <= kstar),
        s"${r.getString(0)}: rank ${r.getInt(3)} vs kstar $kstar")
    }
    // FDR is never more conservative than FWER: every Holm critical
    // α/(k−r+1) ≤ the BH critical α·r/k at the same rank, so Holm's
    // rejection set must be a subset of BH's
    val bhRej = bh.filter(_.getBoolean(5)).map(_.getString(0)).toSet
    val holmRej = holm.filter(_.getBoolean(5)).map(_.getString(0)).toSet
    assert(holmRej.subsetOf(bhRej), s"holm=$holmRej bh=$bhRej")
    // identical z machinery: z agrees with a54 group-for-group
    val zBh = bh.map(r => r.getString(0) -> r.getDouble(2)).toMap
    holm.foreach(r => assert(zBh(r.getString(0)) == r.getDouble(2)))
  }

  test("a56_kruskal_wallis: driver replay of H and the tie correction") {
    import spark.implicits._
    val r = Registry.queries("a56_kruskal_wallis")(spark, sf).collect()(0)
    val xs = Tables.events(spark, sf)
      .filter($"value".isNotNull).select($"event_type", $"value")
      .as[(String, Double)].collect()
    val n = xs.length
    val sorted = xs.map(_._2).sorted
    val firstIdx = scala.collection.mutable.Map[Double, Int]()
    val cnt = scala.collection.mutable.Map[Double, Int]()
    sorted.zipWithIndex.foreach { case (v, i) =>
      if (!firstIdx.contains(v)) firstIdx(v) = i + 1
      cnt(v) = cnt.getOrElse(v, 0) + 1
    }
    def avgRank(v: Double) = firstIdx(v) + (cnt(v) - 1) / 2.0
    val groups = xs.groupBy(_._1)
    val sterm = groups.values.map { g =>
      val rg = g.map(x => avgRank(x._2)).sum
      rg * rg / g.length
    }.sum
    val h = 12.0 / (n.toDouble * (n + 1)) * sterm - 3.0 * (n + 1)
    val t3 = cnt.values.map(t => t.toLong * t * t - t).sum.toDouble
    val c = 1.0 - t3 / (n.toDouble * n * n - n)
    assert(r.getLong(0) == n && r.getLong(1) == groups.size)
    assert(math.abs(r.getDouble(2) - h) < 1e-3, s"h ${r.getDouble(2)} vs $h")
    assert(math.abs(r.getDouble(3) - h / c) < 1e-3,
      s"hc ${r.getDouble(3)} vs ${h / c}")
    // rank sums are conserved: Σ R_g = N(N+1)/2 ⟹ H ≥ 0
    assert(h >= 0.0)
  }

  test("a57_mcnemar: discordant cells replay; verdict is the exact integer comparison") {
    import spark.implicits._
    val r = Registry.queries("a57_mcnemar")(spark, sf).collect()(0)
    val per = Tables.events(spark, sf)
      .select($"user_id", $"event_type", dayofmonth($"ts").as("dom"))
      .as[(Long, String, Int)].collect()
      .groupBy(_._1).view.mapValues { es =>
        (es.exists(e => e._2 == "purchase" && e._3 <= 15),
          es.exists(e => e._2 == "purchase" && e._3 >= 16))
      }.toMap
    val n10 = per.values.count { case (a, b) => a && !b }.toLong
    val n01 = per.values.count { case (a, b) => !a && b }.toLong
    val n11 = per.values.count { case (a, b) => a && b }.toLong
    val n00 = per.values.count { case (a, b) => !a && !b }.toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((n10, n01, n11, n00)))
    assert(n10 + n01 + n11 + n00 == per.size)
    // verdict matches the cross-multiplied integer rule exactly
    assert(r.getBoolean(5) ==
      ((n10 - n01) * (n10 - n01) * 10000L > 38415L * (n10 + n01)))
  }

  test("a60_power_mde: replay from the two arms' moments; scaling laws hold") {
    import spark.implicits._
    val r = Registry.queries("a60_power_mde")(spark, sf).collect()(0)
    val xs = Tables.orders(spark, sf)
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_orderpriority", $"o_totalprice")
      .as[(String, Double)].collect()
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    def arm(g: String) = {
      val vs = xs.filter(_._1 == g).map(t => t._2 / 65536.0)
      (vs.length, vs.map(q6).sum, vs.map(v => q6(v * v)).sum)
    }
    val (n1, s1, ss1) = arm("1-URGENT"); val (n2, s2, ss2) = arm("2-HIGH")
    val vp = ((ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2)) / (n1 + n2 - 2)
    val mu = (s1 + s2) / (n1 + n2)
    val mde = 2.801585 * math.sqrt(vp) * math.sqrt(1.0 / n1 + 1.0 / n2)
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(math.abs(r.getDouble(3) - mde) < 1e-3, s"mde ${r.getDouble(3)} vs $mde")
    assert(math.abs(r.getDouble(4) - mde / mu) < 1e-3)
    val nreq = math.ceil(2.0 * vp * 2.801585 * 2.801585 / math.pow(0.01 * mu, 2)).toLong
    assert(math.abs(r.getLong(5) - nreq) <= 1,
      s"n_req ${r.getLong(5)} vs $nreq")
    // sanity: detecting a 1% lift needs far more than the current arms
    assert(r.getLong(5) > r.getLong(0))
  }

  test("graph_modularity: Q replays from the LPA census; bounded") {
    // sf0.01: the co-purchase graph needs support ≥ 20 to have edges
    val gsf = "/root/testdata/sf0.01"
    val census = Registry.queries("graph_label_propagation")(spark, gsf).collect()
    val q = Registry.queries("graph_modularity")(spark, gsf).collect()(0)
    val m = census.map(_.getLong(2)).sum // within-edges ≤ m; need true m
    assert(q.getLong(1) == census.length)
    val mEdges = q.getLong(0).toDouble
    val want = census.map { r =>
      val e = r.getLong(2).toDouble; val dt = r.getLong(3).toDouble
      math.floor((e / mEdges - (dt / (2.0 * mEdges)) * (dt / (2.0 * mEdges)))
        * 1e12 + 0.5)
    }.sum / 1e12
    assert(math.abs(q.getDouble(2) - want) < 1e-3,
      s"q ${q.getDouble(2)} vs replay $want")
    assert(q.getDouble(2) > -0.5 && q.getDouble(2) <= 1.0)
    assert(m <= q.getLong(0), "within-community edges exceed total edges")
  }

  test("a61_icc_design_effect: one-way random-effects replay; deff consistent") {
    import spark.implicits._
    val r = Registry.queries("a61_icc_design_effect")(spark, sf).collect()(0)
    val xs = Tables.events(spark, sf).filter($"value".isNotNull)
      .select($"user_id", $"value" / 512.0)
      .as[(Long, Double)].collect()
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val byU = xs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = byU.size; val nt = xs.length
    val stats = byU.values.map { vs =>
      val n = vs.length
      val s = vs.map(q6).sum; val ss = vs.map(v => q6(v * v)).sum
      (n, s, math.floor((ss - s * s / n) * 1e6 + 0.5) / 1e6,
        math.floor(s * s / n * 1e6 + 0.5) / 1e6)
    }.toSeq
    val ssw = stats.map(_._3).sum
    val sqAll = stats.map(_._2).sum
    val ssb = stats.map(_._4).sum - sqAll * sqAll / nt
    val msb = ssb / (k - 1); val msw = ssw / (nt - k)
    val n0 = (nt - stats.map(t => t._1.toDouble * t._1).sum / nt) / (k - 1)
    val icc = (msb - msw) / (msb + (n0 - 1.0) * msw)
    assert(r.getLong(0) == k && r.getLong(1) == nt)
    assert(math.abs(r.getDouble(2) - n0) < 1e-3, s"n0 ${r.getDouble(2)} vs $n0")
    assert(math.abs(r.getDouble(3) - icc) < 1e-3, s"icc ${r.getDouble(3)} vs $icc")
    assert(math.abs(r.getDouble(4) - (1.0 + 49.0 * icc)) < 1e-2)
    // ICC is a correlation: bounded; deff ≥ 1 − 49/(n0−1)-ish, sanity only
    assert(r.getDouble(3) > -1.0 && r.getDouble(3) < 1.0)
  }

  test("graph_assortativity: Pearson-over-degrees replay; r in [-1, 1]") {
    val gsf = "/root/testdata/sf0.01"
    val r = Registry.queries("graph_assortativity")(spark, gsf).collect()(0)
    // replay from the LPA census's edge universe is not available
    // directly; recompute degrees from the emitted m and the census's
    // degree mass is insufficient — so replay from scratch via the
    // label-propagation entry's own inputs: edges = pairs of parts
    // co-purchased in ≥2 orders among parts with support ≥ 20
    import spark.implicits._
    val items = graft.core.Tables.lineitem(spark, gsf)
      .select($"l_orderkey".as("k"), $"l_partkey".as("p")).distinct()
      .as[(Long, Long)].collect()
    val sup = items.groupBy(_._2).view.mapValues(_.length).toMap
    val byOrder = items.filter(t => sup(t._2) >= 20).groupBy(_._1)
    val pairCnt = scala.collection.mutable.Map[(Long, Long), Int]()
    byOrder.values.foreach { os =>
      val ps = os.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCnt((ps(i), ps(j))) = pairCnt.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = pairCnt.filter(_._2 >= 2).keys.toSeq
    val deg = scala.collection.mutable.Map[Long, Long]()
    edges.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
    }
    val dirPairs = edges.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a)))
    }
    val n = dirPairs.length.toLong
    val sx = dirPairs.map(_._1).sum; val sxy = dirPairs.map(t => t._1 * t._2).sum
    val sxx = dirPairs.map(t => t._1 * t._1).sum
    val want = (n * sxy - sx * sx).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * sxx - sx * sx).toDouble))
    assert(r.getLong(0) == edges.length, s"${r.getLong(0)} vs ${edges.length} edges")
    assert(math.abs(r.getDouble(1) - want) < 1e-3,
      s"r ${r.getDouble(1)} vs replay $want")
    assert(r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0)
  }

  test("pipe_group_split: zero cross-split users under the group hash; row hash leaks") {
    val out = Registry.queries("pipe_group_split")(spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(3) == 0L, s"group split leaked ${r.getLong(3)} users")
      assert(r.getLong(4) > 0L, "row-hash counterfactual shows no leak — fixture degenerate")
    }
    // splits partition the corpus: event and user counts conserve
    val totalEvents = out.map(_.getLong(1)).sum
    val totalUsers = out.map(_.getLong(2)).sum
    assert(totalEvents == graft.core.Tables.events(spark, "/root/testdata/sf0.01").count())
    // group split ⇒ user sets disjoint ⇒ user counts ADD to the corpus total
    val distinctUsers = graft.core.Tables.events(spark, "/root/testdata/sf0.01")
      .select("user_id").distinct().count()
    assert(totalUsers == distinctUsers, s"$totalUsers vs $distinctUsers")
  }
}

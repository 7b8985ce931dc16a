package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Behavioral pins beyond the DuckDB oracle for the retrieval /
  * association / audit / information-theory / conformal operators:
  * driver-side recomputation of BM25 and the basket rules, the Benford
  * histogram's probability-mass invariants, MI's information
  * inequalities, and the ~90% coverage the split-conformal theorem
  * actually promises.
  */
class RetrievalRulesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("text_bm25_search: exact driver replay of Okapi BM25 reproduces the top-10") {
    import spark.implicits._
    val out = Registry.queries("text_bm25_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(out.nonEmpty && out.length <= 10)

    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val terms = Seq("spark", "window", "dup")
    val k1 = 1.2; val b = 0.75
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }
    val n = docs.length.toDouble
    val avgdl = toks.map(_._2.length).sum / n
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    val replay = toks.flatMap { case (id, ws) =>
      val dl = ws.length.toDouble
      val ts = terms.flatMap { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          Some(idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        }
      }
      if (ts.isEmpty) None
      else Some((id, BigDecimal(ts.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, ts.length))
    }.sortBy { case (id, s, _) => (-s, id) }.take(10)
    assert(out.toSeq == replay.toSeq,
      s"spark=${out.toSeq.take(3)} replay=${replay.toSeq.take(3)}")
  }

  test("pipe_market_basket: rule algebra holds and a driver replay agrees") {
    import spark.implicits._
    // thresholds scale with the tiny sf: recompute rules directly
    val out = Registry.queries("pipe_market_basket")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.length == 20)
    val items = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val sup = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val nBaskets = byOrder.size.toDouble
    val pairSup = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, ps) <- byOrder; i <- ps.indices; j <- (i + 1) until ps.length
         if sup(ps(i)) >= 20 && sup(ps(j)) >= 20)
      pairSup((ps(i), ps(j))) = pairSup.getOrElse((ps(i), ps(j)), 0L) + 1
    for (r <- out) {
      val (p1, p2) = (r.getLong(0), r.getLong(1))
      val ps = r.getLong(2); val s1 = r.getLong(3); val s2 = r.getLong(4)
      assert(p1 < p2)
      assert(pairSup((p1, p2)) == ps, s"pair ($p1,$p2)")
      assert(sup(p1) == s1 && sup(p2) == s2)
      assert(ps <= math.min(s1, s2) && ps >= 3)
      val lift = BigDecimal(ps.toDouble * nBaskets / (s1 * s2.toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(6) - lift) < 1e-9)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
    // top-20 really is the lift frontier: every emitted lift >= any
    // non-emitted qualifying pair's lift
    val emitted = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val minEmitted = out.map(_.getDouble(6)).min
    val maxOther = pairSup.collect {
      case ((a, b), c) if c >= 3 && !emitted((a, b)) =>
        BigDecimal(c.toDouble * nBaskets / (sup(a) * sup(b).toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    if (maxOther.nonEmpty) assert(maxOther.max <= minEmitted)
  }

  test("a31_benford_digits: digit mass sums to 1 per segment, counts conserve, chi2 constant") {
    import spark.implicits._
    val out = Registry.queries("a31_benford_digits")(spark, sf).cache()
    try {
      assert(out.filter($"digit" < 1 || $"digit" > 9).isEmpty)
      val perPri = out.groupBy($"pri").agg(
        sum($"n").as("n"),
        sum($"p_obs").as("pmass"),
        countDistinct($"chi2").as("nchi"))
        .collect()
      val totalOrders = Tables.orders(spark, sf).count()
      assert(perPri.map(_.getLong(1)).sum == totalOrders)
      perPri.foreach { r =>
        assert(math.abs(r.getDouble(2) - 1.0) < 0.001, s"pmass ${r.getDouble(2)}")
        assert(r.getLong(3) == 1, "chi2 must be one value per segment")
      }
      // Benford reference mass itself sums to 1 over digits 1..9
      val bmass = (1 to 9).map(d => math.log(1.0 + 1.0 / d) / math.log(10.0)).sum
      assert(math.abs(bmass - 1.0) < 1e-12)
    } finally out.unpersist(false)
  }

  test("a33_mutual_information: information inequalities and a driver replay") {
    import spark.implicits._
    val r = Registry.queries("a33_mutual_information")(spark, sf).collect().head
    val (mi, hx, hy, uc, n) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
    assert(mi >= -1e-4 && mi <= math.min(hx, hy) + 1e-4, s"mi=$mi hx=$hx hy=$hy")
    assert(uc >= -1e-4 && uc <= 1.0 + 1e-4)
    assert(n == Tables.events(spark, sf).count())
    // driver replay from raw events
    val rows = Tables.events(spark, sf)
      .select($"event_type", (hour($"ts") / lit(6)).cast("int"))
      .as[(String, Int)].collect()
    val nn = rows.length.toDouble
    val joint = rows.groupBy(identity).view.mapValues(_.length).toMap
    val px = rows.groupBy(_._1).view.mapValues(_.length / nn).toMap
    val py = rows.groupBy(_._2).view.mapValues(_.length / nn).toMap
    val miRef = joint.map { case ((x, y), c) =>
      (c / nn) * math.log((c / nn) / (px(x) * py(y)))
    }.sum
    assert(math.abs(mi - miRef) < 1e-3, s"mi=$mi ref=$miRef")
    val hxRef = -px.values.map(p => p * math.log(p)).sum
    assert(math.abs(hx - hxRef) < 1e-3)
  }

  test("pipe_conformal_interval: ~90% coverage, q is a realized calibration residual") {
    import spark.implicits._
    val out = Registry.queries("pipe_conformal_interval")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.length >= 3)
    out.foreach { r =>
      val cov = r.getDouble(6)
      assert(cov >= 0.80 && cov <= 1.0, s"${r.getString(0)} coverage=$cov")
      assert(r.getDouble(2) > 0.0) // q
      assert(r.getLong(3) > r.getLong(4)) // train > calib under 60/20/20
    }
    val meanCov = out.map(_.getDouble(6)).sum / out.length
    assert(meanCov >= 0.85 && meanCov <= 0.97, s"mean coverage $meanCov")
  }

  test("a34_ks_test: driver replay of the exact two-sample D statistic") {
    import spark.implicits._
    val r = Registry.queries("a34_ks_test")(spark, sf).collect().head
    val (n1, n2, d, crit) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(d >= 0.0 && d <= 1.0)
    assert(crit > 0.0)
    assert(r.getBoolean(4) == (d > crit))
    val rows = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "error"))
      .select($"event_type", $"value").as[(String, Double)].collect()
    val s1 = rows.filter(_._1 == "click").map(_._2).sorted
    val s2 = rows.filter(_._1 == "error").map(_._2).sorted
    assert(s1.length == n1 && s2.length == n2)
    val grid = (s1 ++ s2).distinct.sorted
    val dRef = grid.map { x =>
      math.abs(
        s1.count(_ <= x).toDouble / s1.length - s2.count(_ <= x).toDouble / s2.length)
    }.max
    assert(math.abs(d - dRef) < 1e-4, s"d=$d ref=$dRef")
  }

  test("a35_psi: terms individually nonnegative, smoothed masses sum to 1, driver replay") {
    import spark.implicits._
    val out = Registry.queries("a35_psi")(spark, sf).collect()
    assert(out.length == 11)
    val psi = out.head.getDouble(6)
    assert(out.forall(_.getDouble(6) == psi))
    // (a-b)·ln(a/b) >= 0 always — PSI and every term nonnegative
    out.foreach(r => assert(r.getDouble(5) >= -1e-4, s"term ${r.getDouble(5)}"))
    assert(psi >= 0.0)
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 0.005, "p1 mass")
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 0.005, "p2 mass")
    // driver replay
    val rows = Tables.events(spark, sf)
      .select($"value", $"ts" < lit("2024-01-16").cast("timestamp"))
      .as[(Double, Boolean)].collect()
    def histo(xs: Array[Double]) = {
      val h = new Array[Long](11)
      xs.foreach(v => h(math.min(math.floor(v / 10.0), 10.0).toInt) += 1)
      h
    }
    val h1 = histo(rows.filter(_._2).map(_._1)); val n1 = h1.sum
    val h2 = histo(rows.filterNot(_._2).map(_._1)); val n2 = h2.sum
    val ref = (0 until 11).map { b =>
      val p1 = (h1(b) + 0.5) / (n1 + 5.5); val p2 = (h2(b) + 0.5) / (n2 + 5.5)
      (p2 - p1) * math.log(p2 / p1)
    }.sum
    assert(math.abs(psi - ref) < 1e-3, s"psi=$psi ref=$ref")
    out.zipWithIndex.foreach { case (r, b) =>
      assert(r.getLong(1) == h1(b) && r.getLong(2) == h2(b), s"bin $b counts")
    }
  }

  test("pipe_gbm_stumps: boosting strictly reduces MSE from the variance baseline") {
    import spark.implicits._
    val out = Registry.queries("pipe_gbm_stumps")(spark, sf).collect()
    assert(out.length == 3)
    val mses = out.map(_.getDouble(5))
    assert(mses(0) > mses(1) && mses(1) > mses(2), s"not decreasing: ${mses.toSeq}")
    // baseline: variance of y (the round-0 model is the global mean)
    val ys = Tables.lineitem(spark, sf).select($"l_extendedprice").as[Double].collect()
    val mean = ys.sum / ys.length
    val varY = ys.map(y => (y - mean) * (y - mean)).sum / ys.length
    assert(mses(0) < varY, s"round 1 must beat the mean: ${mses(0)} vs $varY")
    // driver replay of the round-1 stump search
    val qs = Tables.lineitem(spark, sf)
      .select($"l_quantity", $"l_discount", $"l_extendedprice")
      .as[(Double, Double, Double)].collect()
    val feats = Seq[(String, ((Double, Double, Double)) => Double)](
      "q" -> (_._1), "d" -> (_._2))
    val best = (for {
      (fn, fx) <- feats
      c <- qs.map(fx).distinct.sorted.dropRight(1)
    } yield {
      val (l, r) = qs.partition(t => fx(t) <= c)
      val (sl, sr) = (l.map(t => t._3 - mean).sum, r.map(t => t._3 - mean).sum)
      (fn, c, sl * sl / l.length + sr * sr / r.length)
    }).minBy { case (f, c, g) => (-g, f, c) }
    assert(out.head.getString(1) == best._1 && out.head.getDouble(2) == best._2,
      s"stump1 ${out.head.getString(1)}@${out.head.getDouble(2)} vs replay ${best._1}@${best._2}")
  }

  test("pipe_target_encoding: driver replay of the LOO formula; encodings stay in the target hull") {
    import spark.implicits._
    val out = Registry.queries("pipe_target_encoding")(spark, sf).collect()
    val rows = Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
    val prior = rows.map(_._2).sum / rows.length
    val byType = rows.groupBy(_._1)
    val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
    out.foreach { r =>
      val t = r.getString(0)
      val ys = byType(t).map(_._2)
      val (sg, ng) = (ys.sum, ys.length)
      val encs = ys.map(y => (sg - y + 10.0 * prior) / (ng - 1 + 10.0))
      assert(r.getLong(1) == ng)
      assert(math.abs(r.getDouble(2) - encs.min) < 1e-3, s"$t min")
      assert(math.abs(r.getDouble(3) - encs.max) < 1e-3, s"$t max")
      assert(math.abs(r.getDouble(4) - encs.sum / ng) < 1e-3, s"$t mean")
      // smoothing keeps every encoding inside the observed target hull
      assert(encs.min >= lo - 1e-9 && encs.max <= hi + 1e-9)
    }
  }

  test("w22_max_drawdown: drawdowns bounded, peaks dominate, max_dd monotone per key") {
    import spark.implicits._
    val out = Registry.queries("w22_max_drawdown")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    out.foreach { case (t, y, peak, dd, maxDd) =>
      assert(peak >= y - 1e-9, s"$t peak<y")
      assert(dd >= -1e-9 && dd < 1.0, s"$t dd=$dd")
      assert(maxDd >= dd - 1e-9)
    }
    out.groupBy(_._1).foreach { case (t, rows) =>
      val mdd = rows.map(_._5)
      mdd.sliding(2).foreach(w =>
        if (w.length == 2) assert(w(1) >= w(0) - 1e-9, s"$t max_dd not monotone"))
      // the first day of each key is its own peak: dd = 0
      assert(rows.head._4 == 0.0)
    }
  }

  test("a36_hill_tail: driver replay of the Hill estimator per segment") {
    import spark.implicits._
    val out = Registry.queries("a36_hill_tail")(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    val rows = Tables.orders(spark, "/root/testdata/sf0.01")
      .select($"o_orderpriority", $"o_totalprice", $"o_orderkey")
      .as[(String, Double, Long)].collect()
    out.foreach { r =>
      val pri = r.getString(0)
      val xs = rows.filter(_._1 == pri).sortBy(t => (-t._2, t._3)).map(_._2)
      assert(r.getLong(1) == 100)
      val xt = xs(100)
      assert(math.abs(r.getDouble(2) - xt) < 1e-3)
      val alpha = 1.0 / (xs.take(100).map(x => math.log(x) - math.log(xt)).sum / 100)
      assert(math.abs(r.getDouble(3) - alpha) < 1e-3, s"$pri hill ${r.getDouble(3)} vs $alpha")
      assert(alpha > 0.0)
    }
  }

  test("pipe_qini_uplift: decile partition conserves users; null-effect arms give a flat curve") {
    import spark.implicits._
    val out = Registry.queries("pipe_qini_uplift")(spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 10)
    val nUsers = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"user_id").distinct().count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == nUsers)
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(4) <= r.getLong(2),
        "conversions cannot exceed arm sizes")
      // the md5 arm is independent of conversion: per-decile uplift is noise
      assert(math.abs(r.getDouble(5)) < 0.15, s"uplift ${r.getDouble(5)}")
    }
    // final Qini = total incremental conversions vs scaled control —
    // near zero for a null effect, bounded well below the arm size
    val qFinal = out.maxBy(_.getInt(0)).getDouble(6)
    val nt = out.map(_.getLong(1)).sum
    assert(math.abs(qFinal) < 0.05 * nt, s"qini $qFinal vs nT $nt")
  }

  test("pipe_msprt_ab: always-valid p-value is monotone non-increasing and null arms never reject") {
    import spark.implicits._
    val out = Registry.queries("pipe_msprt_ab")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.length >= 25)
    val ps = out.map(_.getDouble(5))
    ps.sliding(2).foreach(w => if (w.length == 2)
      assert(w(1) <= w(0) + 1e-9, "always-valid p must be non-increasing"))
    assert(ps.forall(p => p > 0.0 && p <= 1.0))
    // md5 arms carry no real effect: the sequential test must NOT
    // reject at alpha = 0.05 (the whole point vs naive daily peeking)
    assert(ps.last > 0.05, s"null effect rejected: p=${ps.last}")
    // cumulative counts monotone
    val cts = out.map(_.getLong(1))
    cts.sliding(2).foreach(w => if (w.length == 2) assert(w(1) >= w(0)))
    // lambda recomputation on the last day from exact counts
    val last = out.last
    val users = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" && $"value" >= 150, 1L)
        .otherwise(0L)).as("conv"))
      .withColumn("arm",
        expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 2"))
      .groupBy($"arm").agg(count(lit(1)).as("n"), sum($"conv").as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (nT, cT) = users(1L); val (nC, cC) = users(0L)
    assert(last.getLong(1) == cT && last.getLong(2) == cC)
    val z = cT.toDouble / nT - cC.toDouble / nC
    val pbar = (cT + cC).toDouble / (nT + nC)
    val v = pbar * (1 - pbar) * (1.0 / nT + 1.0 / nC)
    val tau = 0.0001
    val lam = math.sqrt(v / (v + tau)) * math.exp(z * z * tau / (2.0 * v * (v + tau)))
    assert(math.abs(last.getDouble(4) - lam) < 1e-3, s"${last.getDouble(4)} vs $lam")
  }

  test("pipe_cuped: variance reduction equals rho^2, adjustment never hurts, replay") {
    import spark.implicits._
    val r = Registry.queries("pipe_cuped")(spark, "/root/testdata/sf0.01").collect().head
    val (n, theta, varY, varC, red) =
      (r.getLong(0), r.getDouble(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(n > 0)
    assert(varC <= varY + 1e-9, "CUPED can only reduce variance")
    assert(red >= -1e-9 && red <= 1.0 + 1e-9)
    // var_cuped = var_y * (1 - rho^2) by construction
    // red is itself rounded to 4 decimals → slack scales with var_y
    assert(math.abs(varC - varY * (1 - red)) < 1e-4 * varY + 1e-3,
      s"$varC vs ${varY * (1 - red)}")
    // driver replay of theta from the per-user (pre, post) means
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val rows = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"user_id", $"ts", $"value")
      .as[(Long, java.sql.Timestamp, Double)].collect()
    val byU = rows.groupBy(_._1)
    val xy = byU.values.flatMap { es =>
      val pre = es.filter(_._2.before(cut)).map(_._3)
      val post = es.filter(e => !e._2.before(cut)).map(_._3)
      if (pre.isEmpty || post.isEmpty) None
      else Some((pre.sum / pre.length, post.sum / post.length))
    }.toArray
    assert(xy.length == n)
    val nn = xy.length.toDouble
    val (mx, my) = (xy.map(_._1).sum / nn, xy.map(_._2).sum / nn)
    val cov = xy.map(t => (t._1 - mx) * (t._2 - my)).sum / nn
    val vx = xy.map(t => (t._1 - mx) * (t._1 - mx)).sum / nn
    assert(math.abs(theta - cov / vx) < 1e-3, s"theta $theta vs ${cov / vx}")
  }

  test("pipe_did: null md5 arms give a near-zero estimate; SE positive; cells coherent") {
    val r = Registry.queries("pipe_did")(spark, "/root/testdata/sf0.01").collect().head
    val did = r.getDouble(4); val se = r.getDouble(5); val t = r.getDouble(6)
    assert(se > 0.0)
    assert(math.abs(t - did / se) < 2e-3, s"t=$t did/se=${did / se}")
    // no real treatment: |t| must not scream significance
    assert(math.abs(t) < 3.0, s"null DiD rejected: t=$t")
    // all four cell means populated and plausible
    (0 to 3).foreach(i => assert(!r.isNullAt(i) && r.getDouble(i) > 0.0))
  }

  test("a39_ljung_box: driver replay of the ACF and the portmanteau accumulation") {
    import spark.implicits._
    val out = Registry.queries("a39_ljung_box")(spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 5)
    val daily = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(sum($"value").as("v"))
      .orderBy($"day").as[(java.sql.Timestamp, Double)].collect().map(_._2)
    val n = daily.length
    val xbar = daily.sum / n
    val c = daily.map(_ - xbar)
    val den = c.map(x => x * x).sum
    var qAcc = 0.0
    out.zipWithIndex.foreach { case (r, i) =>
      val k = i + 1
      assert(r.getInt(0) == k)
      val rk = (0 until n - k).map(t => c(t) * c(t + k)).sum / den
      assert(math.abs(r.getDouble(1) - rk) < 1e-3, s"acf($k) ${r.getDouble(1)} vs $rk")
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
      qAcc += rk * rk / (n - k)
      val q = n * (n + 2.0) * qAcc
      assert(math.abs(r.getDouble(2) - q) < 1e-2, s"Q($k) ${r.getDouble(2)} vs $q")
      assert(r.getBoolean(3) == (r.getDouble(2) > 11.0705) ||
        math.abs(r.getDouble(2) - 11.0705) < 1e-3)
    }
    // Q is monotone in k (sum of nonnegative terms)
    val qs = out.map(_.getDouble(2))
    qs.sliding(2).foreach(w => if (w.length == 2) assert(w(1) >= w(0) - 1e-9))
  }

  test("a41_theil_sen: driver replay of the median pairwise slope; robustness to one outlier") {
    import spark.implicits._
    val out = Registry.queries("a41_theil_sen")(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(sum($"value").as("v"))
      .select($"event_type", $"day", $"v")
      .as[(String, java.sql.Timestamp, Double)].collect()
    def medianSlope(vs: Array[Double]): Double = {
      val sl = (for (i <- vs.indices; j <- (i + 1) until vs.length)
        yield ((vs(j) - vs(i)) / (j - i), i, j)).sortBy(t => (t._1, t._2, t._3))
      val n = sl.length
      if (n % 2 == 1) sl(n / 2)._1 else (sl(n / 2 - 1)._1 + sl(n / 2)._1) / 2
    }
    out.foreach { r =>
      val key = r.getString(0)
      val vs = daily.filter(_._1 == key).sortBy(_._2.getTime).map(_._3)
      assert(r.getLong(1) == vs.length.toLong * (vs.length - 1) / 2)
      val ref = medianSlope(vs)
      assert(math.abs(r.getDouble(2) - ref) < 1e-3, s"$key ${r.getDouble(2)} vs $ref")
      // robustness: corrupting ONE point barely moves Theil-Sen where
      // it would yank an OLS slope
      val corrupted = vs.clone(); corrupted(corrupted.length / 2) *= 100
      val tsC = medianSlope(corrupted)
      def ols(ys: Array[Double]): Double = {
        val n = ys.length; val mx = (n - 1) / 2.0; val my = ys.sum / n
        ys.zipWithIndex.map { case (y, i) => (i - mx) * (y - my) }.sum /
          ys.zipWithIndex.map { case (_, i) => (i - mx) * (i - mx) }.sum
      }
      val olsMove = math.abs(ols(corrupted) - ols(vs))
      val tsMove = math.abs(tsC - ref)
      assert(tsMove < olsMove / 5,
        s"$key: TS moved $tsMove vs OLS $olsMove under one corrupted point")
    }
  }

  test("a41b_theil_sen_sampled: exact replay of the hash-sampled median; lands in the exact distribution's middle band") {
    import spark.implicits._
    val out = Registry.queries("a41b_theil_sen_sampled")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("v"))
      .select($"event_type", $"day", $"v")
      .as[(String, java.sql.Timestamp, Double)].collect()
    // the query's md5 pair predicate, replayed bit-exactly: first 15
    // hex chars of md5("<event_type>:<i>:<j>") as a long, mod 10000
    def kept(et: String, i: Int, j: Int): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$et:$i:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 10000 < 4000
    }
    out.foreach { r =>
      val key = r.getString(0)
      val vs = daily.filter(_._1 == key).sortBy(_._2.getTime).map(_._3)
      val all = (for (i <- vs.indices; j <- (i + 1) until vs.length)
        yield ((vs(j) - vs(i)) / (j - i), i + 1, j + 1))
      val sample = all.filter(t => kept(key, t._2, t._3))
        .sortBy(t => (t._1, t._2, t._3))
      // n_pairs reports the SAMPLED pair count
      assert(r.getLong(1) == sample.length.toLong, s"$key n_pairs")
      val m = sample.length
      val want = if (m % 2 == 1) sample(m / 2)._1
        else (sample(m / 2 - 1)._1 + sample(m / 2)._1) / 2
      assert(math.abs(r.getDouble(2) - want) < 1e-3,
        s"$key sampled median ${r.getDouble(2)} vs replay $want")
      // tolerance vs the EXACT estimator: a median over a 40% uniform
      // pair sample is a sample quantile with sd ≈ √(p(1−p)/m) ≈ 0.04
      // in quantile units, so the sampled estimate must land within
      // the exact slope distribution's [0.35, 0.65] band (≈3σ margin;
      // measured 0.46–0.55 on this corpus)
      val exactSorted = all.map(_._1).sorted
      val q = exactSorted.count(_ <= r.getDouble(2)).toDouble / exactSorted.length
      assert(q >= 0.35 && q <= 0.65,
        s"$key sampled median at quantile $q of the exact slope distribution")
    }
  }

  test("a42_bootstrap_ci: interval brackets the mean and shrinks like 1/sqrt(n); weights are Poisson(1)-calibrated") {
    import spark.implicits._
    val out = Registry.queries("a42_bootstrap_ci")(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    val evStats = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), stddev_pop($"value").as("sd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (m, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(lo < m && m < hi, s"${r.getString(0)}: CI [$lo,$hi] must bracket mean $m")
      // half-width should be on the order of 2·sd/sqrt(n) — loose envelope
      val (n, sd) = evStats(r.getString(0))
      val sem = sd / math.sqrt(n.toDouble)
      val half = (hi - lo) / 2
      assert(half > 0.8 * sem && half < 4.0 * sem,
        s"${r.getString(0)}: half-width $half vs sem $sem")
    }
    // the deterministic Poisson(1) map is calibrated: mean weight ≈ 1
    val wStats = Tables.events(spark, "/root/testdata/sf0.01")
      .select($"event_id").crossJoin(spark.range(0, 50).select($"id".as("b")))
      .withColumn("u",
        expr("CAST(conv(substr(md5(concat(CAST(event_id AS STRING), ':', CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT) % 10000"))
      .withColumn("w",
        when($"u" < 3679, 0L).when($"u" < 7358, 1L).when($"u" < 9197, 2L)
          .when($"u" < 9810, 3L).when($"u" < 9963, 4L).otherwise(5L))
      .agg(avg($"w"), variance($"w")).collect().head
    assert(math.abs(wStats.getDouble(0) - 1.0) < 0.02, s"E[w]=${wStats.getDouble(0)}")
    assert(math.abs(wStats.getDouble(1) - 1.0) < 0.05, s"Var[w]=${wStats.getDouble(1)}")
  }

  test("a42b_bootstrap_ci_fast: contract booleans true; mean agrees with the md5 spelling") {
    val sf = "/root/testdata/sf0.01"
    val fast = Registry.queries("a42b_bootstrap_ci_fast")(spark, sf).collect()
    assert(fast.nonEmpty)
    fast.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: CI does not bracket the mean")
      assert(r.getBoolean(3), s"${r.getString(0)}: CI width outside the CLT envelope")
    }
    // same exact-mean spelling as a42 — the two entries' means must be
    // identical (only the weight draw stream differs)
    val slow = Registry.queries("a42_bootstrap_ci")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    fast.foreach(r => assert(r.getDouble(1) == slow(r.getString(0)),
      s"${r.getString(0)}: mean mismatch vs a42"))
  }

  test("text_term_drift: driver replay of the smoothed log-odds ranking") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val out = Registry.queries("text_term_drift")(spark, sf).collect()
    assert(out.length == 20)
    // z non-increasing (floor-rounded display of the ordering key)
    out.map(_.getDouble(4)).sliding(2).foreach(w =>
      if (w.length == 2) assert(w(0) >= w(1)))
    // driver replay: token counts, smoothing, ranking
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    var na = 0L; var nb = 0L
    docs.foreach { case (src, text) =>
      val slice = if (src.length == 4) "a" else "b"
      text.toLowerCase.split(" ", -1).filter(_.length >= 3).foreach { t =>
        cnt((slice, t)) = cnt.getOrElse((slice, t), 0L) + 1
        if (slice == "a") na += 1 else nb += 1
      }
    }
    val vocab = cnt.keys.map(_._2).toSet
    def lorZ(t: String): (Double, Double, Long, Long) = {
      val ya = cnt.getOrElse(("a", t), 0L); val yb = cnt.getOrElse(("b", t), 0L)
      val lor = math.log((ya + 0.5) / (na - ya + 0.5)) -
        math.log((yb + 0.5) / (nb - yb + 0.5))
      val se = math.sqrt(1.0 / (ya + 0.5) + 1.0 / (na - ya + 0.5) +
        1.0 / (yb + 0.5) + 1.0 / (nb - yb + 0.5))
      (lor, lor / se, ya, yb)
    }
    val want = vocab.toSeq
      .filter(t => cnt.getOrElse(("a", t), 0L) + cnt.getOrElse(("b", t), 0L) >= 20)
      .map(t => (t, lorZ(t)))
      .sortBy { case (t, (_, z, _, _)) => (-z, t) }
      .take(20)
    assert(out.map(_.getString(0)).toSeq == want.map(_._1),
      s"top-20 terms: ${out.map(_.getString(0)).take(5).toSeq} vs ${want.map(_._1).take(5)}")
    out.zip(want).foreach { case (r, (t, (lor, z, ya, yb))) =>
      assert(r.getLong(1) == ya && r.getLong(2) == yb, s"$t counts")
      assert(math.abs(r.getDouble(3) - lor) < 1e-3, s"$t lor")
      assert(math.abs(r.getDouble(4) - z) < 1e-3, s"$t z")
    }
  }

  test("j32_tpch_q3: top-10 revenue ordering and positivity") {
    val out = Registry.queries("j32_tpch_q3")(spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 10)
    val revs = out.map(_.getDouble(1))
    revs.sliding(2).foreach(w => assert(w(0) >= w(1)))
    assert(revs.forall(_ > 0.0))
  }

  test("pipe_srm_check: honest hash split passes; chi2 replay; synthetic skew trips") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val out = Registry.queries("pipe_srm_check")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n0, n1, chi2, srm) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      val e = (n0 + n1) / 2.0
      val want = math.floor(((n0 - e) * (n0 - e) / e * 2) * 10000 + 0.5) / 10000
      assert(math.abs(chi2 - want) < 1e-9, s"${r.getString(0)}: chi2 $chi2 vs $want")
      // the md5 assignment is honest 50/50 — no segment trips on this
      // deterministic corpus (chi2 = 0.96 across the board)
      assert(!srm, s"${r.getString(0)}: honest split tripped SRM (chi2=$chi2)")
    }
    // sensitivity: a 60/40 logging bug at this segment size MUST trip
    val n = out.head.getLong(1) + out.head.getLong(2)
    val sk = math.round(n * 0.6).toDouble; val e2 = n / 2.0
    assert((sk - e2) * (sk - e2) / e2 * 2 > 3.8415,
      s"60/40 skew undetectable at n=$n — segment too small for the cutoff")
  }

  test("a43_markov_transitions: rows normalize to 1, counts conserve, driver replay") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val out = Registry.queries("a43_markov_transitions")(spark, sf).collect()
    assert(out.nonEmpty)
    // per-from probabilities sum to ~1 (each p rounded to 4dp, so the
    // row sum is within 5e-4 · fanout of exactly 1)
    out.groupBy(_.getString(0)).foreach { case (from, rows) =>
      val pSum = rows.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) <= 5e-4 * rows.length, s"$from: Σp=$pSum")
    }
    // transition count conservation: Σ cnt = Σ_users max(0, n_events−1)
    val perUser = graft.core.Tables.events(spark, sf)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .agg(sum($"n" - 1)).collect()(0).getLong(0)
    assert(out.map(_.getLong(2)).sum == perUser)
    // driver replay of a sampled user's sequence
    val seq0 = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
      .groupBy(_._1)
    val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
    seq0.values.foreach { evs =>
      val ordered = evs.sortBy(e => (e._2.getTime, e._3)).map(_._4)
      ordered.sliding(2).foreach {
        case Array(f, t) => pairCnt((f, t)) = pairCnt.getOrElse((f, t), 0L) + 1
        case _ => ()
      }
    }
    out.foreach { r =>
      assert(pairCnt.getOrElse((r.getString(0), r.getString(1)), 0L) == r.getLong(2),
        s"cnt(${r.getString(0)}→${r.getString(1)})")
    }
  }

  test("a44_gini: bounds, invariance to value shift in replay, driver replay") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val out = Registry.queries("a44_gini")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getDouble(2)
      // Gini of a nonnegative support lives in [0, 1)
      assert(g >= 0.0 && g < 1.0, s"${r.getString(0)}: gini $g out of range")
    }
    // driver replay of the exact formula on the shifted values
    val vals = graft.core.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1)
    out.foreach { r =>
      val key = r.getString(0)
      val raw = vals(key).map(_._2)
      val mn = raw.min
      val xs = raw.map(_ - mn).sorted
      val n = xs.length
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
      val g = (2.0 * six - (n + 1) * sx) / (n * sx)
      assert(r.getLong(1) == n.toLong)
      assert(math.abs(r.getDouble(2) - g) <= 2e-4, s"$key: ${r.getDouble(2)} vs $g")
    }
  }

  test("a44b_gini_binned: tracks the exact Gini within the bin-resolution bound") {
    val sf = "/root/testdata/sf0.01"
    val exact = Registry.queries("a44_gini")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val binned = Registry.queries("a44b_gini_binned")(spark, sf).collect()
    assert(binned.nonEmpty)
    binned.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0)
      assert(math.abs(g - exact(r.getString(0))) <= 5e-3,
        s"${r.getString(0)}: binned $g vs exact ${exact(r.getString(0))}")
    }
  }

  test("a44b binning scheme survives a heavy tail (the case equal-width bins lose)") {
    // deterministic Pareto-like sample: x = u^(-1/1.2) − 1 on a uniform
    // grid — 84% of rows land below x=1 while the top row is ~860;
    // exactly the concentration shape Gini is used on
    val n = 2000
    val xs = (0 until n).map(i => math.pow((i + 0.5) / n, -1.0 / 1.2) - 1.0)
    def exactGini(v: Seq[Double]): Double = {
      val s = v.sorted; val m = s.length
      val six = s.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
      (2.0 * six - (m + 1) * s.sum) / (m * s.sum)
    }
    def binnedGini(v: Seq[Double], logSpaced: Boolean): Double = {
      val r = v.max - v.min
      val shifted = v.map(_ - v.min)
      def bin(x: Double): Int =
        if (r == 0) 0
        else if (logSpaced)
          math.min(1023, math.floor(math.log(1.0 + x) / math.log(1.0 + r) * 1024.0).toInt)
        else math.min(1023, math.floor(x / (r / 1024.0)).toInt)
      val g = shifted.groupBy(bin).toSeq.sortBy(_._1)
        .map { case (_, vs) => (vs.length.toDouble, vs.sum) }
      val nTot = shifted.length.toDouble; val sTot = shifted.sum
      var cum = 0.0; var acc = 0.0
      g.foreach { case (ni, si) =>
        val lPrev = cum / sTot; cum += si
        acc += (ni / nTot) * (cum / sTot + lPrev)
      }
      1.0 - acc
    }
    val ex = exactGini(xs)
    val logErr = math.abs(binnedGini(xs, logSpaced = true) - ex)
    val linErr = math.abs(binnedGini(xs, logSpaced = false) - ex)
    assert(logErr <= 0.01, s"log-spaced err $logErr vs exact $ex")
    // and the equal-width scheme demonstrably fails here — the reason
    // the query bins geometrically
    assert(linErr > logErr * 5,
      s"equal-width err $linErr should be far worse than log-spaced $logErr")
  }

  test("w24_lead_lag: symmetry xcorr(a,b,k) = xcorr(b,a,-k); lag-0 pairs mirror; bounds") {
    val out = Registry.queries("w24_lead_lag")(spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 5 * 4 * 7, s"expected full pair×lag grid, got ${out.length}")
    out.foreach(r => assert(!r.isNullAt(4), s"null xcorr at $r"))
    val byKey = out.map(r =>
      (r.getString(0), r.getString(1), r.getInt(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    byKey.foreach { case ((a, b, k), (n, c)) =>
      assert(c >= -1.0001 && c <= 1.0001, s"($a,$b,$k): xcorr $c out of [-1,1]")
      // alignment symmetry: corr(a(t), b(t+k)) is the same aligned set
      // as corr(b(t), a(t−k)) — identical n and (up to rounding) value
      val (n2, c2) = byKey((b, a, -k))
      assert(n == n2, s"($a,$b,$k): n $n vs mirrored $n2")
      assert(math.abs(c - c2) <= 2e-4, s"($a,$b,$k): $c vs mirrored $c2")
    }
  }

  test("pipe_seq_gap_patterns: equi-join plan (no BNLJ), exact driver replay of pair stats") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val df = Registry.queries("pipe_seq_gap_patterns")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"band join degraded to a product plan:\n$p")
    val out = df.collect()
    assert(out.nonEmpty)
    // driver replay: all ordered pairs with 0 < gap <= 1h per user
    val ev: Seq[(Long, String, Long)] = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts")
      .as[(Long, String, java.sql.Timestamp)].collect().toSeq
      .map(e => (e._1, e._2,
        e._3.getTime * 1000L + (e._3.getNanos / 1000L) % 1000L)) // epoch µs
    val pairs = for {
      g <- ev.groupBy(_._1).values.toSeq
      a <- g
      b <- g
      if b._3 - a._3 > 0 && b._3 - a._3 <= 3600000000L
    } yield ((a._2, b._2), (a._1, b._3 - a._3))
    val byPat = pairs.groupBy(_._1)
    assert(out.length == byPat.size)
    out.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val g = byPat(k)
      assert(r.getLong(2) == g.size, s"$k n_pairs")
      assert(r.getLong(3) == g.map(_._2._1).distinct.size, s"$k n_users")
      val sorted = g.map(_._2._2).sorted
      val n = sorted.length
      val med = if (n % 2 == 1) sorted(n / 2).toDouble
        else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
      assert(math.abs(r.getDouble(4) - med) < 1e-6, s"$k med ${r.getDouble(4)} vs $med")
    }
  }

  test("pipe_propensity_strata: exact replay of quantized-gradient training + quintile ATT") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val out = Registry.queries("pipe_propensity_strata")(spark, sf).collect()
    assert(out.nonEmpty)
    // replay the whole chain: user grain -> 2 quantized-gradient epochs
    // -> quintiles on (quantized p, user_id) -> per-bin ATT terms
    val users = graft.core.Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(
        sum(when($"event_type" === "signup", 1L).otherwise(0L)).as("ns"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("nv"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("nc"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("ne"),
        sum(when($"event_type" === "purchase",
          floor($"value" * 1000000.0 + 0.5).cast("long")).otherwise(0L)).as("yq"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map { case (id, ns, nv, nc, ne, yq) =>
        (id, if (ns >= 14) 1.0 else 0.0, nv / 32.0, nc / 32.0, ne / 32.0, yq / 1e6)
      }
    val n = users.length.toDouble
    def grad(p: ((Long, Double, Double, Double, Double, Double)) => Double) = {
      def q(f: ((Long, Double, Double, Double, Double, Double)) => Double) =
        users.map(u => math.floor(f(u) * 1e9 + 0.5).toLong).sum / 1e9 / n
      (q(u => p(u) - u._2), q(u => (p(u) - u._2) * u._3),
       q(u => (p(u) - u._2) * u._4), q(u => (p(u) - u._2) * u._5))
    }
    val g1 = grad(_ => 0.5)
    val w1 = (-0.5 * g1._1, -0.5 * g1._2, -0.5 * g1._3, -0.5 * g1._4)
    def sig(w: (Double, Double, Double, Double))(u: (Long, Double, Double, Double, Double, Double)) =
      1.0 / (1.0 + math.exp(-(w._1 + w._2 * u._3 + w._3 * u._4 + w._4 * u._5)))
    val g2 = grad(sig(w1))
    val w2 = (w1._1 - 0.5 * g2._1, w1._2 - 0.5 * g2._2, w1._3 - 0.5 * g2._3, w1._4 - 0.5 * g2._4)
    val scored = users.map(u => (u, math.floor(sig(w2)(u) * 1e12 + 0.5).toLong))
      .sortBy { case (u, pq) => (pq, u._1) }
    // ntile(5): first (len mod 5) buckets get the extra row
    val base = scored.length / 5; val extra = scored.length % 5
    val binned = scored.zipWithIndex.map { case ((u, _), i) =>
      val cut = (0 until 5).scanLeft(0)((acc, b) => acc + base + (if (b < extra) 1 else 0))
      (cut.indexWhere(_ > i) - 1, u)
    }
    val strata = binned.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, g) =>
      val t = g.filter(_._2._2 == 1.0); val c = g.filter(_._2._2 == 0.0)
      (b.toLong, t.size.toLong, c.size.toLong,
        t.map(u => math.floor(u._2._6 * 1e6 + 0.5).toLong).sum / 1e6,
        c.map(u => math.floor(u._2._6 * 1e6 + 0.5).toLong).sum / 1e6)
    }.filter(s => s._2 > 0 && s._3 > 0)
    val totT = strata.map(_._2).sum.toDouble
    assert(out.length == strata.size, s"${out.length} vs ${strata.size} supported bins")
    out.zip(strata).foreach { case (r, (b, nt, ncn, syt, syc)) =>
      assert(r.getLong(0) == b && r.getLong(1) == nt && r.getLong(2) == ncn,
        s"bin $b counts: (${r.getLong(1)},${r.getLong(2)}) vs ($nt,$ncn)")
      def f4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(math.abs(r.getDouble(3) - f4(syt / nt)) < 1e-9, s"bin $b y_t")
      assert(math.abs(r.getDouble(4) - f4(syc / ncn)) < 1e-9, s"bin $b y_c")
      assert(math.abs(r.getDouble(5) - f4(nt / totT * (syt / nt - syc / ncn))) < 1e-9,
        s"bin $b att_term")
    }
    // quintiles are balanced within 1 row by construction
    val sizes = out.map(r => r.getLong(1) + r.getLong(2))
    assert(sizes.max - sizes.min <= 1, sizes.mkString(","))
  }
}

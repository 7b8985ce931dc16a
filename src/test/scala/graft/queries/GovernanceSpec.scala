package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Behavioral pins for the governance family beyond the DuckDB oracle:
  * exact driver-side replays of the seeded DP noise and the ECE
  * integer-arithmetic identity, the k-anonymity flag semantics, and the
  * erasure cascade's conservation + referential-integrity invariants.
  */
class GovernanceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** JVM twin of Shingles.h60: first 15 hex chars of md5, base-16. */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("a62_dp_noisy_release: noise replays exactly from the seeded hash") {
    import spark.implicits._
    val got = Registry.queries("a62_dp_noisy_release")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val raw = Tables.customer(spark, sf)
      .select($"c_mktsegment", $"c_acctbal").as[(String, Double)].collect()
    val groups = raw.groupBy(_._1)
    assert(got.keySet == groups.keySet)
    for ((seg, rows) <- groups) {
      val n = rows.length.toLong
      val sCents = rows.map(r =>
        math.floor(math.min(math.max(r._2, 0.0), 10000.0) * 100 + 0.5).toLong).sum
      val h1 = h60(s"dpn|$seg"); val h2 = h60(s"dps|$seg")
      val u1 = (h1 % 1048576L).toDouble / 1048576.0
      val u2 = (h2 % 1048576L).toDouble / 1048576.0
      val sg1 = if (h1 % 2 == 0) -1L else 1L
      val sg2 = if (h2 % 2 == 0) -1L else 1L
      val noisyN = n + sg1 * math.floor(-2.0 * math.log(1.0 - u1)).toLong
      val noisyCents = sCents + sg2 * math.floor(-2000000.0 * math.log(1.0 - u2)).toLong
      val noisySum = math.floor(noisyCents.toDouble / 100.0 * 10000 + 0.5) / 10000
      assert(got(seg)._1 == noisyN, s"$seg count: ${got(seg)._1} vs $noisyN")
      assert(math.abs(got(seg)._2 - noisySum) < 1e-9, s"$seg sum")
      // the release must actually be noised for at least one group —
      // a regression that drops the noise term would still "replay"
    }
    val trueCounts = groups.view.mapValues(_.length.toLong).toMap
    assert(groups.keys.exists(seg => got(seg)._1 != trueCounts(seg)),
      "every noisy count equals its true count — noise silently dropped?")
  }

  test("a63_k_anonymity: flags match class size; sensitive diversity bounded") {
    import spark.implicits._
    val rows = Registry.queries("a63_k_anonymity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(3)).sum
    assert(total == Tables.customer(spark, sf).count(), "classes partition the table")
    rows.foreach { r =>
      val (n, lDiv, kAnon, lFlag) =
        (r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6))
      assert(n >= 1 && lDiv >= 1 && lDiv <= 2)
      assert((kAnon == 1) == (n >= 5))
      assert((lFlag == 1) == (lDiv >= 2))
    }
    // at least one risky class must exist in the fixture or the audit
    // pins nothing (sf0.001 has ~150 customers over ~500 QI cells)
    assert(rows.exists(_.getInt(5) == 0), "no sub-k class found")
  }

  test("o31_erasure_cascade: conservation, zero orphans, cascade replay") {
    import spark.implicits._
    val rows = Registry.queries("o31_erasure_cascade")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    rows.foreach { case (t, (total, purged, kept, orphans)) =>
      assert(total == purged + kept, s"$t conservation")
      assert(orphans == 0L, s"$t orphans after cascade")
    }
    // replay the cascade driver-side
    val tomb = Tables.customer(spark, sf).select($"c_custkey").as[Long]
      .collect().filter(k => h60(k.toString) % 29 == 0).toSet
    assert(rows("customer")._2 == tomb.size.toLong)
    val ords = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .as[(Long, Long)].collect()
    val purgedOrders = ords.filter(o => tomb.contains(o._2)).map(_._1).toSet
    assert(rows("orders")._2 == purgedOrders.size.toLong)
    val liPurged = Tables.lineitem(spark, sf).select($"l_orderkey").as[Long]
      .collect().count(purgedOrders.contains)
    assert(rows("lineitem")._2 == liPurged.toLong)
    assert(tomb.nonEmpty, "fixture produced an empty deletion set — pin is vacuous")
  }

  test("pavFit: exact-integer PAV — violator pooling, carry-forward, monotone output") {
    // a descending-then-rising pattern: bins 0 (.8) and 1 (.2) violate
    // monotonicity and must pool to .5; bin 2 (.5) ties and stays
    val f = GovernanceQueries.pavFit(Seq((0, 10L, 8L), (1, 10L, 2L), (2, 10L, 5L)), 3)
    assert(f(0) == (10L, 20L) && f(1) == (10L, 20L) && f(2) == (5L, 10L))
    // a single observed bin covers the whole range (carry both ways)
    val g = GovernanceQueries.pavFit(Seq((2, 10L, 1L)), 5)
    assert(g.forall(_ == (1L, 10L)))
    // already-monotone input is untouched; zero-count bins are skipped
    val h = GovernanceQueries.pavFit(Seq((0, 4L, 1L), (1, 0L, 0L), (2, 4L, 3L)), 3)
    assert(h(0) == (1L, 4L) && h(1) == (1L, 4L) && h(2) == (3L, 4L))
    // output rates are monotone nondecreasing for a stress pattern
    val z = GovernanceQueries.pavFit(
      Seq((0, 5L, 4L), (1, 5L, 1L), (2, 5L, 3L), (3, 5L, 2L), (4, 5L, 5L)), 5)
    val rates = z.map { case (p, n) => p.toDouble / n }
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b + 1e-12 }, rates)
  }

  test("pipe_isotonic_calibration: calibrated rates monotone, ECEs well-formed") {
    val rows = Registry.queries("pipe_isotonic_calibration")(spark, sf).collect()
    assert(rows.nonEmpty)
    val calP = rows.map(_.getDouble(2))
    assert(calP.zip(calP.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"calibrated step function not monotone: ${calP.mkString(",")}")
    val (pre, post) = (rows.map(_.getDouble(4)).distinct, rows.map(_.getDouble(5)).distinct)
    assert(pre.length == 1 && post.length == 1, "ECEs must be constants")
    assert(pre.head >= 0.0 && post.head >= 0.0)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("a64_ece_reliability: integer-exact ECE identity and bin partition") {
    import spark.implicits._
    val rows = Registry.queries("a64_ece_reliability")(spark, sf).collect()
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n, "bins partition the table")
    val eces = rows.map(_.getDouble(5)).distinct
    assert(eces.length == 1, "ece must be identical on every row")
    // replay: quantize p, fold exact longs
    val scored = Tables.orders(spark, sf)
      .select($"o_totalprice", ($"o_orderpriority" === "1-URGENT").cast("long"))
      .as[(Double, Long)].collect()
      .map { case (tp, y) =>
        val p = 1.0 / (1.0 + math.exp(-(tp / 100000.0 - 1.5)))
        val pq = math.floor(p * 10000 + 0.5).toLong
        (math.min(pq / 1000, 9L), pq, y)
      }
    val byBin = scored.groupBy(_._1)
    val gqAll = byBin.values.map { g =>
      math.abs(g.map(_._2).sum - 10000L * g.map(_._3).sum)
    }.sum
    val want = math.floor(gqAll.toDouble / 10000.0 / n * 10000 + 0.5) / 10000
    assert(math.abs(eces.head - want) < 1e-9, s"ece ${eces.head} vs replay $want")
    rows.foreach { r =>
      val (bin, bn, conf, acc) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      val g = byBin(bin)
      assert(bn == g.length.toLong)
      assert(conf >= 0.0 && conf <= 1.0 && acc >= 0.0 && acc <= 1.0)
      // confidence must sit inside its own bin's 0.1 band (quantized)
      assert(conf >= bin * 0.1 - 1e-4 && conf <= (bin + 1) * 0.1 + 1e-4)
    }
  }
}

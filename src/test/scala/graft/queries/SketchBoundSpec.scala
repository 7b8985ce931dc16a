package graft.queries

import graft.SparkSpec

/** The driver can't oracle a sketch (HLL internals are engine-specific,
  * so a14_approx_distinct is a rows-only gate there) — this spec is the
  * accuracy proof instead: the realized relative error of
  * approx_count_distinct(rsd=0.05) against the exact countDistinct must
  * stay inside a 3×rsd envelope on real testdata. HLL++'s rsd is a
  * standard deviation, so 3σ = 15% is a conservative deterministic
  * bound (the sketch itself is deterministic for fixed input). */
class SketchBoundSpec extends SparkSpec {

  test("a15: GK approx quantiles within 5% of exact, per group") {
    // accuracy=1000 bounds the RANK error at n/1000; on these price
    // distributions that translates to well under 5% in value space
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Registry.queries("a15_approx_quantile")(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        for ((e, a) <- Seq(("exact_p50", "approx_p50"), ("exact_p95", "approx_p95"))) {
          val exact = r.getAs[Double](e); val approx = r.getAs[Double](a)
          assert(math.abs(approx - exact) / exact <= 0.05,
            s"$sf ${r.getAs[String]("l_returnflag")}: $a=$approx vs $e=$exact")
        }
      }
    }
  }

  test("HLL sketches re-aggregate: daily sketch union equals the direct estimate") {
    // The property that makes 100 TB distinct-count dashboards possible:
    // persist one sketch per (slice, day) and answer ANY date-range
    // distinct-count by merging sketches — never rescanning the fact.
    // Union of same-lgK HLL sketches is register-wise max, i.e. exactly
    // the sketch the direct pass builds, so the reaggregated estimate
    // must EQUAL the direct one (not just approximate it); both stay
    // inside the usual error envelope of the exact count.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.01")
    val daily = ev.groupBy(date_trunc("day", $"ts").as("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val merged = daily.agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est"))
      .first().getLong(0)
    val direct = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
      .first().getLong(0)
    val exact = ev.select(countDistinct($"user_id")).first().getLong(0)
    assert(merged == direct,
      s"sketch reaggregation diverged: merged=$merged direct=$direct")
    assert(math.abs(merged - exact).toDouble / exact <= 0.15,
      s"estimate $merged outside 3-sigma envelope of exact $exact")
  }

  test("a14: HLL approx distinct within 3×rsd of exact, per group") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Registry.queries("a14_approx_distinct")(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val relErr = r.getAs[Double]("rel_err")
        assert(relErr <= 0.15,
          s"$sf ${r.getAs[String]("event_type")}: rel_err $relErr exceeds 3×rsd envelope 0.15")
      }
    }
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Volume sanity: the clean→daily path over ~1M generated rows across
  * 50 stations — no collect of data, one shuffle per stage, results
  * spot-checked analytically. (Correctness at scale shape, not a
  * wall-clock benchmark.) */
class VolumeSpec extends SparkSpec {
  import spark.implicits._

  test("clean + daily aggregate over 1M rows / 50 stations") {
    // 50 stations × ~834 days × 24 h ≈ 1.0M rows, distributed generation
    val hourly = spark.range(1000000)
      .select(
        (col("id") % 50).cast("string").as("station_id"),
        timestamp_seconds(lit(1577836800L) + (col("id") / 50) * 3600).as("ts_utc"),
        (lit(15.0) + (col("id") % 20)).as("temp_c"),
        lit(40.0).as("lat"), lit(-73.0).as("lon"),
        lit("isd").as("source"), lit(0L).as("qc_flags"))
      .select("ts_utc", "station_id", "lat", "lon", "temp_c", "source", "qc_flags")

    val daily = DailyTmax(CleanHourly.flagSpikes(CleanHourly.flagOutOfRange(hourly)),
      "America/New_York",
      clock = () => java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))

    val agg = daily.agg(
      count(lit(1)).as("n"),
      countDistinct($"station_id").as("n_stations"),
      max($"tmax_c").as("max_t"),
      min($"coverage_hours").as("min_cov")).collect()(0)
    assert(agg.getAs[Long]("n_stations") == 50)
    // station s sees temps 15 + ((s + 50k) mod 20) = two residues
    // {s mod 20, (s+10) mod 20} → per-station daily max is
    // 15 + max of the two; every full-coverage day must hit it exactly
    val expected = (0 until 50).map { s =>
      (s.toString, 15.0 + math.max(s % 20, (s + 10) % 20))
    }.toDF("station_id", "expected_max")
    val mismatches = daily.filter($"coverage_hours" === 24)
      .join(expected, "station_id")
      .filter($"tmax_c" =!= $"expected_max")
      .count()
    assert(mismatches == 0)
    assert(agg.getAs[Double]("max_t") == 34.0) // station 9/19/29/39/49 hits 15+19
    // ~834 days per station (23/25h DST days shift edges slightly)
    val n = agg.getAs[Long]("n")
    assert(n >= 50 * 830 && n <= 50 * 840, s"n=$n")
  }

  test("native as-of join over 1M x 100k rows, analytically checked") {
    // right: per key (1000 keys), one row at each exact hour 0..99 whose
    // value IS its epoch second → the expected as-of match for any left
    // time t is floor(t to the hour)
    val right = spark.range(100000)
      .select(
        (col("id") % 1000).as("k"),
        timestamp_seconds(expr("id DIV 1000") * 3600).as("ts"),
        (expr("id DIV 1000") * 3600).as("v"))
    // left: 1M rows, times spread over the same 100-hour span
    val left = spark.range(1000000)
      .select(
        (col("id") % 1000).as("k"),
        timestamp_seconds((col("id") % 356400)).as("ts"),
        col("id").as("event_id"))
    val out = graft.plans.AsofJoinNative(left, right, Seq("k"), "ts", "ts")
    val bad = out
      .withColumn("t", unix_timestamp(col("ts")))
      .filter(col("v").isNull || col("v") =!= (col("t") - col("t") % 3600))
      .count()
    assert(bad == 0)
    assert(out.count() == 1000000)
  }

  test("end-to-end corpus dedup over 1M docs with planted duplicate structure") {
    // 800k unique docs (id-stamped words → disjoint trigram sets, so
    // LSH bands cannot collide across docs) + 200k exact copies: doc
    // 800000+b and 900000+b copy doc b for b < 100000. Expected
    // components are fully analytic: 100k triples labeled by their base
    // id, 700k singletons — and the WHOLE pipeline runs at volume
    // (fused signatures, band buckets, bucket-size window, clique
    // verification, connected components), not a subsample.
    val docs = spark.range(1000000)
      .select(col("id").as("doc_id"),
        expr("""concat('a', CAST(CASE WHEN id >= 800000 THEN id % 100000 ELSE id END AS STRING),
                       ' b', CAST(CASE WHEN id >= 800000 THEN id % 100000 ELSE id END AS STRING),
                       ' c', CAST(CASE WHEN id >= 800000 THEN id % 100000 ELSE id END AS STRING),
                       ' d', CAST(CASE WHEN id >= 800000 THEN id % 100000 ELSE id END AS STRING),
                       ' e', CAST(CASE WHEN id >= 800000 THEN id % 100000 ELSE id END AS STRING))""")
          .as("text"))

    val labeled = DedupDocs(docs).cache()
    assert(labeled.count() == 1000000)
    assert(labeled.filter(col("is_survivor")).count() == 800000)

    val sizes = labeled.groupBy(col("component")).agg(count(lit(1)).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("groups"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 700000L, 3L -> 100000L),
      s"component size histogram $sizes")

    // copies are labeled by their base doc, which survives
    val wrongLabel = labeled
      .filter(col("doc_id") >= 800000 && col("component") =!= col("doc_id") % 100000)
      .count()
    assert(wrongLabel == 0)
    labeled.unpersist()
  }
}

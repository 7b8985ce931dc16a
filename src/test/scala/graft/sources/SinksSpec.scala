package graft.sources

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("hourly sink partitions by station/year and prunes on read") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val df = Seq(
      (Timestamp.valueOf("2023-07-01 00:00:00"), "KLGA", 20.0),
      (Timestamp.valueOf("2024-07-01 00:00:00"), "KLGA", 21.0),
      (Timestamp.valueOf("2024-07-01 00:00:00"), "KJFK", 22.0))
      .toDF("ts_utc", "station_id", "temp_c")
    Sinks.writeHourlyObs(df, dir)
    assert(Files.exists(Paths.get(s"$dir/station_id=KLGA/year=2023")))
    assert(Files.exists(Paths.get(s"$dir/station_id=KJFK/year=2024")))
    val read = spark.read.parquet(dir).filter($"station_id" === "KLGA" && $"year" === 2024)
    assert(read.count() == 1)
    val plan = read.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("station_id"), s"partition pruning missing: $scanLine")
  }

  test("writeSortedBy: disjoint per-file key ranges, sorted within files") {
    val dir = Files.createTempDirectory("graft_sorted").toString
    // scrambled key so the layout is earned by the sink, not the input
    val df = spark.range(10000)
      .select($"id", pmod($"id" * 2654435761L, lit(10007L)).as("k"))
    Sinks.writeSortedBy(df, dir, Seq("k"), numFiles = 4)
    val files = Files.list(Paths.get(dir)).iterator()
    val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    assert(parts.size == 4)
    // per-file min/max spans must not overlap: a range predicate then
    // touches few FILES, and (via the within-file sort) few row groups
    val spans = parts.map { f =>
      val r = spark.read.parquet(f).agg(min($"k"), max($"k")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, prevMax), (nextMin, _)) =>
        assert(prevMax <= nextMin, s"overlapping file ranges: $spans")
      case _ =>
    }
    // rows inside a file are sorted — the property parquet row-group
    // min/max stats need to be narrow
    val ks = spark.read.parquet(parts.head).coalesce(1)
      .select($"k").collect().map(_.getLong(0))
    assert(ks.sameElements(ks.sorted), "rows within a file must be sorted by k")
  }

  test("forecast append overwrites only the re-ingested issue partition") {
    val dir = Files.createTempDirectory("graft_fc").toString
    def part(issue: String, v: Double) = Seq(("KLGA", Timestamp.valueOf(issue), v))
      .toDF("station_id", "issue_time_utc", "tmax_pred_f")
    Sinks.appendForecastPartition(part("2024-07-01 12:00:00", 86.0), dir)
    Sinks.appendForecastPartition(part("2024-07-01 18:00:00", 88.0), dir)
    // re-ingest the 12:00 issue with corrected data
    Sinks.appendForecastPartition(part("2024-07-01 12:00:00", 87.0), dir)
    val out = spark.read.parquet(dir).orderBy("issue_hour")
      .select("tmax_pred_f").as[Double].collect()
    assert(out.toSeq == Seq(87.0, 88.0)) // 12:00 replaced, 18:00 untouched
  }

  test("bucketed tables join co-located: no exchange on either side") {
    val left = (1 to 200).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 200).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    Sinks.writeBucketed(left, "bkt_left", "k", 4, sortCols = Seq("k"))
    Sinks.writeBucketed(right, "bkt_right", "k", 4, sortCols = Seq("k"))
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(joined.count() == 200)
      val plan = joined.queryExecution.executedPlan.toString
      // the write-time bucketing satisfies the join's distribution
      // requirement on BOTH sides: shuffle paid once at write, never again
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}

package graft.ops

import java.nio.file.Files
import graft.SparkSpec

/** Persisted table statistics and the join decisions they feed: one-pass
  * collection without an Expand, parquet round-trip, and the broadcast
  * side actually flipping the physical join strategy. */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  test("collect: one aggregate, no Expand, exact nulls + plausible ndv") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
      .toDF("id", "tag")
    val plan = df.groupBy().agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
      .queryExecution.executedPlan.toString
    val stats = TableStats.collect(spark, df, "t")
    assert(stats.rows == 4)
    assert(stats.columns("id").nulls == 0)
    assert(stats.columns("tag").nulls == 1)
    assert(stats.columns("id").approxDistinct == 4) // HLL exact at tiny n
    assert(stats.columns("tag").approxDistinct == 2)
    // the collection plan itself must not Expand (the o23b contract)
    val cPlan = df.agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.approx_count_distinct($"id"),
      org.apache.spark.sql.functions.approx_count_distinct($"tag"))
      .queryExecution.executedPlan.toString
    assert(!cPlan.contains("Expand"), cPlan)
    assert(plan != null)
  }

  test("write/read round-trip preserves rows, bytes, and per-column stats") {
    val dir = Files.createTempDirectory("graft_stats").toString
    val df = (1L to 100L).toDF("id")
    df.write.mode("overwrite").parquet(s"$dir/data")
    val stats = TableStats.collect(spark, spark.read.parquet(s"$dir/data"),
      "ids", dataDir = Some(s"$dir/data"))
    assert(stats.bytes > 0, "file-listing bytes should be nonzero")
    TableStats.write(spark, stats, dir)
    val back = TableStats.read(spark, dir).get
    assert(back == stats)
    assert(TableStats.read(spark, s"$dir/absent").isEmpty)
  }

  test("broadcastSide: smaller fitting side wins, neither fits -> None") {
    def st(b: Long) = TableStats.Stats("t", 1, b, Map.empty)
    assert(TableStats.broadcastSide(st(10), st(20), 100) == Some(Left(())))
    assert(TableStats.broadcastSide(st(200), st(20), 100) == Some(Right(())))
    assert(TableStats.broadcastSide(st(20), st(200), 100) == Some(Left(())))
    assert(TableStats.broadcastSide(st(200), st(300), 100) == None)
    // bytes unknown (0) never broadcasts on a guess
    assert(TableStats.broadcastSide(st(0), st(0), 100) == None)
  }

  test("joinWithStats flips the physical strategy on measured bytes") {
    val big = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "b")
    val small = (1L to 50L).map(i => (i, i * 2)).toDF("k", "s")
    def stats(bytes: Long) = TableStats.Stats("t", 1, bytes, Map.empty)
    // small side measured under threshold -> BroadcastHashJoin
    val bc = TableStats.joinWithStats(
      big, stats(1L << 30), small, stats(1024), Seq("k"))
    assert(bc.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(bc.count() == 50)
    // neither fits -> no broadcast hint from us (plain join stands;
    // rows identical either way)
    val plain = TableStats.joinWithStats(
      big, stats(1L << 30), small, stats(1L << 30), Seq("k"),
      thresholdBytes = 100)
    assert(plain.count() == 50)
  }
}

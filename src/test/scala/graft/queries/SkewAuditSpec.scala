package graft.queries

import graft.SparkSpec
import graft.core.Tables

/** Pins o26_skew_audit: driver replay of every emitted count per key
  * family, the exact-integer strategy rules, and a constructed-skew
  * check that a hot key actually flips the recommendation. */
class SkewAuditSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("per-family counts replay; strategy follows the integer rules") {
    val out = Registry.queries("o26_skew_audit")(spark, sf).collect()
    assert(out.length == 3)
    val byFam = out.map(r => r.getString(0) -> r).toMap
    val userCnts = Tables.events(spark, sf).groupBy("user_id").count()
      .as[(Long, Long)].collect().map(_._2)
    val r = byFam("events.user_id")
    assert(r.getLong(1) == userCnts.sum && r.getLong(2) == userCnts.length
      && r.getLong(3) == userCnts.max)
    assert(r.getLong(4) == userCnts.sorted.reverse.take(10).sum)
    out.foreach { row =>
      val (rows, keys, top1) = (row.getLong(1), row.getLong(2), row.getLong(3))
      val want =
        if (top1 * 10 >= rows) "hot-cold-split"
        else if (top1 * keys >= 8 * rows) "salt"
        else "plain-aqe"
      assert(row.getString(7) == want, s"${row.getString(0)}: ${row.getString(7)}")
    }
  }

  test("a constructed hot key flips the recommendation to hot-cold-split") {
    val d = java.nio.file.Files.createTempDirectory("skew").toString
    val hot = (1 to 500).map(i => (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      7L, "view", 1.0, "{}")) ++
      (1 to 100).map(i => (1000L + i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        100L + i, "view", 1.0, "{}"))
    hot.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    // the other two families need their tables present
    Seq("lineitem", "orders").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    val out = Registry.queries("o26_skew_audit")(spark, d).collect()
      .map(r => r.getString(0) -> r.getString(7)).toMap
    assert(out("events.user_id") == "hot-cold-split", s"got $out")
  }
}

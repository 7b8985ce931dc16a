package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attaches most recent right row at or before left ts, per key") {
    val left = Seq(
      (1L, ts("2024-07-01 10:00:00"), 7L),
      (1L, ts("2024-07-01 12:00:00"), 8L),
      (2L, ts("2024-07-01 12:00:00"), 9L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-07-01 09:00:00"), 100.0),
      (1L, ts("2024-07-01 11:00:00"), 200.0),
      (2L, ts("2024-07-01 13:00:00"), 300.0)) // after left → never matched
      .toDF("user_id", "ts", "value")
    val out = AsofJoin(left, right, Seq("user_id"), "ts", Seq("value"))
      .orderBy("event_id").collect()
    assert(Option(out(0).getAs[java.lang.Double]("asof_value")).map(_.toDouble).contains(100.0))
    assert(Option(out(1).getAs[java.lang.Double]("asof_value")).map(_.toDouble).contains(200.0))
    assert(out(2).isNullAt(out(2).fieldIndex("asof_value"))) // no prior right row
  }

  test("equal timestamps match (<= semantics) and keys do not leak") {
    val left = Seq((1L, ts("2024-07-01 10:00:00"), 1L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-07-01 10:00:00"), 42.0),
      (2L, ts("2024-07-01 09:00:00"), 99.0)) // other key
      .toDF("user_id", "ts", "value")
    val out = AsofJoin(left, right, Seq("user_id"), "ts", Seq("value")).collect()
    assert(out(0).getAs[Double]("asof_value") == 42.0)
  }

  test("carries the whole most-recent row: null payload fields preserved, no row mixing") {
    val left = Seq((1L, ts("2024-07-01 12:00:00"), 1L)).toDF("user_id", "ts", "event_id")
    // most recent right row (11:00) has amount=null, tag="new"; the older
    // row (09:00) has amount=7.0, tag="old". ASOF must carry (null, "new"),
    // never the staler amount and never a mix of the two rows.
    val right = Seq(
      (1L, ts("2024-07-01 09:00:00"), Option(7.0), Option("old")),
      (1L, ts("2024-07-01 11:00:00"), None: Option[Double], Option("new")))
      .toDF("user_id", "ts", "amount", "tag")
    val out = AsofJoin(left, right, Seq("user_id"), "ts", Seq("amount", "tag")).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("asof_amount")))
    assert(out(0).getAs[String]("asof_tag") == "new")
  }
}

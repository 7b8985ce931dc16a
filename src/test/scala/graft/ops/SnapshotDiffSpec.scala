package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def feed(byValue: Boolean) = {
    val old = Seq(
      (1L, "A", Some(10.0)), // unchanged
      (2L, "B", Some(20.0)), // payload update
      (3L, "C", Some(30.0)), // deleted
      (4L, "D", None),       // null payload, unchanged
      (5L, "E", None)        // null -> value update
    ).toDF("k", "status", "price")
    val neu = Seq(
      (1L, "A", Some(10.0)),
      (2L, "B", Some(21.0)),
      (4L, "D", Option.empty[Double]),
      (5L, "E", Some(5.0)),
      (6L, "F", Some(60.0)) // insert
    ).toDF("k", "status", "price")
    SnapshotDiff.changes(old, neu, keys = Seq("k"),
        compareCols = Seq("status", "price"), byValue = byValue)
      .orderBy("k").as[(Long, String)].collect().toSeq
  }

  test("hash mode classifies insert/update/delete and drops unchanged") {
    assert(feed(byValue = false) ===
      Seq((2L, "update"), (3L, "delete"), (5L, "update"), (6L, "insert")))
  }

  test("byValue mode agrees, including null->value transitions") {
    assert(feed(byValue = true) === feed(byValue = false))
  }

  test("empty old snapshot yields all inserts; empty new yields all deletes") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val none = a.filter(lit(false))
    val ins = SnapshotDiff.changes(none, a, Seq("k"), Seq("v")).collect()
    val del = SnapshotDiff.changes(a, none, Seq("k"), Seq("v")).collect()
    assert(ins.map(_.getString(1)).toSeq === Seq("insert"))
    assert(del.map(_.getString(1)).toSeq === Seq("delete"))
  }
}

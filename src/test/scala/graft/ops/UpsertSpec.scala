package graft.ops

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def frame(rows: Seq[(Long, String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "attr", "ver", "v")
  }

  test("updates replace base rows with the same key") {
    val base = frame(Seq((1L, "old", 1L, 1.0), (2L, "keep", 1L, 2.0)))
    val upd = frame(Seq((1L, "new", 2L, 9.0), (3L, "ins", 1L, 3.0)))
    val out = Upsert.mergeLatest(base, upd, Seq("k"), Seq("ver"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, "new", 9.0), (2L, "keep", 2.0), (3L, "ins", 3.0)))
  }

  test("within a side the greatest orderBy tuple wins; update wins full ties") {
    val base = frame(Seq((1L, "b1", 5L, 1.0), (1L, "b2", 7L, 2.0)))
    val upd = frame(Seq((1L, "u-low", 3L, 3.0), (1L, "u-tie", 7L, 4.0)))
    // base has ver 7, update also has ver 7 → tie on orderBy, update wins
    val out = Upsert.mergeLatest(base, upd, Seq("k"), Seq("ver"))
      .collect().map(r => r.getString(1))
    assert(out.toSeq == Seq("u-tie"))
  }

  test("an update older than the snapshot row does not win") {
    val base = frame(Seq((1L, "cur", 10L, 1.0)))
    val upd = frame(Seq((1L, "stale", 4L, 2.0)))
    val out = Upsert.mergeLatest(base, upd, Seq("k"), Seq("ver"))
      .collect().map(r => r.getString(1))
    assert(out.toSeq == Seq("cur"))
  }

  test("plan: no window, map-side partial combine, exactly one exchange") {
    val base = frame(Seq((1L, "a", 1L, 1.0)))
    val upd = frame(Seq((2L, "b", 1L, 2.0)))
    val plan = Upsert.mergeLatest(base, upd, Seq("k"), Seq("ver"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    // partial_max_by below the exchange = the shuffle carries one
    // candidate per (mapper, key), not the whole change log
    val exchangeAt = plan.indexOf("Exchange")
    val partialAt = plan.indexOf("partial_max_by")
    assert(exchangeAt >= 0 && partialAt > exchangeAt,
      s"expected map-side partial aggregation below the exchange:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange:\n$plan")
  }

  test("schema and column mismatches are rejected") {
    val base = frame(Seq((1L, "a", 1L, 1.0)))
    val wrong = base.withColumnRenamed("v", "w")
    intercept[IllegalArgumentException] {
      Upsert.mergeLatest(base, wrong, Seq("k"), Seq("ver"))
    }
    intercept[IllegalArgumentException] {
      Upsert.mergeLatest(base, base, Seq("nope"), Seq("ver"))
    }
  }
}

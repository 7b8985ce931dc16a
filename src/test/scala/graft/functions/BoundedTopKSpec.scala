package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BoundedTopK: partition-independence, tie determinism, buffer bound,
  * and the partial (map-side) aggregation the scale story rests on. */
class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window spelling on an adversarially shuffled input") {
    val rows = (1L to 2000L).map(i => (s"g${i % 7}", (i % 50).toDouble, i))
    // repartition(13) scatters each group across partitions so merge()
    // runs on genuinely partial buffers in nondeterministic order
    val df = rows.toDF("g", "score", "id").repartition(13)
    val topk = BoundedTopK.udaf(5)
    val got = df.groupBy($"g").agg(topk($"score", $"id").as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", ($"pos" + 1).as("rank"), $"col._1".as("score"), $"col._2".as("id"))
      .orderBy($"g", $"rank")
      .as[(String, Int, Double, Long)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (_, s, id) => (-s, id) }.take(5).zipWithIndex
        .map { case ((_, s, id), i) => (g, i + 1, s, id) }
    }.sorted
    assert(got == want)
    // ties on score MUST resolve by id: 50 score values over ~285 rows
    // per group guarantees collisions, so the tie path is exercised
    val scores = rows.map { case (g, s, _) => (g, s) }
    assert(scores.distinct.size < scores.size, "tie case is vacuous")
  }

  test("buffers never exceed 2k entries through reduce/merge") {
    val agg = new BoundedTopK.TopKAgg(4)
    var buf = agg.zero
    for (i <- 1 to 100) {
      buf = agg.reduce(buf, (i.toDouble, i.toLong))
      assert(buf.length < 8, s"buffer grew to ${buf.length}")
    }
    var buf2 = agg.zero
    for (i <- 101 to 150) buf2 = agg.reduce(buf2, (i.toDouble, i.toLong))
    val merged = agg.merge(buf, buf2)
    assert(merged.length <= 8)
    assert(agg.finish(merged) == Seq((150.0, 150L), (149.0, 149L), (148.0, 148L), (147.0, 147L)))
  }

  test("the plan aggregates partially before the exchange") {
    val df = (1L to 100L).map(i => (s"g${i % 3}", i.toDouble, i)).toDF("g", "score", "id")
      .repartition(4)
    val topk = BoundedTopK.udaf(3)
    val p = df.groupBy($"g").agg(topk($"score", $"id")).queryExecution.executedPlan.toString
    // ObjectHashAggregate runs in partial + final mode around the
    // exchange — the map-side combine that bounds shuffle width to
    // k·mappers per group; losing it re-shuffles every row
    assert(p.contains("ObjectHashAggregate"), p)
    assert("partial_".r.findAllIn(p).nonEmpty, p)
  }
}

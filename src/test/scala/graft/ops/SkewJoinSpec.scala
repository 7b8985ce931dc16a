package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def skewedFact(n: Int) =
    spark.range(n.toLong).select(
      // key 7 takes 60% of rows; the rest spread over 200 cold keys;
      // every 97th row has a NULL key (must not NPE the sketch build —
      // inner-join semantics drop them regardless)
      when($"id" % 97 === 0, lit(null).cast("long"))
        .when($"id" % 10 < 6, 7L).otherwise($"id" % 200 + 100).as("k"),
      ($"id" * 3 % 97).cast("double").as("v"))

  private def dimOf(fact: org.apache.spark.sql.DataFrame) =
    fact.select($"k").distinct().withColumn("label", concat(lit("n"), $"k"))

  test("result equals the plain inner join exactly") {
    val fact = skewedFact(20000)
    val dim = dimOf(fact)
    val got = SkewJoin.inner(fact, dim, "k", hotThreshold = 1000)
      .groupBy($"k", $"label").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val ref = fact.join(dim, Seq("k"))
      .groupBy($"k", $"label").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == ref)
  }

  test("hot slice broadcasts, cold remainder shuffles — both regimes in one plan") {
    val fact = skewedFact(20000)
    val out = SkewJoin.inner(fact, dimOf(fact), "k", hotThreshold = 1000)
    // the INITIAL plan is the right thing to pin here: the hot side's
    // strategy comes from the explicit broadcast() hint, fixed before
    // AQE ever runs (a noop write would execute a separate
    // QueryExecution and leave this one un-finalized anyway)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"hot slice must broadcast:\n$plan")
    // the cold remainder keeps a SEPARATE join (AQE may broadcast the
    // small cold dim here too — the split itself is what is pinned)
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins >= 2, s"expected two join regimes in one plan:\n$plan")
  }

  test("left-outer equals the plain left join: unmatched facts and null keys survive") {
    val fact = skewedFact(20000)
    // dim missing a third of the keys → real unmatched-left rows
    val dim = dimOf(fact).filter($"k" % 3 =!= 0)
    def summarize(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"k", $"label").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2), r.getDouble(3))).toSet
    val got = summarize(SkewJoin.leftOuter(fact, dim, "k", hotThreshold = 1000))
    val ref = summarize(fact.join(dim, Seq("k"), "left_outer"))
    assert(got == ref)
    // the full fact survives — nothing dropped by the regime split
    assert(SkewJoin.leftOuter(fact, dim, "k", 1000).count() == fact.count())
  }

  test("no hot keys → single plain join; threshold bounds driver state") {
    val uniform = spark.range(5000).select(($"id" % 500).as("k"), $"id".cast("double").as("v"))
    val dim = dimOf(uniform)
    val out = SkewJoin.inner(uniform, dim, "k", hotThreshold = 1000)
    assert(out.count() == 5000)
    // every key ~10 rows << 1000: the fast path is the plain join with
    // no broadcast split (one join node in the analyzed plan)
    val joins = out.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 1, "uniform data must not split regimes")
  }
}

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

  test("salted inner equals the plain join; left-outer keeps nulls and unmatched") {
    val fact = skewedFact(20000)
    val dim = dimOf(fact).filter($"k" % 3 =!= 0)
    def summarize(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"k", $"label").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2), r.getDouble(3))).toSet
    assert(summarize(SkewJoin.innerSalted(fact, dim, "k", hotThreshold = 1000, nSalts = 8))
      == summarize(fact.join(dim, Seq("k"))))
    assert(summarize(SkewJoin.leftOuterSalted(fact, dim, "k", hotThreshold = 1000, nSalts = 8))
      == summarize(fact.join(dim, Seq("k"), "left_outer")))
    assert(SkewJoin.leftOuterSalted(fact, dim, "k", 1000, 8).count() == fact.count())
  }

  test("pre-built sketch + salted join: the fact parquet is scanned exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_onescan").toString
    skewedFact(20000).write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim must NOT derive from the fact here (dimOf would re-scan the
    // same parquet from the dim side and defeat the scan count)
    val dim = spark.range(300).select(($"id" + 7).as("k"))
      .withColumn("label", concat(lit("n"), $"k"))
    // the sketch rides in from a prior stage (built here once, as that
    // stage would); the join itself must then read the fact ONCE — no
    // sketch scan, no hot/cold branch scans
    val cms = SkewJoin.sketch(fact, "k")
    val out = SkewJoin.innerSalted(fact, dim, "k", hotThreshold = 1000,
      nSalts = 8, cms = Some(cms))
    // count occurrences of the fact RELATION in the optimized plan (the
    // physical tree hides scans inside the AQE wrapper): the hot/cold
    // branch spelling shows it 2-3 times, the salted spelling once
    val factScans = out.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.count(_.relation match {
      case r: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        r.location.rootPaths.exists(_.toString.contains(dir))
      case _ => false
    })
    assert(factScans == 1,
      s"expected exactly one fact scan, got $factScans:\n${out.queryExecution.optimizedPlan}")
    // and the answer is still the plain join
    assert(out.count() == fact.join(dim, Seq("k")).count())
  }

  test("saturated sketch → hot dim slice above budget → plain-join fallback") {
    val fact = skewedFact(20000)
    val dim = dimOf(fact)
    // w=2: every key collides into two cells, so every key estimates
    // ~half the fact — far above threshold → all ~201 dim keys read hot,
    // which exceeds a 50-row broadcast budget
    val out = SkewJoin.inner(fact, dim, "k", hotThreshold = 1000, w = 2, d = 1,
      maxHotDimRows = 50)
    val joins = out.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 1, "saturated sketch must fall back to one plain join")
    assert(out.count() == fact.join(dim, Seq("k")).count())
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

package graft.ops

import graft.SparkSpec

class MixSamplerSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 30L).map(i => (i, s"dom${i % 3}")).toDF("id", "dom")

  test("quotas are floor(weight*total); unweighted domains excluded; deterministic") {
    val out = MixSampler.sample(docs, "dom", "id",
      Map("dom0" -> 0.5, "dom1" -> 0.25), total = 20L)
    val byDom = out.collect().groupBy(_.getString(1))
    assert(byDom("dom0").length == 10) // floor(0.5*20)
    assert(byDom("dom1").length == 5)  // floor(0.25*20)
    assert(!byDom.contains("dom2"))    // no weight → excluded
    // reproducible: same input, same sample, same ranks
    val again = MixSampler.sample(docs, "dom", "id",
      Map("dom0" -> 0.5, "dom1" -> 0.25), total = 20L)
    assert(out.collect().toSeq == again.collect().toSeq)
  }

  test("over-asked quota degrades to the whole domain") {
    val out = MixSampler.sample(docs, "dom", "id", Map("dom0" -> 5.0), total = 100L)
    assert(out.count() == 10) // dom0 only has 10 docs
  }

  test("bucketed decomposition equals the per-domain window on a one-hot fixture") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // 95% of rows in one domain — the shape that made the old
    // window-per-domain spelling a single reducer
    val skewed = (0L until 400L)
      .map(i => (i, if (i < 380) "web" else s"niche${i % 4}", 3L + i % 5))
      .toDF("id", "dom", "toks")
    val weights = Map("web" -> 0.6, "niche0" -> 0.2)
    val h = expr(graft.queries.Shingles.h60("CAST(id AS STRING)"))

    // reference spelling: global per-domain window (fine at spec scale)
    val quota = when($"dom" === "web", lit(120L))
      .when($"dom" === "niche0", lit(40L)).otherwise(lit(null).cast("long"))
    val wRef = Window.partitionBy($"dom").orderBy(h, $"id")
    val ref = skewed.withColumn("mix_rank", row_number().over(wRef).cast("long"))
      .filter($"mix_rank" <= quota)
      .select($"id", $"dom", $"mix_rank").collect().toSet
    val got = MixSampler.sample(skewed, "dom", "id", weights, total = 200L)
      .select($"id", $"dom", $"mix_rank").collect().toSet
    assert(got == ref)

    // token budgets: same equivalence for the running sum
    val budget = when($"dom" === "web", lit(600L))
      .when($"dom" === "niche0", lit(200L)).otherwise(lit(null).cast("long"))
    val wCum = wRef.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val refTok = skewed.withColumn("cum_tokens", sum($"toks").over(wCum))
      .filter($"cum_tokens" <= budget)
      .select($"id", $"dom", $"cum_tokens").collect().toSet
    val gotTok = MixSampler.sampleByTokens(skewed, "dom", "id", "toks",
        weights, totalTokens = 1000L)
      .select($"id", $"dom", $"cum_tokens").collect().toSet
    assert(gotTok == refTok)
  }

  test("corpus window is partitioned by (domain, bucket), never domain alone") {
    val out = MixSampler.sample(docs, "dom", "id", Map("dom0" -> 0.5), total = 20L)
    val p = out.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p).toSeq
    assert(specs.nonEmpty)
    specs.foreach(s => assert(s.contains("mix_b"), s"window without bucket: $s"))
  }

  test("token-budget sampling admits the monotone prefix within the budget") {
    import org.apache.spark.sql.functions._
    val withTokens = docs.withColumn("toks", lit(7L))
    // dom0 has 10 docs x 7 tokens = 70; budget floor(0.5*60)=30 → 4 docs (28)
    val out = MixSampler.sampleByTokens(withTokens, "dom", "id", "toks",
      Map("dom0" -> 0.5), totalTokens = 60L)
    val rows = out.collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("cum_tokens")).max == 28L)
    // determinism: the admitted prefix is identical across runs
    val again = MixSampler.sampleByTokens(withTokens, "dom", "id", "toks",
      Map("dom0" -> 0.5), totalTokens = 60L).collect()
    assert(rows.map(_.getAs[Long]("id")).toSet == again.map(_.getAs[Long]("id")).toSet)
  }
}

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

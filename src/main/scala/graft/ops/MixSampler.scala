package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted domain mixing — the sampling step a training
  * corpus runs after dedup/quality filtering: each domain (source,
  * language, crawl...) contributes floor(weight · total) documents,
  * chosen by a stable per-row hash order so the "random" sample is
  * reproducible across runs and engines (no RNG, no seed plumbing).
  *
  * Scale shape: one window partitioned by domain, ordered by the
  * 60-bit md5 hash of the id — per-domain rank, NO global sort; at
  * 100 TB each domain's window parallelizes independently and AQE
  * handles domain-size skew. Domains without a weight are excluded
  * (weight 0); an over-asked quota degrades to "the whole domain".
  */
object MixSampler {

  /** @param weights domain → mixture fraction (need not sum to 1;
    *                missing domains contribute nothing)
    * @param total   target corpus size; per-domain quota =
    *                floor(weight · total)
    * @return input rows + `mix_rank` (1-based stable rank within the
    *         domain), filtered to the quota
    */
  def sample(df: DataFrame, domainCol: String, idCol: String,
      weights: Map[String, Double], total: Long): DataFrame = {
    // quotas resolve on the DRIVER and enter the plan as long literals:
    // floor(w * total) in engine-side arithmetic is a cross-engine
    // hazard (binary-double 0.29*100 floors to 28, decimal floors to
    // 29) — one authoritative computation sidesteps the entire class
    val quotas: Map[String, Long] =
      weights.map { case (dom, w) => dom -> math.floor(w * total).toLong }
    val quota: Column = quotas.foldLeft(lit(null).cast("long")) {
      case (acc, (dom, q)) => when(col(domainCol) === dom, lit(q)).otherwise(acc)
    }
    val h = expr(graft.queries.Shingles.h60(s"CAST($idCol AS STRING)"))
    val w = Window.partitionBy(col(domainCol)).orderBy(h, col(idCol))
    df.withColumn("mix_rank", row_number().over(w))
      .filter(col("mix_rank") <= quota) // null quota (unweighted domain) drops
  }

  /** Token-budget variant — the semantics a real mixture actually uses
    * (training budgets are in TOKENS, not documents): per domain, admit
    * the hash-ordered prefix whose cumulative token count stays within
    * floor(weight · totalTokens). Once the running sum crosses the
    * budget, every later row in the domain is out (monotone prefix —
    * deterministic, no knapsack). Same single per-domain window as
    * `sample`; budgets are driver-computed long literals. */
  def sampleByTokens(df: DataFrame, domainCol: String, idCol: String,
      tokenCol: String, weights: Map[String, Double], totalTokens: Long): DataFrame = {
    val budgets: Map[String, Long] =
      weights.map { case (dom, w) => dom -> math.floor(w * totalTokens).toLong }
    val budget: Column = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (dom, b)) => when(col(domainCol) === dom, lit(b)).otherwise(acc)
    }
    val h = expr(graft.queries.Shingles.h60(s"CAST($idCol AS STRING)"))
    val w = Window.partitionBy(col(domainCol)).orderBy(h, col(idCol))
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }
}

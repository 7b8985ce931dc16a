package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic weighted domain mixing — the sampling step a training
  * corpus runs after dedup/quality filtering: each domain (source,
  * language, crawl...) contributes floor(weight · total) documents,
  * chosen by a stable per-row hash order so the "random" sample is
  * reproducible across runs and engines (no RNG, no seed plumbing).
  *
  * Scale shape: a production domain ("web" at 100 TB) is most of the
  * corpus, so a window partitioned by domain alone is ONE reducer
  * sorting almost everything. Instead the 60-bit hash order is split on
  * its top `bucketBits` bits: a per-(domain, bucket) count histogram
  * (|domains| × 2^bucketBits rows) is aggregated with map-side combine
  * and collected driver-side like a model fit; the driver turns it into
  * cumulative "rows below this bucket" offsets, which re-enter the plan
  * through a broadcast join. The only window over the corpus is then
  * partitioned by (domain, bucket) — 2^bucketBits-way parallel within
  * every domain — and buckets entirely past the quota are pruned by the
  * inner join before any sort happens. Because the bucket is a monotone
  * prefix of the hash ordering, offset + within-bucket rank is EXACTLY
  * the global per-domain rank (equivalence pinned in MixSamplerSpec and
  * by the windowed DuckDB oracle of text_domain_mix/text_token_mix).
  *
  * Domains without a weight are excluded (weight 0); an over-asked
  * quota degrades to "the whole domain".
  */
object MixSampler {

  /** 4096 hash-order buckets per domain — the corpus-window parallelism. */
  val DefaultBucketBits = 12

  private def h60(idCol: String): Column =
    expr(graft.queries.Shingles.h60(s"CAST($idCol AS STRING)"))

  /** Collects the per-(domain, bucket) histogram and returns broadcast-
    * joinable offset rows (domain, bucket, below, cap): cumulative
    * `value` in lower buckets of the same domain, limited to buckets
    * that can still contribute rows under `cap` (quota or budget).
    * `keepEq` keeps the below == cap boundary (needed for token budgets
    * where a zero-token row on the boundary is still admitted). */
  private def bucketOffsets(df: DataFrame, domainCol: String, bucket: Column,
      value: Column, caps: Map[String, Long], keepEq: Boolean): DataFrame = {
    val spark = df.sparkSession
    val hist = df
      .filter(col(domainCol).isin(caps.keys.toSeq: _*))
      .groupBy(col(domainCol).as("mix_d"), bucket.as("mix_b"))
      .agg(sum(value).as("mix_c"))
      .collect()
    val rows = hist
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (dom, bs) =>
        val cap = caps(dom)
        var below = 0L
        bs.sortBy(_._2).flatMap { case (_, b, c) =>
          val keep = if (keepEq) below <= cap else below < cap
          val row = if (keep) Some(Row(dom, b, below, cap)) else None
          below += c
          row
        }
      }
    val schema = StructType(Seq(
      StructField("mix_d", StringType), StructField("mix_b", LongType),
      StructField("mix_below", LongType), StructField("mix_cap", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** @param weights domain → mixture fraction (need not sum to 1;
    *                missing domains contribute nothing)
    * @param total   target corpus size; per-domain quota =
    *                floor(weight · total)
    * @return input rows + `mix_rank` (1-based stable rank within the
    *         domain, long), filtered to the quota
    */
  def sample(df: DataFrame, domainCol: String, idCol: String,
      weights: Map[String, Double], total: Long,
      bucketBits: Int = DefaultBucketBits): DataFrame = {
    // quotas resolve on the DRIVER and enter the plan as long literals:
    // floor(w * total) in engine-side arithmetic is a cross-engine
    // hazard (binary-double 0.29*100 floors to 28, decimal floors to
    // 29) — one authoritative computation sidesteps the entire class
    val quotas: Map[String, Long] =
      weights.map { case (dom, w) => dom -> math.floor(w * total).toLong }
    val h = h60(idCol)
    val bucket = shiftright(h, 60 - bucketBits)
    val offsets = bucketOffsets(df, domainCol, bucket, lit(1L), quotas, keepEq = false)
    val w = Window.partitionBy(col(domainCol), col("mix_b")).orderBy(h, col(idCol))
    df.join(broadcast(offsets),
        col(domainCol) === col("mix_d") && bucket === col("mix_b"))
      .withColumn("mix_rank", col("mix_below") + row_number().over(w))
      .filter(col("mix_rank") <= col("mix_cap"))
      .drop("mix_d", "mix_b", "mix_below", "mix_cap")
  }

  /** Token-budget variant — the semantics a real mixture actually uses
    * (training budgets are in TOKENS, not documents): per domain, admit
    * the hash-ordered prefix whose cumulative token count stays within
    * floor(weight · totalTokens). Once the running sum crosses the
    * budget, every later row in the domain is out (monotone prefix —
    * deterministic, no knapsack). Same bucketed decomposition as
    * `sample`; requires non-negative token counts (monotonicity is what
    * makes the past-budget bucket pruning exact). */
  def sampleByTokens(df: DataFrame, domainCol: String, idCol: String,
      tokenCol: String, weights: Map[String, Double], totalTokens: Long,
      bucketBits: Int = DefaultBucketBits): DataFrame = {
    val budgets: Map[String, Long] =
      weights.map { case (dom, w) => dom -> math.floor(w * totalTokens).toLong }
    val h = h60(idCol)
    val bucket = shiftright(h, 60 - bucketBits)
    val offsets = bucketOffsets(df, domainCol, bucket,
      coalesce(col(tokenCol).cast("long"), lit(0L)), budgets, keepEq = true)
    val w = Window.partitionBy(col(domainCol), col("mix_b")).orderBy(h, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(offsets),
        col(domainCol) === col("mix_d") && bucket === col("mix_b"))
      .withColumn("cum_tokens", col("mix_below") + sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= col("mix_cap"))
      .drop("mix_d", "mix_b", "mix_below", "mix_cap")
  }
}

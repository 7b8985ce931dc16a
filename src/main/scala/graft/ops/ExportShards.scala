package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-budgeted shard export — the last mile of a training-data
  * pipeline: curated documents leave the lakehouse as numbered shards
  * whose token counts respect a per-shard budget, with a manifest the
  * trainer reads instead of listing files.
  *
  * Assignment is the deterministic concat-and-chunk rule (the
  * text_pack_bins discipline): docs in stable doc_id order, shard id =
  * floor(tokens-before-this-doc / budget) — a doc opens the next shard
  * once the running total crosses the boundary, so every shard except
  * the last holds ≥ budget − max_doc_tokens and ≤ budget +
  * max_doc_tokens tokens (docs are never split). The running total is
  * [[PrefixSum]]'s range-bucketed two-pass cumsum: a single-reducer
  * global window would serialize the corpus at 100 TB.
  *
  * Output layout: `outDir/data/shard=<id>/…parquet` (one file per
  * shard — shards are budget-bounded by construction, so one file is
  * the right grain) plus `outDir/manifest` with per-shard doc/token
  * counts and the doc_id span. Deterministic: same corpus + budget ⟹
  * byte-stable assignment, so re-exports are reproducible (the
  * training-run provenance property).
  */
object ExportShards {

  /** Adds `shard` to the docs frame (doc_id-ordered concat-and-chunk). */
  def plan(docs: DataFrame, tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val withTok = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("__g", lit("all"))
    PrefixSum.withCumsum(withTok, "__g", "doc_id", "n_tokens", "__cum", buckets = 32)
      .withColumn("shard",
        floor((col("__cum") - col("n_tokens")) / tokenBudget.toDouble).cast("long"))
      .drop("__g", "__cum")
  }

  /** Plan + write shards and manifest. Returns the manifest frame. */
  def export(docs: DataFrame, outDir: String, tokenBudget: Long): DataFrame = {
    val planned = plan(docs, tokenBudget)
    planned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/data")
    val spark = docs.sparkSession
    // partition-column inference reads `shard=` dirs back as INT;
    // re-cast so the manifest schema is stable regardless of layout
    val manifest = spark.read.parquet(s"$outDir/data")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }
}

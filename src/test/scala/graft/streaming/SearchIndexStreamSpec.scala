package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.ops.SearchIndex
import org.apache.spark.sql.functions._

/** Pins the streaming search-index contract: a generational layout fed
  * in micro-batches scores BIT-IDENTICALLY to a one-shot batch build
  * over the same corpus (df/Σdl additivity — equality, not closeness),
  * replaying a generation is idempotent, and the index is serveable
  * mid-ingest (a prefix of generations = a valid index of the prefix
  * corpus). */
class SearchIndexStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "window", "dup")

  private def results(dir: String): Seq[(Long, Double, Int)] =
    SearchIndex.search(spark, dir, terms, k = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq

  test("streamed generations ≡ one-shot build; replay idempotent; mid-ingest serveable") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val d = java.nio.file.Files.createTempDirectory("sidx_stream").toString

    // 3 micro-batches by doc_id band, driven through the streaming sink
    docs.withColumn("band", pmod($"doc_id", lit(3L)))
      .repartition(3, $"band").drop("band")
      .write.mode("overwrite").parquet(s"$d/in")
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$d/in")
    Streams.searchIndexStream(src, s"$d/gen_idx", s"$d/ckpt").awaitTermination()

    SearchIndex.build(docs, s"$d/full_idx")
    assert(results(s"$d/gen_idx") == results(s"$d/full_idx"),
      "generational index diverged from the one-shot build")

    // replay idempotence: re-applying an existing generation changes nothing
    val gen0Docs = spark.read.parquet(s"$d/gen_idx/postings")
      .select($"doc_id").distinct().limit(5).as[Long].collect()
    SearchIndex.applyGenBatch(
      docs.filter($"doc_id".isin(gen0Docs: _*)), s"$d/replay_idx", 0L)
    val before = results(s"$d/replay_idx")
    SearchIndex.applyGenBatch(
      docs.filter($"doc_id".isin(gen0Docs: _*)), s"$d/replay_idx", 0L)
    assert(results(s"$d/replay_idx") == before, "generation replay not idempotent")

    // mid-ingest: a single-generation prefix is a valid index of its docs
    val half = docs.filter($"doc_id" % 2 === 0)
    SearchIndex.applyGenBatch(half, s"$d/prefix_idx", 0L)
    SearchIndex.build(half, s"$d/prefix_full")
    assert(results(s"$d/prefix_idx") == results(s"$d/prefix_full"))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted dedup-admission index — the write-once derivable columns
  * of a kept corpus, stored AT ADMISSION so that incremental
  * batch-vs-corpus dedup ([[DedupDocs.incrementalIndexed]]) joins
  * precomputed state instead of re-hashing the corpus text on every
  * batch:
  *
  *   dir/fps    (doc_id, fp)      content fingerprint, md5 of text
  *   dir/bands  (doc_id, bucket)  MinHash-LSH band buckets
  *   dir/grams  (doc_id, gram)    distinct 60-bit trigram hashes
  *
  * Each table is written range-partitioned and row-group-sorted by its
  * JOIN key (fp / bucket / doc_id), so a batch's probe of a 100 TB
  * index prunes files and row groups from footer stats instead of
  * scanning the index end to end. (On a cluster with a metastore these
  * become `bucketBy` tables and the probe joins shuffle-free; the
  * path-parquet spelling keeps the same sort-pruning property without
  * catalog state.)
  *
  * `append` is the steady-state maintenance op: after a batch is
  * admitted, ONLY the admitted docs' rows are appended — the index is
  * never rebuilt. Appended files carry the same per-file sort, so
  * pruning holds within every generation of files; compact
  * generations offline (re-run [[write]]) when file counts grow.
  *
  * Derivation cost: [[build]] scans the doc text once per table (three
  * narrow map-side passes at admission time, amortized over every
  * future batch the index serves).
  */
object DedupIndex {

  /** The index as DataFrames — what [[DedupDocs.incrementalIndexed]]
    * consumes; produced by [[build]] (fresh derivation) or [[read]]
    * (stored index). */
  final case class Frames(fps: DataFrame, bands: DataFrame, grams: DataFrame)

  /** Derive the three index tables from (doc_id, text) docs. Null-text
    * docs index nothing (unknown content must never match anything —
    * the same contract as [[DedupDocs]]'s null handling). */
  def build(docs: DataFrame, rowsPerBand: Int = 4): Frames = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    Frames(
      fps = docs.select(col("doc_id"), md5(col("text")).as("fp"))
        .filter(col("fp").isNotNull),
      bands = DedupDocs.bandBuckets(docs, rowsPerBand),
      grams = DedupDocs.hashedGrams(docs))
  }

  /** Write a fresh index for a kept corpus (overwrites `dir`). */
  def write(docs: DataFrame, dir: String, rowsPerBand: Int = 4): Unit =
    writeFrames(build(docs, rowsPerBand), dir, SaveMode.Overwrite)

  /** Append the index rows of newly ADMITTED docs — the per-batch
    * maintenance op; the existing index files are untouched. */
  def append(admitted: DataFrame, dir: String, rowsPerBand: Int = 4): Unit =
    writeFrames(build(admitted, rowsPerBand), dir, SaveMode.Append)

  private def writeFrames(f: Frames, dir: String, mode: SaveMode): Unit = {
    graft.sources.Sinks.writeSortedBy(f.fps, s"$dir/fps", Seq("fp"), mode = mode)
    graft.sources.Sinks.writeSortedBy(f.bands, s"$dir/bands", Seq("bucket"), mode = mode)
    graft.sources.Sinks.writeSortedBy(f.grams, s"$dir/grams", Seq("doc_id", "gram"), mode = mode)
  }

  /** Open a stored index. */
  def read(spark: SparkSession, dir: String): Frames = Frames(
    fps = spark.read.parquet(s"$dir/fps"),
    bands = spark.read.parquet(s"$dir/bands"),
    grams = spark.read.parquet(s"$dir/grams"))
}

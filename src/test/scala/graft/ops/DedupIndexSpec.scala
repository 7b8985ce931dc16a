package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted admission index: indexed incremental dedup must (1)
  * produce exactly what the direct corpus-rescanning spelling
  * produces, (2) never scan the corpus text again — the whole point of
  * storing the index — and (3) stay correct across append generations
  * (batch N+1 is rejected by docs admitted in batch N). */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val near = "the quick brown fox jumps over the lazy dog again and again tonight"
  private val other = "completely different words about spark engines and parquet files here"
  private val third = "yet another unrelated document discussing weather stations and sensors"

  private def corpusDocs = Seq(
    (1L, base), (2L, other)).toDF("doc_id", "text")

  private def batchDocs = Seq(
    (10L, base),   // exact dup of corpus 1
    (11L, near),   // near dup of corpus 1
    (12L, third),  // fresh → admitted
    (13L, third),  // exact dup of 12 within the batch → batch_dup
    (14L, null.asInstanceOf[String])) // unknown content → isolated, admitted
    .toDF("doc_id", "text")

  private def collectStatuses(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

  test("indexed admission equals the corpus-rescanning incremental exactly") {
    val idx = DedupIndex.build(corpusDocs)
    val viaIndex = collectStatuses(DedupDocs.incrementalIndexed(idx, batchDocs))
    val direct = collectStatuses(DedupDocs.incremental(corpusDocs, batchDocs))
    assert(viaIndex == direct)
    assert(viaIndex == Set(
      (10L, "corpus_exact", -1L),
      (11L, "corpus_near", -1L),
      (12L, "admitted", 12L),
      (13L, "batch_dup", 12L),
      (14L, "admitted", 14L)))
  }

  test("the stored index is joined, the corpus text is NEVER re-scanned") {
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_didx_corpus").toString
    val indexDir = java.nio.file.Files.createTempDirectory("graft_didx_index").toString
    corpusDocs.write.mode("overwrite").parquet(corpusDir)
    DedupIndex.write(spark.read.parquet(corpusDir), indexDir)

    val out = DedupDocs.incrementalIndexed(
      DedupIndex.read(spark, indexDir), batchDocs)
    // the corpus parquet must appear NOWHERE in the admission plan —
    // every corpus-side input comes from the index tables
    val corpusScans = out.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.count(_.relation match {
      case r: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        r.location.rootPaths.exists(_.toString.contains(corpusDir))
      case _ => false
    })
    assert(corpusScans == 0,
      s"corpus docs re-scanned $corpusScans times:\n${out.queryExecution.optimizedPlan}")
    // and the result still matches the direct spelling
    assert(collectStatuses(out) ==
      collectStatuses(DedupDocs.incremental(corpusDocs, batchDocs)))
  }

  test("banding parameter is index state: a non-default write still band-matches probes") {
    // rowsPerBand=2 → 4 bands of 2: written to dir/meta and picked up by
    // read() and append(), so the probe hashes batch bands identically —
    // a mismatch would make the bucket value spaces disjoint and
    // silently admit every near-duplicate
    val indexDir = java.nio.file.Files.createTempDirectory("graft_didx_rpb").toString
    DedupIndex.write(corpusDocs, indexDir, rowsPerBand = 2)
    val idx = DedupIndex.read(spark, indexDir)
    assert(idx.rowsPerBand == 2)
    val out = collectStatuses(DedupDocs.incrementalIndexed(idx,
      Seq((11L, near)).toDF("doc_id", "text")))
    assert(out == Set((11L, "corpus_near", -1L)),
      "near-dup must still be caught under the stored non-default banding")
  }

  test("compaction merges append generations; admission results are unchanged") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft_didx_cp").toString
    DedupIndex.write(corpusDocs, indexDir)
    DedupIndex.append(Seq((12L, third)).toDF("doc_id", "text"), indexDir)
    def admitted = collectStatuses(
      DedupDocs.incrementalIndexed(DedupIndex.read(spark, indexDir),
        Seq((20L, third), (22L, base + " extra")).toDF("doc_id", "text")))
    val before = admitted
    def dataFiles(t: String): Long =
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$indexDir/$t"))
        .filter(p => p.toString.endsWith(".parquet")).count()
    val filesBefore = dataFiles("fps")
    DedupIndex.compact(spark, indexDir)
    assert(dataFiles("fps") < filesBefore,
      "compaction must merge the write+append generations into fewer files")
    assert(DedupIndex.read(spark, indexDir).rowsPerBand == 4)
    assert(admitted == before, "compaction must not change admission results")
  }

  test("append generation: docs admitted in batch N reject their dups in batch N+1") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft_didx_gen").toString
    // corpus does NOT contain `base`, so batch 1 admits it; batch 2's
    // exact copy and near variant must then be rejected by the APPENDED
    // index rows, not by anything from the original corpus
    DedupIndex.write(Seq((2L, other)).toDF("doc_id", "text"), indexDir)

    val batch1 = Seq((10L, third), (12L, base),
      (14L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val admitted1 = batch1.join(
      DedupDocs.incrementalIndexed(DedupIndex.read(spark, indexDir), batch1)
        .filter($"status" === "admitted").select($"doc_id"), "doc_id")
    assert(admitted1.count() == 3) // all distinct → all admitted
    DedupIndex.append(admitted1, indexDir)

    val batch2 = Seq(
      (20L, base), // exact dup of appended 12
      (21L, near), // near dup of appended 12 (Jaccard 0.83, shared band)
      (22L, "entirely novel content that matches nothing else in any corpus batch"))
      .toDF("doc_id", "text")
    val out = collectStatuses(
      DedupDocs.incrementalIndexed(DedupIndex.read(spark, indexDir), batch2))
    assert(out == Set(
      (20L, "corpus_exact", -1L),
      (21L, "corpus_near", -1L),
      (22L, "admitted", 22L)))
    // null-text docs index nothing: doc 14 contributed no fp/band/gram rows
    assert(spark.read.parquet(s"$indexDir/fps")
      .filter($"doc_id" === 14L).count() == 0)
  }
}

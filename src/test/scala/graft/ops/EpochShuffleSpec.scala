package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the persisted epoch-shuffle index contract: the permutation is
  * a seeded bijection (positions are exactly 1..N, reproducible across
  * derivations, different per seed), a resume slice of the persisted
  * index equals the same slice recomputed in-flight row-for-row, and
  * the resume read opens only the files whose position span intersects
  * the slice — the O(slice) restart the 100 TB loader depends on. */
class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 1000L).toDF("doc_id")

  test("permutation is a seeded bijection: positions 1..N, reproducible, seed-sensitive") {
    val p7 = EpochShuffle.permutation(docs, "doc_id", seed = 7)
      .select($"pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(p7.map(_._1).toSeq == (1L to 1000L), "positions must be exactly 1..N")
    assert(p7.map(_._2).distinct.length == 1000, "every doc appears once")
    // reproducible: the position is a pure function of (seed, doc_id)
    val again = EpochShuffle.permutation(docs, "doc_id", seed = 7)
      .select($"pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(p7.toSeq == again.toSeq)
    // a different seed draws a different order (identical is a 1/N!
    // event — an astronomically loud failure if the seed is ignored)
    val p8 = EpochShuffle.permutation(docs, "doc_id", seed = 8)
      .select($"pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(p7.map(_._2).toSeq != p8.map(_._2).toSeq, "seed must change the order")
  }

  test("resume slices of the persisted index equal the in-flight recompute; files prune") {
    val idx = java.nio.file.Files.createTempDirectory("epochidx").toString
    EpochShuffle.write(docs, "doc_id", seed = 7, outDir = idx, numFiles = 16)
    for ((from, until) <- Seq((0L, 50L), (100L, 250L), (900L, 1000L))) {
      val persisted = EpochShuffle.resume(spark, idx, from, until)
        .select($"pos", $"doc_id", $"hv")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val recomputed = EpochShuffle.permutation(docs, "doc_id", seed = 7)
        .filter($"pos" > from && $"pos" <= until)
        .select($"pos", $"doc_id", $"hv")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(persisted == recomputed, s"slice ($from,$until]")
      assert(persisted.length == (until - from).toInt)
    }
    // the prune: a 150-position slice of a 16-file index must open a
    // strict subset of the files (disjoint pos spans by construction)
    val cand = EpochShuffle.candidateFiles(spark, idx, 100L, 250L)
    val total = spark.read.parquet(s"$idx/data").inputFiles.length
    assert(total == 16, s"expected 16 index files, got $total")
    assert(cand.length <= 4, s"slice must prune to O(slice) files, got ${cand.length}")
  }

  test("an id wider than the order-key pad fails loudly instead of silently colliding") {
    // Spark's lpad TRUNCATES over-width strings — two ids sharing a
    // 19-char prefix would collide in the order key and break the
    // seeded bijection nondeterministically; the guard turns that into
    // an immediate error. String ids up to the pad width still work.
    val ok = Seq("a", "b" * 19, "c").toDF("doc_id")
    val pos = EpochShuffle.permutation(ok, "doc_id", seed = 3)
      .select($"pos").as[Long].collect().sorted.toSeq
    assert(pos == Seq(1L, 2L, 3L))
    val bad = Seq("a", "x" * 20).toDF("doc_id")
    val ex = intercept[Exception] {
      EpochShuffle.permutation(bad, "doc_id", seed = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("exceeds the 19-char order-key pad")),
      s"unexpected failure: $ex")
  }
}

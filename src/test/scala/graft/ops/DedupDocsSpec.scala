package graft.ops

import graft.SparkSpec

class DedupDocsSpec extends SparkSpec {
  import spark.implicits._

  test("exact and near duplicates cluster into one group; min doc_id survives") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    val docs = Seq(
      (1L, base),
      (5L, base),                                   // exact dup of 1
      (3L, near),                                   // near dup (shares most trigrams)
      (7L, "completely different words about spark engines and parquet files here"))
      .toDF("doc_id", "text")
    val out = DedupDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true))   // group head survives
    assert(out(5L)._1 == 1L && !out(5L)._2)
    assert(out(3L)._1 == 1L && !out(3L)._2) // near dup joins the same group
    assert(out(7L) == (7L, true))   // singleton untouched
  }

}

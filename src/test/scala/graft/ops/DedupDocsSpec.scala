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

  test("candidate verification: a band collision below the Jaccard floor never merges") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    val docs = Seq((1L, base), (3L, near)).toDF("doc_id", "text")
    // true trigram Jaccard of the pair is 10/12 ≈ 0.83: the default 0.5
    // floor keeps the merge, a 0.9 floor rejects the candidate edge —
    // proving the verification actually gates on EXACT similarity, not
    // on the banding that proposed the pair
    val merged = DedupDocs(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged(3L) == 1L)
    val strict = DedupDocs(docs, minJaccard = Some(0.9))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(strict(1L) == 1L && strict(3L) == 3L,
      "verification floor 0.9 must reject the 0.83-Jaccard candidate")
    // exact duplicates merge regardless of the floor: content-hash
    // edges are certain and bypass verification
    val exact = DedupDocs(Seq((1L, base), (5L, base)).toDF("doc_id", "text"),
      minJaccard = Some(0.99)).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact(5L) == 1L)
  }

  test("boilerplate-heavy corpus: 4000-copy template dedups via star edges, not a 8M-pair clique") {
    // verified mode must route the mega-bucket through the k−1-edge star
    // fallback: a clique over 4000 copies would emit ~8M candidate pairs
    // into the verification join; the star emits 3999 edges. The spec
    // passing in seconds (not minutes) IS the regression guard, plus the
    // exact group accounting below.
    val template = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = ((0L until 4000L).map(i => (i, template)) ++
      Seq((9000L, "completely different words about spark engines and parquet files here"),
          (9001L, "another unique document mentioning window functions and broadcast joins")))
      .toDF("doc_id", "text")
    val out = DedupDocs(docs).cache()
    assert(out.filter($"component" === 0L).count() == 4000L) // one group, head 0
    assert(out.filter($"is_survivor").count() == 3L)         // head + 2 uniques
    out.unpersist()
  }

  test("null-text docs never merge: unknown content is not identical content") {
    val docs = Seq((1L, null: String), (2L, null: String), (3L, "real words here today"))
      .toDF("doc_id", "text")
    val out = DedupDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true) && out(2L) == (2L, true) && out(3L) == (3L, true),
      s"every doc must survive as its own component, got $out")
  }

  test("incremental mega-buckets: huge shared band bucket rejects unverified") {
    val template = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    // maxVerifyBucket=0 forces every shared bucket into the mega
    // regime (per-side sizes here are 1): the 0.9 floor that would
    // admit the 0.83-Jaccard near-dup in verified mode is bypassed —
    // the batch doc is rejected unverified
    val corpus = Seq((1L, template)).toDF("doc_id", "text")
    val batch = Seq((10L, near)).toDF("doc_id", "text")
    val strictVerified = DedupDocs.incremental(corpus, batch, minJaccard = Some(0.9))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strictVerified(10L) == "admitted")
    val mega = DedupDocs.incremental(corpus, batch, minJaccard = Some(0.9), maxVerifyBucket = 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mega(10L) == "corpus_near")
  }

  test("incremental: batch docs classified against the corpus, then among themselves") {
    val template = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    val corpus = Seq(
      (1L, template),
      (2L, "completely different words about spark engines and parquet files here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, template),                                           // exact corpus dup
      (11L, near),                                               // near corpus dup (jac 0.83)
      (12L, "fresh content mentioning window functions and broadcast joins"),
      (13L, "fresh content mentioning window functions and broadcast joins"), // batch dup of 12
      (14L, "entirely novel text on bloom filters and shuffle partitions"))
      .toDF("doc_id", "text")
    val out = DedupDocs.incremental(corpus, batch)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      10L -> "corpus_exact",
      11L -> "corpus_near",
      12L -> "admitted",
      13L -> "batch_dup",
      14L -> "admitted"))
    // strict floor: the 0.83-Jaccard near pair is no longer a corpus
    // rejection; it must fall through to batch-internal processing
    val strict = DedupDocs.incremental(corpus, batch, minJaccard = Some(0.9))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(strict(11L) == "admitted")
    assert(strict(10L) == "corpus_exact") // content hash unaffected by the floor
  }

  test("mega-buckets fall back to unverified star edges (clique impossible at that size)") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    // maxVerifyBucket=1 forces every 2-doc bucket into the mega regime:
    // the 0.9 floor that rejects this 0.83-Jaccard pair in verified mode
    // is bypassed, pinning that the fallback really is unverified
    val out = DedupDocs(Seq((1L, base), (3L, near)).toDF("doc_id", "text"),
      minJaccard = Some(0.9), maxVerifyBucket = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(3L) == 1L)
  }

}

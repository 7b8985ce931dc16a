package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hot-gram (stop-gram) guard: on a boilerplate-heavy corpus one
  * shared trigram alone produces C(n,2) candidate pairs — the
  * one-reducer skew bomb the df cap exists to defuse. */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  private def candidatePairs(g: DataFrame): Long =
    g.as("a")
      .join(g.as("b"), col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .count()

  test("df cap collapses the quadratic candidate blowup from one boilerplate gram") {
    val n = 200
    // every doc opens with the same boilerplate trigram; the tail is unique
    val docs = (1 to n)
      .map(i => (i.toLong, s"shared boiler plate u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "text")
    val grams = Shingles.wordTrigrams(docs)
      .select($"doc_id", expr(Shingles.h60("gram")).as("gram"))
      .distinct()
    val uncapped = candidatePairs(grams)
    val capped = candidatePairs(DedupQueries.cappedGrams(grams, DedupQueries.JaccardDfCap))
    assert(uncapped >= n.toLong * (n - 1) / 2, s"expected quadratic blowup, got $uncapped")
    assert(capped == 0, s"cap should drop the corpus-wide gram, got $capped pairs")
  }

  test("df cap keeps pair-specific grams: true near-dups still collide") {
    // two docs sharing five grams among 6 docs total — all df ≤ cap
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta theta"),
      (3L, "one two three four"),
      (4L, "five six seven eight"),
      (5L, "nine ten eleven twelve"),
      (6L, "thirteen fourteen fifteen sixteen")).toDF("doc_id", "text")
    val grams = Shingles.wordTrigrams(docs)
      .select($"doc_id", expr(Shingles.h60("gram")).as("gram"))
      .distinct()
    val capped = DedupQueries.cappedGrams(grams, DedupQueries.JaccardDfCap)
    assert(candidatePairs(capped) > 0)
    assert(capped.count() == grams.count()) // nothing here is corpus-wide
  }
}

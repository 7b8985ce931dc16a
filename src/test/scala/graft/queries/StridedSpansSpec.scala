package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract gates for the winnowed substring-span twin
  * (`dedup_substring_spans_strided`), proving the two claims its entry
  * comment makes:
  *
  *  1. COMPLETENESS (the detection guarantee): every duplicated run of
  *     ≥ L+s−1 = 39 chars shares ≥ 1 anchor — planted at ALL eight
  *     alignment residues mod s, because naive positional striding
  *     passes the aligned cases and fails exactly the misaligned ones;
  *     content-defined winnowing must pass all eight.
  *  2. SOUNDNESS: on the real corpus, every strided hit is a position
  *     the exact every-position twin also marks duplicated (anchors
  *     are a subset of gram starts; a duplicated anchor gram is a
  *     duplicated gram).
  *
  * Plus the winnowing density invariant the islands gap (L+s−1) rests
  * on: consecutive anchors within a doc are ≤ s apart.
  */
class StridedSpansSpec extends SparkSpec {
  import spark.implicits._

  private val L = DedupQueries.StrideL
  private val S = DedupQueries.StrideS
  private val sf = "/root/testdata/sf0.001"

  private def randText(seed: Int, len: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  test("guarantee: a 39-char duplicated run is caught at every alignment mod s") {
    // payload = exactly L+s−1 chars, shared between doc 0 and docs 1..8;
    // doc r plants it at offset 50+r, covering all residues mod 8.
    // Fillers are independent seeded-random letters — the chance any two
    // share a 32-gram is ~26^-32, so the payload is the ONLY duplicate.
    val payload = randText(999, L + S - 1)
    val docs = (0 to S).map { r =>
      val off = 50 + r
      val text = randText(1000 + r, off) + payload + randText(2000 + r, 120)
      (r.toLong, text, off + 1) // planted run starts at 1-based off+1
    }
    val df = docs.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val hits = DedupQueries.stridedHits(df)
      .select($"doc_id", $"p").as[(Long, Int)].collect().toSet
    docs.foreach { case (id, _, start) =>
      val inRun = hits.exists { case (d, p) =>
        d == id && p >= start && p + L - 1 <= start + (L + S - 1) - 1
      }
      assert(inRun, s"doc $id (offset residue ${(start - 1) % S}): no hit " +
        s"anchor inside the planted [${start}, ${start + L + S - 2}] run")
    }
  }

  test("soundness on the real corpus: strided hits ⊆ exact dup positions") {
    val docs = graft.core.Tables.documents(spark, sf)
    val strided = DedupQueries.stridedHits(docs).select($"doc_id", $"p")
    val exact = DedupQueries.substringHits(docs, hashedGrams = false)
      .select($"doc_id", $"p")
    assert(strided.except(exact).count() === 0)
    // and the twin actually finds duplication on this corpus
    assert(strided.count() > 0)
  }

  test("winnowing density: consecutive anchors per doc are ≤ s apart") {
    val docs = graft.core.Tables.documents(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
    val gaps = DedupQueries.stridedAnchors(docs)
      .withColumn("gap", col("p") - lag(col("p"), 1).over(w))
      .agg(max(col("gap")).as("maxGap"), min(col("p")).as("minP"))
      .head()
    assert(gaps.getAs[Int]("maxGap") <= S)
    assert(gaps.getAs[Int]("minP") <= S) // first window [1,s] always anchors
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the curation-funnel composition (`pipe_curation`) and the
  * canonicalization policy (`dedup_canonical`) on a corpus constructed
  * so every stage has a known victim: a quality reject, an exact
  * duplicate, and a near-dup cluster whose LONGEST member is not its
  * smallest id — the case where keep-longest and keep-first disagree,
  * so a policy regression flips the picked representative. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ≥50 distinct alphabetic words incl. 2 stopwords → passes every
  // Gopher rule; `offset` shifts the vocabulary so unrelated docs
  // share no trigram
  private def passingWords(offset: Int, n: Int = 60): Seq[String] =
    Seq("the", "of") ++ (0 until n - 2).map { i =>
      val k = offset + i
      s"${('a' + k / 26 % 26).toChar}${('a' + k % 26).toChar}${('a' + k / 676 % 26).toChar}word"
    }

  private def doc(id: Long, words: Seq[String], source: String) = {
    val text = words.mkString(" ")
    (id, text, "en", source, text.length.toLong)
  }

  // A(1): passing; B(2): exact copy of A; C(3): A's words + 5 extra →
  // near-dup of A (Jaccard ≈ 0.92) and LONGER, so canonical despite the
  // larger id; D(4): 10 words → Gopher reject; E(5): disjoint vocab
  // singleton in its own source
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("curation").toString
    val a = passingWords(0)
    Seq(
      doc(1L, a, "web"),
      doc(2L, a, "web"),
      doc(3L, a ++ Seq("extraone", "extratwo", "extrathree", "extrafour", "extrafive"), "web"),
      doc(4L, passingWords(500, 12), "web"),
      doc(5L, passingWords(1000), "books"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_canonical keeps the longest member, not the smallest id") {
    val rows = Registry.queries("dedup_canonical")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one cluster {1,2,3}: component = min id 1, canonical = 3 (longest),
    // chars_removed = |A| + |B|
    val aLen = passingWords(0).mkString(" ").length.toLong
    assert(rows.toSeq == Seq((1L, 3L, 3L, 2 * aLen)),
      s"cluster/size/canonical/chars_removed mismatch: ${rows.toSeq}")
  }

  test("pipe_curation funnel: each stage drops exactly its victim") {
    val rows = Registry.queries("pipe_curation")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val cLen = (passingWords(0) ++
      Seq("extraone", "extratwo", "extrathree", "extrafour", "extrafive"))
      .mkString(" ").length.toLong
    val eLen = passingWords(1000).mkString(" ").length.toLong
    assert(rows.toSeq == Seq(
      // books: E sails through untouched
      ("books", 1L, 1L, 1L, 1L, eLen),
      // web: D fails quality, B is an exact dup, A loses to C on length
      ("web", 4L, 3L, 2L, 1L, cLen)),
      s"funnel mismatch: ${rows.toSeq}")
  }
}

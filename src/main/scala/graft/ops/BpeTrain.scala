package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the vocabulary-learning step of
  * an LLM data pipeline, shaped the way production tokenizer trainers
  * actually scale: the CORPUS is only ever touched by one word-count
  * aggregation (map-side combined, one shuffle whose width is the
  * word-TYPE table, not the corpus), and the merge loop runs on that
  * compact (word, count) table driver-side — identical in spirit to
  * training on word frequencies à la the original BPE formulation
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units") and to every practical tokenizer trainer. A
  * 100 TB corpus has a word-type table in the millions regardless of
  * its size; `maxTypes` caps the driver table by frequency rank so the
  * collect is bounded even on adversarial vocabularies.
  *
  * Determinism: pair selection breaks frequency ties lexicographically
  * and the type cap breaks count ties by word — the same corpus always
  * learns the same merge list, on any cluster layout.
  *
  * Applying the learned merges corpus-wide is the map-side
  * [[graft.functions.BpeEncode]] expression (codegen'd, zero shuffle).
  */
object BpeTrain {

  /** Learn `nMerges` BPE merges from the corpus.
    *
    * @param maxTypes cap on the word-type table collected to the driver
    *                 (top by count, deterministic tiebreak)
    * @return merges in learned order — rank i = i-th pair; feed to
    *         [[graft.functions.BpeEncode]]
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxTypes: Int = 100000): Seq[(String, String)] = {
    val typeRows = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(maxTypes)
      .collect()

    // driver state: each word type as its current symbol sequence
    val types: Array[(Array[String], Long)] = typeRows.map { r =>
      (r.getString(0).toCharArray.map(_.toString), r.getLong(1))
    }

    val merges = Seq.newBuilder[(String, String)]
    var syms = types
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      // adjacent-position pair counts, weighted by type frequency
      val counts = new java.util.HashMap[(String, String), Long]()
      syms.foreach { case (ss, n) =>
        var i = 0
        while (i + 1 < ss.length) {
          counts.merge((ss(i), ss(i + 1)), n, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestN = 0L
        counts.forEach { (p, n) =>
          val better = n > bestN || (n == bestN && (best == null ||
            p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))
          if (better) { best = p; bestN = n }
        }
        if (bestN < 2) done = true // merging a singleton pair gains nothing
        else {
          merges += best
          syms = syms.map { case (ss, n) => (applyMerge(ss, best), n) }
          round += 1
        }
      }
    }
    merges.result()
  }

  /** One left-to-right non-overlapping merge pass (the BPE application
    * rule; shared semantics with BpeEncodeImpl's per-row kernel). */
  private[graft] def applyMerge(ss: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < ss.length) {
      if (i + 1 < ss.length && ss(i) == pair._1 && ss(i + 1) == pair._2) {
        out += ss(i) + ss(i + 1); i += 2
      } else { out += ss(i); i += 1 }
    }
    out.result()
  }
}

package graft.queries

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** First-principles pins for the KN LM and annotator-kappa entries:
  * the Kneser–Ney score replays exactly from hand-built count maps
  * (including the Σ_w2 P(w2|w1) = 1 normalization the smoothing
  * guarantees), and kappa replays from the 4-cell confusion matrix. */
class KnKappaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("text_bigram_kn_score: driver replay; per-context probabilities normalize") {
    import spark.implicits._
    val got = Registry.queries("text_bigram_kn_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // hand-built counts from the same corpus
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val bigrams = docs.flatMap { case (id, t) =>
      val ws = t.split(" ", -1); ws.indices.dropRight(1).map(i => (id, ws(i), ws(i + 1)))
    }
    val c12 = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nfw = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nbw = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ntypes = c12.size.toDouble
    val D = 0.75
    def p(w1: String, w2: String): Double =
      math.max(c12((w1, w2)) - D, 0.0) / c1(w1) +
        D * nfw(w1) / c1(w1) * (nbw(w2) / ntypes)
    // replay a handful of docs exactly
    for ((id, t) <- docs.take(5)) {
      val ws = t.split(" ", -1)
      val lps = ws.indices.dropRight(1).map(i => math.log(p(ws(i), ws(i + 1))))
      val (n, avg) = got(id)
      assert(n == lps.length.toLong)
      val want = math.rint(lps.sum / lps.length * 10000) / 10000
      assert(math.abs(avg - want) < 2e-4, s"doc $id: $avg vs $want")
    }
    // KN normalization: for a sampled context, the observed-pair mass
    // plus the backoff mass over the REST of the vocab sums to 1
    val vocab = (c12.keys.map(_._2) ++ nbw.keys).toSet.toSeq
    val w1 = c1.maxBy(_._2)._1 // the heaviest context
    val seen = c12.keys.filter(_._1 == w1).map(_._2).toSet
    val total =
      seen.toSeq.map(w2 => p(w1, w2)).sum +
        vocab.filterNot(seen).map(w2 =>
          D * nfw(w1) / c1(w1) * (nbw.getOrElse(w2, 0L) / ntypes)).sum
    assert(math.abs(total - 1.0) < 1e-9, s"KN mass for '$w1' = $total")
  }

  test("text_annotator_kappa: cells partition, exact replay, kappa <= 1") {
    import spark.implicits._
    val r = Registry.queries("text_annotator_kappa")(spark, sf).collect()(0)
    val (n, n11, n10, n01, n00, kappa) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(7))
    assert(n11 + n10 + n01 + n00 == n)
    assert(kappa <= 1.0 + 1e-9)
    val cells = Tables.documents(spark, sf).select($"text").as[String].collect()
      .map { t =>
        val toks = t.split(" ", -1).length
        val ra = toks >= 30
        val rb = t.length.toDouble / toks <= 6.0
        (ra, rb)
      }
    assert(n11 == cells.count(c => c._1 && c._2).toLong)
    assert(n00 == cells.count(c => !c._1 && !c._2).toLong)
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) +
      (n00 + n01).toDouble * (n00 + n10)) / (n.toDouble * n)
    val want = math.floor((po - pe) / (1.0 - pe) * 10000 + 0.5) / 10000
    assert(math.abs(kappa - want) < 1e-9, s"kappa $kappa vs $want")
  }
}

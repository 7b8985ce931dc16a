package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral pins for the trained text models that the hash gate alone
  * cannot express: relative accuracy floors and probability sanity. */
class TextMlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("trained language-ID beats (or matches) the bigram heuristic's accuracy") {
    import spark.implicits._
    // the honest bar: this corpus's lang labels share one vocabulary, so
    // no classifier can do much better than the learned class prior —
    // but the trained softmax must never do WORSE than the zero-training
    // bootstrap heuristic it replaces
    val trained = Registry.queries("text_lang_id_trained")(spark, sf)
      .agg(sum($"n_correct").cast("double") / sum($"n")).head.getDouble(0)
    val hits = size(expr("regexp_extract_all(text, 'th|he|er|in', 0)"))
    val heuristic = graft.core.Tables.documents(spark, sf)
      .withColumn("pred",
        when(hits / length($"text").cast("double") >= 0.02, "en").otherwise("other"))
      .agg(avg(when($"pred" === $"lang", 1.0).otherwise(0.0))).head.getDouble(0)
    assert(trained >= heuristic,
      s"trained accuracy $trained fell below the heuristic's $heuristic")
  }

  test("trained language-ID output is well-formed: counts consistent, probs in (0,1)") {
    import spark.implicits._
    val rows = Registry.queries("text_lang_id_trained")(spark, sf).collect()
    assert(rows.length == 5, "one row per language class")
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == graft.core.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n"))
      val p = r.getAs[Double]("avg_p_true")
      assert(p > 0.0 && p < 1.0, s"true-class probability out of range: $p")
    }
    // prior learning is the minimum the two epochs must deliver: the
    // majority class ('en') must score above the uniform 1/5
    val en = rows.find(_.getAs[String]("lang") == "en").get
    assert(en.getAs[Double]("avg_p_true") > 0.2,
      s"majority class prob ${en.getAs[Double]("avg_p_true")} not above uniform")
  }

  test("text_keyword_rake: exact driver replay of degree/frequency scoring; no stopwords in phrases") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val stop = Set("the", "a", "of", "and", "to")
    val out = Registry.queries("text_keyword_rake")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach(r => assert(r.getString(0).split(' ').forall(w => !stop(w)),
      s"stopword leaked into phrase '${r.getString(0)}'"))
    // replay: phrases = maximal non-stopword runs; deg = Σ plen over
    // occurrences; score(w) = deg/freq quantized to 1e-6; phrase score
    // = Σ word scores; top-20 by (score, phrase)
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val phrases = docs.flatMap { case (_, text) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      text.split(' ').foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur = w :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs
    }
    val deg = scala.collection.mutable.Map.empty[String, Long]
    val freq = scala.collection.mutable.Map.empty[String, Long]
    phrases.foreach { p =>
      p.foreach { w =>
        deg(w) = deg.getOrElse(w, 0L) + p.length
        freq(w) = freq.getOrElse(w, 0L) + 1
      }
    }
    val wq = deg.keys.map(w =>
      w -> math.floor(deg(w).toDouble / freq(w) * 1e6 + 0.5).toLong).toMap
    val scored = phrases.groupBy(_.mkString(" ")).map { case (ph, occ) =>
      (ph, occ.length.toLong, occ.head.map(wq).sum)
    }.toSeq
    val top = scored.sortBy { case (ph, _, s) => (-s, ph) }.take(20)
    out.zip(top).foreach { case (r, (ph, n, s)) =>
      assert(r.getString(0) == ph && r.getLong(1) == n,
        s"(${r.getString(0)},${r.getLong(1)}) vs replay ($ph,$n)")
      assert(math.abs(r.getDouble(2) - s / 1e6) < 1e-9)
    }
  }

  test("text_textrank_keywords: driver replay of 3 weighted PageRank iterations") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val stop = Set("the", "a", "of", "and", "to")
    val out = Registry.queries("text_textrank_keywords")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach(r => assert(r.getDouble(2) >= 0.15 - 1e-9, s"rank below damping floor: $r"))
    // replay: weighted adjacent co-occurrence graph + damped iterations
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val wt = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (_, text) =>
      text.split(' ').sliding(2).foreach {
        case Array(x, y) if x != y && !stop(x) && !stop(y) =>
          val k = if (x < y) (x, y) else (y, x)
          wt(k) = wt.getOrElse(k, 0L) + 1
        case _ => ()
      }
    }
    val edges = wt.toSeq.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val wdeg = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = wdeg.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[String, BigDecimal]
      edges.foreach { case (src, dst, w) =>
        // DECIMAL(28,14) truncation of each contribution, like the plan
        val c = BigDecimal(r(src) * w / wdeg(src))
          .setScale(14, BigDecimal.RoundingMode.HALF_UP)
        contrib(dst) = contrib.getOrElse(dst, BigDecimal(0)) + c
      }
      r = wdeg.keys.map(n =>
        n -> (0.15 + 0.85 * contrib.getOrElse(n, BigDecimal(0)).toDouble)).toMap
    }
    val want = r.toSeq
      .map { case (w, v) => (w, math.floor(v * 1e8 + 0.5).toLong) }
      .sortBy { case (w, q) => (-q, w) }.take(20)
    out.zip(want).foreach { case (row, (w, q)) =>
      assert(row.getString(0) == w, s"${row.getString(0)} vs replay $w")
      assert(math.abs(row.getDouble(2) - math.floor(q / 1e8 * 1e4 + 0.5) / 1e4) < 2e-4)
      assert(row.getLong(1) == wdeg(w))
    }
  }
}

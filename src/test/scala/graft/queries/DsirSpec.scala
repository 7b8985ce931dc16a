package graft.queries

import graft.SparkSpec

/** Pins `pipe_dsir_resample` two ways: an exact driver replay of the
  * hashed-unigram importance weights on the real sf0.001 corpus (the
  * integer wq for every returned doc, recomputed from first principles
  * with JVM md5 — catches any drift in bucketing, smoothing, or the
  * 1e-8 quantization), and a constructed-corpus ordering pin: a doc
  * WRITTEN in the target vocabulary must outscore every doc written in
  * a disjoint vocabulary regardless of its own lang label — the
  * behavior DSIR exists to produce.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def bucket(word: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(word.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1024
  }

  test("driver replay: every returned wq is the exact integer Σ n·lrq") {
    val sf = "/root/testdata/sf0.001"
    val out = Registry.queries("pipe_dsir_resample")(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
    val toks = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(w => (id, lang, bucket(w)))
    }
    val cr = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ct = toks.filter(_._2 == "en").groupBy(_._3)
      .view.mapValues(_.length.toLong).toMap
    val nr = toks.length.toDouble
    val nt = toks.count(_._2 == "en").toDouble
    val lrq = cr.map { case (b, c) =>
      b -> math.floor((math.log((ct.getOrElse(b, 0L) + 1.0) / (nt + 1024.0))
        - math.log((c + 1.0) / (nr + 1024.0))) * 1e8 + 0.5).toLong
    }
    val wq = toks.groupBy(_._1).view
      .mapValues(_.groupBy(_._3).map { case (b, g) => g.length * lrq(b) }.sum)
      .toMap
    val want = wq.toSeq.sortBy { case (id, w) => (-w, id) }.take(50)
    assert(out.length == want.length)
    out.zip(want).foreach { case (r, (id, w)) =>
      assert(r.getLong(0) == id && r.getLong(2) == w,
        s"doc ${r.getLong(0)}/${r.getLong(2)} vs replay $id/$w")
    }
  }

  test("ordering pin: target-vocabulary docs outrank disjoint-vocabulary docs") {
    val d = java.nio.file.Files.createTempDirectory("dsir").toString
    val enWords = (0 until 40).map(i => s"envocab$i")
    val xxWords = (0 until 40).map(i => s"xxvocab$i")
    def text(ws: Seq[String]) = (ws ++ ws).mkString(" ")
    val rows = Seq(
      (1L, text(enWords), "en", "web", 0L),
      (2L, text(enWords.drop(5)), "en", "web", 0L),
      (3L, text(enWords.take(35)), "en", "web", 0L),
      // the probe: labeled xx, written in the target vocabulary
      (10L, text(enWords.take(30)), "xx", "web", 0L),
      (11L, text(xxWords), "xx", "web", 0L),
      (12L, text(xxWords.drop(5)), "xx", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Registry.queries("pipe_dsir_resample")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(10L) > out(11L) && out(10L) > out(12L),
      s"en-vocab probe did not outrank xx-vocab docs: $out")
    Seq(1L, 2L, 3L).foreach(en => Seq(11L, 12L).foreach(xx =>
      assert(out(en) > out(xx), s"en doc $en ≤ xx doc $xx: $out")))
  }
}

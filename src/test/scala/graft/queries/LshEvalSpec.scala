package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins dedup_lsh_eval: output well-formedness, the false-positive row's
  * conservation law against an independently recomputed candidate count
  * (fp = |cands| − Σ n_hit), and the one recall value banding
  * guarantees deterministically — an EXACT duplicate pair (J = 1)
  * produces identical signatures, so both bands collide and recall at
  * jb = 10 must be 1.0. */
class LshEvalSpec extends SparkSpec {
  import spark.implicits._

  private def h60mod5(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 5
  }

  test("well-formed rows; fp row conserves against recomputed candidates") {
    val sf = "/root/testdata/sf0.001"
    val out = Registry.queries("dedup_lsh_eval")(spark, sf).collect()
    out.foreach { r =>
      val (jb, np, nh) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(jb == -1 || (jb >= 3 && jb <= 10), s"bucket $jb")
      assert(nh <= np, s"jb=$jb: $nh hits > $np pairs")
      if (jb >= 3)
        assert(r.getDouble(3) == math.floor(nh.toDouble / np * 10000 + 0.5) / 10000)
    }
    // recompute the candidate set on the same 40% sample
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf)
      .filter(pmod(expr(Shingles.h60("CAST(doc_id AS STRING)")), lit(5)) < 2)
    val sig = docs.select($"doc_id", expr("minhash_sig(text)").as("sig"))
      .filter($"sig".isNotNull)
    val buckets = sig.select($"doc_id",
      explode(array(
        md5(concat_ws(",", (1 to 4).map(i => element_at($"sig", i)): _*)),
        md5(concat_ws(",", (5 to 8).map(i => element_at($"sig", i)): _*)))).as("bucket"))
    val nCands = buckets.as("a")
      .join(buckets.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val fp = out.find(_.getInt(0) == -1).map(_.getLong(1)).getOrElse(0L)
    val hitSum = out.filter(_.getInt(0) >= 3).map(_.getLong(2)).sum
    assert(fp == nCands - hitSum, s"fp $fp vs $nCands cands − $hitSum hits")
  }

  test("an exact duplicate inside the sample is always a candidate: recall(jb=10) = 1") {
    val d = java.nio.file.Files.createTempDirectory("lsheval").toString
    // two doc ids that BOTH pass the 40% md5 sample gate
    val sampled = (1L to 200L).filter(i => h60mod5(i.toString) < 2).take(2)
    val text = (0 until 40).map(i => s"tok$i").mkString(" ")
    val other = (100 until 140).map(i => s"tok$i").mkString(" ")
    Seq(
      (sampled(0), text, "en", "web", text.length.toLong),
      (sampled(1), text, "en", "web", text.length.toLong),
      (999L, other, "en", "web", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Registry.queries("dedup_lsh_eval")(spark, d).collect()
    val ten = out.find(_.getInt(0) == 10)
    assert(ten.isDefined, s"no jb=10 row: ${out.toSeq}")
    assert(ten.get.getLong(1) == 1L && ten.get.getLong(2) == 1L
      && ten.get.getDouble(3) == 1.0, s"${ten.get}")
  }
}

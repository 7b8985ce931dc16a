package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a b c"),
    (3L, "one two"),            // < 3 words → null signature
    (4L, ""),                   // empty → single empty token → null
    (5L, "x y z  w"))           // double space → empty token kept, like split(text,' ')
    .toDF("doc_id", "text")

  test("minhash_sig equals the explode+groupBy spelling bit-for-bit") {
    GraftFunctions.register(spark)
    val seeds = MinHashSigImpl.Seeds
    // reference spelling built from the SAME production shingle helper —
    // if Shingles.wordTrigrams tokenization changes, this proof must
    // fail rather than keep passing against a stale inline copy
    val viaAgg = graft.queries.Shingles.wordTrigrams(docs)
      .withColumn("g", expr(graft.queries.Shingles.h60("gram")))
      .groupBy($"doc_id")
      .agg(array(seeds.zipWithIndex.map { case (k, i) =>
        min(expr(s"g ^ ${k}L")).as(s"h$i")
      }: _*).as("sig"))
    val viaExpr = docs.select($"doc_id", expr("minhash_sig(text)").as("sig"))
      .filter($"sig".isNotNull)
    assert(viaExpr.count() == viaAgg.count())
    assert(viaExpr.join(viaAgg.withColumnRenamed("sig", "agg_sig"), "doc_id")
      .filter($"sig" =!= $"agg_sig").count() == 0)
  }

  test("null for docs with fewer than 3 words, in both eval paths") {
    GraftFunctions.register(spark)
    val out = docs.select($"doc_id", expr("minhash_sig(text)").as("sig"))
      .orderBy("doc_id").collect()
    assert(!out(0).isNullAt(1) && !out(1).isNullAt(1))
    assert(out(2).isNullAt(1) && out(3).isNullAt(1))
    assert(!out(4).isNullAt(1)) // 5 tokens incl. empty → has trigrams
    // interpreted path: factoryMode=NO_CODEGEN is what actually forces
    // nullSafeEval (wholeStage=false alone still uses codegen'd
    // projections) — this is the path production falls back to when
    // generated code fails to compile. Assert VALUE equality against
    // the codegen rows, not just null-ness: a divergence inside the
    // hash computation itself must fail here.
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = docs.select($"doc_id", expr("minhash_sig(text)").as("sig"))
        .orderBy("doc_id").collect()
      assert(interp.length == out.length)
      out.zip(interp).foreach { case (c, i) =>
        assert(c.getLong(0) == i.getLong(0))
        assert(c.isNullAt(1) == i.isNullAt(1), s"null-ness diverges for doc ${c.getLong(0)}")
        if (!c.isNullAt(1))
          assert(c.getSeq[Long](1) == i.getSeq[Long](1),
            s"interpreted signature diverges from codegen for doc ${c.getLong(0)}")
      }
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }
}

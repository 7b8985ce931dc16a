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
    val viaAgg = docs
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")),
        split($"text", " ").as("ws"))
      .filter($"pos" <= size($"ws") - 3)
      .select($"doc_id", concat_ws(" ", $"w",
        element_at($"ws", $"pos" + 2), element_at($"ws", $"pos" + 3)).as("gram"))
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
    val conf = spark.conf
    val prev = conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = docs.select(expr("minhash_sig(text)").as("sig")).collect()
      assert(interp.count(!_.isNullAt(0)) == 3)
    } finally conf.set("spark.sql.codegen.wholeStage", prev)
  }
}

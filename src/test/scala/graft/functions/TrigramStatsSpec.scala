package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrigramStatsSpec extends SparkSpec {
  import spark.implicits._

  test("trigram_stats equals the explode+countDistinct spelling") {
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "a b a b a b a b"),        // heavy repetition: grams cycle
      (2L, "one two three four five"),
      (3L, "x y"),                    // < 3 words → null
      (4L, "p p p p"))                // single repeated gram
      .toDF("doc_id", "text")
    // reference spelling built from the SAME production shingle helper
    val viaAgg = graft.queries.Shingles.wordTrigrams(docs)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"), countDistinct($"gram").as("n_distinct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaExpr = docs
      .select($"doc_id", expr("trigram_stats(text)").as("st"))
      .filter($"st".isNotNull)
      .select($"doc_id", element_at($"st", 1), element_at($"st", 2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaExpr == viaAgg)
    assert(viaExpr(1L) == (6L, 2L)) // "a b a"/"b a b" alternating
    assert(viaExpr(4L) == (2L, 1L))
    assert(!viaExpr.contains(3L))
  }

  test("interpreted path (NO_CODEGEN) matches") {
    GraftFunctions.register(spark)
    val docs = Seq((1L, "a b a b a b a b"), (2L, "x y")).toDF("doc_id", "text")
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val out = docs.select($"doc_id", expr("trigram_stats(text)").as("st"))
        .orderBy("doc_id").collect()
      assert(out(0).getSeq[Long](1) == Seq(6L, 2L))
      assert(out(1).isNullAt(1))
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }
}

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
    val viaAgg = docs
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")),
        split($"text", " ").as("ws"))
      .filter($"pos" <= size($"ws") - 3)
      .select($"doc_id", concat_ws(" ", $"w",
        element_at($"ws", $"pos" + 2), element_at($"ws", $"pos" + 3)).as("gram"))
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
}

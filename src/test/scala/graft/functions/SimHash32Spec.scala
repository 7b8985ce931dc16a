package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHash32Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a b c"),
    (3L, "solo"),
    (4L, ""),                 // single empty token, like split(text,' ')
    (5L, "x y  z"),           // double space → empty token voted like any word
    (6L, "dup dup dup other")) // duplicate words vote once per occurrence
    .toDF("doc_id", "text")

  test("simhash32 equals the explode+groupBy bit-vote spelling exactly") {
    GraftFunctions.register(spark)
    val viaAgg = {
      val words = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
        .withColumn("g", expr(graft.queries.Shingles.h60("w")))
      val bitCols = (0 until 32).map { j =>
        sum(expr(s"2 * ((g >> $j) & 1) - 1")).as(s"s$j")
      }
      words.groupBy($"doc_id").agg(bitCols.head, bitCols.tail: _*)
        .select($"doc_id",
          (0 until 32).map(j => expr(s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END"))
            .reduce(_ + _).cast("long").as("agg_sim"))
    }
    val joined = docs.select($"doc_id", expr("simhash32(text)").as("sim"))
      .join(viaAgg, "doc_id")
    assert(joined.count() == 6)
    assert(joined.filter($"sim" =!= $"agg_sim").count() == 0)
  }

  test("interpreted path produces the same values as codegen; null text → null") {
    GraftFunctions.register(spark)
    val withNull = docs.unionByName(Seq((9L, null: String)).toDF("doc_id", "text"))
    val codegen = withNull.select($"doc_id", expr("simhash32(text)").as("sim"))
      .orderBy("doc_id").collect()
    assert(codegen.last.isNullAt(1)) // null text
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = withNull.select($"doc_id", expr("simhash32(text)").as("sim"))
        .orderBy("doc_id").collect()
      assert(interp.length == codegen.length)
      codegen.zip(interp).foreach { case (c, i) =>
        assert(c.isNullAt(1) == i.isNullAt(1))
        if (!c.isNullAt(1))
          assert(c.getLong(1) == i.getLong(1), s"doc ${c.getLong(0)}")
      }
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("simhash values stay within 32 bits") {
    GraftFunctions.register(spark)
    val sims = docs.select(expr("simhash32(text)")).collect().map(_.getLong(0))
    assert(sims.forall(s => s >= 0L && s <= 0xFFFFFFFFL))
  }
}

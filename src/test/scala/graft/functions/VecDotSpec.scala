package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot computes the float dot product in double, null-safe") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Option(Seq(1.0f, 2.0f, 3.0f)), Option(Seq(3.0f, 2.0f, 1.0f))),
      (Option(Seq(0.5f, 0.5f)), Option(Seq(2.0f, 2.0f))),
      (None, Option(Seq(1.0f))))
      .toDF("a", "b")
      .select(expr("vec_dot(a, b)").as("d"))
    val out = df.collect()
    assert(out(0).getDouble(0) == 10.0)
    assert(out(1).getDouble(0) == 2.0)
    assert(out(2).isNullAt(0))
  }

  test("vec_dot matches the HOF spelling bit-for-bit") {
    GraftFunctions.register(spark)
    val vecs = (0 until 50).map(i => Seq.tabulate(64)(j => (math.sin(i * 64 + j)).toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val both = df.as("a").crossJoin(df.as("b"))
      .select(
        expr("vec_dot(a.v, b.v)").as("native"),
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("mismatched lengths yield null in both eval paths, never a truncated product") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    // codegen path
    assert(df.select(expr("vec_dot(a, b)")).collect()(0).isNullAt(0))
    // interpreted path (codegen disabled)
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(df.select(expr("vec_dot(a, b)")).collect()(0).isNullAt(0))
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("type check rejects non-float arrays") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b")
        .select(expr("vec_dot(a, b)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("vec_dot"))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom KLL quantile aggregates (functions/KllSketch.scala): rank
  * guarantee on known data, parquet binary round-trip through a
  * generation-split stored table, and the scalar/aggregate registry
  * wiring. KLL compaction is internally randomized, so assertions are
  * rank BRACKETS (the sketch's actual contract), never exact values. */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("rank guarantee on a known distribution; union over stored generations holds it") {
    graft.functions.GraftFunctions.register(spark)
    // 20k uniform values over 40 groups: true quantiles are known
    val df = (0 until 20000).map(i => (i % 40, i.toDouble)).toDF("g", "v")
    val daily = df.groupBy($"g").agg(expr("kll_sketch_agg(v, 200)").as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("kll_tbl").toString
    daily.filter($"g" < 20).write.mode("overwrite").parquet(s"$dir/t")
    daily.filter($"g" >= 20).write.mode("append").parquet(s"$dir/t")
    val q = spark.read.parquet(s"$dir/t")
      .agg(expr("kll_union_agg(sk, 200)").as("u"))
      .select(
        expr("kll_quantile(u, 0.5d)").as("p50"),
        expr("kll_quantile(u, 0.95d)").as("p95"),
        expr("kll_quantile(u, 0.0d)").as("p0"),
        expr("kll_quantile(u, 1.0d)").as("p100"))
      .head()
    // k=200 → ε ≈ 1.65%; bracket at ±3% of the 0..19999 rank space
    assert(math.abs(q.getDouble(0) - 10000.0) <= 600.0, s"p50=${q.getDouble(0)}")
    assert(math.abs(q.getDouble(1) - 19000.0) <= 600.0, s"p95=${q.getDouble(1)}")
    // extremes are EXACT by the KLL contract (min/max always retained)
    assert(q.getDouble(2) === 0.0)
    assert(q.getDouble(3) === 19999.0)
  }

  test("empty group yields null sketch; nulls are skipped not counted") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1, Some(5.0)), (1, None), (2, None))
      .toDF("g", "v")
    val sk = df.groupBy($"g").agg(expr("kll_sketch_agg(v, 200)").as("sk"))
      .orderBy($"g").collect()
    assert(sk(0).get(1) != null) // group 1: one real value
    assert(sk(1).get(1) == null) // group 2: only nulls → empty → null
    val one = df.filter($"g" === 1)
      .agg(expr("kll_quantile(kll_sketch_agg(v, 200), 0.5d)")).head().getDouble(0)
    assert(one === 5.0)
  }
}

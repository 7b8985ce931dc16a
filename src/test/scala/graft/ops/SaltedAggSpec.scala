package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedAggSpec extends SparkSpec {
  import spark.implicits._

  // heavy skew: 90% of rows share one key
  private val rows = (0 until 1000).map { i =>
    (if (i < 900) "hot" else s"k${i % 7}", i.toLong, (i % 13) * 0.25)
  }.toDF("key", "id", "v")

  test("salted two-phase equals the direct GROUP BY on skewed data") {
    val salted = SaltedAgg.aggregate(rows, Seq("key"), $"id", salts = 8,
      Seq(
        SaltedAgg.sumDecimal($"v", "sv"),
        SaltedAgg.countRows("n"),
        SaltedAgg.minOf($"id", "min_id"),
        SaltedAgg.maxOf($"id", "max_id")))
      .select($"key", $"sv".cast("double").as("sv"), $"n".cast("long").as("n"),
        $"min_id", $"max_id")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val direct = rows.groupBy($"key")
      .agg(sum($"v".cast("decimal(25,8)")).cast("double").as("sv"),
        count(lit(1)).as("n"), min($"id").as("min_id"), max($"id").as("max_id"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted == direct)
  }

  test("phase structure: exactly two hash exchanges, partials bounded by keys*salts") {
    val df = SaltedAgg.aggregate(rows, Seq("key"), $"id", salts = 8,
      Seq(SaltedAgg.countRows("n")))
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted HLL sketch table behind o28: merge must be
  * order/generation-insensitive (HLL union is a register-wise max —
  * commutative and associative), the binary column must round-trip
  * parquet exactly, and the union estimate must sit inside the lgK=12
  * error bound of the exact distinct. */
class HllSketchTableSpec extends SparkSpec {
  import spark.implicits._

  test("parquet round-trip + append generation ≡ one-shot union; estimate within bound") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.core.Tables.events(spark, sf)
      .select($"user_id", to_date($"ts").as("day"))
    val daily = ev.groupBy($"day").agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("hll_tbl").toString
    // two append generations split mid-month — the o19/Manifest delta
    // discipline: a new day appends one sketch row, nothing rebuilds
    val split = java.sql.Date.valueOf("2024-01-16")
    daily.filter($"day" < split).write.mode("overwrite").parquet(s"$dir/t")
    daily.filter($"day" >= split).write.mode("append").parquet(s"$dir/t")
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))")).head().getLong(0)
    val fromDisk = est(spark.read.parquet(s"$dir/t"))
    val oneShot = est(daily)
    assert(fromDisk === oneShot,
      "union over appended generations must equal the one-shot union exactly")
    val exact = ev.agg(countDistinct($"user_id")).head().getLong(0)
    assert(math.abs(fromDisk - exact) <= exact * 0.05,
      s"estimate $fromDisk outside 5% of exact $exact")
  }
}

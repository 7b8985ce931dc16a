package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The streaming HLL sketch-table writer: partial sketches written per
  * micro-batch must union to EXACTLY the batch-built sketch (HLL
  * insert and union are both register-wise max over the same hash, so
  * any partition of the same multiset yields identical registers), and
  * a replayed generation must overwrite itself, not double-fold. */
class HllSketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed partials ≡ batch-built sketch exactly; generation replay is idempotent") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.core.Tables.events(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("hll_stream").toString
    val weeks = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22", "2024-02-01")
    for (i <- 0 until 4) {
      ev.filter($"ts" >= lit(weeks(i)).cast("timestamp") &&
          $"ts" < lit(weeks(i + 1)).cast("timestamp"))
        .select($"user_id", $"ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/w$i")
    }
    val src = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in/*")
    Streams.hllSketchTableStream(src, s"$tmp/table", s"$tmp/ckpt")
      .awaitTermination()
    def est(df: org.apache.spark.sql.DataFrame): Long = df
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))"))
      .head().getLong(0)
    val streamed = est(spark.read.parquet(s"$tmp/table"))
    val batchBuilt = est(
      ev.select($"user_id", to_date($"ts").as("day"))
        .groupBy($"day").agg(expr("hll_sketch_agg(user_id, 12)").as("sk")))
    assert(streamed === batchBuilt,
      "partial-sketch union must equal the batch-built sketch exactly")
    // replay: rewriting a generation with the same rows changes nothing
    val gen0 = ev.filter($"ts" < lit(weeks(1)).cast("timestamp"))
      .select($"user_id", date_trunc("week", $"ts").as("wk"), to_date($"ts").as("day"))
      .groupBy($"wk", $"day").agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    gen0.write.mode("overwrite").parquet(s"$tmp/table/gen=0")
    assert(est(spark.read.parquet(s"$tmp/table")) === batchBuilt,
      "generation replay must overwrite, never double-fold")
  }
}

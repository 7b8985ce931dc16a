package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Catalyst's OWN runtime bloom-filter injection (InjectRuntimeFilter)
  * — the built-in cousin of the manual j18 gate: when a shuffle join's
  * dim side carries a selective predicate, the optimizer plants a
  * bloom-filter aggregate on it and a might_contain() probe on the fact
  * side BELOW the fact's exchange, cutting shuffle volume exactly like
  * ops/SkewJoin's manual gate. Pinned so a Spark upgrade or a conf
  * drift that silently disables the rewrite fails a test: the engine's
  * 100 TB story leans on it whenever the dim outgrows the broadcast
  * budget. (Thresholds are lowered to local-scale — at production
  * sizes the defaults fire on their own.) */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim join gets a might_contain probe on the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rtf").toString
    spark.range(200000).select(
      (col("id") % 5000).as("k"), col("id").as("payload"))
      .write.parquet(s"$dir/fact")
    spark.range(5000).select(
      col("id").as("k"), (col("id") % 7).as("seg"))
      .write.parquet(s"$dir/dim")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle-join regime
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"seg" === 3)
      val q = fact.join(dim, "k").agg(sum($"payload").as("total"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected runtime bloom probe in:\n$plan")
      // and it computes the right thing with the filter in place
      val total = q.collect()(0).getAs[Long]("total")
      val want = (0L until 200000L).filter(id => (id % 5000) % 7 == 3).sum
      assert(total == want)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  // skewed: one giant group + two small ones, string order keys
  private val rows = (0 until 300).map { i =>
    val g = if (i < 270) "big" else if (i < 285) "s1" else "s2"
    (g, f"doc_$i%04d", (i % 7).toLong)
  }.toDF("grp", "k", "v")

  test("bucketed cumsum equals the per-group window exactly") {
    val w = Window.partitionBy($"grp").orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = rows.withColumn("cum", sum($"v").over(w))
      .select($"grp", $"k", $"cum").collect().toSet
    for (buckets <- Seq(1, 4, 64)) { // boundary count affects only parallelism
      val got = PrefixSum.withCumsum(rows, "grp", "k", "v", buckets = buckets)
        .select($"grp", $"k", $"cum").collect().toSet
      assert(got == ref, s"buckets=$buckets")
    }
  }

  test("every input row is kept, including null group and null order keys") {
    val withNulls = rows.union(Seq(
      (null.asInstanceOf[String], "doc_x", 1L),
      ("big", null.asInstanceOf[String], 2L)).toDF("grp", "k", "v"))
    val out = PrefixSum.withCumsum(withNulls, "grp", "k", "v")
    assert(out.count() == withNulls.count())
  }

  test("window is partitioned by (group, bucket), never group alone") {
    val out = PrefixSum.withCumsum(rows, "grp", "k", "v", buckets = 8)
    val p = out.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p).toSeq
    assert(specs.nonEmpty)
    specs.foreach(s => assert(s.contains("ps_b"), s"window without bucket: $s"))
  }
}

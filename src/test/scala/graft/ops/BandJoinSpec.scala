package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BandJoin: bucketed band join ≡ the naive |Δ| theta-join. */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 10.0), (2L, 10.5), (3L, -3.2), (4L, 0.0),
    (4L, 0.0) // duplicate row: multiplicity
  ).toDF("lid", "lv")

  private val right = Seq(
    (10L, 10.24), (11L, 10.76), (12L, -3.0), (13L, 0.25),
    (14L, 99.0)
  ).toDF("rid", "rv")

  private def naive = left.join(right, abs($"lv" - $"rv") <= 0.25)

  test("bucketed ≡ naive across band widths, duplicates preserved") {
    for (delta <- Seq(0.25)) {
      val banded = BandJoin.band(left, right, "lv", "rv", delta)
      val a = banded.groupBy($"lid", $"rid").count()
      val b = naive.groupBy($"lid", $"rid").count()
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
      // duplicate left rows each match 13 (|0.0 - 0.25| <= 0.25)
      assert(banded.filter($"lid" === 4 && $"rid" === 13).count() == 2)
      // negative values bucket correctly
      assert(banded.filter($"lid" === 3 && $"rid" === 12).count() == 1)
      // far row never matches
      assert(banded.filter($"rid" === 14).isEmpty)
    }
  }

  test("exact boundary |Δ| == delta is included, just outside excluded") {
    val l = Seq((1L, 1.0)).toDF("lid", "lv")
    val r = Seq((2L, 1.5), (3L, 1.51)).toDF("rid", "rv")
    val out = BandJoin.band(l, r, "lv", "rv", 0.5)
    assert(out.select($"rid").as[Long].collect().toSeq == Seq(2L))
  }

  test("caller column named __band is rejected, not silently clobbered") {
    val l = left.withColumn("__band", lit(7L))
    intercept[IllegalArgumentException] {
      BandJoin.band(l, right, "lv", "rv", 0.25)
    }
    intercept[IllegalArgumentException] {
      BandJoin.band(left, right.withColumn("__band", lit(7L)), "lv", "rv", 0.25)
    }
  }

  test("plan is a hash equi-join on the bucket, never a nested loop") {
    val p = BandJoin.band(left, right, "lv", "rv", 0.25)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin"), p)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IntervalJoin: binned overlap join ≡ the naive theta-join, with SQL
  * join multiplicity (duplicates preserved, no distinct). */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private val left = Seq(
    (1L, d("2024-01-01"), d("2024-01-20")), // spans 3 bins
    (2L, d("2024-02-01"), d("2024-02-01")), // single day
    (3L, d("2024-03-01"), d("2024-03-05")),
    (3L, d("2024-03-01"), d("2024-03-05"))  // duplicate row: multiplicity
  ).toDF("lid", "ls", "le")

  private val right = Seq(
    (10L, d("2024-01-15"), d("2024-01-25")), // overlaps 1 in 2 shared bins
    (11L, d("2024-01-20"), d("2024-01-30")), // touches 1 at its end day
    (12L, d("2024-02-01"), d("2024-02-01")), // exact single-day match w/ 2
    (13L, d("2024-03-04"), d("2024-03-10")), // overlaps both copies of 3
    (14L, d("2024-06-01"), d("2024-06-05"))  // no overlap
  ).toDF("rid", "rs", "re")

  private def naive = left.join(right, $"ls" <= $"re" && $"rs" <= $"le")

  test("binned ≡ naive theta-join, including duplicate-row multiplicity") {
    for (binDays <- Seq(1, 7, 30)) {
      val binned = IntervalJoin.overlap(left, right, "ls", "le", "rs", "re", binDays)
      assert(binned.columns.toSeq == Seq("lid", "ls", "le", "rid", "rs", "re"))
      val a = binned.groupBy($"lid", $"rid").count()
      val b = naive.groupBy($"lid", $"rid").count()
      assert(a.except(b).isEmpty && b.except(a).isEmpty, s"binDays=$binDays")
      // the duplicate left row must match 13 twice
      assert(binned.filter($"lid" === 3 && $"rid" === 13).count() == 2)
      // end-touching intervals DO overlap (closed intervals)
      assert(binned.filter($"lid" === 1 && $"rid" === 11).count() == 1)
      // disjoint pair never appears
      assert(binned.filter($"rid" === 14).isEmpty)
    }
  }

  test("extra equi-keys restrict matches within the same key") {
    val lk = left.withColumn("k", $"lid" % 2)
    val rk = right.withColumn("k", lit(1L))
    val out = IntervalJoin.overlap(lk, rk, "ls", "le", "rs", "re", 7, keys = Seq("k"))
    // only odd lids carry k=1: lid 1 and the two lid-3 copies
    assert(out.select($"lid").distinct().as[Long].collect().toSet == Set(1L, 3L))
    assert(out.columns.count(_ == "k") == 1)
  }

  test("caller column named __bin is rejected, not silently clobbered") {
    intercept[IllegalArgumentException] {
      IntervalJoin.overlap(left.withColumn("__bin", lit(0L)),
        right, "ls", "le", "rs", "re", 7)
    }
    intercept[IllegalArgumentException] {
      IntervalJoin.overlap(left,
        right.withColumn("__bin", lit(0L)), "ls", "le", "rs", "re", 7)
    }
  }

  test("plan is a hash equi-join on the bin — no cartesian, no nested loop") {
    val p = IntervalJoin.overlap(left, right, "ls", "le", "rs", "re", 7)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin"), p)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IncrementalAgg: the maintained table must equal the from-scratch
  * aggregate of the updated fact — under inserts, deletes (including a
  * fully-deleted group), and update pairs — with the plan shape the
  * scale story needs (full-outer merge, semi-join-pruned rescan). */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IncrementalAgg.Spec(Seq("g", "h"), Seq("v"), Seq("v"))

  // deterministic fixture: 13×3 groups, values cycling mod 101
  private def base = (1L to 5000L)
    .map(i => (i, (i % 13).toString, (i % 3).toString, ((i * 7) % 101).toDouble))
    .toDF("id", "g", "h", "v")

  // deletes: every 37th row PLUS all of group g=5 (a full-group delete);
  // inserts: 600 new rows, some landing in brand-new group g=x — and
  // none in g=5, so the full deletion is not silently repopulated
  private def deletes = base.filter($"id" % 37 === 0 || $"g" === "5")
  private def inserts = (5001L to 5600L)
    .map(i => (i, if (i % 10 == 0) "x" else (i % 13).toString, (i % 3).toString,
      ((i * 11) % 101).toDouble))
    .toDF("id", "g", "h", "v")
    .filter($"g" =!= "5")

  private def updated = base.join(deletes.select("id"), Seq("id"), "left_anti")
    .unionByName(inserts)
  private def changes =
    inserts.withColumn("w", lit(1L)).unionByName(deletes.withColumn("w", lit(-1L)))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("sum_v", round($"sum_v", 6))
      .orderBy("g", "h").collect().toSeq

  test("maintain equals the from-scratch aggregate of the updated table") {
    val stored = IncrementalAgg.storedAggregate(base, spec)
    val got = canon(IncrementalAgg.maintain(stored, changes, updated, spec))
    val want = canon(IncrementalAgg.storedAggregate(updated, spec))
    assert(got == want)
    // the full-group delete really dropped out, and the new group entered
    val gs = got.map(_.getString(0)).toSet
    assert(!gs.contains("5") && gs.contains("x"))
  }

  test("sum-only spec skips the rescan entirely") {
    val sumSpec = spec.copy(minMaxCols = Nil)
    val stored = IncrementalAgg.storedAggregate(base, sumSpec)
    val out = IncrementalAgg.maintain(stored, changes, updated, sumSpec)
    assert(canon(out) == canon(IncrementalAgg.storedAggregate(updated, sumSpec)))
    // `updated` must not appear in the plan at all: with only abelian
    // state there is nothing to rescan — updated's lineage carries an
    // anti join (and the min/max path a semi join); neither may show
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("LeftAnti") && !p.contains("LeftSemi"), p)
  }

  test("plan: full-outer merge with a semi-join-pruned min/max rescan") {
    val stored = IncrementalAgg.storedAggregate(base, spec)
    val p = IncrementalAgg.maintain(stored, changes, updated, spec)
      .queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), p)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }
}

package graft.ops

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Split exactness: 70/15/15 counts, disjointness, temporal ordering
  * (tests/test_eval.py:73-124). */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val df100 = (0 until 100).map { i =>
    (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"))
  }.toDF("id", "ts")

  test("positional split yields exactly 70/15/15 on 100 rows, disjoint, time-ordered") {
    val out = Splits.positional(df100, "ts", "id")
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("train" -> 70L, "val" -> 15L, "test" -> 15L))
    val maxTrain = out.filter($"split" === "train").agg(max("ts")).collect()(0).getTimestamp(0)
    val minVal = out.filter($"split" === "val").agg(min("ts")).collect()(0).getTimestamp(0)
    val maxVal = out.filter($"split" === "val").agg(max("ts")).collect()(0).getTimestamp(0)
    val minTest = out.filter($"split" === "test").agg(min("ts")).collect()(0).getTimestamp(0)
    assert(maxTrain.before(minVal) && maxVal.before(minTest))
    assert(out.select("id").distinct().count() == 100) // no dup/loss
  }

  test("walk-forward folds: trailing window train, disjoint consecutive tests") {
    val folds = Splits.walkForward(df100, "ts", "id", windowSize = Some(30), stepSize = 10, nFolds = 3)
    assert(folds.size == 3)
    val (train0, test0) = folds(0) // last fold: test = rows 91..100
    assert(test0.count() == 10 && train0.count() == 30)
    val testIds = folds.flatMap(_._2.select("id").as[Long].collect())
    assert(testIds.distinct.size == 30) // disjoint across folds
    val maxTrain0 = train0.agg(max("id")).collect()(0).getLong(0)
    val minTest0 = test0.agg(min("id")).collect()(0).getLong(0)
    assert(maxTrain0 < minTest0)
  }

  test("walk-forward label paths agree: quantile boundaries reproduce positional folds") {
    // unique timestamps + tight relErr → the time at each boundary rank
    // cuts exactly where the row_number does
    val pos = Splits
      .walkForwardLabelsPositional(df100, "ts", "id", Some(30), 10, 3)
      .select($"id", $"fold", $"role").collect().toSet
    val byTime = Splits
      .walkForwardLabelsByTime(df100, "ts", Some(30), 10, 3, total = 100L, relErr = 1e-9)
      .select($"id", $"fold", $"role").collect().toSet
    assert(byTime == pos)
    // the dispatcher picks positional below the threshold, byTime above
    val viaDispatch = Splits
      .walkForwardLabels(df100, "ts", "id", Some(30), 10, 3, scaleRows = 10L, relErr = 1e-9)
      .select($"id", $"fold", $"role").collect().toSet
    assert(viaDispatch == pos)
  }

  test("scale-path fold labeling has no window at all in the plan") {
    val out = Splits.walkForwardLabelsByTime(df100, "ts", Some(30), 10, 3, total = 100L)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("by-order quantile split reproduces the positional split row for row") {
    // ties-free order value (unique timestamps here) → exact parity,
    // including on n=100 where floor(n·0.7) must not ceil to 71
    val pos = Splits.positional(df100, "ts", "id")
      .select($"id", $"split").collect().toSet
    val byOrder = Splits.byOrderQuantile(df100, unix_timestamp($"ts"))
      .select($"id", $"split").collect().toSet
    assert(byOrder == pos)
    // and a caller-supplied count skips the count pass without changing labels
    val withCount = Splits
      .byOrderQuantile(df100, unix_timestamp($"ts"), knownCount = Some(100L))
      .select($"id", $"split").collect().toSet
    assert(withCount == pos)
  }

  test("degenerate fractions: a train bucket below one row stays empty, nothing crashes") {
    val tiny = df100.limit(3)
    val out = Splits.byOrderQuantile(tiny,
      unix_timestamp($"ts"), Splits.SplitFractions(train = 0.1, validation = 0.3))
    // floor(3·0.1)=0 → no train rows; floor(3·0.4)=1 → one val row
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("train", 0L) == 0L)
    assert(counts("val") == 1L && counts("test") == 2L)
  }

  test("quantile split approximates fractions without a global window") {
    val out = Splits.byTimeQuantile(df100, "ts")
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 70L) <= 2)
    assert(counts.values.sum == 100L)
  }
}

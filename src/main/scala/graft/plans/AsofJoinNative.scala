package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native as-of join — a whole-operator extension (custom LogicalPlan +
  * Strategy + SparkPlan), the one time-series join Spark has no built-in
  * operator for. For each left row, attach the most recent right row of
  * the same key with `right.time <= left.time` (optionally within
  * `tolerance`); unmatched left rows keep null right columns (left-outer
  * semantics, the same contract as DuckDB `ASOF LEFT JOIN` and pandas
  * `merge_asof`).
  *
  * Why a custom operator when [[graft.ops.AsofJoin]] already composes it
  * from union + window? The composed spelling is correct and
  * shuffle-optimal but pays for generality: it materializes a unioned
  * (|L|+|R|)-row frame, runs a window `last(ignoreNulls)` over it, and
  * filters half of it back out. This operator is the plan you'd write by
  * hand: shuffle both sides on the key (Spark inserts the exchanges from
  * `requiredChildDistribution` — co-partitioning is negotiated by
  * EnsureRequirements exactly as for a sort-merge join), sort each side
  * by (key, time) (from `requiredChildOrdering`), then a single
  * streaming merge pass per partition with **O(1) state per key** — one
  * buffered right row, no unioned frame, no window buffer, no filter.
  * At 100 TB both spellings shuffle the same bytes; this one removes the
  * post-shuffle window materialization entirely, and its output stays
  * (key, time)-sorted and key-partitioned for downstream stages —
  * `outputPartitioning`/`outputOrdering` advertise it, so a following
  * per-key window or aggregation plans with zero additional exchange.
  *
  * Directions (pandas merge_asof parity): `backward` (default, most
  * recent right row at or before the left time), `forward` (earliest at
  * or after), `nearest` (closer of the two; exact ties prefer
  * backward) — all three run in the same single merge pass with the
  * same O(1) state.
  *
  * Semantics details:
  *  - null keys never match (SQL equality), on either side;
  *  - null left time never matches; null right times are skipped;
  *  - right-side time ties: the last row in sort order wins ("most
  *    recent" includes the latest duplicate) — callers needing
  *    determinism under ties must make (key, time) unique on the right,
  *    same as with any as-of engine;
  *  - `tolerance` is in the column's physical unit (µs for timestamps,
  *    days for dates, the raw value for integer times).
  */
sealed trait AsofDirection extends Serializable
object AsofDirection {
  /** most recent right row with time <= left time (the default). */
  case object Backward extends AsofDirection
  /** earliest right row with time >= left time. */
  case object Forward extends AsofDirection
  /** whichever of the two is closer; exact ties prefer backward. */
  case object Nearest extends AsofDirection

  def parse(s: String): AsofDirection = s.toLowerCase match {
    case "backward" => Backward
    case "forward" => Forward
    case "nearest" => Nearest
    case other => throw new IllegalArgumentException(
      s"unknown as-of direction: $other (backward|forward|nearest)")
  }
}

case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    direction: AsofDirection = AsofDirection.Backward)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: lowers [[AsofJoinPlan]] to [[AsofJoinExec]].
  * Registered via `GraftExtensions` (`injectPlannerStrategy`) or
  * imperatively with [[AsofJoinNative.register]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tol, dir) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, dir) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join. Both children are hash-clustered on
  * the keys and sorted by (keys, time); each partition is then a single
  * forward merge holding exactly one candidate right row — the latest
  * with time <= the current left row's time. No per-key buffering, no
  * window state: memory is O(1) beyond the sort, so a skewed key that
  * would blow up a window buffer streams through untouched. */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    direction: AsofDirection = AsofDirection.Backward)
  extends BinaryExecNode {

  require(leftKeys.length == rightKeys.length &&
    leftKeys.zip(rightKeys).forall { case (l, r) => DataType.equalsIgnoreNullability(l.dataType, r.dataType) },
    "as-of join key types must match pairwise")
  require(DataType.equalsIgnoreNullability(leftTime.dataType, rightTime.dataType),
    s"as-of time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  // Same distribution contract as SortMergeJoinExec: EnsureRequirements
  // inserts co-partitioned exchanges (or reuses existing ones) on both
  // sides; AQE coalescing is validated against this requirement, so the
  // two sides can never drift apart.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def keyTimeOrder(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) :+ SortOrder(time, Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keyTimeOrder(leftKeys, leftTime), keyTimeOrder(rightKeys, rightTime))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = keyTimeOrder(leftKeys, leftTime)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  // fail fast at plan construction, not per-task after the shuffle
  require(AsofJoinExec.supportedTimeType(leftTime.dataType),
    s"unsupported as-of time type: ${leftTime.dataType}")

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOutput = left.output
    val rOutput = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val tol = tolerance
    val dir = direction
    val outAttrs = output
    // resolved OUTSIDE the task closure: the closure must capture only
    // locals, never `this` (the whole plan subtree)
    val getTime = AsofJoinExec.timeGetter(leftTime.dataType)

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
        val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOutput)
        val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOutput)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rOutput.length)
        // bind against the NULLABLE output attrs (not rOutput, which may
        // be non-nullable): the null-right row must project as nulls
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

        new Iterator[InternalRow] {
          // current right row, not yet consumed by the merge: the row
          // object stays valid until the next rIter.next() call, so it is
          // held WITHOUT copying; its key/time are extracted at load time
          // (projection buffers are reused, values are not).
          private var rCur: InternalRow = _
          private var rKey: UnsafeRow = _ // rKeyProj buffer, valid until next load
          private var rTimeIsNull = false
          private var rTimeVal = 0L
          // best candidate for the current left key: the ONLY buffered
          // state — copied once per right row at most.
          private var matchRow: InternalRow = _
          private var matchKey: UnsafeRow = _
          private var matchTime = 0L

          loadRight()

          private def loadRight(): Unit = {
            if (rIter.hasNext) {
              rCur = rIter.next()
              rKey = rKeyProj(rCur)
              val t = rTimeProj(rCur)
              rTimeIsNull = t.isNullAt(0)
              rTimeVal = if (rTimeIsNull) 0L else getTime(t)
            } else {
              rCur = null
            }
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            var matched: InternalRow = null
            if (!lKey.anyNull) {
              val lt = lTimeProj(l)
              if (!lt.isNullAt(0)) {
                val lTimeVal = getTime(lt)
                // advance the right side up to (and including) the last
                // row with key == lKey and time <= lTimeVal
                var advance = true
                while (advance && rCur != null) {
                  if (rKey.anyNull || rTimeIsNull) {
                    loadRight() // null keys/times sort first; never match
                  } else {
                    val cmp = keyOrd.compare(rKey, lKey)
                    if (cmp < 0) {
                      loadRight()
                    } else if (cmp == 0 && rTimeVal <= lTimeVal) {
                      matchRow = rCur.copy()
                      matchKey = rKey.copy()
                      matchTime = rTimeVal
                      loadRight()
                    } else {
                      advance = false
                    }
                  }
                }
                // hi - lo is mathematically >= 0 on each side; a negative
                // result is Long overflow (extreme LongType times) and
                // saturates, so the far candidate can never win on wrap
                def gapOrMax(hi: Long, lo: Long): Long = {
                  val d = hi - lo
                  if (d < 0) Long.MaxValue else d
                }
                // backward candidate: the last consumed row of this key
                // with time <= lt (an exact-tie row lands here with d = 0)
                val backOk = matchRow != null &&
                  keyOrd.compare(matchKey, lKey) == 0 &&
                  tol.forall(t => gapOrMax(lTimeVal, matchTime) <= t)
                // forward candidate: the UNCONSUMED current right row —
                // same key, time strictly > lt after the advance
                val fwdOk = rCur != null && !rKey.anyNull && !rTimeIsNull &&
                  keyOrd.compare(rKey, lKey) == 0 &&
                  tol.forall(t => gapOrMax(rTimeVal, lTimeVal) <= t)
                matched = dir match {
                  case AsofDirection.Backward =>
                    if (backOk) matchRow else null
                  case AsofDirection.Forward =>
                    // earliest time >= lt: an exact tie (consumed into the
                    // backward slot with d = 0) beats any strictly-later row
                    if (backOk && matchTime == lTimeVal) matchRow
                    else if (fwdOk) rCur
                    else null
                  case AsofDirection.Nearest =>
                    val db = if (backOk) gapOrMax(lTimeVal, matchTime) else Long.MaxValue
                    val df = if (fwdOk) gapOrMax(rTimeVal, lTimeVal) else Long.MaxValue
                    if (db == Long.MaxValue && df == Long.MaxValue) null
                    else if (db <= df) matchRow // ties prefer backward
                    else rCur
                }
              }
            }
            numOutputRows += 1
            if (matched != null) {
              numMatched += 1
              resultProj(joined(l, matched))
            } else {
              resultProj(joined(l, nullRight))
            }
          }
        }
    }
  }
}

object AsofJoinExec {
  private[plans] def supportedTimeType(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType |
         DateType | IntegerType | ShortType => true
    case _ => false
  }

  /** Physical-value extractor for the supported time types; sort order
    * of the extracted Long matches the column's sort order. Lives on
    * the companion so task closures capture a plain function, not the
    * exec node. */
  private[plans] def timeGetter(dt: DataType): InternalRow => Long = dt match {
    case TimestampType | TimestampNTZType | LongType => (r: InternalRow) => r.getLong(0)
    case DateType | IntegerType => (r: InternalRow) => r.getInt(0).toLong
    case ShortType => (r: InternalRow) => r.getShort(0).toLong
    case other =>
      throw new IllegalArgumentException(s"unsupported as-of time type: $other")
  }
}

/** DataFrame-level entry point for the native as-of join. */
object AsofJoinNative {

  /** Register the planner strategy and the pushdown/pruning optimizer
    * rule on an existing session (idempotent). Sessions built with
    * `spark.sql.extensions=graft.functions.GraftExtensions` get both
    * automatically. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsofJoinStrategy.type]))
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.exists(_.isInstanceOf[AsofJoinOptimizations.type]))
      spark.experimental.extraOptimizations = opts :+ AsofJoinOptimizations
  }

  /** Per-key as-of join, left-outer: each left row picks up the right
    * row selected by `direction` — "backward" (default: most recent
    * with right time <= left time), "forward" (earliest at-or-after),
    * or "nearest" (closer of the two, ties backward) — within
    * `tolerance`, in the time column's physical unit (µs for
    * timestamps). Output columns: all of `left`'s, then all of
    * `right`'s (nullable). Right-side columns whose names collide with
    * left ones are suffixed `_r`. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = PlanBridge.analyzed(left)
    // Re-alias every right column: (a) fresh expression ids make
    // self-joins (same source table on both sides) unambiguous, exactly
    // what Dataset.join's dedup does; (b) name collisions get a `_r`
    // suffix so the output schema is addressable.
    val lNames = lPlan.output.map(_.name).toSet
    val rAnalyzed = PlanBridge.analyzed(right)
    val rAliases = rAnalyzed.output.map { a =>
      val name = if (lNames.contains(a.name)) s"${a.name}_r" else a.name
      Alias(a, name)()
    }
    val rPlan = Project(rAliases, rAnalyzed)
    val rOut = rPlan.projectList.map(_.toAttribute)

    def resolveL(name: String): Attribute =
      lPlan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"left column not found: $name"))
    def resolveR(name: String): Attribute = {
      val eff = if (lNames.contains(name)) s"${name}_r" else name
      rOut.find(_.name == eff).getOrElse(
        throw new IllegalArgumentException(s"right column not found: $name"))
    }

    val plan = AsofJoinPlan(
      lPlan, rPlan,
      keyCols.map(resolveL), keyCols.map(resolveR),
      resolveL(leftTsCol), resolveR(rightTsCol),
      tolerance, AsofDirection.parse(direction))
    PlanBridge.ofRows(spark, plan)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer support for [[AsofJoinPlan]] — Catalyst's built-in pushdown
  * and pruning rules stop at unknown nodes, so without this rule a
  * filter above an as-of join runs AFTER both shuffles and every column
  * of both sides travels through them. At 100 TB that is the difference
  * between shuffling a week of one station and shuffling the whole
  * table. Injected via `GraftExtensions` (`injectOptimizerRule`, runs
  * inside the operator-optimization fixpoint) and imperatively through
  * [[AsofJoinNative.register]].
  *
  * What is (and is not) safe to move:
  *  - LEFT-only deterministic conjuncts push below the join: each output
  *    row is one left row enriched independently, so dropping left rows
  *    early never changes any other row's match.
  *  - RIGHT-side conjuncts must NOT push down: a post-join predicate on
  *    right columns constrains the MATCHED row; filtering the right
  *    input instead would let an older row become the match — different
  *    semantics.
  *  - Column pruning inserts Projects under both children keeping only
  *    referenced output columns plus each side's keys and time column.
  */
object AsofJoinOptimizations extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // ---- left-only filter pushdown ----
    case f @ Filter(cond, aj: AsofJoinPlan) =>
      val leftSet = aj.left.outputSet
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(leftSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    // ---- column pruning through the join ----
    case p @ Project(list, aj: AsofJoinPlan) if canPrune(list, aj) =>
      val keep = needed(list, aj)
      def prune(child: LogicalPlan): LogicalPlan = {
        val kept = child.output.filter(keep.contains)
        if (kept.length == child.output.length) child else Project(kept, child)
      }
      p.copy(child = aj.copy(left = prune(aj.left), right = prune(aj.right)))
  }

  /** Everything the join itself consumes plus everything `list` needs —
    * the single definition both the guard and the rewrite use. */
  private def needed(list: Seq[NamedExpression], aj: AsofJoinPlan): AttributeSet =
    AttributeSet(list.flatMap(_.references)) ++
      AttributeSet(aj.leftKeys.flatMap(_.references)) ++
      AttributeSet(aj.rightKeys.flatMap(_.references)) ++
      aj.leftTime.references ++ aj.rightTime.references

  private def canPrune(list: Seq[NamedExpression], aj: AsofJoinPlan): Boolean = {
    val keep = needed(list, aj)
    (aj.left.output ++ aj.right.output).exists(a => !keep.contains(a))
  }
}

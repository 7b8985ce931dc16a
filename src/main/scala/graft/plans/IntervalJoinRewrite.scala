package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DoubleType, LongType}

/** Optimizer rewrite: an inner join whose condition contains a closed
  * interval-overlap pair on DATE columns —
  *
  *   lStart <= rEnd AND rStart <= lEnd      (either conjunct order,
  *                                           >= spelled either way)
  *
  * — is what Spark plans as a nested-loop theta-join: O(|L|·|R|)
  * comparisons regardless of how few pairs truly overlap. This rule
  * rewrites the shape into ops.IntervalJoin's binned plan at the
  * LOGICAL level, so a user writing the natural predicate gets the
  * scalable plan automatically: both sides Generate-explode into the
  * fixed-width time bins their interval covers, the join becomes a
  * hash equi-join on the bin (original condition riding along as the
  * residual), and a first-overlap-bin guard keeps each true pair
  * exactly once — multiplicity, null semantics (a null date generates
  * no bins, exactly as the null predicate drops the row), and the
  * output schema are all unchanged.
  *
  * Point-in-interval probes (ts >= start AND ts <= end) are the
  * degenerate case lStart = lEnd and rewrite the same way, the point
  * landing in one bin.
  *
  * OPT-IN: enable with `spark.graft.intervalJoin.enabled=true` (bin
  * width in days via `spark.graft.intervalJoin.binDays`, default 7).
  * Deliberately conservative — only DateType AttributeReferences, only
  * Inner joins — and it never fires twice on its own output (the
  * generated `__graft_bin` attribute is the marker).
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ENABLED = "spark.graft.intervalJoin.enabled"
  val BIN_DAYS = "spark.graft.intervalJoin.binDays"
  private val BIN = "__graft_bin"

  /** Imperative registration on an existing session (idempotent);
    * sessions built with `spark.sql.extensions=graft.functions.
    * GraftExtensions` get the rule automatically. The rule still only
    * fires once [[ENABLED]] is set true. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val opts = spark.experimental.extraOptimizations
    if (!opts.exists(_.isInstanceOf[IntervalJoinRewrite.type]))
      spark.experimental.extraOptimizations = opts :+ IntervalJoinRewrite
  }

  /** A conjunct normalized to `small <= big` on date attributes. */
  private object DateLeq {
    def unapply(e: Expression): Option[(AttributeReference, AttributeReference)] = e match {
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference)
          if a.dataType == DateType && b.dataType == DateType => Some((a, b))
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference)
          if a.dataType == DateType && b.dataType == DateType => Some((b, a))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ENABLED, "false").toBoolean) return plan
    val binDays = conf.getConfString(BIN_DAYS, "7").toInt
    require(binDays > 0, s"$BIN_DAYS must be positive")

    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.output.exists(_.name == BIN) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val ls = left.outputSet
        val rs = right.outputSet
        // find lStart <= rEnd and rStart <= lEnd (first matching pair)
        val lToR = conjuncts.collectFirst {
          case DateLeq(a, b) if ls.contains(a) && rs.contains(b) => (a, b)
        }
        val rToL = conjuncts.collectFirst {
          case DateLeq(a, b) if rs.contains(a) && ls.contains(b) => (a, b)
        }
        (lToR, rToL) match {
          case (Some((lStart, rEnd)), Some((rStart, lEnd))) =>
            def bin(e: Expression): Expression =
              Floor(Divide(Cast(UnixDate(e), DoubleType), Literal(binDays.toDouble)))
            def explodeBins(child: LogicalPlan, s: Expression, e: Expression,
                out: Attribute): LogicalPlan =
              // Sequence is TimeZoneAwareExpression: without an explicit
              // zone it reads as unresolved and fails plan validation
              Generate(Explode(Sequence(bin(s), bin(e), None,
                  Some(conf.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(out), child = child)
            val lBin = AttributeReference(BIN, LongType, nullable = false)()
            val rBin = AttributeReference(BIN, LongType, nullable = false)()
            val newLeft = explodeBins(left, lStart, lEnd, lBin)
            val newRight = explodeBins(right, rStart, rEnd, rBin)
            // emit each true pair exactly once: only in the bin holding
            // the overlap's start
            val firstBinGuard = EqualTo(lBin, bin(Greatest(Seq(lStart, rStart))))
            val newCond = (EqualTo(lBin, rBin) +: conjuncts :+ firstBinGuard)
              .reduce(And)
            Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
          case _ => j
        }
    }
  }
}

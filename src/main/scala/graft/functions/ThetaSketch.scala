package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Theta sketches as custom Catalyst aggregates — the SET-OPERATION
  * member of the stored-sketch family (o28 HLL = distinct counts, o29
  * KLL = quantiles): a theta sketch is a uniform sample of the hashed
  * key space, so stored sketches support INTERSECTION and DIFFERENCE
  * estimates — "distinct users who did X AND Y / X BUT NOT Y" — which
  * an HLL sketch fundamentally cannot answer (union-only). Audience
  * overlap, benchmark-contamination user sets, cohort retention
  * algebra: all from |segments| stored sketch rows, never an event
  * re-scan. Below the nominal-entries threshold (lgK=12 → 4096) a
  * theta sketch is EXACT — estimation starts only past it, with
  * relative error ≈ 1/√(2^lgK) on unions and wider on small
  * intersections (the documented caveat the o30 gate brackets).
  *
  * theta_sketch_agg(key, lgK)  → binary compact sketch per group
  * theta_union_agg(sk, lgK)    → binary union of serialized sketches
  * theta_estimate(sk)          → double estimate
  * theta_intersect(a, b)       → binary sketch of A ∩ B
  * theta_a_not_b(a, b)         → binary sketch of A ∖ B
  *
  * The aggregation buffer is a theta Union (it accepts BOTH raw key
  * updates and sketch merges, and serializes losslessly — the
  * round-trip TypedImperativeAggregate needs between partials). */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union] {
  def lgK: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  override def merge(buffer: Union, input: Union): Union = {
    buffer.union(input.getResult())
    buffer
  }
  override def eval(buffer: Union): Any = {
    val r = buffer.getResult()
    if (r.isEmpty) null else r.toByteArray
  }
  override def serialize(buffer: Union): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]
}

/** Fold raw long keys into one theta sketch per group. */
final case class ThetaSketchAgg(
    child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "theta_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg expects BIGINT, got ${child.dataType.catalogString}")

  override def update(buffer: Union, input: org.apache.spark.sql.catalyst.InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = c.head)
}

/** Union previously-serialized compact sketches (the stored-table path). */
final case class ThetaUnionAgg(
    child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "theta_union_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects BINARY, got ${child.dataType.catalogString}")

  override def update(buffer: Union, input: org.apache.spark.sql.catalyst.InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = c.head)
}

final case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate expects BINARY, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(sk: Any): Any =
    ThetaSketchFns.estimate(sk.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ThetaSketchFns$$.MODULE$$.estimate($s);")
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

abstract class ThetaBinarySetOp extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, BINARY), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
}

final case class ThetaIntersect(left: Expression, right: Expression)
    extends ThetaBinarySetOp {
  override def prettyName: String = "theta_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketchFns.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ThetaSketchFns$$.MODULE$$.intersect($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersect =
    copy(left = l, right = r)
}

final case class ThetaANotB(left: Expression, right: Expression)
    extends ThetaBinarySetOp {
  override def prettyName: String = "theta_a_not_b"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketchFns.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ThetaSketchFns$$.MODULE$$.aNotB($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotB =
    copy(left = l, right = r)
}

object ThetaSketchFns {
  private def heap(b: Array[Byte]) =
    Sketches.heapifyCompactSketch(Memory.wrap(b))

  def estimate(sk: Array[Byte]): Double = heap(sk).getEstimate

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildIntersection()
      .intersect(heap(a), heap(b)).toByteArray

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(heap(a), heap(b)).toByteArray

  private def litK(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn lgK must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def agg2(name: String, clazz: Class[_],
      mk: (Expression, Int) => TypedImperativeAggregate[Union])
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"$name expects 2 arguments, got ${children.size}")
      mk(children.head, litK(children(1), name)).toAggregateExpression()
    })

  private def scalar(name: String, clazz: Class[_], n: Int,
      mk: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.size == n, s"$name expects $n arguments, got ${children.size}")
      mk(children)
    })

  private[functions] val sketchAggDescriptor =
    agg2("theta_sketch_agg", classOf[ThetaSketchAgg], ThetaSketchAgg(_, _))
  private[functions] val unionAggDescriptor =
    agg2("theta_union_agg", classOf[ThetaUnionAgg], ThetaUnionAgg(_, _))
  private[functions] val estimateDescriptor =
    scalar("theta_estimate", classOf[ThetaEstimate], 1, c => ThetaEstimate(c.head))
  private[functions] val intersectDescriptor =
    scalar("theta_intersect", classOf[ThetaIntersect], 2, c => ThetaIntersect(c.head, c(1)))
  private[functions] val aNotBDescriptor =
    scalar("theta_a_not_b", classOf[ThetaANotB], 2, c => ThetaANotB(c.head, c(1)))
}

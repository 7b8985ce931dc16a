package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable QUANTILE sketches as custom Catalyst aggregates — the
  * percentile counterpart of the built-in HLL sketch functions, which
  * Spark does not expose in SQL: `approx_percentile` answers one
  * in-flight query but its sketch can neither persist nor merge across
  * stored generations. These wrap the datasketches KLL doubles sketch
  * (already on Spark's classpath — the same library behind
  * hll_sketch_agg) as TypedImperativeAggregates, so a per-day sketch
  * TABLE persists to parquet (binary column) and any date-range
  * quantile is one union over the stored rows — the o28/o29 sketch-
  * table discipline, never an event re-scan. KLL guarantees a
  * NORMALIZED RANK error ε(k): the returned value's true rank is
  * within q ± ε, which is the bound the o29 contract gate checks
  * against exact percentiles on both engines.
  *
  * kll_sketch_agg(value, k)   → binary serialized KllDoublesSketch
  * kll_union_agg(sketch, k)   → binary union of serialized sketches
  * kll_quantile(sketch, q)    → double value at normalized rank q
  */
abstract class KllAggBase
    extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(buffer: KllDoublesSketch, input: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(input); buffer
  }
  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Fold raw double values into one KLL sketch per group. */
final case class KllSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg expects DOUBLE, got ${child.dataType.catalogString}")

  override def update(buffer: KllDoublesSketch, input: org.apache.spark.sql.catalyst.InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = c.head)
}

/** Union previously-serialized KLL sketches (the stored-table path). */
final case class KllUnionAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_union_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_union_agg expects BINARY, got ${child.dataType.catalogString}")

  override def update(buffer: KllDoublesSketch, input: org.apache.spark.sql.catalyst.InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }
  override def withNewMutableAggBufferOffset(n: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllUnionAgg =
    copy(child = c.head)
}

/** Scalar: value at normalized rank q (INCLUSIVE criteria) from a
  * serialized sketch. */
final case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile expects (BINARY, DOUBLE), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(sk: Any, q: Any): Any =
    KllSketchFns.quantile(sk.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, q) =>
      s"${ev.value} = graft.functions.KllSketchFns$$.MODULE$$.quantile($s, $q);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}

object KllSketchFns {
  def quantile(bytes: Array[Byte], q: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
      .getQuantile(q, QuantileSearchCriteria.INCLUSIVE)

  private def litK(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      require(other.foldable, s"$fn k must be a literal")
      other.eval().asInstanceOf[Number].intValue()
  }

  private[functions] val sketchAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_sketch_agg"),
    new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"kll_sketch_agg expects (value, k), got ${children.size} args")
      KllSketchAgg(children.head, litK(children(1), "kll_sketch_agg"))
        .toAggregateExpression()
    })

  private[functions] val unionAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_union_agg"),
    new ExpressionInfo(classOf[KllUnionAgg].getName, "kll_union_agg"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"kll_union_agg expects (sketch, k), got ${children.size} args")
      KllUnionAgg(children.head, litK(children(1), "kll_union_agg"))
        .toAggregateExpression()
    })

  private[functions] val quantileDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_quantile"),
    new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"kll_quantile expects (sketch, q), got ${children.size} args")
      KllQuantile(children.head, children(1))
    })
}

package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert index of two 16-bit bucket ids as a native Catalyst
  * expression with codegen — the kernel behind the Hilbert layout
  * ([[graft.ops.HilbertOrder]]).
  *
  * The rotate/reflect recurrence needs per-row loop state (x and y
  * mutate every iteration), so the pure-Column spelling unrolls it into
  * 16 chained projections — correct, but it materializes 3 columns per
  * step and measured 13 s at the sf1 key build. This expression runs
  * the identical 16 iterations as ONE tight generated-Java loop inside
  * whole-stage codegen: no intermediate columns, no extra projections.
  * [[graft.ops.HilbertOrder.withHilbertKey]] (the Column spelling)
  * stays as the cross-check — HilbertOrderSpec pins expression ≡
  * projection chain ≡ the reference xy2d recursion on a full grid, and
  * the o27 DuckDB oracle replays the same steps as a CTE chain.
  *
  * Inputs must already be bucket ids in [0, 2^16) ([[graft.ops.ZOrder
  * .bucket]]'s contract); bits beyond the 16th are ignored by the bit
  * tests, exactly as in the Column spelling.
  */
final case class HilbertIndex2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hilbert2 expects (BIGINT, BIGINT), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex2.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xc, yc) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xc; long $y = $yc; long $d = 0L;
         |for (long $s = ${1L << (HilbertIndex2.Bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2 =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2 {
  /** Bits per dimension — must match [[graft.ops.HilbertOrder.DimBits]]. */
  val Bits: Int = 16

  /** Reference recursion (also the interpreted eval path). */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (Bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private[functions] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert2"),
    new ExpressionInfo(classOf[HilbertIndex2].getName, "hilbert2"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"hilbert2 expects exactly 2 arguments, got ${children.size}")
      HilbertIndex2(children.head, children(1))
    })
}

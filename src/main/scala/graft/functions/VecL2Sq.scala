package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._

/** Squared L2 distance between a float vector and a double vector
  * (typically a literal centroid), accumulated in double left-to-right —
  * the assignment kernel of k-means and IVF cell probing.
  *
  * Replaces the HOF spelling
  * `aggregate(zip_with(x.cast("array<double>"), c, (x,c) -> (x-c)*(x-c)), 0d, (a,v) -> a+v)`
  * with one fused codegen loop: per element d = (double)x_i − c_i,
  * acc += d·d — the SAME operations in the SAME order, so results are
  * bit-equal with the HOF spelling and the DuckDB list_reduce oracle
  * (VecL2SqSpec pins this). Length mismatch and null elements yield
  * NULL, exactly as zip_with's null-padding propagates through the sum.
  */
final case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch / null element
  override def prettyName: String = "vec_l2sq"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq expects (array<float>, array<double>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != c.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || c.isNullAt(i)) return null
        val d = x.getFloat(i).toDouble - c.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $a.getFloat($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

object VecL2Sq {
  private[functions] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_l2sq"),
    new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"vec_l2sq expects exactly 2 arguments, got ${children.size}")
      VecL2Sq(children(0), children(1))
    })
}

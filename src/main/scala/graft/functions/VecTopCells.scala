package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`nprobe` nearest-centroid cell ids for a float vector against a
  * FULL centroid matrix — the IVF coarse-quantizer assignment kernel,
  * fused into one expression.
  *
  * This replaces the per-centroid expression spelling
  * (`array_sort(array(struct(vec_l2sq(x, c0), 0), struct(..., 1), …))`)
  * whose expression tree grows as K·d literals: fine for a handful of
  * cells, but a CORPUS-SCALED quantizer (K ≈ N / targetCellSize, the
  * rule that keeps per-cell candidate counts flat as the corpus grows)
  * reaches hundreds of cells, where K separate vec_l2sq subtrees blow
  * past codegen limits and Catalyst transform budgets. Here the matrix
  * rides the plan as ONE reference object (model state, exactly like
  * [[BpeEncode]]'s merge table and the PQ codebooks) and the kernel is
  * a tight K·d loop shared verbatim by eval and codegen.
  *
  * Arithmetic is bit-identical to [[VecL2Sq]] (per element
  * d = (double)x_i − c_i, acc += d·d, left-to-right), and the tie rule
  * is (distance asc, cell id asc) — the same total order the
  * `array_sort(struct(d2, cid))` spelling and the DuckDB
  * `row_number() OVER (ORDER BY d2, cell)` oracle produce, so swapping
  * the spelling cannot move a hash. Null element or a centroid/vector
  * length mismatch yields NULL (the [[VecL2Sq]] contract). Fewer than
  * `nprobe` centroids return all K ids in order.
  */
final case class VecTopCells(child: Expression, cents: Seq[Seq[Double]],
    nprobe: Int) extends UnaryExpression {

  require(cents.nonEmpty, "vec_top_cells needs at least one centroid")
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_top_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_top_cells expects array<float>, got ${t.catalogString}")
  }

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    VecTopCellsImpl.topCells(input.asInstanceOf[ArrayData], matrix, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centMatrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("cells")
      s"""
         |ArrayData $res = graft.functions.VecTopCellsImpl.topCells(
         |  $c, $matRef, $nprobe);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecTopCells =
    copy(child = newChild)
}

object VecTopCells {
  /** Column builder (no function-registry round trip — the centroid
    * matrix is per-call model state, not a session-global function). */
  def cells(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    org.apache.spark.sql.graft.PlanBridge.column(
      VecTopCells(org.apache.spark.sql.graft.PlanBridge.expression(vec),
        cents.map(_.toSeq).toSeq, nprobe))
}

object VecTopCellsImpl {

  /** The shared kernel: distances to every centroid, maintaining the
    * top-`nprobe` list by (d2 asc, cid asc) with a small insertion
    * buffer (nprobe is 1–2 in every caller — no heap needed). Returns
    * null on a null element or dimension mismatch. */
  def topCells(a: ArrayData, cents: Array[Array[Double]], np0: Int): ArrayData = {
    val k = cents.length
    val np = if (np0 < k) np0 else k
    val n = a.numElements()
    val bd = new Array[Double](np)
    val bc = new Array[Int](np)
    var filled = 0
    var cid = 0
    while (cid < k) {
      val c = cents(cid)
      if (c.length != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val d = a.getFloat(i).toDouble - c(i)
        acc += d * d
        i += 1
      }
      // insertion position among the filled entries; a tie keeps the
      // earlier (smaller) cid in front because `cid < bc(p-1)` is
      // false for the ascending scan
      var p = filled
      while (p > 0 && (acc < bd(p - 1) ||
          (acc == bd(p - 1) && cid < bc(p - 1)))) p -= 1
      if (p < np) {
        val lim = if (filled < np - 1) filled else np - 1
        var j = lim
        while (j > p) { bd(j) = bd(j - 1); bc(j) = bc(j - 1); j -= 1 }
        bd(p) = acc
        bc(p) = cid
        if (filled < np) filled += 1
      }
      cid += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bc, filled))
  }
}

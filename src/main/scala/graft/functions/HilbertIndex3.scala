package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 3-D Hilbert index of three 21-bit bucket ids — the locality layout
  * key for (time, entity, domain) fact tables, completing the layout
  * matrix next to [[HilbertIndex2]] (2-D) and `ZOrder.interleave21x3`
  * (3-D Morton): the Hilbert walk visits all 2^63 cells through
  * 6-neighbor unit steps only (HilbertOrder3Spec pins unit-step +
  * bijectivity exhaustively at 3 bits/dim and samples at 21), so equal
  * key ranges cover tighter boxes than Morton's quadrant jumps — fewer
  * row groups intersect a 3-dim predicate at the same file count.
  *
  * Algorithm: Skilling's transposed-Hilbert walk ("Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004 — public): undo the
  * excess-work exchanges top-bit-down, Gray-encode across dimensions,
  * then interleave the transposed words (X[0] carries each 3-bit
  * group's high bit). Everything is long bit-math in one static JVM
  * call per row from generated code — no intermediate columns, stays
  * inside whole-stage codegen (the 2-D kernel's lesson: the unrolled
  * Column spelling materializes 3 columns × bits projections and
  * measured 13 s vs sub-second at the sf1 key build).
  *
  * Inputs must already be bucket ids in [0, 2^21) (`ZOrder.bucket`'s
  * contract, bits = DimBits3); bits beyond the 21st are masked off.
  */
final case class HilbertIndex3(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert3 expects (BIGINT, BIGINT, BIGINT), got " +
        children.map(_.dataType.catalogString).mkString("(", ", ", ")"))

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    HilbertIndex3.xyz2d(x.asInstanceOf[Long], y.asInstanceOf[Long],
      z.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xc, yc, zc) =>
      s"${ev.value} = graft.functions.HilbertIndex3$$.MODULE$$.xyz2d($xc, $yc, $zc);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HilbertIndex3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertIndex3 {
  /** Bits per dimension: 21 → a 63-bit key, the same key space as
    * `ZOrder.interleave21x3`. */
  val Bits: Int = 21

  private val Mask: Long = (1L << Bits) - 1

  /** Axes → Hilbert index at 21 bits/dim — the expression's kernel. */
  def xyz2d(xIn: Long, yIn: Long, zIn: Long): Long =
    xyz2d(xIn, yIn, zIn, Bits)

  /** Axes → Hilbert index (Skilling forward transform + interleave),
    * parameterized bits for the spec's exhaustive small-grid gates. */
  def xyz2d(xIn: Long, yIn: Long, zIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = xIn & mask
    var y = yIn & mask
    var z = zIn & mask
    // inverse-undo the excess work, top bit down to bit 1; dim 0's own
    // exchange with X[0] is the identity, so only its invert remains
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1L) {
      val p = q - 1L
      if ((x & q) != 0L) x ^= p
      if ((y & q) != 0L) x ^= p
      else { val t = (x ^ y) & p; x ^= t; y ^= t }
      if ((z & q) != 0L) x ^= p
      else { val t = (x ^ z) & p; x ^= t; z ^= t }
      q >>= 1
    }
    // Gray-encode across dimensions
    y ^= x
    z ^= y
    var t = 0L
    q = m
    while (q > 1L) {
      if ((z & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    x ^= t; y ^= t; z ^= t
    // interleave the transposed words: bit k of (x,y,z) → bits
    // (3k+2, 3k+1, 3k) — x carries each group's high bit
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      d = (d << 3) |
        (((x >> k) & 1L) << 2) | (((y >> k) & 1L) << 1) | ((z >> k) & 1L)
      k -= 1
    }
    d
  }

  /** Hilbert index → axes (Skilling inverse) — the spec's round-trip /
    * unit-step reference; returns (x, y, z). */
  def d2xyz(d: Long, bits: Int = Bits): (Long, Long, Long) = {
    // de-interleave into the transposed words
    var x = 0L; var y = 0L; var z = 0L
    var k = 0
    while (k < bits) {
      x |= ((d >> (3 * k + 2)) & 1L) << k
      y |= ((d >> (3 * k + 1)) & 1L) << k
      z |= ((d >> (3 * k)) & 1L) << k
      k += 1
    }
    // Gray decode
    val t0 = z >> 1
    z ^= y
    y ^= x
    x ^= t0
    // redo the excess work, bit 1 up to the top bit, dims in reverse
    val m = 1L << (bits - 1)
    var q = 2L
    while (q <= m) {
      val p = q - 1L
      if ((z & q) != 0L) x ^= p
      else { val u = (x ^ z) & p; x ^= u; z ^= u }
      if ((y & q) != 0L) x ^= p
      else { val u = (x ^ y) & p; x ^= u; y ^= u }
      if ((x & q) != 0L) x ^= p
      q <<= 1
    }
    (x, y, z)
  }

  private[functions] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert3"),
    new ExpressionInfo(classOf[HilbertIndex3].getName, "hilbert3"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        s"hilbert3 expects exactly 3 arguments, got ${children.size}")
      HilbertIndex3(children.head, children(1), children(2))
    })
}

package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document 32-bit SimHash in ONE pass, as a native Catalyst
  * expression — the same fusion story as [[MinHashSig]]: the composable
  * spelling (explode words → md5 → groupBy doc with 32 signed-vote
  * sums) materializes one row PER WORD and pays a full shuffle with 32
  * aggregate columns to reassemble per-document hashes. A document's
  * SimHash is a pure scalar function of its text, so this expression
  * fuses split → hash → bit-vote into a tight per-row loop: the
  * signature stage becomes map-side only ahead of the byte-band
  * candidate join.
  *
  * Determinism contract (bit-equal with the aggregate spelling and the
  * DuckDB oracle in DedupQueries.dedup_simhash): word ids are the same
  * 60-bit md5-prefix integers as Shingles.h60, the vote for bit j is
  * sum over words of 2·((h>>j)&1)−1 — duplicate words vote once per
  * occurrence, exactly like the explode spelling — and bit j is set
  * iff the vote is strictly positive. Empty tokens are kept
  * (split(text, ' ') semantics); null text → null.
  */
final case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects STRING, got ${child.dataType.catalogString}")

  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHash32Impl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32Impl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Static kernel shared by the interpreted and codegen paths. */
object SimHash32Impl {

  def compute(text: UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    val votes = new Array[Int](32)
    val md = MinHashSigImpl.borrowDigest()
    var i = 0
    while (i < words.length) {
      md.reset()
      val dig = md.digest(words(i).getBytes(StandardCharsets.UTF_8))
      // 60-bit id = first 15 hex chars (7 bytes + high nibble of the 8th)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = (h << 4) | ((dig(7) & 0xf0L) >> 4)
      var j = 0
      while (j < 32) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }
}

object SimHash32 {
  private[functions] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash32"),
    new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        s"simhash32 expects exactly 1 argument, got ${children.size}")
      SimHash32(children.head)
    })
}

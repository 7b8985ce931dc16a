package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word-trigram statistics [total, distinct] in one pass —
  * the kernel of the repetition quality filter.
  *
  * Same fusion argument as [[MinHashSig]]: the counts are a scalar
  * function of the text, so computing them per row removes the gram
  * explode AND the countDistinct rewrite (which expands into two
  * aggregates with an extra exchange). Distinctness is over the exact
  * gram STRINGS — identical semantics to `count(DISTINCT gram)` in
  * both engines, no hash-collision caveat. Documents with fewer than
  * 3 words → null.
  *
  * Memory envelope: the per-row gram set is O(distinct grams) ≈ a
  * small multiple of the document length — the same order as the row
  * itself, which is already resident in executor memory, but with no
  * spill path (the explode+countDistinct spelling could spill). A
  * corpus with multi-hundred-MB single documents should length-cap
  * upstream (as every quality filter here does) or keep the
  * aggregate spelling for that stage.
  */
final case class TrigramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null when < 3 words

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"trigram_stats expects STRING, got ${child.dataType.catalogString}")

  override def prettyName: String = "trigram_stats"

  override protected def nullSafeEval(input: Any): Any =
    TrigramStatsImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("stats")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $arr =
         |  graft.functions.TrigramStatsImpl.compute($c);
         |if ($arr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $arr;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TrigramStats =
    copy(child = newChild)
}

object TrigramStatsImpl {
  /** @return [n_grams, n_distinct] or null for < 3 words */
  def compute(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1) // split(text,' ') semantics
    if (words.length < 3) return null
    val seen = new java.util.HashSet[String]()
    var total = 0L
    var i = 0
    while (i + 2 < words.length) {
      seen.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
      total += 1
      i += 1
    }
    new GenericArrayData(Array(total, seen.size.toLong))
  }
}

object TrigramStats {
  private[functions] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("trigram_stats"),
    new ExpressionInfo(classOf[TrigramStats].getName, "trigram_stats"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        s"trigram_stats expects exactly 1 argument, got ${children.size}")
      TrigramStats(children.head)
    })
}

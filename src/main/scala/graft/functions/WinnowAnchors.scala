package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint anchors (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * as a native Catalyst expression: for every window of `win`
  * consecutive L-gram start positions in `text`, select the
  * rightmost-minimal gram, and return the DISTINCT selected anchors as
  * sortable keys `gram ∥ lpad(10⁹ − p, 10, '0')` (min key = (min gram,
  * max p) — the rightmost tie-break that makes the selection
  * content-defined, so two copies of a duplicated run select
  * corresponding anchors regardless of alignment).
  *
  * Why an expression and not Column combinators: the obvious
  * higher-order-function spelling (`transform(sequence(1,nG), w ->
  * array_min(slice(ks, w, s)))` over a per-row key array) re-evaluates
  * the O(n·L) key-array subexpression once per window element — Spark
  * inlines the projection into the lambda and does no loop-invariant
  * hoisting — turning the per-doc cost into O(n²·L): measured 150 s vs
  * 0.8 s for the exact twin on the sf0.001 corpus. The explode +
  * doc-window spelling is linear but shuffles every gram start on
  * doc_id first. This kernel computes the whole anchor set DOC-LOCALLY
  * in one monotonic-deque sliding-window-minimum pass — O(n·L) compare
  * work, O(n) deque ops — inside whole-stage codegen, so only the
  * ~2n/(s+1) expected anchors ever leave the scan stage.
  *
  * Position/char semantics are 1-based Java chars (UTF-16 code units),
  * matching Spark `substring` and DuckDB `substr` on BMP text; key
  * order is char-wise, which coincides with DuckDB's byte-wise UTF-8
  * collation on ASCII corpora (the documents tables are ASCII — the
  * strided-spans oracle replays this selection exactly).
  */
final case class WinnowAnchors(child: Expression, gramLen: Int, win: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_anchors"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_anchors expects STRING, got ${child.dataType.catalogString}")
    else if (gramLen < 1 || win < 1)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_anchors expects gramLen ≥ 1 and window ≥ 1, got ($gramLen, $win)")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    WinnowAnchors.compute(input.asInstanceOf[UTF8String], gramLen, win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowAnchors$$.MODULE$$" +
        s".compute($c, $gramLen, $win);")

  override protected def withNewChildInternal(newChild: Expression): WinnowAnchors =
    copy(child = newChild)
}

object WinnowAnchors {

  /** One pass over the text: sliding-window minimum (monotonic deque)
    * over the gram-key sequence, windows = every gram start w with
    * extent [w, min(w+win−1, nG)] (tail windows clamp, selecting a few
    * extra anchors — harmless superset, and exactly what the oracle's
    * `ROWS BETWEEN CURRENT ROW AND win−1 FOLLOWING` computes). Deque
    * keys are strictly increasing head→tail; keys never tie because the
    * position suffix is unique, so the comparator resolves gram ties to
    * the larger position (rightmost). */
  def compute(text: UTF8String, l: Int, win: Int): ArrayData = {
    val t = text.toString
    val n = t.length
    if (n < l) return new GenericArrayData(Array.empty[Any])
    val nG = n - l + 1

    // k(a) < k(b): gram(a) < gram(b), ties → a > b (rightmost wins)
    def kLt(a: Int, b: Int): Boolean = {
      var i = 0
      while (i < l) {
        val c = t.charAt(a - 1 + i) - t.charAt(b - 1 + i)
        if (c != 0) return c < 0
        i += 1
      }
      a > b
    }

    val dq = new Array[Int](nG)
    var head = 0
    var tail = 0 // live deque slice is dq[head, tail)
    var r = 0    // highest position pushed so far
    var last = -1
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var w = 1
    while (w <= nG) {
      val e = math.min(w + win - 1, nG)
      while (r < e) {
        r += 1
        while (tail > head && kLt(r, dq(tail - 1))) tail -= 1
        dq(tail) = r
        tail += 1
      }
      while (dq(head) < w) head += 1
      val a = dq(head)
      if (a != last) {
        last = a
        out += UTF8String.fromString(
          t.substring(a - 1, a - 1 + l) + f"${1000000000 - a}%010d")
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  private[functions] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_anchors"),
    new ExpressionInfo(classOf[WinnowAnchors].getName, "winnow_anchors"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        s"winnow_anchors expects exactly 3 arguments, got ${children.size}")
      require(children(1).foldable && children(2).foldable,
        "winnow_anchors gramLen and window must be literals")
      val l = children(1).eval().asInstanceOf[Number].intValue()
      val w = children(2).eval().asInstanceOf[Number].intValue()
      WinnowAnchors(children.head, l, w)
    })
}

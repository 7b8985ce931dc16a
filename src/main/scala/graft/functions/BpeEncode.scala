package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge list to a text column: split on spaces,
  * tokenize each word by repeatedly applying the LOWEST-RANK applicable
  * merge (left-to-right, non-overlapping — the standard BPE application
  * rule), emit all tokens as one array<string>.
  *
  * This is the corpus-wide half of [[graft.ops.BpeTrain]]: training
  * touches the corpus once to build word counts; ENCODING is this
  * map-side expression — zero shuffle, whole-stage codegen via a static
  * kernel call, the merge table riding along as an expression reference
  * object (model state in the plan, exactly like the literal centroids
  * on the IVF path). A UDF spelling would carry the same table but
  * break codegen; an explode+join spelling would shuffle the corpus
  * per merge rank.
  *
  * Kernel cost per word is O(len · merges-applied), the same loop every
  * BPE implementation runs; the merge table lookup is O(1) per adjacent
  * pair via a rank hash map.
  */
final case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects STRING, got ${child.dataType.catalogString}")

  override def prettyName: String = "bpe_encode"

  @transient private lazy val table = BpeEncodeImpl.buildTable(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeImpl.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncodeImpl.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncodeImpl.encode($c, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Column builder (no function-registry round trip — the merge list
    * is per-call model state, not a session-global function). */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.PlanBridge.column(
      BpeEncode(org.apache.spark.sql.graft.PlanBridge.expression(text), merges))
}

object BpeEncodeImpl {

  /** Merge ranks keyed by "left right" (symbols never contain spaces:
    * words are split on space before any merge). Serializable — it is
    * shipped inside the expression to every task. */
  final class MergeTable(val ranks: java.util.HashMap[String, Integer])
      extends Serializable

  def buildTable(merges: Seq[(String, String)]): MergeTable = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, Integer.valueOf(i))
    }
    new MergeTable(m)
  }

  def encode(text: UTF8String, table: MergeTable): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) encodeWord(word, table, out)
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(word: String,
      table: MergeTable,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var syms: Array[String] = word.toCharArray.map(_.toString)
    var continue = syms.length > 1
    while (continue) {
      // lowest-rank applicable merge
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = table.ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        // apply that one merge left-to-right, non-overlapping
        val key = bestRank
        val next = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && {
            val r = table.ranks.get(syms(j) + " " + syms(j + 1))
            r != null && r == key
          }) { next += syms(j) + syms(j + 1); j += 2 }
          else { next += syms(j); j += 1 }
        }
        syms = next.result()
        continue = syms.length > 1
      }
    }
    var k = 0
    while (k < syms.length) { out += UTF8String.fromString(syms(k)); k += 1 }
  }
}

package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature in ONE pass: 8 minhashes over the
  * word-trigram shingle set, as a native Catalyst expression.
  *
  * Why: the composable spelling (posexplode trigrams → md5 → groupBy
  * doc with 8 min() aggregates) materializes one row PER GRAM and pays
  * a full shuffle to reassemble per-document signatures. A document's
  * signature is a pure scalar function of its text, so this expression
  * fuses shingle → hash → running-min into a tight per-row loop: no
  * explode, no exchange — the signature stage becomes map-side only,
  * which is the difference between one shuffle and zero shuffles ahead
  * of the LSH band join at 100 TB.
  *
  * Determinism contract (oracle-compatible): gram ids are the SAME
  * 60-bit md5-prefix integers as Shingles.h60 / the DuckDB oracle
  * (first 15 hex chars of md5 = first 7 bytes + high nibble of the
  * 8th), the "permutations" are the same XOR seeds, and word splitting
  * matches split(text, ' ') with limit -1 (trailing empties kept).
  * Documents with fewer than 3 words have no shingles → null.
  */
final case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null when < 3 words

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects STRING, got ${child.dataType.catalogString}")

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $arr =
         |  graft.functions.MinHashSigImpl.compute($c);
         |if ($arr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $arr;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Static kernel shared by the interpreted and codegen paths (the
  * generated Java calls the static forwarder directly). */
object MinHashSigImpl {

  /** XOR-permutation seeds — MUST stay identical to the oracle SQL in
    * DedupQueries.dedup_minhash_lsh and to ops.DedupDocs. */
  val Seeds: Array[Long] = Array(
    0x9E3779B97F4A7C1L, 0x6A09E667F3BCC90L, 0xBB67AE8584CAA73L, 0x3C6EF372FE94F82L,
    0xA54FF53A5F1D36FL, 0x510E527FADE682DL, 0x9B05688C2B3E6C1L, 0x1F83D9ABFB41BD6L)

  // one digest instance per task thread — a per-row getInstance() pays a
  // JCA provider lookup + allocation on every document
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Shared per-thread digest for sibling md5-kernel expressions
    * (SimHash32) — same rationale: no per-row getInstance(). */
  private[functions] def borrowDigest(): MessageDigest = digest.get()

  def compute(text: UTF8String): ArrayData = {
    // split(text, ' ') semantics: limit -1 keeps trailing empty tokens
    val words = text.toString.split(" ", -1)
    if (words.length < 3) return null
    val mins = Array.fill(Seeds.length)(Long.MaxValue)
    val md = digest.get()
    var i = 0
    while (i + 2 < words.length) {
      val gram = words(i) + " " + words(i + 1) + " " + words(i + 2)
      md.reset()
      val dig = md.digest(gram.getBytes(StandardCharsets.UTF_8))
      // 60-bit id = first 15 hex chars of the digest: 7 full bytes plus
      // the high nibble of the 8th (== Shingles.h60 / DuckDB spelling)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = (h << 4) | ((dig(7) & 0xf0L) >> 4)
      var j = 0
      while (j < Seeds.length) {
        val v = h ^ Seeds(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashSig {
  private[functions] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        s"minhash_sig expects exactly 1 argument, got ${children.size}")
      MinHashSig(children.head)
    })
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object CharStatsKernels {

  /** One-pass alphanumeric character histogram summary of a document:
    * count occurrences of each of the 36 ASCII alphanumerics
    * (`a-z` case-folded, `0-9`) and return
    * `[n, Σ cᵢ²]` where `n = Σ cᵢ` — the two integer moments the
    * Simpson-diversity quality signal needs (`1 − Σcᵢ²/n²`).
    *
    * Byte-exact contract: only ASCII bytes are counted; multi-byte
    * UTF-8 sequences are ≥ 0x80 per byte and fall through, so the scan
    * is codepoint-safe on any input and EQUAL to the oracle's
    * `regexp_replace(lower(text), '[^a-z0-9]', '')` counting on ASCII
    * corpora (full-Unicode case folding that lands in a-z, e.g.
    * U+212A KELVIN SIGN → k, is deliberately out of contract — the
    * oracle twin and this kernel must disagree on nothing, so the
    * contract is ASCII, which TESTDATA.md's corpus satisfies at every
    * SF).
    *
    * Both moments are exact integers (no accumulation-order issue, no
    * float summation) — the single IEEE division happens once, at the
    * end, in the query, on identical operands in both engines.
    */
  def alnumSq(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val counts = new Array[Long](36)
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
      else if (b >= 'A' && b <= 'Z') counts(b - 'A') += 1
      else if (b >= '0' && b <= '9') counts(26 + (b - '0')) += 1
      i += 1
    }
    var total = 0L
    var sq = 0L
    var c = 0
    while (c < 36) {
      total += counts(c)
      sq += counts(c) * counts(c)
      c += 1
    }
    new GenericArrayData(Array[Any](total, sq))
  }
}

/** Native alphanumeric-moments expression — the per-document kernel of
  * the character-diversity quality signal (q85). The composed
  * alternative (explode characters → groupBy(doc, char) → squares)
  * multiplies the row count by document length and pays a corpus-wide
  * exchange; this is a single generated call, zero shuffle, inside
  * whole-stage codegen.
  */
case class AlnumSqStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"alnum_sq_stats requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    CharStatsKernels.alnumSq(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CharStatsKernels.alnumSq($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

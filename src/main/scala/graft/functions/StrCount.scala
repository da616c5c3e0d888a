package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.classic.ClassicConversions
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper invoked from both interpreted eval and generated code. */
object StrCount {
  /** Non-overlapping substring occurrence count — the exact semantics of
    * Python `str.count` used by the reference's keyword term-frequency
    * scoring (04_tag_text_contracts.py:118, 07_keyword_tag&filter_tables
    * .py:130, 09_clean_tables.py:238): "aaaa".count("aa") == 2.
    * Empty needle => 0 (the reference never calls it with one).
    * Operates on UTF8String bytes — needle/haystack are well-formed UTF-8
    * so byte-wise search equals codepoint-wise search.
    */
  def count(text: UTF8String, kw: UTF8String): Long = {
    val n = kw.numBytes()
    if (n == 0) return 0L
    // MEASURED trade (round 7, q09 sf0.1 isolated warm): getBytes
    // copies the haystack per call, but the subsequent scan is a tight
    // primitive array loop the JIT bounds-check-eliminates — 0.49 s.
    // The zero-copy alternative (a UTF8String.find loop over the
    // string's own memory) was tried and measured 1.1-1.2 s: per-
    // position matchAt/arrayEquals dispatch costs more than the copy
    // saves at document sizes. Keep the copy; do not "fix" it again
    // without re-measuring.
    val hay = text.getBytes
    val needle = kw.getBytes
    var i = 0
    var c = 0L
    val limit = hay.length - n
    while (i <= limit) {
      var j = 0
      while (j < n && hay(i + j) == needle(j)) j += 1
      if (j == n) { c += 1; i += n } else i += 1
    }
    c
  }
}

/** Catalyst expression for non-overlapping substring counting.
  *
  * A native `Expression` (not a Scala UDF) so it participates in
  * whole-stage codegen: the generated code calls the static
  * [[StrCount.count]] with no boxing, no serialization, and no codegen
  * fallback — this sits in the hot path of the term-frequency operator
  * (SURVEY.md §2.4 A1) which at 100 TB runs once per (document ×
  * keyword).
  */
case class CountOccurrences(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "count_occurrences requires two STRING arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(text: Any, kw: Any): Any =
    StrCount.count(text.asInstanceOf[UTF8String], kw.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.StrCount.count($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Functions {

  /** Single source of truth for graft's native functions: (name,
    * implementing class, builder). Consumed by BOTH [[register]] (the
    * imperative session path) and [[GraftExtensions]] (the
    * SparkSessionExtensions path) so the two can never drift. */
  /** Builders validate arity up front: an over-arity call must fail
    * analysis, not silently drop arguments (minhash_sig(text, 7) would
    * otherwise "work" at the hardcoded width); under-arity must read
    * as a clear error, not an IndexOutOfBoundsException. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == n,
        s"$name expects exactly $n argument(s), got ${es.length}")
      build(es)
    }

  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("count_occurrences", classOf[CountOccurrences],
      arity("count_occurrences", 2)(e => CountOccurrences(e(0), e(1)))),
    ("vec_dot", classOf[FloatDot],
      arity("vec_dot", 2)(e => FloatDot(e(0), e(1)))),
    ("minhash_sig", classOf[MinhashSig],
      arity("minhash_sig", 1)(e => MinhashSig(e(0)))),
    ("topk_neighbors", classOf[TopKNeighbors],
      arity("topk_neighbors", 2)(e =>
        TopKNeighbors(e(0), e(1)).toAggregateExpression())),
    ("bigram_set", classOf[BigramSet],
      arity("bigram_set", 1)(e => BigramSet(e(0)))),
    ("alnum_sq_stats", classOf[AlnumSqStats],
      arity("alnum_sq_stats", 1)(e => AlnumSqStats(e(0)))),
    ("legacy_attachments", classOf[graft.crz.LegacyAttachments],
      arity("legacy_attachments", 1)(e =>
        graft.crz.LegacyAttachments(e(0)))))

  /** Idempotently register graft's native expressions with a session's
    * FunctionRegistry (also makes them usable from spark.sql text). */
  def register(s: SparkSession): Unit = {
    val registry =
      ClassicConversions.castToImpl(s).sessionState.functionRegistry
    all.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Column-API surface for [[CountOccurrences]]; requires
    * [[register]] to have been called on the session. */
  def countOccurrences(text: Column, kw: Column): Column =
    call_function("count_occurrences", text, kw)
}

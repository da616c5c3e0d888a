package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static kernel shared by interpreted eval and generated code. */
object VecKernels {
  /** Dot product of two float vectors, accumulated in double strictly
    * left-to-right — the same IEEE addition order as a left fold, so
    * results are bit-identical to DuckDB's `list_reduce` oracle
    * formulation. Tight primitive loop over columnar ArrayData: no
    * boxing, no per-element expression dispatch. Callers ([[FloatDot]])
    * null out mismatched lengths and null elements BEFORE this runs,
    * so the loop stays branch-free on validity.
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var i = 0
    var s = 0.0d
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** True if any element is SQL NULL — the pre-check that keeps
    * [[dotF]] primitive (no boxed return) while the expression still
    * propagates NULL like the zip_with/list_zip twins do. */
  def anyNull(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }
}

/** Native dot-product expression over Array[Float] columns — the hot
  * kernel of the similarity-search operators (SURVEY.md §7.1.8 /
  * BASELINE.json north-star). A flat per-element expression tree falls
  * out of whole-stage codegen at 64 dims (method-size limits) and goes
  * interpreted; this stays a single generated call into a tight loop.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // a double-array argument would pass analysis and read garbage
  // through getFloat (4 bytes of each 8-byte slot) — fail at analysis
  // like the package's other expressions, never silently mis-read
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_dot requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  // NULL on length mismatch or null elements (the zip_with / DuckDB
  // list_zip convention: a missing pairing poisons the fold) — a
  // truncated partial dot product would launder corrupt rows into
  // plausible-looking similarities
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements() ||
        VecKernels.anyNull(aa) || VecKernels.anyNull(bb)) null
    else VecKernels.dotF(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements() ||
         |    graft.functions.VecKernels.anyNull($a) ||
         |    graft.functions.VecKernels.anyNull($b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VecKernels.dotF($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

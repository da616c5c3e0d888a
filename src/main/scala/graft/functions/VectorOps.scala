package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static kernel shared by interpreted eval and generated code. */
object VecKernels {
  /** Dot product of two float vectors, accumulated in double strictly
    * left-to-right — the same IEEE addition order as a left fold, so
    * results are bit-identical to DuckDB's `list_reduce` oracle
    * formulation. Tight primitive loop over columnar ArrayData: no
    * boxing, no per-element expression dispatch.
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0.0d
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
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

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.dotF($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers graft's native expressions
  * at session build time, so `spark.sql("SELECT count_occurrences(...)")`
  * works without any imperative register() call —
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *
  * or via config on any stock build:
  *
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (SURVEY.md §7.3 custom-vs-built-in: expressions are the only
  * extension point this engine needs — no custom Rule or Strategy.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("count_occurrences"),
      new ExpressionInfo(classOf[CountOccurrences].getName,
        "count_occurrences"),
      (exprs: Seq[Expression]) => CountOccurrences(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => FloatDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinhashSig(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("topk_neighbors"),
      new ExpressionInfo(classOf[TopKNeighbors].getName, "topk_neighbors"),
      (exprs: Seq[Expression]) =>
        TopKNeighbors(exprs(0), exprs(1)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("bigram_set"),
      new ExpressionInfo(classOf[BigramSet].getName, "bigram_set"),
      (exprs: Seq[Expression]) => BigramSet(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("legacy_attachments"),
      new ExpressionInfo(classOf[graft.crz.LegacyAttachments].getName,
        "legacy_attachments"),
      (exprs: Seq[Expression]) => graft.crz.LegacyAttachments(exprs(0))))
  }
}

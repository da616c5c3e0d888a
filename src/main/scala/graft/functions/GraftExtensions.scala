package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

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
  * The function list is [[Functions.all]] — the same single source the
  * imperative path uses, so the two registration routes cannot drift.
  * (SURVEY.md §7.3 custom-vs-built-in: expressions are the only
  * extension point this engine needs — no custom Rule or Strategy.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    Functions.all.foreach { case (name, cls, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
}

package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.ops.SkewOps

/** Salting changes only the shuffle layout — results must be exactly
  * the unsalted ones, and the salted join must not silently degrade to
  * a broadcast (which would make the pattern vacuous). */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation ≡ plain groupBy (exact, incl. decimal sums)") {
    val salted = SkewOps.saltedAgg(spark, sf0001)
    val plain = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(12,2)")).cast("double").as("sum_value"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted join ≡ plain join rollup, and runs as a shuffle join") {
    val salted = SkewOps.saltedJoin(spark, sf0001)
    val plain = Tables.events(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(12,2)")).cast("double").as("sum_value"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    val planText = salted.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(planText.contains("ShuffledHashJoin") ||
      planText.contains("SortMergeJoin"))
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** EXPLAIN harness behind PLANS.md "AQE skew-join vs hand salt": runs
  * the plain events⋈customer join under AQE with skewJoin enabled and
  * broadcast disabled, then the hand-salted q50 shape, printing both
  * executed plans. `runMain graft.tools.SkewProbe [sfDir]`. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .appName("skewprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, dir)
    val cu = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    println("=== PLAIN JOIN, AQE skewJoin enabled, broadcast off ===")
    val plain = ev.join(cu, ev("user_id") === cu("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    plain.collect()
    println(plain.queryExecution.executedPlan.toString.take(4000))
    println("=== HAND-SALTED q50 SHAPE ===")
    val q50 = graft.ops.SkewOps.saltedJoin(spark, dir)
    q50.collect()
    println(q50.queryExecution.executedPlan.toString.take(4000))
    println("=== PLAIN AGG vs SALTED q49 ===")
    val agg = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    agg.collect()
    println(agg.queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}

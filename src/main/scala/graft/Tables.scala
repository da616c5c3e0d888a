package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's deterministic parquet corpus (TESTDATA.md).
  *
  * One function per table; every operator takes the sf directory as a
  * parameter so the same code runs at sf0.001 (smoke), sf0.01 (oracle)
  * and sf0.1 (bench) — and, unchanged, against a 100 TB date-partitioned
  * layout (parquet scans prune partitions + push filters; see
  * SURVEY.md §1.1: the reference's pipe-CSV handoffs
  * [01_parse_xml.py:205-208, 02_filter_by_CIN.py:94] become columnar
  * parquet here).
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = p(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read it as a nanos long (legacy conf) and floor-divide to
    * micros — exactly what DuckDB's nanos→micros coercion does, keeping
    * the oracle comparison bit-identical.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = p(s, d, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")
}

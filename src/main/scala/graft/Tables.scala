package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** Normalize an events frame's `ts` column to session-zoned
    * TIMESTAMP, whatever shape the writer encoded:
    *   - nanos LONG (parquet TIMESTAMP(NANOS) read under the legacy
    *     conf): floor-divide to micros — exactly DuckDB's nanos→micros
    *     coercion, keeping the oracle comparison bit-identical;
    *   - TIMESTAMP_NTZ (parquet timestamp[us] without the
    *     adjusted-to-UTC flag): cast to TIMESTAMP. The session tz is
    *     pinned UTC everywhere (Verify/Bench/specs), so the cast
    *     attaches UTC — matching DuckDB's naive-UTC read of the same
    *     file. Streaming event-time requires TIMESTAMP, so NTZ must
    *     not leak past this point;
    *   - TIMESTAMP: already the right type.
    * ONE function shared by the batch reader and
    * [[graft.streaming.StreamOps]]'s file-source stream, so a driver
    * re-encode of the testdata breaks (at most) TablesSpec's
    * three-shape fixture, not CORRECTNESS.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(p(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")
}

package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Locks `Tables.normalizeTs` over every ts encoding the driver's
  * testdata generator has shipped so far — nanos-long (the legacy-conf
  * read of parquet TIMESTAMP(NANOS)), session-zoned TIMESTAMP, and
  * TIMESTAMP_NTZ (parquet timestamp[us] without the adjusted-to-UTC
  * flag). Each shape is written to a throwaway parquet fixture, read
  * back through the SAME reader path the engine uses, and asserted to
  * land on TimestampType with the exact UTC instant preserved. A
  * future driver re-encode to a new shape fails HERE, not in
  * CORRECTNESS.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2024-03-01T10:30:00Z in micros since epoch
  private val instantMicros = 1709289000000000L

  private def tmpDir(): String =
    Files.createTempDirectory("graft_tables_spec").toString

  private def readBack(dir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(spark.read.parquet(dir))
  }

  private def assertNormalized(dir: String): Unit = {
    val df = readBack(dir)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("id").select(unix_micros($"ts")).as[Long].head()
    assert(got == instantMicros)
  }

  test("normalizeTs: nanos-long column becomes TIMESTAMP at micros") {
    val dir = tmpDir()
    Seq((1L, instantMicros * 1000L)).toDF("id", "ts")
      .write.mode("overwrite").parquet(dir)
    assertNormalized(dir)
  }

  test("normalizeTs: TIMESTAMP column passes through unchanged") {
    val dir = tmpDir()
    Seq((1L, new Timestamp(instantMicros / 1000L))).toDF("id", "ts")
      .write.mode("overwrite").parquet(dir)
    assertNormalized(dir)
  }

  test("normalizeTs: TIMESTAMP_NTZ column is cast to TIMESTAMP (UTC session)") {
    val dir = tmpDir()
    // write an NTZ column directly: cast a UTC timestamp to NTZ under
    // the pinned-UTC session, producing parquet timestamp[us] with
    // isAdjustedToUTC=false — the shape the driver's re-encode ships
    Seq((1L, instantMicros)).toDF("id", "us")
      .select($"id",
        timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(dir)
    val raw = spark.read.parquet(dir)
    assert(raw.schema("ts").dataType == TimestampNTZType,
      "fixture must actually be NTZ on disk")
    assertNormalized(dir)
  }

  test("Tables.events yields TIMESTAMP ts on the live testdata") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }
}

package graft

import graft.ops.StatsOps
import graft.streaming.StreamOps

/** Streaming/batch equivalence (SURVEY.md §2.9): the streaming window
  * aggregate in complete mode must equal the batch aggregate, and the
  * watermarked dedup must keep exactly the distinct key set. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming window agg (complete mode) equals batch aggregation") {
    val stream = StreamOps.streamEventWindows(spark, sf0001)
      .select($"ws", $"event_type", $"n", $"sum_value")
    val batch = StatsOps.eventWindows(spark, sf0001)
      .select($"ws", $"event_type", $"n", $"sum_value")
    assert(stream.count() == batch.count())
    assert(stream.except(batch).count() == 0)
    assert(batch.except(stream).count() == 0)
  }

  test("file-sink window agg (append mode) equals batch aggregation " +
      "over watermark-finalized windows") {
    val out = java.nio.file.Files.createTempDirectory("graft_fsink").toString
    val fromFiles = StreamOps.streamEventWindowsToFiles(spark, sf0001, out)
      .select($"ws", $"event_type", $"n", $"sum_value")
    // append emits exactly the windows whose end the watermark (max
    // event time, 0s delay) passed; the in-flight window stays open
    val maxTs = Tables.events(spark, sf0001)
      .agg(org.apache.spark.sql.functions.max($"ts")).head().getTimestamp(0)
    val batch = StatsOps.eventWindows(spark, sf0001)
      .where(org.apache.spark.sql.functions
        .expr("ws + INTERVAL 1 HOUR") <= maxTs) // window end
      .select($"ws", $"event_type", $"n", $"sum_value")
    assert(fromFiles.count() == batch.count() && fromFiles.count() > 0)
    assert(fromFiles.except(batch).count() == 0)
    assert(batch.except(fromFiles).count() == 0)
  }

  test("streaming source handles TIMESTAMP(MICROS) events like batch " +
      "(the testdata's nanos-long shape never exercises this branch)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_micros").toString
    // re-write the events table with a real timestamp column; rename
    // the single part file to the events.parquet name the source globs
    val stage = s"$dir/stage"
    // Spark's DEFAULT parquet timestamp output is INT96 — force the
    // MICROS physical type this test is named for
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try Tables.events(spark, sf0001).coalesce(1)
      .write.mode("overwrite").parquet(stage)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(dir, "events.parquet"))
    val stream = StreamOps.streamEventWindows(spark, dir)
      .select($"ws", $"event_type", $"n", $"sum_value")
    val batch = StatsOps.eventWindows(spark, dir)
      .select($"ws", $"event_type", $"n", $"sum_value")
    assert(stream.count() == batch.count() && stream.count() > 0)
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("stream-stream interval join pairs aggregate to the batch " +
      "interval-join counts") {
    val streamCounts = StreamOps.streamIntervalJoin(spark, sf0001)
      .groupBy($"event_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val batchCounts = graft.ops.Relational.intervalJoin(spark, sf0001)
      .where($"n_recent_clicks" > 0)
      .select($"event_id", $"n_recent_clicks".as("n"))
    assert(streamCounts.count() == batchCounts.count() &&
      streamCounts.count() > 0)
    assert(streamCounts.except(batchCounts).count() == 0)
    assert(batchCounts.except(streamCounts).count() == 0)
  }

  test("registered q59 wrapper equals the batch matched-count rows " +
      "and q60 wrapper is stable across re-runs") {
    val q59 = StreamOps.streamIntervalJoinCounts(spark, sf0001)
    val batch = graft.ops.Relational.intervalJoin(spark, sf0001)
      .where($"n_recent_clicks" > 0)
    assert(q59.count() == batch.count() && q59.count() > 0)
    assert(q59.except(batch).count() == 0)
    assert(batch.except(q59).count() == 0)
    // the file-sink wrapper clears its managed output dir each run —
    // a second invocation must reproduce the identical row set
    val a = StreamOps.streamEventWindowFiles(spark, sf0001)
    val aRows = a.count()
    val b = StreamOps.streamEventWindowFiles(spark, sf0001)
    assert(aRows == b.count() && aRows > 0)
    assert(b.except(
      StatsOps.eventWindows(spark, sf0001)
        .withColumn("we", $"ws" + org.apache.spark.sql.functions
          .expr("INTERVAL 1 HOUR"))
        .select($"ws", $"we", $"event_type", $"n", $"sum_value"))
      .count() == 0)
  }

  test("streaming dedup emits one row per distinct key") {
    val d = StreamOps.streamDedup(spark, sf0001)
    val expected = Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(d.count() == expected)
  }

  test("streaming ingest near-dup probe equals the batch band join " +
      "and is non-vacuous") {
    import graft.ops.DedupOps
    val got = StreamOps.streamIngestNeardup(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    val docs = Tables.documents(spark, sf0001)
    // cap parity with the materialized index: over-common corpus band
    // keys generate no candidates (never binds at fixture scale, but
    // the expectation must mirror the index's construction — via the
    // SAME shared implementation, so it cannot drift)
    val corpus = DedupOps.capBandBuckets(
      DedupOps.bandFrame(docs.where($"doc_id" % 10 =!= 0)),
      Seq("band", "key"))
    val arriving = DedupOps.bandFrame(docs.where($"doc_id" % 10 === 0))
    val expected = arriving.as("n").join(corpus.as("c"),
        $"n.band" === $"c.band" && $"n.key" === $"c.key")
      .select($"n.doc_id", $"c.doc_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
    // the probe must actually fire at this SF — an empty pair set
    // would make the equality above vacuous
    assert(got.nonEmpty)
    // sides never mix: new docs only on the left, corpus on the right
    assert(got.forall { case (n, c) => n % 10 == 0 && c % 10 != 0 })
  }

  test("stateful flatMapGroupsWithState counts equal batch aggregates") {
    val st = StreamOps.statefulUserCounts(spark, sf0001)
    val batch = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"))
    val joined = st.select($"user_id", $"n_events")
      .join(batch.withColumnRenamed("n_events", "expected"), "user_id")
    assert(joined.where($"n_events" =!= $"expected").count() == 0)
    assert(st.count() == batch.count())
  }

  test("streaming quality gate equals the batch q88 report exactly " +
      "(single frame-level definition, two execution modes)") {
    val st = StreamOps.streamQualityGate(spark, sf0001)
      .as[(String, Long, Long)].collect().toSet
    val batch = graft.ops.CorpusOps.qualityGate(spark, sf0001)
      .as[(String, Long, Long)].collect().toSet
    assert(st == batch)
    assert(st.nonEmpty)
  }

  test("q99 outer interval join ⊇ inner q59 on matched rows; zero-" +
      "count rows appear exactly at/below the per-input-min watermark") {
    import org.apache.spark.sql.functions._
    val outer = StreamOps.streamIntervalJoinOuter(spark, sf0001).cache()
    val inner = StreamOps.streamIntervalJoinCounts(spark, sf0001).cache()
    // matched rows agree exactly with the inner join
    assert(outer.where($"n_recent_clicks" > 0).except(inner).count() == 0)
    assert(inner.except(outer.where($"n_recent_clicks" > 0)).count() == 0)
    // zero-count (null-emitted) rows: exactly the no-click errors at
    // or below the per-input-min watermark (min(max_err, max_click)
    // - the 2h allowed lateness); the window top ts_err is exclusive,
    // so eviction needs only ts_err <= wm, not ts_err + 2h <= wm
    val zeros = outer.where($"n_recent_clicks" === 0)
      .select($"event_id")
    assert(zeros.count() > 0, "outer join must surface unmatched errors")
    val ev = Tables.events(spark, sf0001)
    val horizon = ev.agg((least(
      max(when($"event_type" === "error", unix_micros($"ts"))),
      max(when($"event_type" === "click", unix_micros($"ts"))))
      - 7200000000L).as("h"))
    val expected = ev.where($"event_type" === "error")
      .join(inner.select($"event_id"), Seq("event_id"), "left_anti")
      .crossJoin(horizon)
      .where(unix_micros($"ts") <= $"h")
      .select($"event_id")
    assert(zeros.except(expected).count() == 0 &&
      expected.except(zeros).count() == 0,
      "zero-count rows must equal the horizon-filtered no-click errors")
    outer.unpersist(); inner.unpersist()
  }

  test("q98 transformWithState aggs equal batch count AND exact-cents " +
      "money sum, and the RocksDB provider conf is restored after") {
    import org.apache.spark.sql.functions._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    val got = StreamOps.statefulUserAggs(spark, sf0001)
      .select($"user_id", $"n_events", $"sum_value")
    val batch = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum((expr("CAST(value AS DECIMAL(12,2))") * 100).cast("long"))
          .cast("double") / 100.0).as("sum_value"))
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.except(batch).count() == 0)
    assert(batch.except(got).count() == 0)
    assert(spark.conf.getOption(key) == before,
      "state-store provider conf must be restored")
  }

  test("q90 streaming session windows equal batch gap-sessionization " +
      "restricted to watermark-finalized sessions") {
    import org.apache.spark.sql.functions._
    val stream = StreamOps.streamSessionize(spark, sf0001)
      .select($"ws", $"we", $"user_id", $"n_events", $"sum_value")
    val maxTs = Tables.events(spark, sf0001)
      .agg(max($"ts")).head().getTimestamp(0)
    // batch q38 sessions: window = [session_start, session_end + gap);
    // the stream finalizes exactly those whose end passed the watermark
    val batch = StatsOps.sessionize(spark, sf0001)
      .select($"session_start".as("ws"),
        expr("session_end + INTERVAL 30 MINUTE").as("we"),
        $"user_id", $"n_events", $"sum_value")
      .where($"we" <= maxTs)
    assert(stream.count() == batch.count() && stream.count() > 0)
    assert(stream.except(batch).count() == 0)
    assert(batch.except(stream).count() == 0)
    // and the in-flight tail is real: at least one session not emitted
    assert(StatsOps.sessionize(spark, sf0001).count() > batch.count())
  }

  test("q90 exact-gap events merge into ONE session (the probe-pinned " +
      "touching-windows rule, aligned with q38's diff > gap boundary)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    val rows = Seq(
      // user 1: events exactly 30 min apart -> ONE session
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 1L, "click", 1.0, "{}"),
      // user 2: 30 min + 1 us apart -> TWO sessions
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "click", 1.0, "{}"),
      (4L, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:30:00").getTime + 1L),
        2L, "click", 1.0, "{}"),
      // a late sentinel pushes the watermark far past everything above
      (5L, java.sql.Timestamp.valueOf("2024-01-02 12:00:00"), 3L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/staging")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/staging/part-*.parquet"))(0)
    fs.rename(part.getPath,
      new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
    val sess = StreamOps.streamSessionize(spark, dir)
      .select($"user_id", $"n_events").as[(Long, Long)].collect().toSeq
      .sorted
    assert(sess == Seq((1L, 2L), (2L, 1L), (2L, 1L)),
      s"got $sess — exact-gap merge semantics drifted")
  }

  test("multimodal decode stub is deterministic and schema-stable") {
    val a = graft.ops.MultimodalOps.mediaFeatures(spark, sf0001)
    val b = graft.ops.MultimodalOps.mediaFeatures(spark, sf0001)
    assert(a.schema == b.schema)
    assert(a.except(b).count() == 0)
    assert(a.count() == Tables.documents(spark, sf0001).count())
  }
}

package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2.9 / §7.1.7: the
  * reference's daily-dump loop 00_download_CRZ_DB.py:179-219 re-seamed
  * as a file-source stream).
  *
  * Scale notes: the same code runs `trigger(AvailableNow)` against a
  * date-partitioned landing directory on a cluster — file-source
  * micro-batching + watermarked state is the standard continuous
  * form of stage 1-2 of the reference; state store size is bounded by
  * the watermark horizon, not the corpus.
  */
object StreamOps {

  private val runId = new AtomicInteger(0)
  // last memory-sink table per op — dropped on the next invocation so
  // repeated runs in one session don't accumulate driver-side results
  private val lastTable =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def dec2 = graft.Money.dec2 _

  /** A table's parquet file as a file-source stream: batch-read for
    * the schema, then a glob-filtered readStream over the directory —
    * the one scaffold every streaming source here shares. */
  private def fileStream(s: SparkSession, dir: String,
      table: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/$table.parquet")
    s.readStream
      .schema(raw.schema)
      .option("pathGlobFilter", s"$table.parquet")
      .parquet(dir)
  }

  /** The events table as a file-source STREAM with the event-time
    * column normalized by the SAME `Tables.normalizeTs` the batch
    * reader uses — one shape-repair site for every ts encoding the
    * driver has shipped (nanos-long, TIMESTAMP, TIMESTAMP_NTZ);
    * streaming watermarks reject NTZ, so normalization is load-bearing
    * here, not cosmetic. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.Tables.normalizeTs(fileStream(s, dir, "events"))
  }

  /** Drain a streaming frame synchronously into a memory sink and
    * return the materialized table; the previous invocation's sink
    * table (same prefix) is dropped first. */
  private def drainToTable(s: SparkSession, df: DataFrame,
      prefix: String, mode: String): DataFrame = {
    val name = s"${prefix}_${runId.incrementAndGet()}"
    Option(lastTable.put(prefix, name))
      .foreach(s.catalog.dropTempView(_))
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    s.table(name)
  }

  /** q34 — the q30 tumbling-window aggregation executed as a real
    * Structured Streaming query: parquet file source → event-time
    * window aggregate → in-memory sink (complete mode), drained
    * synchronously with processAllAvailable. Oracle-comparable
    * because complete mode emits every window.
    */
  def streamEventWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = eventsStream(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec2($"value")).cast("double").as("sum_value"))
    drainToTable(s, agg, "graft_stream_windows", "complete")
      .select($"window.start".as("ws"), $"window.end".as("we"),
        $"event_type", $"n", $"sum_value")
  }

  val streamEventWindowsSql: String =
    """SELECT date_trunc('hour', ts) AS ws,
      |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
      |       event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** [[streamEventWindows]]'s cluster-parity form: the same windowed
    * aggregate written to a parquet FILE sink in append mode under a
    * watermark — no driver-side memory sink; results land as files,
    * which is how a real deployment runs this continuously (output
    * scales with the file system, not driver memory). Append mode
    * emits a window only once the watermark passes its end, so the
    * in-flight final window(s) stay in state — exactly continuous
    * semantics; StreamingSpec asserts file rows ≡ the batch aggregate
    * restricted to watermark-finalized windows. */
  def streamEventWindowsToFiles(s: SparkSession, dir: String,
      outDir: String): DataFrame = {
    import s.implicits._
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec2($"value")).cast("double").as("sum_value"))
      .select($"window.start".as("ws"), $"window.end".as("we"),
        $"event_type", $"n", $"sum_value")
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/chk")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(s"$outDir/data")
  }

  /** q60 — [[streamEventWindowsToFiles]] as a driver-checkable query:
    * the output directory is derived from the source dir under the
    * warehouse path and cleared before each run, so every invocation
    * re-executes the watermarked append-mode stream from a fresh
    * checkpoint (the same full-reprocess semantics as q34's memory
    * sink — the measured cost is the stream, not a cached read-back).
    * Append mode emits exactly the windows whose end the watermark
    * (max event time, 0 s delay) passed, so the oracle is the batch
    * aggregate restricted to `we <= max(ts)` — this row-set difference
    * vs q34 is precisely the continuous-semantics contract the oracle
    * now locks. */
  def streamEventWindowFiles(s: SparkSession, dir: String): DataFrame = {
    val out = new org.apache.hadoop.fs.Path(
      s.sessionState.conf.warehousePath,
      "graft_stream_files_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    streamEventWindowsToFiles(s, dir, out.toString)
      .select(col("ws"), col("we"), col("event_type"), col("n"),
        col("sum_value"))
  }

  val streamEventWindowFilesSql: String =
    """WITH w AS (
      |  SELECT date_trunc('hour', ts) AS ws,
      |         date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
      |         event_type, COUNT(*) AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY 1, 2, 3
      |)
      |SELECT * FROM w
      |WHERE we <= (SELECT max(ts) FROM events)""".stripMargin

  /** Stream-stream interval join (the continuous form of q46): error
    * events inner-join click events of the same user within the
    * preceding 2 hours, both sides watermarked so the join state is
    * bounded by the time horizon, not the stream length — the
    * standard Spark stream-stream join shape. Inner joins emit each
    * matched pair as soon as both rows have arrived; the watermarks
    * only bound state retention. StreamingSpec aggregates the drained
    * pairs and compares against the batch q46 counts (matched rows).
    */
  def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val errors = eventsStream(s, dir)
      .where($"event_type" === "error")
      .select($"event_id", $"user_id".as("u_err"), $"ts".as("ts_err"))
      .withWatermark("ts_err", "2 hours")
    val clicks = eventsStream(s, dir)
      .where($"event_type" === "click")
      .select($"user_id".as("u_click"), $"ts".as("ts_click"))
      .withWatermark("ts_click", "2 hours")
    val pairs = errors.join(clicks,
      $"u_err" === $"u_click" &&
        $"ts_click" >= $"ts_err" - expr("INTERVAL 2 HOURS") &&
        $"ts_click" < $"ts_err")
    drainToTable(s, pairs, "graft_stream_ijoin", "append")
      .select($"event_id", $"u_err".as("user_id"), $"ts_click")
  }

  /** q59 — [[streamIntervalJoin]] as a driver-checkable query: the
    * emitted pairs rolled up to clicks-per-error counts. An inner
    * stream-stream join emits exactly the matched pairs, so the
    * rollup equals the batch q46 counts restricted to errors with at
    * least one preceding click — the oracle states that correlated
    * range count directly. This is the CORRECTNESS row that exercises
    * real watermarked two-sided join state (q34 only covers the
    * windowed-aggregate state path). */
  def streamIntervalJoinCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    streamIntervalJoin(s, dir)
      .groupBy($"event_id", $"user_id")
      .agg(count(lit(1)).as("n_recent_clicks"))
  }

  val streamIntervalJoinCountsSql: String =
    """SELECT * FROM (
      |  SELECT e.event_id, e.user_id,
      |    (SELECT COUNT(*) FROM events c
      |     WHERE c.event_type = 'click' AND c.user_id = e.user_id
      |       AND epoch_us(c.ts) >= epoch_us(e.ts) - CAST(7200000000 AS BIGINT)
      |       AND epoch_us(c.ts) < epoch_us(e.ts)) AS n_recent_clicks
      |  FROM events e WHERE e.event_type = 'error'
      |) WHERE n_recent_clicks > 0""".stripMargin

  /** q99 — LEFT OUTER stream-stream interval join: q59's shape with
    * the unmatched side kept. Outer stream-stream joins exercise the
    * state path inner joins never touch — an unmatched left row is
    * emitted (click side null) only when the watermark PROVES no
    * future click can match it. Two subtleties, both MEASURED against
    * boundary rows rather than assumed: (1) the global watermark is
    * the MIN across the two stream inputs — each withWatermark node
    * tracks ITS OWN max event time (errors-only / clicks-only, the
    * nodes sit above the type filters), so
    * `wm = min(max_err, max_click) − 2 h` (the sf0.001 corpus, whose
    * last error sits hours before its last click, separates this
    * from the global max); (2) an error is provably unmatchable as
    * soon as its window TOP falls at or below the watermark — future
    * clicks arrive with ts_click ≥ wm, a match needs
    * ts_click < ts_err, so eviction is `ts_err ≤ wm`, NOT
    * `ts_err + 2 h ≤ wm` (the sf0.01 boundary row separates the
    * two). Contract: errors WITH preceding clicks appear always
    * (eager inner emissions); zero-count errors appear iff
    * `ts_err ≤ min(max_err, max_click) − 2 h`; tail errors emit
    * nothing yet. That row-set difference IS the outer-join
    * watermark semantics, locked the same way q60 locks window
    * finalization and q90 session finalization. */
  def streamIntervalJoinOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val errors = eventsStream(s, dir)
      .where($"event_type" === "error")
      .select($"event_id", $"user_id".as("u_err"), $"ts".as("ts_err"))
      .withWatermark("ts_err", "2 hours")
    val clicks = eventsStream(s, dir)
      .where($"event_type" === "click")
      .select($"user_id".as("u_click"), $"ts".as("ts_click"))
      .withWatermark("ts_click", "2 hours")
    val pairs = errors.join(clicks,
      $"u_err" === $"u_click" &&
        $"ts_click" >= $"ts_err" - expr("INTERVAL 2 HOURS") &&
        $"ts_click" < $"ts_err",
      "left_outer")
    drainToTable(s, pairs, "graft_stream_ojoin", "append")
      .groupBy($"event_id", $"u_err".as("user_id"))
      .agg(count($"ts_click").as("n_recent_clicks"))
  }

  val streamIntervalJoinOuterSql: String =
    """SELECT event_id, user_id, n_recent_clicks FROM (
      |  SELECT e.event_id, e.user_id, e.ts,
      |    (SELECT COUNT(*) FROM events c
      |     WHERE c.event_type = 'click' AND c.user_id = e.user_id
      |       AND epoch_us(c.ts) >= epoch_us(e.ts) - CAST(7200000000 AS BIGINT)
      |       AND epoch_us(c.ts) < epoch_us(e.ts)) AS n_recent_clicks
      |  FROM events e WHERE e.event_type = 'error'
      |) WHERE n_recent_clicks > 0
      |   OR epoch_us(ts) + CAST(7200000000 AS BIGINT)
      |      <= (SELECT least(
      |            max(CASE WHEN event_type = 'error'
      |                THEN epoch_us(ts) END),
      |            max(CASE WHEN event_type = 'click'
      |                THEN epoch_us(ts) END))
      |          FROM events)""".stripMargin

  /** Per-user running state for [[statefulUserCounts]]. */
  final case class UserState(n: Long, total: Double)
  final case class UserCount(user_id: Long, n_events: Long,
      sum_value: Double)

  /** Custom stateful streaming (SURVEY.md §2.9:
    * KeyValueGroupedDataset.flatMapGroupsWithState): per-user running
    * event counts/sums held in GroupState across micro-batches —
    * the state-store-backed form of an accumulating dimension. State
    * size is O(users), bounded; on a cluster the state store is
    * RocksDB-backed and checkpointed. Exercised by StreamingSpec
    * against the batch aggregate.
    */
  def statefulUserCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = eventsStream(s, dir)
      .select($"user_id", $"value")
      .as[(Long, Double)]
    val updated = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          state.update(UserState(n, total))
          Iterator.single(UserCount(user, n, total))
      }
    // update mode appends one row per (batch, user); keep the latest
    // per user for the final answer
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"n_events".desc)
    drainToTable(s, updated.toDF(), "graft_stateful_counts", "update")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .where($"rn" === 1).drop("rn")
  }

  /** q64 — [[statefulUserCounts]] as a driver-checkable query: the
    * per-user event COUNTS from the flatMapGroupsWithState state
    * store. Counts are order-insensitive, so the final state equals
    * the batch aggregate no matter how the stream micro-batches; the
    * running float sum deliberately stays OUT of the registered
    * output — `total += v` accumulates in group-iterator order,
    * which shuffle read order can vary run to run (the same reason
    * q56 needed decimal sums). This row makes CORRECTNESS exercise
    * the custom-state API, completing the streaming trio (q34
    * windowed agg state, q59 join state, q64 arbitrary state). */
  def statefulUserEventCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    statefulUserCounts(s, dir).select($"user_id", $"n_events")
  }

  val statefulUserEventCountsSql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM events GROUP BY user_id""".stripMargin

  /** Per-user running (event count, exact cents sum) for q98 — the
    * modern `transformWithState` StatefulProcessor (Spark 4.x's
    * replacement for flatMapGroupsWithState, SURVEY.md §2.9): typed
    * ValueState on the RocksDB state-store provider, no timers. The
    * sum is carried as EXACT integer cents (decimal(12,2)·100 cast
    * long before the processor), so unlike q64 the money sum is
    * micro-batch-order-free and can join the oracle contract; the
    * single division to euros happens at the output edge. */
  private final class UserAggProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), UserCount] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}
    @transient private var st: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[(Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      st = getHandle.getValueState[(Long, Long)]("agg", enc, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserCount] = {
      var (n, cents) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; cents += c }
      st.update((n, cents))
      Iterator.single(UserCount(key, n, cents.toDouble / 100.0))
    }
  }

  /** q98 — [[UserAggProcessor]] as a driver-checkable query: per-user
    * event counts AND exact money sums from transformWithState state.
    * Completes the streaming-state coverage with the arbitrary-state
    * API Spark 4 ships for new pipelines (q64 keeps the legacy
    * flatMapGroupsWithState path alive); RocksDB provider is set for
    * the query and restored after — on a cluster this store is the
    * one that spills state to disk instead of executor heap, which
    * is what makes O(users) state viable at corpus scale. Update-mode
    * emissions append one row per (micro-batch, user); the latest per
    * user (max n_events) is the final state, the q64 convention. */
  def statefulUserAggs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = eventsStream(s, dir)
        .select($"user_id",
          (dec2($"value") * 100).cast("long").as("cents"))
        .as[(Long, Long)]
      val updated = stream.groupByKey(_._1)
        .transformWithState(new UserAggProcessor,
          TimeMode.None(), OutputMode.Update())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"n_events".desc)
      drainToTable(s, updated.toDF(), "graft_tws_aggs", "update")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1).drop("rn")
    } finally {
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  val statefulUserAggsSql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
      |       AS DOUBLE) / 100.0 AS sum_value
      |FROM events GROUP BY user_id""".stripMargin

  /** Streaming first-seen dedup (D1/D2 as a continuous query,
    * SURVEY.md §2.9): watermarked dropDuplicates on the key columns.
    * State is bounded by the watermark horizon. Exercised by the
    * streaming spec (not oracle-comparable: append-mode emission
    * depends on watermark advancement, which is data-arrival
    * dependent — exactly the semantics difference the survey calls
    * out).
    */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val deduped = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
    drainToTable(s, deduped, "graft_stream_dedup", "append")
      .select($"event_id", $"user_id", $"event_type", $"ts")
  }

  /** q80 — [[streamDedup]] as a driver-checkable query. Streaming
    * dropDuplicates emits exactly one row per key, but WHICH row is
    * arrival-order-dependent (the micro-batch's partition order, not
    * event time), so the row identity is not oracle-comparable — the
    * KEY SET is: project the emitted rows to their dedup keys, which
    * must equal the batch distinct no matter how the stream
    * micro-batched. This completes the streaming family's oracle
    * coverage (q34 windowed-agg state, q59 join state, q64 arbitrary
    * state, q80 dedup state); the ts-carrying row shape stays under
    * StreamingSpec, where arrival order is controlled. */
  def streamDedupKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    streamDedup(s, dir).select($"user_id", $"event_type")
  }

  val streamDedupKeysSql: String =
    "SELECT DISTINCT user_id, event_type FROM events"

  /** q89 — streaming quality gate: [[graft.ops.CorpusOps.qualityGateOf]]
    * applied VERBATIM to the documents file-stream — one frame-level
    * definition executes in both batch (q88) and continuous-ingest
    * mode, so the two can never drift (the same single-definition
    * guarantee the q80 dedup and q69 ingest probe give their batch
    * twins). Every signal is a stateless per-row expression (the
    * native kernel runs per micro-batch with no state), and the only
    * stateful operator is the ≤ 4-group verdict rollup — complete
    * output mode, O(1) state, no watermark needed.
    *
    * The oracle is the batch q88 SQL: after the stream drains the
    * corpus, the running aggregate must equal the batch answer
    * exactly. */
  def streamQualityGate(s: SparkSession, dir: String): DataFrame = {
    val agged = graft.ops.CorpusOps.qualityGateOf(
      fileStream(s, dir, "documents"))
    drainToTable(s, agged, "graft_stream_qgate", "complete")
  }

  val streamQualityGateSql: String = graft.ops.CorpusOps.qualityGateSql

  /** q90 — STREAMING sessionization: q38's gap-based sessions as a
    * `session_window` streaming aggregate (SURVEY.md §2.9 — the one
    * window family the suite's streaming trio didn't yet exercise:
    * q34 pins fixed windows, q59 join state, q64 arbitrary state;
    * session windows have MERGING state, a different state-store
    * code path). Watermark 0 s + append mode emit exactly the
    * sessions the watermark (max event time) has finalized: a
    * session's window is [first_ts, last_ts + gap), so the oracle is
    * the batch q38 sessionization restricted to
    * `last_ts + gap <= max(ts)` — the in-flight tail session per
    * user stays in state, exactly continuous semantics (the q60
    * contract, applied to sessions).
    *
    * Merge semantics pinned by probe and spec: two events exactly
    * `gap` apart MERGE (Spark merges on overlap-or-touch), matching
    * q38's `diff > gap` boundary rule, so the two operators cannot
    * drift. State per key is bounded by the user's open session, and
    * the session store evicts on watermark — state is O(active
    * users), not stream length.
    */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = eventsStream(s, dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(dec2($"value")).cast("double").as("sum_value"))
    drainToTable(s, agg, "graft_stream_sessions", "append")
      .select($"session_window.start".as("ws"),
        $"session_window.end".as("we"),
        $"user_id", $"n_events", $"sum_value")
  }

  val streamSessionizeSql: String =
    """WITH sess AS (
      |  SELECT user_id, session_id, MIN(ts) AS ws,
      |         MAX(ts) + INTERVAL 30 MINUTE AS we,
      |         COUNT(*) AS n_events,
      |         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
      |           AS sum_value
      |  FROM (
      |    SELECT user_id, ts, value,
      |      SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS UNBOUNDED PRECEDING) AS session_id
      |    FROM (
      |      SELECT *,
      |        CASE WHEN prev_us IS NULL
      |               OR epoch_us(ts) - prev_us > 1800 * 1000000
      |             THEN 1 ELSE 0 END AS boundary
      |      FROM (SELECT event_id, user_id, ts, value,
      |              LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
      |                ORDER BY ts, event_id) AS prev_us
      |            FROM events))
      |  ) GROUP BY user_id, session_id
      |)
      |SELECT ws, we, user_id, n_events, sum_value FROM sess
      |WHERE we <= (SELECT max(ts) FROM events)""".stripMargin

  /** q69 — streaming ingest near-dup gate (the continuous-ingestion
    * form of q21's MinHash+LSH): newly arriving documents — the
    * deterministic `doc_id % 10 = 0` ingest slice — stream in from
    * the file source, compute their LSH band keys with the same
    * native `minhash_sig` kernel, and probe the STATIC corpus band
    * index (built in batch from the already-ingested 90%). The join
    * is stream-static and therefore STATELESS: no watermark and no
    * state-store growth — each micro-batch probes the index and
    * emits its candidate (new, corpus) pairs; the post-drain
    * `distinct` collapses any cross-batch re-emission.
    *
    * Scale shape: the index is one row per corpus doc per band
    * (key = 4 concatenated 16-bit minima — tiny next to the text it
    * summarizes), MATERIALIZED as a bucketed table by the batch
    * pipeline ([[graft.ops.LayoutOps.ensureBandIndexLayout]] — built
    * once per source fingerprint, reused across micro-batches AND
    * across sessions); the arriving side's signatures are zero-shuffle
    * per-row kernels, so a micro-batch costs sig + an equi-join probe
    * whose index-scan side needs no exchange (bucket spec = join key;
    * LayoutSpec pins the plan). Nothing is all-pairs; streaming state
    * is zero, so the query runs forever without compaction. */
  def streamIngestNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val arriving = graft.ops.DedupOps.bandFrame(
      fileStream(s, dir, "documents").where($"doc_id" % 10 === 0))
    val matches = graft.ops.LayoutOps.bandIndexProbe(s, dir, arriving)
    drainToTable(s, matches, "graft_stream_ingest", "append").distinct()
  }

  val streamIngestNeardupSql: String =
    graft.ops.DedupOps.minhashBandCtes +
      graft.ops.DedupOps.corpusBandCtesSql +
      graft.ops.DedupOps.candNcCteSql +
      "\nSELECT doc_new, doc_corpus FROM cand_nc"
}

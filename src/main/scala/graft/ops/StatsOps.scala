package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Columnar statistics + event-stream aggregates.
  *
  * q15 is the Spark rendering of the reference's per-column stats
  * passes over extracted tables (09_clean_tables.py:180-309, SURVEY.md
  * §2.2 P10-P12 / §2.4 A6 / §2.8): tables become a long
  * (column, cell) frame and every per-column statistic is one
  * conditional aggregate in a single pass — the reference's four
  * separate row-loops collapse into one columnar shuffle.
  *
  * Scale notes: the long format means per-column stats of a million
  * heterogeneous extracted tables are ONE groupBy(tableId, column)
  * aggregation, never a driver-side loop over per-table DataFrames
  * (SURVEY.md §7.4.5).
  */
object StatsOps {

  private def dec2 = graft.Money.dec2 _

  /** q15 — per-column stats: non-empty count (P10) and a numeric-row
    * ratio with the reference's 0.75 threshold, in one conditional-
    * aggregation pass over the long (column, cell) frame. The numeric
    * test HERE is strict full-match (`^[0-9]+$` — "the cell IS a
    * number"), a deliberate fit for this generic stats surface; the
    * reference-parity P12 rule (digit CONTAINMENT, 09:268 findall —
    * '100,00 EUR' counts) lives where P12 is actually rendered,
    * `crz.TablesPipeline.columnStats`. */
  def columnStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.events(s, dir).select(explode(array(
      struct(lit("event_type").as("colname"), $"event_type".as("cell")),
      struct(lit("user_id").as("colname"), $"user_id".cast("string").as("cell")),
      struct(lit("props").as("colname"), $"props".as("cell"))
    )).as("c")).select($"c.colname", $"c.cell")
    cells.groupBy($"colname").agg(
        count(lit(1)).as("n"),
        sum(when(trim($"cell") =!= "", 1L).otherwise(0L)).as("n_nonempty"),
        sum(when($"cell".rlike("^[0-9]+$"), 1L).otherwise(0L)).as("n_numeric"))
      .withColumn("numeric_ratio",
        $"n_numeric".cast("double") / $"n".cast("double"))
      .withColumn("is_numeric_col", $"numeric_ratio" > 0.75)
  }

  val columnStatsSql: String =
    """SELECT colname, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN trim(cell) <> '' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_nonempty,
      |  CAST(SUM(CASE WHEN regexp_matches(cell, '^[0-9]+$') THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_numeric,
      |  CAST(SUM(CASE WHEN regexp_matches(cell, '^[0-9]+$') THEN 1 ELSE 0 END)
      |       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS numeric_ratio,
      |  CAST(SUM(CASE WHEN regexp_matches(cell, '^[0-9]+$') THEN 1 ELSE 0 END)
      |       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) > 0.75 AS is_numeric_col
      |FROM (
      |  SELECT 'event_type' AS colname, event_type AS cell FROM events
      |  UNION ALL
      |  SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
      |  UNION ALL
      |  SELECT 'props', props FROM events
      |) GROUP BY colname""".stripMargin

  /** q30 — tumbling-window event aggregation (batch form of the
    * streaming seam, SURVEY.md §2.9: the daily-dump loop
    * 00_download_CRZ_DB.py:179-219 as event-time windows). */
  def eventWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("ws", date_trunc("hour", $"ts"))
      .groupBy($"ws", $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec2($"value")).cast("double").as("sum_value"),
        countDistinct($"user_id").as("n_users"))
  }

  val eventWindowsSql: String =
    """SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q47 — sliding event-time windows (2 h window, 1 h slide): every
    * event lands in exactly two windows. The oracle derives the same
    * two window starts arithmetically — sliding windows are just an
    * explode over the slide grid, which is also how they scale (each
    * event contributes window/slide rows, no cross-window state). */
  def slidingWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec2($"value")).cast("double").as("sum_value"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"sum_value")
  }

  val slidingWindowsSql: String =
    """SELECT ws, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT unnest([date_trunc('hour', ts),
      |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
      |         event_type, value
      |  FROM events
      |) GROUP BY ws, event_type""".stripMargin

  /** q31 — semi-structured property extraction (F27's
    * stringified-structure parsing, 03_download_contracts.py:619-646,
    * as a regexp pull from the JSON props column). */
  def jsonProps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k",
        // try_cast: props without a "k" field extract '' — null, not
        // an ANSI cast error
        expr("try_cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT)"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        max($"k").as("max_k"))
      .withColumn("avg_k", $"sum_k".cast("double") / $"n".cast("double"))
  }

  val jsonPropsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT))
      |       AS BIGINT) AS sum_k,
      |  MAX(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS max_k,
      |  CAST(SUM(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT))
      |       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_k
      |FROM events GROUP BY event_type""".stripMargin

  /** q38 — sessionization: split each user's event stream at >30 min
    * gaps (lag + running sum of boundary flags), then per-session
    * aggregates. The windowed form of the reference's per-day batch
    * seam; integer epoch-micros arithmetic keeps the oracle exact. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
      .withColumn("boundary",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"boundary").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(dec2($"value")).cast("double").as("sum_value"))
  }

  val sessionizeSql: String =
    """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       MIN(ts) AS session_start,
      |       MAX(ts) AS session_end, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT user_id, ts, value,
      |    SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM (
      |    SELECT *,
      |      CASE WHEN prev_us IS NULL
      |             OR epoch_us(ts) - prev_us > 1800 * 1000000
      |           THEN 1 ELSE 0 END AS boundary
      |    FROM (SELECT event_id, user_id, ts, value,
      |            LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
      |              ORDER BY ts, event_id) AS prev_us
      |          FROM events))
      |) GROUP BY user_id, session_id""".stripMargin

  /** q39 — CUBE grouping (the grouping-sets family SURVEY.md §2.4
    * notes as absent from the reference): order counts and exact sums
    * over all subsets of (status, priority). */
  def cubeCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec2($"o_totalprice")).cast("double").as("sum_price"))
  }

  val cubeCountsSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"""
      .stripMargin

  /** q40 — exact interpolated percentiles per group (median family,
    * absent from the reference per SURVEY.md §2.4). Both engines use
    * linear interpolation on identical sorted doubles. */
  def percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
  }

  val percentilesSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.95) AS p95
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** q83 — ordered funnel: how far each user progresses through
    * view → click → purchase, where each stage must happen STRICTLY
    * after the previous stage's first occurrence (a click before the
    * first view does not count). Output is the 4-row stage → n_users
    * conversion table.
    *
    * Scale shape: ONE exchange (groupBy user_id), then a sorted
    * per-user event fold — the `aggregate` higher-order function walks
    * the (ts, event_id)-sorted list once carrying the
    * (first_view, first_click_after, first_purchase_after) state, so
    * the whole funnel is a single pass per user with no further
    * shuffle. The equivalent min-per-stage formulation (the oracle
    * twin) needs a join + re-aggregation PER STAGE — 3 extra exchanges
    * that grow linearly with funnel depth; the fold costs the same for
    * any depth. Per-user event lists are bounded by per-user activity,
    * not corpus size — the standard sessionization memory contract
    * (same as q38's window).
    *
    * Fold-vs-min equivalence: the fold takes the FIRST qualifying
    * event in (ts, event_id) order, whose ts is exactly
    * `min(ts | type ∧ after-prev-stage)` — the oracle's value. */
  def funnelStages(s: SparkSession, dir: String): DataFrame =
    funnelStagesOf(Tables.events(s, dir))

  /** [[funnelStages]] over an arbitrary events frame (frame-level core
    * for spec-side synthetic corpora). */
  private[graft] def funnelStagesOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupBy($"user_id")
      .agg(sort_array(collect_list(
        struct($"ts", $"event_id", $"event_type"))).as("evs"))
      .withColumn("f", expr(
        """aggregate(evs,
          |  struct(CAST(NULL AS TIMESTAMP) AS vt,
          |         CAST(NULL AS TIMESTAMP) AS ct,
          |         CAST(NULL AS TIMESTAMP) AS pt),
          |  (a, e) -> struct(
          |    CASE WHEN a.vt IS NULL AND e.event_type = 'view'
          |         THEN e.ts ELSE a.vt END AS vt,
          |    CASE WHEN a.ct IS NULL AND a.vt IS NOT NULL
          |              AND e.event_type = 'click' AND e.ts > a.vt
          |         THEN e.ts ELSE a.ct END AS ct,
          |    CASE WHEN a.pt IS NULL AND a.ct IS NOT NULL
          |              AND e.event_type = 'purchase' AND e.ts > a.ct
          |         THEN e.ts ELSE a.pt END AS pt))""".stripMargin))
      .select(
        when($"f.pt".isNotNull, "purchase")
          .when($"f.ct".isNotNull, "click")
          .when($"f.vt".isNotNull, "view")
          .otherwise("none").as("stage"))
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
  }

  val funnelStagesSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS vt FROM events
      |  WHERE event_type = 'view' GROUP BY 1
      |), c AS (
      |  SELECT e.user_id, min(e.ts) AS ct
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY 1
      |), p AS (
      |  SELECT e.user_id, min(e.ts) AS pt
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY 1
      |), u AS (SELECT DISTINCT user_id FROM events)
      |SELECT CASE WHEN pt IS NOT NULL THEN 'purchase'
      |            WHEN ct IS NOT NULL THEN 'click'
      |            WHEN vt IS NOT NULL THEN 'view'
      |            ELSE 'none' END AS stage,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |       LEFT JOIN p USING (user_id)
      |GROUP BY 1""".stripMargin

  /** q94 — cohort retention: users cohorted by their FIRST active day,
    * then for each (cohort_day, day_offset) the number of distinct
    * cohort members active that many days later — the standard
    * retention triangle (the product-analytics companion to q38's
    * sessionization and q83's funnel, both over the same events
    * stream).
    *
    * Scale shape: ONE corpus exchange — the per-user day SET is a
    * map-side-combinable collect_set keyed by user_id (bounded by the
    * calendar span, not event volume), and cohort day + offsets derive
    * from it per row (array_min + explode, no join, no second scan of
    * events). The final rollup needs no count-DISTINCT Expand: after
    * the set explode a user contributes at most one row per (cohort,
    * offset) cell, so count(*) IS the distinct-active count. The
    * join+distinct formulation this replaces planned 2 scans and 4
    * exchanges. Counts only — every value crossing the engine boundary
    * is an exact integer or a date. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", to_date($"ts").as("day"))
      .groupBy($"user_id").agg(collect_set($"day").as("days"))
      .select($"user_id", array_min($"days").as("cohort_day"),
        explode($"days").as("day"))
      .groupBy($"cohort_day",
        datediff($"day", $"cohort_day").cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  val cohortRetentionSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), cohorts AS (
      |  SELECT user_id, min(day) AS cohort_day FROM active GROUP BY 1
      |)
      |SELECT c.cohort_day,
      |       CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
      |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
      |FROM active a JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

}

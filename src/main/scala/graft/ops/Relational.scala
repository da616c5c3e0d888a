package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operators — the Spark-first re-expression of the
  * reference's filter/join/dedup pipeline (SURVEY.md §2.2/2.3/2.5/2.6,
  * reference 02_filter_by_CIN.py) mapped onto the driver's TPC-H-ish
  * corpus.
  *
  * Scale notes (100 TB):
  *  - every dimension side (customer, nation, literal keyword dims) is
  *    explicitly `broadcast()` — no shuffle of the fact table for
  *    semi/anti joins;
  *  - dedup is `row_number` over a hash-partitioned window, not the
  *    reference's O(n²) membership list (02_filter_by_CIN.py:252-268);
  *  - filters are plain Catalyst predicates so they push down to the
  *    parquet scan (PushedFilters), pruning row groups at the source.
  */
object Relational {

  /** Exact decimal rendering of a 2-dp money column. The source doubles
    * hold 2-decimal values, so this cast is lossless and makes every
    * downstream SUM exact and order-insensitive — required for
    * bit-identical DuckDB-oracle comparison and the right choice at
    * scale anyway (no float-summation drift across 1000 executors).
    */
  private def dec2 = graft.Money.dec2 _

  /** q01 — the reference's clean-filter pipeline (SURVEY.md §7.2):
    * price filter (P6: 02_filter_by_CIN.py:234-243), date filter
    * (P7: 02:246-250), broadcast semi-join vs a dimension (J1/P3:
    * 02:199-203) and first-seen dedup (D1: 02:252-268) as a
    * deterministic row_number window.
    */
  def cleanFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val base = o
      .filter($"o_totalprice" >= 1000.0 &&
        $"o_orderdate" >= to_timestamp(lit("1996-01-01 00:00:00")))
      .join(broadcast(cust), o("o_custkey") === cust("c_custkey"), "left_semi")
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    base.withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderdate")
  }

  val cleanFilterSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |FROM (
      |  SELECT o.*, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |           ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders o
      |  WHERE o_totalprice >= 1000 AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND EXISTS (SELECT 1 FROM customer c
      |                WHERE c.c_custkey = o.o_custkey
      |                  AND c.c_mktsegment = 'BUILDING')
      |) WHERE rn = 1""".stripMargin

  /** q02 — pricing summary (A2-style grouped aggregation; the category
    * rollup shape of 04_tag_text_contracts.py:115-119 on numeric data).
    * Partial (map-side) aggregation + 2-key hash agg; exact decimals.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        // sums accumulate as exact decimal (order-insensitive across any
        // partitioning); the FINAL value is rendered as double so both
        // engines hand the comparator the same scalar type — a decimal
        // output would surface as Decimal('137431.00') vs 137431.0.
        sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec2($"l_extendedprice") * dec2(lit(1) - $"l_discount"))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** q03 — revenue join (J3/J4: metadata lookup joins of
    * 04_tag_text_contracts.py:123-125 / 07:134-146, at TPC-H Q3 shape).
    * customer is broadcast; orders⋈lineitem shuffles on the join key
    * once, and the groupBy reuses that partitioning (no second
    * exchange on l_orderkey).
    */
  def revenueJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "MACHINERY")
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" < to_timestamp(lit("1998-01-01 00:00:00")))
    val li = Tables.lineitem(s, dir)
      .filter($"l_shipdate" > to_timestamp(lit("1996-06-30 00:00:00")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(cust), o("o_custkey") === cust("c_custkey"), "left_semi")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(dec2($"l_extendedprice") * dec2(lit(1) - $"l_discount"))
        .cast("double").as("revenue"))
  }

  val revenueJoinSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1996-06-30'
      |  AND EXISTS (SELECT 1 FROM customer c
      |              WHERE c.c_custkey = o_custkey
      |                AND c.c_mktsegment = 'MACHINERY')
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin

  /** q04 — substring-containment semi-join (P4/J2: the resort fuzzy
    * membership filter 02_filter_by_CIN.py:205-225). A
    * BroadcastNestedLoopJoin with a `contains` theta-condition — the
    * literal keyword dim is tiny, so the NL join never shuffles the
    * fact side; `exists()` short-circuits like the reference's break.
    */
  def containsSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kws = Seq("widget", "bolt").toDF("kw")
    val part = Tables.part(s, dir)
    part.join(broadcast(kws), part("p_name").contains(kws("kw")), "left_semi")
      .select($"p_partkey", $"p_name", $"p_brand", $"p_type")
  }

  val containsSemiJoinSql: String =
    """SELECT p_partkey, p_name, p_brand, p_type FROM part
      |WHERE EXISTS (SELECT 1 FROM (VALUES ('widget'), ('bolt')) k(kw)
      |              WHERE contains(p_name, kw))""".stripMargin

  /** q05 — anti join (J6: live-vs-XML link reconciliation
    * 03_download_contracts.py:516-547; D5 keyword exclusion 09:320):
    * customers that never ordered. Plain left_anti — the planner
    * picks broadcast vs shuffle from the filtered build side's size
    * (AQE re-plans at runtime); no hint is forced here because at
    * 100 TB the date-filtered orders side is NOT reliably small.
    */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= to_timestamp(lit("2000-01-01 00:00:00")))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01')"""
      .stripMargin

  /** q06 — first-seen dedup (D1/D2/D3: the reference's control-db
    * membership lists, 02:252-268 / 03:713 / 04_convert:147-156) with
    * deterministic keep-first semantics via row_number — order-stable
    * under any partitioning, unlike bare dropDuplicates.
    */
  def dedupFirstSeen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
  }

  val dedupFirstSeenSql: String =
    """SELECT event_id, user_id, event_type, ts, value FROM (
      |  SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |           ORDER BY ts, event_id) AS rn FROM events e
      |) WHERE rn = 1""".stripMargin

  /** q07 — per-group top-k (O5: best-column-per-table ranking
    * 09_clean_tables.py:263-309 expressed as a partitioned window, per
    * SURVEY.md §2.9). Hash-partitioned window, no global sort.
    */
  def windowTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long")).where($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
  }

  val windowTopKSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o.*, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders o
      |) WHERE rn <= 3""".stripMargin

  /** q08 — union + distinct + broadcast dimension join (D4: the
    * case-insensitive link union 03:516-547). Distinct is a hash
    * aggregate on the union's key columns.
    */
  def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = Tables.nation(s, dir)
    val fromCust = Tables.customer(s, dir)
      .select($"c_nationkey".as("nationkey")).withColumn("src", lit("customer"))
    val fromSupp = Tables.supplier(s, dir)
      .select($"s_nationkey".as("nationkey")).withColumn("src", lit("supplier"))
    fromCust.union(fromSupp).distinct()
      .join(broadcast(n), $"nationkey" === n("n_nationkey"))
      .select($"n_name", $"src")
  }

  val unionDistinctSql: String =
    """SELECT n_name, src FROM (
      |  SELECT DISTINCT * FROM (
      |    SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
      |    UNION ALL
      |    SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier)
      |) u JOIN nation ON u.nationkey = n_nationkey""".stripMargin

  /** q16 — size accounting (A9: attachment byte totals
    * 03_download_contracts.py:611-657): exact decimal sums per group +
    * a single-IEEE-op double division for the MB rendering.
    */
  def sizeAccounting(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2($"o_totalprice")).cast("double").as("sum_price"))
      .withColumn("sum_millions", $"sum_price" / lit(1000000.0d))
  }

  val sizeAccountingSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / 1000000.0
      |    AS sum_millions
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** q17 — outcome counters (A10: the tosslevel discard-reason audit
    * 02_filter_by_CIN.py:184-301 as a *queryable* reason column, per
    * SURVEY.md §5). One computed column + groupBy — a single hash agg.
    */
  def outcomeCounters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .withColumn("reason",
        when($"o_totalprice" < 50000.0, "low_price")
          .when($"o_orderstatus" === "F", "finished")
          .when(year($"o_orderdate") < 1997, "too_old")
          .otherwise("kept"))
      .groupBy($"reason").agg(count(lit(1)).as("n"))
  }

  val outcomeCountersSql: String =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low_price'
      |            WHEN o_orderstatus = 'F' THEN 'finished'
      |            WHEN year(o_orderdate) < 1997 THEN 'too_old'
      |            ELSE 'kept' END AS reason,
      |       COUNT(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  /** q18 — calendar dimension ops (F18-F20: the hand-rolled
    * leap-year/day clamping of 00_download_CRZ_DB.py:28-98 becomes
    * date_trunc + last_day).
    */
  def dateDimension(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .withColumn("month_start", date_trunc("month", $"o_orderdate").cast("date"))
      .withColumn("month_end", last_day($"o_orderdate".cast("date")))
      .groupBy($"month_start", $"month_end").agg(count(lit(1)).as("n_orders"))
  }

  val dateDimensionSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |       COUNT(*) AS n_orders
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** q19 — as-of join: each event matched to the latest order (by
    * o_orderdate, ties → highest o_orderkey) of the same user at or
    * before the event timestamp.
    *
    * Implemented the scalable way (SURVEY.md §2.3 "absent from the
    * reference" list): tag + union + single partitioned window — one
    * shuffle on the key, no O(events × orders) range join, no
    * broadcast requirement on either side. This survives 100 TB where
    * a join-then-filter would explode.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id".as("key"), $"ts".as("at"),
        $"event_id", lit(1).as("is_event"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("timestamp").as("o_orderdate"))
    val od = Tables.orders(s, dir)
      .select($"o_custkey".as("key"), $"o_orderdate".as("at"),
        lit(null).cast("long").as("event_id"), lit(0).as("is_event"),
        $"o_orderkey", $"o_orderdate")
    // orders sort before events at the same instant (is_event asc) so the
    // running last_value already includes same-timestamp orders; among
    // same-date orders the highest orderkey wins.
    val w = Window.partitionBy($"key")
      .orderBy($"at", $"is_event", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.union(od)
      .withColumn("last_orderkey", last($"o_orderkey", ignoreNulls = true).over(w))
      .withColumn("last_orderdate", last($"o_orderdate", ignoreNulls = true).over(w))
      .where($"is_event" === 1)
      .select($"event_id", $"key".as("user_id"), $"at".as("ts"),
        $"last_orderkey", $"last_orderdate")
  }

  /** q41 — global top-k (TakeOrderedAndProject: sort + limit fuse into
    * a per-partition top-k + single merge — no global sort at scale).
    * Deterministic tiebreak on the key. */
  def topOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  val topOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** q42 — orders above their customer's average (the correlated
    * scalar subquery family). Implemented as the scalable join-agg
    * form — one aggregation + one equi-join — while the oracle states
    * it as the correlated subquery; both must agree exactly, which the
    * decimal average guarantees. */
  def aboveCustomerAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    // price > avg ⟺ price * n > sum — cross-multiplied so the compare
    // is exact decimal arithmetic (division scales differ per engine)
    val byCust = o.groupBy($"o_custkey".as("ck"))
      .agg(sum(dec2($"o_totalprice")).as("sum_price"),
        count(lit(1)).as("n"))
    o.join(byCust, $"o_custkey" === $"ck")
      .where(dec2($"o_totalprice") * $"n" > $"sum_price")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  val aboveCustomerAvgSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(12,2)) *
      |      (SELECT COUNT(*) FROM orders o2
      |       WHERE o2.o_custkey = o.o_custkey) >
      |      (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(12,2)))
      |       FROM orders o3 WHERE o3.o_custkey = o.o_custkey)"""
      .stripMargin

  /** q46 — bounded interval join (the range-join family SURVEY.md §2.3
    * lists as absent from the reference): for each error event, the
    * number of click events by the same user in the preceding 2 hours.
    *
    *
    * Implemented the scalable way: both sides bucketed to the
    * 2-hour grid and joined on (user, bucket) with the click side
    * expanded to its two candidate buckets — an equi-join whose
    * per-key width is bounded by the window, never an O(n·m) range
    * scan. The oracle states the naive correlated range join; results
    * must agree exactly.
    */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val win = 7200L * 1000000L // 2 h in micros
    val errors = ev.where($"event_type" === "error")
      .select($"event_id", $"user_id", unix_micros($"ts").as("t_err"),
        expr(s"unix_micros(ts) div $win").as("bucket"))
    // each click can only match errors in its own or the next bucket
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("t_click"))
      .withColumn("bucket",
        explode(array(expr(s"t_click div $win"), expr(s"t_click div $win") + 1)))
    errors.join(clicks, Seq("user_id", "bucket"), "left")
      .withColumn("hit",
        when($"t_click".isNotNull &&
          $"t_click" >= $"t_err" - win && $"t_click" < $"t_err", 1L)
          .otherwise(0L))
      .groupBy($"event_id", $"user_id")
      .agg(sum($"hit").as("n_recent_clicks"))
  }

  val intervalJoinSql: String =
    """SELECT e.event_id, e.user_id,
      |  (SELECT COUNT(*) FROM events c
      |   WHERE c.event_type = 'click' AND c.user_id = e.user_id
      |     AND epoch_us(c.ts) >= epoch_us(e.ts) - CAST(7200000000 AS BIGINT)
      |     AND epoch_us(c.ts) < epoch_us(e.ts)) AS n_recent_clicks
      |FROM events e WHERE e.event_type = 'error'""".stripMargin

  val asofJoinSql: String =
    """SELECT event_id, user_id, ts, last_orderkey, last_orderdate FROM (
      |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey,
      |         o.o_orderdate AS last_orderdate,
      |         ROW_NUMBER() OVER (PARTITION BY e.event_id
      |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |) WHERE rn = 1""".stripMargin
}

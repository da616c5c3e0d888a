package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Storage-layout operators for the 100 TB deployment (SURVEY.md §4
  * "partitioned layout `date=` / bucketed by contract id"): the
  * date-partitioned landing layout the reference's daily dumps imply
  * (00_download_CRZ_DB.py:179-219), plus salting for skewed keys.
  */
object LayoutOps {

  /** Write a frame date-partitioned (`month=YYYY-MM/`). Readers that
    * filter on `month` prune partitions at planning time — verified by
    * LayoutSpec via PartitionFilters in the scan plan. */
  def writeDatePartitioned(df: DataFrame, tsCol: String,
      path: String): Unit =
    df.withColumn("month", date_format(col(tsCol), "yyyy-MM"))
      .write.mode("overwrite")
      .partitionBy("month")
      .parquet(path)

  /** q36 — partition-pruned scan over the date layout: only the
    * requested months are read. Returns per-month counts. */
  def prunedMonthlyCounts(s: SparkSession, path: String,
      months: Seq[String]): DataFrame =
    s.read.parquet(path)
      .where(col("month").isin(months: _*))
      .groupBy(col("month")).agg(count(lit(1)).as("n"))

  /** Months [[prunedMonthlyOrderCounts]] prunes to — fixed values
    * present at every SF (orders span 1995-01..2001-08), so the DuckDB
    * oracle can state the same predicate on the unpartitioned table. */
  val PrunedMonths: Seq[String] = Seq("1996-03", "1996-04")

  /** q36 — the date layout end-to-end as a driver-checkable query:
    * write orders `month=`-partitioned, then scan with a month filter
    * that planning-time partition pruning resolves to exactly two
    * directories (PartitionFilters asserted in LayoutSpec). The oracle
    * computes the same counts from the UNPARTITIONED table — proving
    * the layout round-trip loses nothing. At 100 TB the pruned scan
    * reads ~2/80ths of the table; the unpartitioned one reads it all. */
  def prunedMonthlyOrderCounts(s: SparkSession, dir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(
      s.sessionState.conf.warehousePath, "graft_orders_by_month").toString
    writeDatePartitioned(
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
      "o_orderdate", path)
    prunedMonthlyCounts(s, path, PrunedMonths)
  }

  val prunedMonthlyOrderCountsSql: String = {
    val in = PrunedMonths.map(m => s"'$m'").mkString(", ")
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM orders
       |WHERE strftime(o_orderdate, '%Y-%m') IN ($in)
       |GROUP BY 1""".stripMargin
  }

  /** Salted aggregation for skewed keys: two-phase groupBy — first on
    * (key, salt) to spread a hot key over `buckets` reducers, then on
    * key. AQE handles moderate skew automatically; this is the
    * explicit pattern for pathological keys (SURVEY.md §7.1.8).
    */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("partial")).as("n"))

  /** Bucketed co-located join: write both sides bucketed+sorted on the
    * join key (`bucketBy` + `saveAsTable`), then join — Spark reads
    * bucket metadata and skips BOTH shuffle exchanges. At 100 TB this
    * is the difference between re-shuffling the fact table on every
    * join and a one-time layout cost (SURVEY.md §4 "bucketed by
    * contract id"). Returns the joined aggregate; LayoutSpec asserts
    * the plan has no Exchange over the scans.
    */
  def bucketedJoin(s: SparkSession, dir: String, buckets: Int): DataFrame = {
    // a previous session may have left the managed-table locations on
    // disk without catalog entries (in-memory catalog) — clear both
    Seq("graft_li_bucketed", "graft_o_bucketed").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.conf.warehousePath, t)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // layout cost is proportional to what you bucket: project to the
    // join/agg columns before the one-time bucketed write
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_li_bucketed")
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_o_bucketed")
    val li = s.table("graft_li_bucketed")
    val o = s.table("graft_o_bucketed")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).as("sum_qty"))
  }

  /** q53 — [[bucketedJoin]] as a driver-checkable query (both scans
    * shuffle-free; decimal-exact sum cast to DOUBLE only at the output
    * edge so the hash compare sees one canonical rendering). */
  def bucketedOrderPriority(s: SparkSession, dir: String): DataFrame =
    bucketedJoin(s, dir, buckets = 8)
      .withColumn("sum_qty", col("sum_qty").cast("double"))

  val bucketedOrderPrioritySql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** q37 — distinct-count sketches (the HLL family SURVEY.md §2.4
    * notes as absent from the reference; a north-star extension):
    * exact vs approx distinct users per event type. approx values are
    * engine-specific, so the driver records the weaker rows-only check
    * for this query. The percentile sketch is flattened to scalar
    * p50/p95 columns — an array column breaks the driver's row-sort. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        // one sketch, both quantiles — flattened to scalars after
        expr("approx_percentile(value, array(0.5, 0.95), 1000)").as("pp"))
      .select(col("event_type"), col("exact_users"), col("approx_users"),
        col("pp").getItem(0).as("value_p50"),
        col("pp").getItem(1).as("value_p95"))
}

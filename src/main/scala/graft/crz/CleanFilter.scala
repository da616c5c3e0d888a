package graft.crz

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entry point 1 — the clean-filter stage (02_filter_by_CIN.py,
  * SURVEY.md §3 "Entry point 1"): one declarative DataFrame chain
  * replacing the reference's sequential per-row filter cascade; the
  * tosslevel discard-reason audit becomes a computed `reason` column
  * (SURVEY.md §5 observability parity) so the audit is queryable, not
  * console noise.
  *
  * Scale notes: both dimensions broadcast (companies ~10^3 rows,
  * resorts ~10^1); all predicates are Catalyst expressions fused into
  * one WholeStageCodegen stage over the fact scan; dedup is a window
  * on the identity key, hash-partitioned — the reference's O(n²)
  * membership list disappears.
  */
object CleanFilter {

  /** Filter parameters (the reference's interactive input()s,
    * 02_filter_by_CIN.py:109-168, as a config object). */
  final case class Params(
      minPrice: java.math.BigDecimal = java.math.BigDecimal.ZERO,
      // string, resolved via to_timestamp in the session time zone —
      // a java.sql.Timestamp here would bind the JVM-default zone
      minDate: String = "2011-01-01 00:00:00",
      requireAttachment: Boolean = true)

  private def normIco(c: Column): Column = regexp_replace(c, " ", "")
  private def normName(c: Column): Column =
    upper(regexp_replace(c, " ", ""))

  /** The discard-reason classifier (A10: tosslevels 1-5,
    * 02_filter_by_CIN.py:184-301). `kept` rows have reason 'kept'. */
  def withReason(contracts: DataFrame, companies: DataFrame,
      resorts: DataFrame, params: Params): DataFrame = {
    // fail a malformed minDate HERE, as a config error, not deep in
    // the cascade: under ANSI (Spark 4 default) to_timestamp would
    // abort mid-job with a DateTimeException far from the cause; with
    // ANSI off it would read NULL and silently disable the date filter
    require(
      scala.util.Try(java.time.LocalDateTime.parse(params.minDate,
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))).isSuccess,
      s"minDate must be 'yyyy-MM-dd HH:mm:ss', got '${params.minDate}'")
    // broadcast the normalized membership sets (J1 list / J2 names)
    val icoSet = companies
      .select(normIco(col("ICO")).as("ico")).distinct()
    val resortNames = resorts
      .select(normName(col("name")).as("rname")).distinct()
    val c = contracts
      .join(broadcast(icoSet), normIco(col("dodavatelIco")) === col("ico"),
        "left")
      .withColumn("cin_ok", col("ico").isNotNull)
      .drop("ico")
    // P4 — resort containment: any resort name is a substring of the
    // normalized purchaser (02:205-225); exists() short-circuits like
    // the reference's break.
    // hint goes on the aggregated one-row frame — broadcast() below an
    // Aggregate is lost and the crossJoin could plan a CartesianProduct
    val rlist = broadcast(
      resortNames.agg(collect_list(col("rname")).as("rnames")))
    // coalesce(false): a NULL objednavatel nulls contains() and then
    // exists(), and when(!NULL) would silently skip the no_resort
    // branch — the reference str()'s NaN to 'nan', matches no resort,
    // and discards (same guard as the prilohy predicate below).
    val withResort = c.crossJoin(rlist)
      .withColumn("resort_ok",
        coalesce(
          expr("exists(rnames, r -> contains(upper(replace(objednavatel, ' ', '')), r))"),
          lit(false)))
      .drop("rnames")
    // sequential filter cascade order preserved from 02:184-301:
    // CIN membership, resort containment, attachments, price, date —
    // first failing predicate names the discard.
    val preDedup = withResort
      .withColumn("pre_reason",
        when(!col("cin_ok"), "no_cin")
          .when(!col("resort_ok"), "no_resort")
          .when(lit(params.requireAttachment) &&
            !expr("exists(coalesce(prilohy, array()), " +
              "a -> coalesce(a.url LIKE 'https://%', false))"),
            "no_attachment")
          .when(col("cenaKonecna").isNull ||
            col("cenaKonecna") < lit(params.minPrice), "price_below_min")
          .when(col("datumZverejnenia").isNull ||
            col("datumZverejnenia") < to_timestamp(lit(params.minDate)),
            "date_below_min")
          .otherwise("kept"))
    // dedup LAST and only among rows that survived the cascade —
    // the reference's control_db only ever sees rows that passed the
    // earlier filters (02:252-268), so a discarded earlier row must
    // not shadow a later survivor.
    val w = Window
      .partitionBy(col("nazov"), col("id"),
        (col("pre_reason") === "kept").as("survivor"))
      .orderBy(col("datumZverejnenia"), col("innerId"))
    preDedup
      .withColumn("rn", row_number().over(w))
      .withColumn("reason",
        when(col("pre_reason") =!= "kept", col("pre_reason"))
          .when(col("rn") > 1, "duplicate")
          .otherwise("kept"))
      .drop("rn", "cin_ok", "resort_ok", "pre_reason")
  }

  /** The cleaned table: kept rows only, ordered projection
    * (02_filter_by_CIN.py:304-310). */
  def clean(contracts: DataFrame, companies: DataFrame,
      resorts: DataFrame, params: Params): DataFrame =
    withReason(contracts, companies, resorts, params)
      .where(col("reason") === "kept").drop("reason")

  /** The audit table (A10): per-reason counts, queryable. */
  def audit(contracts: DataFrame, companies: DataFrame,
      resorts: DataFrame, params: Params): DataFrame =
    withReason(contracts, companies, resorts, params)
      .groupBy(col("reason")).agg(count(lit(1)).as("n"))
}

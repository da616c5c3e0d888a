package graft.crz

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Functions

/** Entry point 3 — the extracted-tables pipeline
  * (07_keyword_tag&filter_tables.py + 09_clean_tables.py, SURVEY.md §3
  * "Entry point 3", §2.8 H1-H3, §2.2 P9-P14, §2.4 A5/A6/A11).
  *
  * Data model (SURVEY.md §7.4.5): every extracted table is rows in ONE
  * long frame `(contract_id, table_no, row_idx, col_idx, cell)` — a
  * million heterogeneous little tables never become a million driver
  * DataFrames; every per-column statistic is one
  * groupBy(contract_id, table_no, col_idx) conditional-aggregation
  * pass (the reference's four separate row loops, 09:180-309).
  */
object TablesPipeline {

  /** Keyword sets mirroring keywords.txt's categories used by 07/09. */
  final case class Keywords(
      position: Seq[String],   // 'Pozícia' category
      header: Seq[String],     // 'Hlavička tabuľky'
      priceHeader: Seq[String] // 'Hlavička cena'
  )

  private def containsAny(c: org.apache.spark.sql.Column,
      kws: Seq[String]): org.apache.spark.sql.Column =
    // reduceOption: an empty keyword category (a plausible keywords.txt
    // state) must read as "no hit", not crash query construction with
    // a contextless empty.reduceLeft
    kws.map(k => lower(c).contains(k.toLowerCase))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Load one extracted-table pipe-CSV (camelot output shape,
    * FIXTURES.md A7) into the long cell frame. headerless read — row 0
    * is data until H1 decides it's a header. */
  def readTableCsv(s: SparkSession, path: String, contractId: String,
      tableNo: Int): DataFrame = {
    val raw = s.read.option("sep", "|").option("header", "false")
      .option("multiLine", "true").option("quote", "\"")
      .csv(path)
    val cols = raw.columns
    val arr = array(cols.toIndexedSeq.map(c => coalesce(col(c), lit(""))): _*)
    raw
      .withColumn("row_idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(monotonically_increasing_id())) - 1)
      .select(lit(contractId).as("contract_id"), lit(tableNo).as("table_no"),
        col("row_idx"), posexplode(arr).as(Seq("col_idx", "cell")))
  }

  /** A6 — the single per-column stats pass: non-empty count (P10),
    * numeric-row ratio (P12), position-keyword hits (H2), spell
    * wrong-ratio inputs (P11). One shuffle for every statistic. */
  def columnStats(cells: DataFrame, dictionary: DataFrame,
      kws: Keywords): DataFrame = {
    // spell ratio needs token-level membership: tokenize cells, check
    // against the broadcast dictionary, re-aggregate per column.
    val tokens = cells
      .select(col("contract_id"), col("table_no"), col("col_idx"),
        explode(split(lower(col("cell")), "\\s+")).as("word"))
      .where(col("word") =!= "")
    val spelled = Dictionary.spellOk(tokens, dictionary)
      .groupBy(col("contract_id"), col("table_no"), col("col_idx"))
      .agg(sum(when(col("known"), 0L).otherwise(1L)).as("n_wrong"),
        count(lit(1)).as("n_tokens"))
    val base = cells.groupBy(col("contract_id"), col("table_no"), col("col_idx"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(trim(col("cell")) =!= "" && col("cell") =!= "nan", 1L)
          .otherwise(0L)).as("n_nonempty"),
        // P12 is digit-CONTAINMENT (09_clean_tables.py:268 `\d+`
        // findall > 0), not a strict numeric-shape match — '15%',
        // '-100,00' and '10 ks' all count numeric in the reference
        sum(when(col("cell").rlike("\\d"), 1L).otherwise(0L)).as("n_numeric"),
        sum(when(containsAny(col("cell"), kws.position), 1L).otherwise(0L))
          .as("n_position_hits"))
    base.join(spelled,
        Seq("contract_id", "table_no", "col_idx"), "left")
      .withColumn("n_wrong", coalesce(col("n_wrong"), lit(0L)))
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("empty_col", col("n_nonempty") === 0)                       // P10
      .withColumn("wrong_ratio",
        when(col("n_tokens") > 0,
          col("n_wrong").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("dummy_col", col("wrong_ratio") > 0.75)                     // P11
      .withColumn("numeric_ratio",
        col("n_numeric").cast("double") / col("n_rows").cast("double"))
      .withColumn("numeric_col", col("numeric_ratio") > 0.75)                 // P12
      .withColumn("position_ratio",
        col("n_position_hits").cast("double") / col("n_rows").cast("double"))
      .withColumn("position_col", col("n_position_hits") > 0)                 // H2
  }

  /** H1/A11 — header detection: keyword score of row 0 (> 2 ⇒ header,
    * 09_clean_tables.py:222-241); P14 — VAT flags on the header row.
    * Both are PER-CELL, as the reference iterates column names
    * (`column.count(keyword)`, `'s DPH' in column` — 09:236,342): a
    * keyword straddling two adjacent header cells must not score, and
    * 'bez' + 'DPH' split across cells is not a VAT flag. Per-cell
    * sums/exists are order-independent, so no cell-order reassembly
    * is needed for determinism. */
  def tableHeader(cells: DataFrame, kws: Keywords): DataFrame = {
    val s = cells.sparkSession
    Functions.register(s)
    // backslashes first, then quotes: a keyword containing `\` must not
    // produce an escape sequence the SQL parser reinterprets (and the
    // \' form assumes spark.sql.parser.escapedStringLiterals=false,
    // Spark's default)
    def sqlLit(k: String) =
      k.toLowerCase.replace("\\", "\\\\").replace("'", "\\'")
    val row0 = cells.where(col("row_idx") === 0)
      .groupBy(col("contract_id"), col("table_no"))
      .agg(expr("collect_list(lower(cell))").as("hcells"))
    val score = kws.header.map(k => expr(
      s"aggregate(hcells, 0L, (acc, c) -> acc + count_occurrences(c, '${sqlLit(k)}'))"))
      .reduceOption(_ + _).getOrElse(lit(0L))
    row0
      .withColumn("header_score", score)
      .withColumn("has_header", col("header_score") > 2)                      // H1
      .withColumn("vat_incl",
        expr("exists(hcells, c -> contains(c, 's dph'))"))                    // P14
      .withColumn("vat_excl",
        expr("exists(hcells, c -> contains(c, 'bez dph'))"))
      .drop("hcells")
  }

  /** H3 + P13 — price-column identification and the price-table gate
    * (09_clean_tables.py:266-309): when the table has a detected
    * header AND at least one column's header cell contains a
    * `Hlavička cena` keyword (case-sensitive substring, like the
    * reference's `keyword in column`), price candidates are RESTRICTED
    * to those header-matched columns; otherwise every column is a
    * candidate. Candidates must still clear the numeric-ratio > 0.75
    * bar, and position/empty/dummy columns are excluded (empty and
    * dummy columns are dropped before the reference reaches step 6).
    * Table kept iff ≥ 1 price column. */
  def tableGate(stats: DataFrame, header: DataFrame, cells: DataFrame,
      kws: Keywords): DataFrame = {
    val hdrPriceHit = kws.priceHeader
      .map(k => col("cell").contains(k))
      .reduceOption(_ || _).getOrElse(lit(false))
    val hdrHits = cells.where(col("row_idx") === 0)
      .select(col("contract_id"), col("table_no"), col("col_idx"),
        hdrPriceHit.as("hdr_price"))
    val byTable = org.apache.spark.sql.expressions.Window
      .partitionBy(col("contract_id"), col("table_no"))
    val candidates = stats
      .join(hdrHits, Seq("contract_id", "table_no", "col_idx"), "left")
      .withColumn("hdr_price", coalesce(col("hdr_price"), lit(false)))
      .join(header.select(col("contract_id"), col("table_no"),
        col("has_header")), Seq("contract_id", "table_no"))
      .withColumn("restricted",
        col("has_header") &&
          max(when(col("hdr_price"), 1).otherwise(0)).over(byTable) > 0)
      .withColumn("price_col",
        col("numeric_col") && !col("position_col") && !col("empty_col") &&
          !col("dummy_col") && (!col("restricted") || col("hdr_price")))
    val priceCols = candidates.where(col("price_col"))
      .groupBy(col("contract_id"), col("table_no"))
      .agg(count(lit(1)).as("n_price_cols"),
        sort_array(collect_list(col("col_idx"))).as("price_cols"))
    val posCols = stats.where(col("position_col"))
      .groupBy(col("contract_id"), col("table_no"))
      .agg(count(lit(1)).as("n_position_cols"))
    header
      .join(priceCols, Seq("contract_id", "table_no"), "left")
      .join(posCols, Seq("contract_id", "table_no"), "left")
      .withColumn("n_price_cols", coalesce(col("n_price_cols"), lit(0L)))
      .withColumn("n_position_cols", coalesce(col("n_position_cols"), lit(0L)))
      .withColumn("price_table", col("n_price_cols") > 0)                     // P13
  }

  /** Cleaned cells: drop empty (P10) and dummy (P11) columns of tables
    * passing the price gate (P13) — the output of 09. */
  def cleanedCells(cells: DataFrame, stats: DataFrame,
      gate: DataFrame): DataFrame =
    cells
      .join(stats.select(col("contract_id"), col("table_no"), col("col_idx"),
        col("empty_col"), col("dummy_col")),
        Seq("contract_id", "table_no", "col_idx"))
      .join(gate.select(col("contract_id"), col("table_no"), col("price_table")),
        Seq("contract_id", "table_no"))
      .where(col("price_table") && !col("empty_col") && !col("dummy_col"))
      .drop("empty_col", "dummy_col", "price_table")

  /** A5 — suggested keywords: tokens from position columns of tables
    * with ≥1 position and ≥1 price column accumulate the column's hit
    * ratio; existing keywords excluded (D5, 09:311-324). */
  def suggestedKeywords(cells: DataFrame, stats: DataFrame,
      gate: DataFrame, existing: DataFrame): DataFrame =
    cells
      .join(stats.where(col("position_col"))
        .select(col("contract_id"), col("table_no"), col("col_idx"),
          col("position_ratio")),
        Seq("contract_id", "table_no", "col_idx"))
      .join(gate.where(col("price_table") && col("n_position_cols") > 0)
        .select(col("contract_id"), col("table_no")),
        Seq("contract_id", "table_no"))
      .select(explode(split(lower(col("cell")), "\\s+")).as("word"),
        col("position_ratio"))
      .where(col("word") =!= "")
      .join(broadcast(existing.select(lower(col("keyword")).as("word"))),
        Seq("word"), "left_anti")
      .groupBy(col("word"))
      .agg(sum(col("position_ratio")).as("weight"))
      .orderBy(col("weight").desc, col("word"))

  /** P9/A3 — table relevance filter: keep tables whose raw text hits
    * any of the taxonomy categories (07:176-197), via the same TF
    * machinery as the corpus tagging. */
  def relevantTables(cells: DataFrame, keywords: DataFrame): DataFrame = {
    val s = cells.sparkSession
    Functions.register(s)
    // (row_idx, col_idx)-ordered reassembly: the raw-text TF must see
    // the file's own cell order (07:115-132), and multi-word keywords
    // can only match across adjacent cells deterministically
    val text = cells.groupBy(col("contract_id"), col("table_no"))
      .agg(lower(array_join(expr(
        "transform(sort_array(collect_list(struct(row_idx, col_idx, cell))), " +
          "x -> x.cell)"), " ")).as("t"))
    text.crossJoin(broadcast(keywords))
      .select(col("contract_id"), col("table_no"),
        Functions.countOccurrences(col("t"), lower(col("keyword")))
          .as("hits"))
      .groupBy(col("contract_id"), col("table_no"))
      .agg(sum(col("hits")).as("total_hits"))
      .where(col("total_hits") > 0)
  }
}

package graft.crz

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Functions

/** Entry point 2 — keyword tagging & ranking (04_tag_text_contracts.py,
  * SURVEY.md §3 "Entry point 2"): per-contract text concat → TF over a
  * broadcast taxonomy (A1, `str.count` semantics via the native
  * CountOccurrences expression) → category rollup + Výskyty grand
  * total (A2) → char count (A7) → numeric ranking sort (O1, with the
  * reference's string-sort quirk deliberately fixed — SURVEY.md
  * §7.4.3) → zero-hit filter (P8) → wide pivot only at export (F29,
  * SURVEY.md §1.3).
  *
  * Scale notes: keywords broadcast; the only shuffles are the
  * per-contract concat agg and the per-(contract,category) rollup, both
  * map-side combined. The wide ~80-column pivot exists ONLY in
  * `exportWide` — internal form stays long.
  */
object Tagging {

  /** keywords: DataFrame[category, keyword] (keywords.txt shape). */
  def tagLong(corpus: DataFrame, keywords: DataFrame): DataFrame = {
    val s = corpus.sparkSession
    Functions.register(s)
    // per-contract casefolded text concat (04_tag:103-113), files in
    // name order — collect_list order alone is not deterministic
    val docs = corpus
      .groupBy(col("contract_id"))
      .agg(lower(expr(
        "array_join(transform(sort_array(collect_list(struct(file, text)))," +
          " x -> x.text), ' ')")).as("t"))
    // distinct: a repeated keywords.txt line (plausible in a hand-
    // maintained file) would otherwise double-count the category and
    // Výskyty totals while the wide export's per-keyword pivot shows
    // the single count — an internally inconsistent export row. The
    // reference's dict-based taxonomy collapses duplicates by
    // construction.
    docs.crossJoin(broadcast(keywords.distinct()))
      .select(col("contract_id"), col("category"), col("keyword"),
        Functions.countOccurrences(col("t"), lower(col("keyword")))
          .as("hits"))
  }

  /** Per-(contract, category) sums + per-contract Výskyty total (A2). */
  def categoryTotals(tagged: DataFrame): DataFrame =
    tagged.groupBy(col("contract_id"), col("category"))
      .agg(sum(col("hits")).as("category_hits"))

  def grandTotals(tagged: DataFrame): DataFrame =
    tagged.groupBy(col("contract_id"))
      .agg(sum(col("hits")).as("vyskyty"))

  /** Ranked tagged table (O1/A7/P8): join contract metadata (J3),
    * char counts, numeric 3-key desc ranking, zero-hit drop. */
  def ranked(corpus: DataFrame, keywords: DataFrame,
      contracts: DataFrame): DataFrame =
    rankedFromTagged(tagLong(corpus, keywords), corpus, contracts)

  /** [[ranked]] over an already-built tagged frame — callers that also
    * materialize the tagged output (Pipeline.run) must not pay the
    * corpus-concat + TF crossJoin twice. */
  def rankedFromTagged(tagged: DataFrame, corpus: DataFrame,
      contracts: DataFrame): DataFrame = {
    val totals = grandTotals(tagged)
    val chars = corpus.groupBy(col("contract_id"))
      .agg(sum(length(col("text"))).as("pocetZnakov"))
    // the unpartitioned window pulls every surviving contract into ONE
    // task — accepted DELIBERATELY: this is the reference's final
    // human-facing ranking (a single CSV, 04_tag:193-198), thousands
    // of rows after the vyskyty > 0 cut even at full corpus size. Do
    // not reuse this shape for corpus-scale frames (q12's per-source
    // docRank partitions; q63 bounds with WindowGroupLimit).
    val w = Window.orderBy(col("vyskyty").desc, col("pocetZnakov").desc,
      col("cenaKonecna").desc, col("contract_id"))
    totals
      .join(chars, "contract_id")
      .join(contracts.withColumnRenamed("id", "contract_id"), "contract_id")
      .where(col("vyskyty") > 0)
      .withColumn("rank", row_number().over(w))
  }

  /** Wide export (F29): one column per keyword, per-category sums and
    * the Výskyty total — the reference's export shape
    * (04_tag:83-89,176-178), produced by pivot at the edge only.
    * Column names are `category_keyword` joined with '_', the
    * reference's own convention — so, like the reference, a category
    * name that itself contains '_' can collide with another pair or
    * with a per-category column; keywords.txt is curated not to. */
  def exportWide(tagged: DataFrame): DataFrame = {
    val perKeyword = tagged.groupBy(col("contract_id"))
      .pivot(concat_ws("_", col("category"), col("keyword")))
      .agg(first(col("hits")))
    val perCategory = categoryTotals(tagged)
      .groupBy(col("contract_id"))
      .pivot(col("category")).agg(first(col("category_hits")))
    val total = grandTotals(tagged)
    perKeyword.join(perCategory, "contract_id").join(total, "contract_id")
  }
}

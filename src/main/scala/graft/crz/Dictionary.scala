package graft.crz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dictionary mining (05_build_special_dictionary.py, SURVEY.md §2.4
  * A4 / §2.7 F21-F22): Slovak-alphabet tokenization, spell-membership
  * against broadcast dictionaries, out-of-vocabulary wordcount with
  * HAVING count > 5.
  *
  * Spell semantics note (SURVEY.md §7.4.1): real hunspell applies affix
  * morphology; the engine uses wordlist-set membership (dic wordlist ∪
  * special dict ∪ keywords), which is what the reference itself does
  * for the special dict (09_clean_tables.py:85,134). The delta is
  * documented, deliberate, and pinned by fixture tests.
  */
object Dictionary {

  /** Load a hunspell-style `.dic` wordlist: first line is the word
    * count header (dropped — it is the only all-digit line a wordlist
    * legitimately contains), one word per line after. One loader for
    * Pipeline.run and every spec — the header rule lives here only. */
  def loadDic(s: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    s.read.text(path)
      .withColumnRenamed("value", "word")
      .where(!col("word").rlike("^[0-9]+$"))

  /** F21 — Slovak-alphabet tokenizer (05_build:22-38): split on any
    * run of characters outside the Slovak alphabet. */
  val slovakTokenSplit = "[^aáäbcčdďeéfghiíjklĺľmnňoóôpqrŕsštťuúvwxyýzž]+"

  def tokenize(corpus: DataFrame): DataFrame =
    corpus
      .select(col("contract_id"),
        explode(split(lower(col("text")), slovakTokenSplit)).as("word"))
      .where(col("word") =!= "")

  /** A4 — OOV mining: words failing dictionary membership, counted,
    * kept above the reference's threshold (count > 5, 05_build:139),
    * sorted desc (O2). `dictionary`: DataFrame[word]. */
  def mineSpecialWords(corpus: DataFrame, dictionary: DataFrame,
      minCount: Long = 5L): DataFrame =
    tokenize(corpus)
      .join(broadcast(dictionary.select(lower(col("word")).as("word"))
        .distinct()), Seq("word"), "left_anti")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .where(col("n") > minCount)
      .orderBy(col("n").desc, col("word"))

  /** Numeric/currency tokens hunspell's spell() accepts without a
    * dictionary hit (09_clean_tables.py:91-93 accepts numbers): prices
    * like '100,00', '100 €', '15%'. Without this rule every price
    * column scores wrong_ratio 1.0 and is dropped as a dummy column —
    * the very columns the price-table gate exists to keep. At least
    * one digit is required so punctuation-only tokens ('-', '€€€',
    * '...') stay misspelled — hunspell accepts numbers, not bare
    * punctuation, and a column of dash placeholders IS a dummy column. */
  val numericTokenPattern = "^[0-9., €%-]+$"
  private val hasDigit = "[0-9]"

  /** Parse the REP table of a hunspell `.aff` file (sk_SK.aff's 52
    * rules) into (rep_from, rep_to) rows. The `REP <count>` header
    * line has only two tokens and is excluded by the three-token
    * pattern. */
  def loadRepRules(s: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    s.read.text(path)
      .where(col("value").rlike("^REP\\s+\\S+\\s+\\S+"))
      .select(split(col("value"), "\\s+").as("p"))
      .select(element_at(col("p"), 2).as("rep_from"),
        element_at(col("p"), 3).as("rep_to"))

  /** Hunspell-affix approximation (F22 delta-shrinker, SURVEY §7.4.1):
    * expand the wordlist with every single-rule REP application
    * before it is broadcast, so diacritic/inflection variants the
    * `.aff` REP table anticipates ('dielo' + `REP o a` → 'diela')
    * pass membership. This narrows, not closes, the gap to full affix
    * morphology: REP is hunspell's substitution table, applied here to
    * ALL occurrences per rule (one rule per variant, like hunspell's
    * one-REP suggestion step). Dictionary-side-only work: wordlist ×
    * rules happens once on the dim side, before broadcast — the corpus
    * never pays for it. */
  def expandWithRep(dictionary: DataFrame, repRules: DataFrame): DataFrame = {
    val base = dictionary.select(lower(col("word")).as("word"))
    val expanded = base
      .crossJoin(broadcast(repRules))
      .where(col("word").contains(col("rep_from")))
      .select(replace(col("word"), col("rep_from"), col("rep_to")).as("word"))
    base.union(expanded).distinct()
  }

  /** F22 — spell(word): broadcast-set membership column (used by the
    * tables pipeline's dummy-column test P11). A word is known if it is
    * in the wordlist OR is a numeric/currency token. */
  def spellOk(words: DataFrame, dictionary: DataFrame): DataFrame =
    words.join(
      broadcast(dictionary.select(lower(col("word")).as("word"))
        .withColumn("known", lit(true)).distinct()),
      Seq("word"), "left")
      .withColumn("known",
        coalesce(col("known"), lit(false)) ||
          (col("word").rlike(numericTokenPattern) &&
            col("word").rlike(hasDigit)))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Functions

/** Text analytics — the Spark-first re-expression of the reference's
  * keyword tagging / dictionary mining / subject extraction stages
  * (SURVEY.md §2.4 A1-A7, §2.7, entry point 2:
  * 04_tag_text_contracts.py, 05_build_special_dictionary.py,
  * 08_extract_subject.py) over the `documents` corpus, plus the
  * text-analysis operators a training-data pipeline needs (language
  * ID, quality scoring, token counting, fingerprinting).
  *
  * Scale notes (100 TB):
  *  - the keyword taxonomy is a literal broadcast dim (a few dozen
  *    rows) — the doc×keyword cross join is a BroadcastNestedLoopJoin
  *    that never shuffles the corpus;
  *  - term frequency uses the native codegen'd [[graft.functions
  *    .CountOccurrences]] expression, not a UDF — it stays inside
  *    WholeStageCodegen;
  *  - all per-doc metrics are narrow (no shuffle); the only wide ops
  *    are the final groupBy(word) wordcount and the rollup, both
  *    map-side-combined hash aggregations.
  */
object TextOps {

  /** Keyword taxonomy — the literal analogue of the reference's
    * keywords.txt (category as first CSV token, SURVEY.md §1.1),
    * using the synthetic corpus vocabulary.
    */
  val keywords: Seq[(String, String)] = Seq(
    "ops" -> "join", "ops" -> "merge", "ops" -> "sort", "ops" -> "hash",
    "engine" -> "spark", "engine" -> "stream", "engine" -> "batch",
    "storage" -> "table", "storage" -> "row", "storage" -> "column")

  private def keywordsSqlValues: String =
    keywords.map { case (c, k) => s"('$c', '$k')" }.mkString(", ")

  /** Long-form (doc_id, category, keyword, hits) — A1's term frequency
    * with `str.count` non-overlap semantics (04_tag_text_contracts
    * .py:98-119), hits unfiltered so rollups see explicit zeros.
    */
  private def keywordHits(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Functions.register(s)
    val kw = keywords.toDF("category", "keyword")
    Tables.documents(s, dir).select($"doc_id", lower($"text").as("t"))
      .crossJoin(broadcast(kw))
      .select($"doc_id", $"category", $"keyword",
        Functions.countOccurrences($"t", $"keyword").as("hits"))
  }

  /** q09 — keyword term frequency (A1), positive hits only (the
    * reference's per-keyword hit columns, kept long-form per
    * SURVEY.md §1.3). */
  def keywordTf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    keywordHits(s, dir).where($"hits" > 0)
  }

  val keywordTfSql: String =
    s"""SELECT * FROM (
       |  SELECT doc_id, category, keyword,
       |    CAST((length(lower(text)) - length(replace(lower(text), keyword, '')))
       |         // length(keyword) AS BIGINT) AS hits
       |  FROM documents CROSS JOIN (VALUES $keywordsSqlValues) k(category, keyword)
       |) WHERE hits > 0""".stripMargin

  /** q10 — category rollup + grand total (A2: per-category sums plus
    * the Výskyty grand total, 04_tag_text_contracts.py:115-119,
    * 167-176) as one ROLLUP pass. */
  def categoryRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    keywordHits(s, dir)
      .rollup($"doc_id", $"category")
      .agg(sum($"hits").as("total_hits"))
  }

  val categoryRollupSql: String =
    s"""SELECT doc_id, category, CAST(SUM(hits) AS BIGINT) AS total_hits FROM (
       |  SELECT doc_id, category,
       |    CAST((length(lower(text)) - length(replace(lower(text), keyword, '')))
       |         // length(keyword) AS BIGINT) AS hits
       |  FROM documents CROSS JOIN (VALUES $keywordsSqlValues) k(category, keyword)
       |) GROUP BY ROLLUP(doc_id, category)""".stripMargin

  /** q11 — word-frequency dictionary mining (A4: tokenize, drop
    * dictionary words, count, HAVING count > threshold, 05_build_
    * special_dictionary.py:103-141). The "known dictionary" is a
    * broadcast anti-join (D5), the wordcount a map-side-combined
    * hash agg. */
  def wordcountDictionary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stop = Seq("the", "a").toDF("w")
    Tables.documents(s, dir)
      .select(explode(split(lower($"text"), "[^a-z]+")).as("word"))
      .where($"word" =!= "")
      .join(broadcast(stop), $"word" === $"w", "left_anti")
      .groupBy($"word").agg(count(lit(1)).as("n"))
      .where($"n" > 5)
  }

  val wordcountDictionarySql: String =
    """SELECT word, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
      |  FROM documents
      |) WHERE word <> '' AND word NOT IN ('the', 'a')
      |GROUP BY word HAVING COUNT(*) > 5""".stripMargin

  /** q12 — relevance ranking (O1 + A7: hits desc, char count desc —
    * 04_tag_text_contracts.py:193-195, with the string-sort quirk
    * deliberately fixed to numeric, SURVEY.md §7.4.3). The global
    * row_number is the *export* ranking of a already-aggregated
    * (one-row-per-doc) frame; at 100 TB the same plan writes sorted
    * output via range-partitioned orderBy instead of one window
    * partition. */
  def docRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hits = keywordHits(s, dir)
      .groupBy($"doc_id").agg(sum($"hits").as("total_hits"))
    val docs = Tables.documents(s, dir).select($"doc_id", $"n_chars")
    val w = Window.orderBy($"total_hits".desc, $"n_chars".desc, $"doc_id")
    hits.join(docs, "doc_id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .select($"doc_id", $"total_hits", $"n_chars", $"rank")
  }

  val docRankSql: String =
    s"""SELECT doc_id, total_hits, n_chars,
       |  ROW_NUMBER() OVER (ORDER BY total_hits DESC, n_chars DESC, doc_id)
       |    AS rank
       |FROM (
       |  SELECT doc_id, CAST(SUM(hits) AS BIGINT) AS total_hits FROM (
       |    SELECT doc_id,
       |      CAST((length(lower(text)) - length(replace(lower(text), keyword, '')))
       |           // length(keyword) AS BIGINT) AS hits
       |    FROM documents CROSS JOIN (VALUES $keywordsSqlValues) k(category, keyword)
       |  ) GROUP BY doc_id
       |) h JOIN (SELECT doc_id, n_chars FROM documents) d USING (doc_id)"""
      .stripMargin

  /** q13 — subject extraction (08_extract_subject.py:42-56 / O6/F5/F7:
    * find the heading, take a capped snippet after it). */
  def subjectExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("pos", locate("order", $"text").cast("long"))
      .where($"pos" > 0)
      .select($"doc_id", $"pos",
        expr("substring(text, pos, 120)").as("snippet"))
  }

  val subjectExtractSql: String =
    """SELECT doc_id, CAST(strpos(text, 'order') AS BIGINT) AS pos,
      |       substr(text, strpos(text, 'order'), 120) AS snippet
      |FROM documents WHERE strpos(text, 'order') > 0""".stripMargin

  /** Full natural-sort key (O3, 04_convert_contracts_to_text.py:51-54):
    * the reference's `[int(c) if c.isdigit() else c.lower() for c in
    * re.split('([0-9]+)', key)]` list compare, re-expressed as an
    * orderable `array<struct<s:string,n:bigint>>`. Each maximal run
    * becomes one element: a digit run → `('', int)`, a text run →
    * `(run, -1)`. Because maximal runs strictly alternate, the first
    * differing index always holds same-typed runs on both sides, so
    * the struct compare (s asc, then n asc; -1 < any digit value)
    * reproduces Python's elementwise semantics including the
    * shorter-list-is-prefix rule. `regexp_extract_all` keeps the key
    * RE2-expressible for the DuckDB oracle (no lookarounds). A digit
    * run beyond bigint range (19+ digits) must DEGRADE, not abort
    * under ANSI mode: try_cast + coalesce saturates it to Long.Max,
    * so such runs sort after every representable run and equal-
    * saturated ties fall through to the later runs / raw-name
    * tie-break (the DuckDB twin states the same TRY_CAST+COALESCE). */
  def naturalKey(src: Column): Column =
    expr(s"""transform(
      regexp_extract_all(lower(${src.toString}), '[0-9]+|[^0-9]+', 0),
      r -> IF(r RLIKE '^[0-9]+$$',
              named_struct('s', '',
                'n', coalesce(try_cast(r AS BIGINT),
                              ${Long.MaxValue}L)),
              named_struct('s', r, 'n', CAST(-1 AS BIGINT))))""")

  /** q14 — natural (alphanumeric) sort (O3: digit-run aware filename
    * ordering, 04_convert_contracts_to_text.py:51-54): 'src2' sorts
    * before 'src10', and multi-run names compare on EVERY run
    * ('p2_x9' before 'p2_x10'). Equal keys ('A1' vs 'a01') tie-break
    * on the raw name for run-to-run determinism. */
  def naturalSort(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"nat_key", $"source")
    Tables.documents(s, dir).select($"source").distinct()
      .withColumn("nat_key", naturalKey($"source"))
      .withColumn("natural_rank", row_number().over(w).cast("long"))
      .select($"source", $"natural_rank")
  }

  // Same run-array key in DuckDB terms; list-of-struct compare is
  // lexicographic in both engines. Arrays never appear in the OUTPUT
  // (the driver's pandas row-sort can't hash them) — only in ORDER BY.
  val naturalSortSql: String =
    """SELECT source,
      |       ROW_NUMBER() OVER (ORDER BY
      |         list_transform(
      |           regexp_extract_all(lower(source), '[0-9]+|[^0-9]+'),
      |           r -> CASE WHEN regexp_matches(r, '^[0-9]+$')
      |                THEN {'s': '', 'n': COALESCE(TRY_CAST(r AS BIGINT),
      |                                             9223372036854775807)}
      |                ELSE {'s': r, 'n': CAST(-1 AS BIGINT)} END)
      |           NULLS FIRST,
      |         source NULLS FIRST) AS natural_rank
      |FROM (SELECT DISTINCT source FROM documents)""".stripMargin

  /** q26 — language identification by profile-token scoring (the
    * n-gram heuristic of an LLM ingest pipeline; machinery of A1).
    * argmax with deterministic (score desc, lang asc) tie-break. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Functions.register(s)
    val profiles = Seq(
      "en" -> "the", "en" -> "fast", "en" -> "small",
      "fr" -> "le", "fr" -> "la",
      "es" -> "el", "es" -> "los",
      "de" -> "der", "de" -> "und",
      "zh" -> "zh").toDF("cand_lang", "token")
    val scored = Tables.documents(s, dir)
      .select($"doc_id", $"lang", lower($"text").as("t"))
      .crossJoin(broadcast(profiles))
      .groupBy($"doc_id", $"lang", $"cand_lang")
      .agg(sum(Functions.countOccurrences($"t", $"token")).as("score"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"cand_lang")
    scored.withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"doc_id", $"cand_lang".as("pred_lang"), $"lang",
        ($"cand_lang" === $"lang").as("correct"), $"score")
  }

  /** q87 — lang-ID confusion matrix: q26's predictions rolled up to
    * (declared lang, predicted lang) → document counts — the
    * classifier-evaluation step a pipeline runs BEFORE trusting
    * detected languages to drive mixture weighting (q70/q79): a
    * heavy off-diagonal cell means the detector's profile set is
    * wrong for that language and the downstream sampling would skew.
    *
    * Scale shape: inherits q26's (broadcast profile cross join +
    * native count_occurrences kernel + per-doc WindowGroupLimit
    * argmax); the confusion rollup itself is a ≤ |langs|²-row
    * map-side-combinable aggregate — evaluation adds nothing to the
    * exchange structure. */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    langId(s, dir)
      .groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n_docs"))
  }

  // lazy: references langIdSql, which is declared below — a strict
  // val here would embed null into the CTE at object init
  lazy val langIdConfusionSql: String =
    s"""WITH pred AS (
       |$langIdSql
       |)
       |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
       |FROM pred GROUP BY 1, 2""".stripMargin

  val langIdSql: String = {
    val profs = Seq(
      ("en", "the"), ("en", "fast"), ("en", "small"),
      ("fr", "le"), ("fr", "la"), ("es", "el"), ("es", "los"),
      ("de", "der"), ("de", "und"), ("zh", "zh"))
      .map { case (l, t) => s"('$l','$t')" }.mkString(", ")
    s"""SELECT doc_id, cand_lang AS pred_lang, lang,
       |       cand_lang = lang AS correct, score FROM (
       |  SELECT doc_id, lang, cand_lang, score,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, cand_lang) AS rn
       |  FROM (
       |    SELECT doc_id, lang, cand_lang,
       |      CAST(SUM(CAST((length(lower(text)) -
       |                length(replace(lower(text), token, '')))
       |           // length(token) AS BIGINT)) AS BIGINT) AS score
       |    FROM documents CROSS JOIN (VALUES $profs) p(cand_lang, token)
       |    GROUP BY doc_id, lang, cand_lang)
       |) WHERE rn = 1""".stripMargin
  }

  /** q27 — document quality scoring (length / stopword-ratio /
    * word-length heuristics an LLM data pipeline filters on; the
    * reference's analogue is the spell-ratio dummy-column test
    * 09_clean_tables.py:193-215). All ratios are a single IEEE
    * division of identical integer operands → oracle-exact. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("words", expr("filter(split(lower(text), '[^a-z]+'), w -> w <> '')"))
      .withColumn("n_words", size($"words").cast("long"))
      .withColumn("n_stop",
        expr("size(filter(words, w -> w = 'the' OR w = 'a'))").cast("long"))
      .where($"n_words" > 0)
      .withColumn("stop_ratio",
        $"n_stop".cast("double") / $"n_words".cast("double"))
      .withColumn("n_letters",
        length(regexp_replace(lower($"text"), "[^a-z]", "")).cast("long"))
      .withColumn("avg_word_len",
        $"n_letters".cast("double") / $"n_words".cast("double"))
      .withColumn("quality",
        when($"n_words" < 30, "too_short")
          .when($"stop_ratio" > 0.2, "boilerplate")
          .otherwise("ok"))
      .select($"doc_id", $"n_words", $"n_stop", $"stop_ratio",
        $"avg_word_len", $"quality")
  }

  val qualityScoreSql: String =
    """SELECT doc_id, n_words, n_stop,
      |  CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) AS stop_ratio,
      |  CAST(n_letters AS DOUBLE) / CAST(n_words AS DOUBLE) AS avg_word_len,
      |  CASE WHEN n_words < 30 THEN 'too_short'
      |       WHEN CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) > 0.2
      |         THEN 'boilerplate'
      |       ELSE 'ok' END AS quality
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |         w -> w <> '')) AS BIGINT) AS n_words,
      |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |         w -> w = 'the' OR w = 'a')) AS BIGINT) AS n_stop,
      |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
      |         AS BIGINT) AS n_letters
      |  FROM documents
      |) WHERE n_words > 0""".stripMargin

  /** q28 — token counting (whitespace tokens + a regex token stream —
    * the BPE-ish pre-tokenizer count an ingest pipeline budgets by). */
  def tokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("ws_tokens",
        size(split(trim($"text"), " +")).cast("long"))
      .withColumn("alpha_tokens",
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).cast("long"))
      .select($"doc_id", $"ws_tokens", $"alpha_tokens", $"n_chars")
  }

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
      |    AS alpha_tokens,
      |  n_chars
      |FROM documents""".stripMargin

  /** q43 — pivot at the export edge (F29: the reference's wide
    * dict→columns row assembly, 04_tag_text_contracts.py:176-178):
    * per-user event-type counts as a fixed wide schema. The pivot
    * value list is explicit, so the schema is stable at any scale. */
  def pivotExport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    graft.Tables.events(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  val pivotExportSql: String =
    """SELECT user_id,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0)
      |    AS BIGINT) AS click,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0)
      |    AS BIGINT) AS error,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
      |    AS BIGINT) AS purchase,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0)
      |    AS BIGINT) AS signup,
      |  CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0)
      |    AS BIGINT) AS view
      |FROM events GROUP BY user_id""".stripMargin

  /** q44 — scalar string-function surface (SURVEY.md §2.7 F1-F9,
    * F24-F26): one projection exercising case, trim, pad, reverse,
    * token extraction and regex pulls, oracle-matched per function. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir).select(
      $"p_partkey",
      upper($"p_name").as("name_upper"),
      reverse($"p_name").as("name_rev"),
      lpad($"p_brand", 10, "#").as("brand_padded"),
      substring_index($"p_name", " ", 1).as("first_word"),
      regexp_extract($"p_brand", "([0-9]+)", 1).as("brand_num"),
      translate($"p_type", "AEIOU", "aeiou").as("type_tr"),
      concat_ws("/", $"p_brand", $"p_type").as("brand_type"),
      length($"p_name").cast("long").as("name_len"))
  }

  val stringFuncsSql: String =
    """SELECT p_partkey, upper(p_name) AS name_upper,
      |  reverse(p_name) AS name_rev,
      |  lpad(p_brand, 10, '#') AS brand_padded,
      |  split_part(p_name, ' ', 1) AS first_word,
      |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      |  translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
      |  concat_ws('/', p_brand, p_type) AS brand_type,
      |  CAST(length(p_name) AS BIGINT) AS name_len
      |FROM part""".stripMargin

  /** q45 — array-function surface (§2.7 F27/F28 family as native
    * arrays): tokenize, sort, dedupe, slice, membership — the
    * higher-order operations the typed attachment arrays rely on. */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("words",
        expr("filter(split(lower(text), '[^a-z]+'), w -> w <> '')"))
      .select(
        $"doc_id",
        size($"words").cast("long").as("n_words"),
        size(array_distinct($"words")).cast("long").as("n_uniq"),
        array_join(slice(array_sort(array_distinct($"words")), 1, 3), ",")
          .as("first3_sorted"),
        array_contains($"words", "spark").as("has_spark"),
        // try_element_at: an all-non-letter document has no words and
        // must yield nulls, not an ANSI INVALID_ARRAY_INDEX error
        try_element_at($"words", lit(1)).as("first_word"),
        try_element_at($"words", lit(-1)).as("last_word"))
  }

  val arrayFuncsSql: String =
    """SELECT doc_id,
      |  CAST(len(words) AS BIGINT) AS n_words,
      |  CAST(len(list_distinct(words)) AS BIGINT) AS n_uniq,
      |  array_to_string(list_sort(list_distinct(words))[1:3], ',')
      |    AS first3_sorted,
      |  list_contains(words, 'spark') AS has_spark,
      |  words[1] AS first_word,
      |  words[-1] AS last_word
      |FROM (SELECT doc_id,
      |        list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |          w -> w <> '') AS words
      |      FROM documents)""".stripMargin

  /** q29 — document fingerprinting (whitespace-normalized content hash
    * + a prefix hash; the rolling-hash fingerprint family). */
  /** q57 — cross-document boilerplate detection (the CCNet-style
    * repeated-content rule of an LLM ingest pipeline): a word
    * [[BoilerShingleWords]]-gram appearing in ≥ [[BoilerMinDocs]]
    * DISTINCT documents is boilerplate; each doc reports the ratio of
    * its shingle positions covered by boilerplate. The unit is the
    * shingle, not the sentence: on this corpus template REUSE happens
    * at sub-sentence granularity (no full sentence spans ≥3 docs at
    * any SF, but 74+ distinct 5-grams do at sf0.01), so the shingle
    * form is the one whose interesting branch actually executes.
    * Two aggregations: shingle → distinct-doc count (map-side
    * combinable), then doc rollup through the frequency join — no
    * all-pairs anything; at 100 TB the shingle-frequency table is the
    * only wide shuffle and it is count-distinct over a hashed key. */
  val BoilerMinDocs = 3L
  val BoilerShingleWords = 5

  /** (doc_id, shingle) long frame of overlapping word n-grams —
    * shared by the boilerplate (q57) and decontamination (q61)
    * detectors; one shingle row per POSITION (duplicates preserved,
    * ratios need them). */
  private def wordShingles(s: SparkSession, dir: String,
      n: Int): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("ws",
        expr("filter(split(lower(text), '[^a-z0-9]+'), w -> w <> '')"))
      .where(size($"ws") >= n)
      .select($"doc_id",
        explode(expr(s"transform(sequence(1, size(ws) - ${n - 1}), " +
          s"i -> array_join(slice(ws, i, $n), ' '))")).as("shingle"))
  }

  def boilerplate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = wordShingles(s, dir, BoilerShingleWords)
    val freq = sh.groupBy($"shingle")
      .agg(countDistinct($"doc_id").as("n_docs"))
    val rolled = sh.join(freq, "shingle")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"n_docs" >= BoilerMinDocs, 1L).otherwise(0L))
          .as("n_boiler"))
      .withColumn("boiler_ratio",
        $"n_boiler".cast("double") / $"n_shingles".cast("double"))
    // row-set contract: EVERY document appears in the report — a doc
    // shorter than the shingle width has no positions to score and is
    // emitted as (0, 0, null), not silently dropped (a downstream
    // keep/drop consumer joining on this report must see all docs).
    // The left join is doc-count-sized on both sides — no new wide
    // shuffle at scale.
    Tables.documents(s, dir).select($"doc_id")
      .join(rolled, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_shingles", lit(0L)).as("n_shingles"),
        coalesce($"n_boiler", lit(0L)).as("n_boiler"),
        $"boiler_ratio")
  }

  /** The `words`/`sh` shingle CTE pair shared by the boilerplate and
    * contamination oracles — the index arithmetic (`range` end,
    * 1-based inclusive slice) lives once, mirroring how the Scala
    * side shares [[wordShingles]]. */
  private def shingleCtes(n: Int): String =
    s"""WITH words AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |      w -> w <> '') AS ws
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(ws) - ${n - 2}),
       |      i -> array_to_string(ws[i:i+${n - 1}], ' '))) AS shingle
       |  FROM words WHERE len(ws) >= $n
       |)""".stripMargin

  val boilerplateSql: String =
    shingleCtes(BoilerShingleWords) +
    s""", freq AS (
       |  SELECT shingle, COUNT(DISTINCT doc_id) AS n_docs
       |  FROM sh GROUP BY shingle
       |), rolled AS (
       |  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |    CAST(SUM(CASE WHEN f.n_docs >= $BoilerMinDocs THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_boiler,
       |    CAST(SUM(CASE WHEN f.n_docs >= $BoilerMinDocs THEN 1 ELSE 0 END)
       |         AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS boiler_ratio
       |  FROM sh s JOIN freq f USING (shingle)
       |  GROUP BY s.doc_id
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(r.n_shingles, 0) AS BIGINT) AS n_shingles,
       |  CAST(COALESCE(r.n_boiler, 0) AS BIGINT) AS n_boiler,
       |  r.boiler_ratio
       |FROM documents d LEFT JOIN rolled r USING (doc_id)""".stripMargin

  /** q61 — benchmark decontamination (the GPT-3/PaLM n-gram overlap
    * rule of an LLM ingest pipeline): a training document sharing any
    * word [[ContamShingleWords]]-gram with the evaluation set is
    * contaminated and reported with its distinct-shared-shingle
    * count. The eval set stands in as the [[ContamEvalMaxId]] lowest
    * doc_ids (a real deployment feeds the benchmark suite as this
    * side).
    *
    * Scale shape: eval suites are tiny next to a 100 TB corpus, so
    * the distinct eval shingles BROADCAST and the corpus side joins
    * map-side — zero corpus-wide shuffle before the per-doc
    * count-distinct rollup (map-side combinable on doc_id). This is
    * the decontamination layout production pipelines use; the
    * all-shingle self-join q57 needs is never required here. */
  val ContamShingleWords = 8
  val ContamEvalMaxId = 20L
  def contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = wordShingles(s, dir, ContamShingleWords)
    val ev = sh.where($"doc_id" < ContamEvalMaxId)
      .select($"shingle").distinct()
    sh.where($"doc_id" >= ContamEvalMaxId)
      .join(broadcast(ev), "shingle")
      .groupBy($"doc_id")
      .agg(countDistinct($"shingle").as("n_shared"))
  }

  val contaminationSql: String =
    shingleCtes(ContamShingleWords) +
    s""", ev AS (
       |  SELECT DISTINCT shingle FROM sh WHERE doc_id < $ContamEvalMaxId
       |)
       |SELECT s.doc_id,
       |  CAST(COUNT(DISTINCT s.shingle) AS BIGINT) AS n_shared
       |FROM sh s JOIN ev USING (shingle)
       |WHERE s.doc_id >= $ContamEvalMaxId
       |GROUP BY s.doc_id""".stripMargin

  /** q62 — deterministic stratified split (the reproducible
    * train/val/test assignment a pre-training pipeline needs): each
    * document's bucket is the first 4 hex digits of md5(doc_id)
    * mod 100 — content-keyed, so re-running on a grown corpus never
    * reassigns an existing doc, and partitioning-independent (no RNG
    * state, no `rand()` whose draw order depends on the plan).
    * Boundaries: bucket < [[SplitTrainPct]] → train,
    * < [[SplitValPct]] → val, else test. Output is the per
    * (lang, split) quota report a mixing/curriculum stage consumes.
    *
    * Scale shape: assignment is a per-row expression — ZERO shuffle
    * for n docs; the only exchange is the tiny count rollup
    * (map-side combinable). The hex→int idiom (`instr` of the digit
    * in '0123456789abcdef') is the same engine-parity construction
    * q54's simhash uses. */
  val SplitTrainPct = 90
  val SplitValPct = 95
  def detSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hexVal = (1 to 4).map(d =>
      s"(instr('0123456789abcdef', substring(md5(cast(doc_id AS string)), $d, 1)) - 1) * ${math.pow(16, 4 - d).toLong}")
      .mkString(" + ")
    Tables.documents(s, dir)
      .withColumn("bucket", expr(s"($hexVal) % 100"))
      .withColumn("split",
        when($"bucket" < SplitTrainPct, "train")
          .when($"bucket" < SplitValPct, "val")
          .otherwise("test"))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"))
  }

  val detSplitSql: String = {
    val hexVal = (1 to 4).map(d =>
      s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $d, 1)) - 1) * ${math.pow(16, 4 - d).toLong}")
      .mkString(" + ")
    s"""SELECT lang,
       |  CASE WHEN ($hexVal) % 100 < $SplitTrainPct THEN 'train'
       |       WHEN ($hexVal) % 100 < $SplitValPct THEN 'val'
       |       ELSE 'test' END AS split,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM documents GROUP BY 1, 2""".stripMargin
  }

  /** q63 — salient-term extraction (the TF-IDF-family keyword miner
    * over the corpus): per-document term frequency against corpus
    * document frequency, top 3 terms per doc by tf/df. The score is
    * a SINGLE IEEE division of identical integer operands in both
    * engines (exact cross-engine ordering without trusting `ln`
    * implementations to agree bit-for-bit — the reason this ranks by
    * tf/df rather than tf·log(N/df); the ranking family is the same).
    *
    * Scale shape: tf is a per-doc narrow aggregate; df is the one
    * corpus-wide exchange (word → doc count, map-side combinable,
    * vocabulary-sized output); the top-3 window is per-doc and Spark
    * plans `row_number() <= k` with WindowGroupLimit (partial below
    * the exchange), so the ranking shuffle is already bounded. */
  val SalientTopK = 3
  def salientTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = Tables.documents(s, dir)
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("word"))
      .where($"word" =!= "")
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"score".desc, $"word")
    tf.join(df, "word")
      .withColumn("score", $"tf".cast("double") / $"df".cast("double"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where($"rn" <= SalientTopK)
      .select($"doc_id", $"word", $"rn", $"tf", $"df", $"score")
  }

  val salientTermsSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, x AS word, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id,
       |          unnest(string_split_regex(lower(text), '[^a-z]+')) AS x
       |        FROM documents)
       |  WHERE x <> '' GROUP BY 1, 2
       |), df AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |)
       |SELECT doc_id, word, rn, tf, df, score FROM (
       |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
       |    CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) AS score,
       |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
       |      ORDER BY CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) DESC,
       |               tf.word) AS rn
       |  FROM tf JOIN df USING (word)
       |) WHERE rn <= $SalientTopK""".stripMargin

  /** q65 — token-budget mixing (the data-mixing stage of a
    * pre-training pipeline): each language keeps documents, in a
    * deterministic content-keyed order, until its token budget
    * ([[BudgetTokensPerLang]]) is spent. Order is md5(doc_id) — the
    * same reproducible shuffle q62's split uses, so the kept prefix
    * is stable under corpus growth for already-seen docs and
    * independent of physical layout; the cutoff is a running-sum
    * window over exact integers (`ROWS UNBOUNDED PRECEDING` pinned on
    * both engines so tie frames cannot differ).
    *
    * Scale shape: one shuffle on lang (the window partition key —
    * language count is tiny, but per-lang data is large and the
    * running sum streams in sort order, O(1) state per partition); a
    * skewed lang would salt exactly like q49. Output: the kept set
    * with its running token totals. */
  val BudgetTokensPerLang = 3000L
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang")
      .orderBy($"ord", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .withColumn("n_tokens",
        size(split(trim($"text"), " +")).cast("long"))
      .withColumn("ord", md5($"doc_id".cast("string")))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .where($"cum_tokens" <= BudgetTokensPerLang)
      .select($"doc_id", $"lang", $"n_tokens", $"cum_tokens")
  }

  val tokenBudgetSql: String =
    s"""SELECT doc_id, lang, n_tokens, cum_tokens FROM (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
       |      AS n_tokens,
       |    CAST(SUM(CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT))
       |      OVER (PARTITION BY lang
       |            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM documents
       |) WHERE cum_tokens <= $BudgetTokensPerLang""".stripMargin

  /** q58 — intra-document repetition ratio (the Gopher/RefinedWeb
    * top-n-gram quality rule): frequency of the single most repeated
    * word bigram over all bigram occurrences in the doc. One
    * explode + (doc, bigram) count + doc-level max/sum rollup —
    * narrow, map-side combinable, no cross-doc traffic at all. */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("ws",
        expr("filter(split(lower(text), '[^a-z]+'), w -> w <> '')"))
      .where(size($"ws") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .as("bigram"))
      .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_bigrams"), max($"c").as("top_count"))
      .withColumn("rep_ratio",
        $"top_count".cast("double") / $"n_bigrams".cast("double"))
      .select($"doc_id", $"n_bigrams", $"top_count", $"rep_ratio")
  }

  val repetitionSql: String =
    """WITH bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(ws)),
      |      i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |            w -> w <> '') AS ws
      |        FROM documents)
      |  WHERE len(ws) >= 2
      |), counts AS (
      |  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2
      |)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |       CAST(MAX(c) AS BIGINT) AS top_count,
      |       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS rep_ratio
      |FROM counts GROUP BY doc_id""".stripMargin

  /** q67 — context-window chunking (the sequence-construction stage
    * of a training-data pipeline): every document is cut into
    * overlapping fixed-token windows ([[ChunkTokens]] tokens, stride
    * [[ChunkStride]]) so long documents fit a model's context window
    * without losing boundary tokens. Chunk starts are
    * `sequence(0, n_tokens - 1 - overlap, stride)` (overlap = size −
    * stride): the final window may be short, every emitted chunk
    * contributes at least one token no earlier chunk covers (a start
    * in the last `overlap` tokens would be fully contained in its
    * predecessor and is not emitted), and a document no longer than
    * one window yields exactly one chunk. Tokenization is the q65/q28
    * whitespace convention, so chunk token counts reconcile with the
    * budget/mixing stages.
    *
    * Scale shape: pure per-row expressions (split → sequence →
    * explode → slice → array_join) — ZERO shuffle for the whole
    * corpus, and each chunk's text comes from the token-array slice,
    * never a re-scan of the source string. Output is ≈ n/stride rows
    * per doc; at 100 TB this is an embarrassingly parallel map whose
    * only cost is the ~1.3× (size/stride) output inflation the
    * overlap deliberately buys. */
  val ChunkTokens = 32
  val ChunkStride = 24
  /** Tokens shared between consecutive chunks; a chunk starting inside
    * the previous chunk's last `ChunkOverlap` tokens can never reach
    * past it, so such starts are pure duplicates and are not emitted. */
  val ChunkOverlap: Int = ChunkTokens - ChunkStride
  def chunkWindows(s: SparkSession, dir: String): DataFrame =
    chunkFrame(Tables.documents(s, dir))

  /** Frame-level chunking core — q67 on the documents table, and the
    * q74 pipeline on the scrubbed survivor stream. Requires
    * (doc_id, text); `keep` names extra input columns to carry
    * through per chunk (q74 threads `lang` this way instead of
    * re-joining the corpus on doc_id — a map-side pass-through vs a
    * second wide exchange). */
  private[graft] def chunkFrame(docs: DataFrame,
      keep: Seq[String] = Nil): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val keepC = keep.map(col)
    docs
      .withColumn("toks", split(trim($"text"), " +"))
      .select(($"doc_id" +: keepC) ++ Seq($"toks", explode(expr(
        s"sequence(0, greatest(size(toks) - 1 - $ChunkOverlap, 0), $ChunkStride)"))
        .as("start")): _*)
      .withColumn("chunk", expr(s"slice(toks, start + 1, $ChunkTokens)"))
      .select(($"doc_id" +: keepC) ++ Seq(
        expr(s"CAST(start DIV $ChunkStride AS BIGINT)").as("chunk_id"),
        size($"chunk").cast("long").as("n_chunk_tokens"),
        array_join($"chunk", " ").as("chunk_text")): _*)
  }

  val chunkWindowsSql: String =
    s"""SELECT doc_id,
       |  CAST(start // $ChunkStride AS BIGINT) AS chunk_id,
       |  CAST(len(toks[start + 1 : start + $ChunkTokens]) AS BIGINT)
       |    AS n_chunk_tokens,
       |  array_to_string(toks[start + 1 : start + $ChunkTokens], ' ')
       |    AS chunk_text
       |FROM (
       |  SELECT doc_id, toks,
       |    unnest(generate_series(0, greatest(len(toks) - 1 - $ChunkOverlap, 0),
       |                           $ChunkStride)) AS start
       |  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
       |        FROM documents))""".stripMargin

  /** q68 — sequence packing (the batch-construction stage after
    * chunking/mixing), in the concatenate-and-cut convention of
    * GPT-style pretraining: documents are laid end-to-end per
    * language in the same md5-keyed deterministic order q65 mixes
    * with, the token stream is cut every [[PackBudget]] tokens, and
    * each document is attributed to the sequence (bin) in which it
    * STARTS (`exclusive-cumsum div budget`). A document may straddle
    * a cut, so a bin's attributed tokens can exceed the budget by up
    * to its last doc's length — this is NOT first-fit bin packing
    * (nothing is held back to keep bins under budget; the cut
    * boundary, not the bin total, is fixed). The report is per-bin
    * packing pressure (docs and attributed tokens per sequence).
    * Unlike q65, which truncates the corpus at one budget, packing
    * keeps every document and answers "how many sequences does this
    * corpus fill, and where do the cuts fall".
    *
    * Scale shape: identical to q65 — one exchange on the window
    * partition key (lang) with O(1) running-sum state per partition,
    * then a map-side-combinable (lang, bin) rollup whose output is
    * corpus_tokens/budget rows. A skewed language salts exactly like
    * q49. */
  val PackBudget = 512L
  def sequencePack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang")
      .orderBy($"ord", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .withColumn("n_tokens",
        size(split(trim($"text"), " +")).cast("long"))
      .withColumn("ord", md5($"doc_id".cast("string")))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .withColumn("bin_id",
        expr(s"CAST((cum_tokens - n_tokens) DIV $PackBudget AS BIGINT)"))
      .groupBy($"lang", $"bin_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("bin_tokens"))
  }

  val sequencePackSql: String =
    s"""SELECT lang,
       |  CAST((cum_tokens - n_tokens) // $PackBudget AS BIGINT) AS bin_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
       |FROM (
       |  SELECT lang,
       |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
       |      AS n_tokens,
       |    CAST(SUM(CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT))
       |      OVER (PARTITION BY lang
       |            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM documents)
       |GROUP BY 1, 2""".stripMargin

  /** q70 — corpus mixture weights (the sampling-distribution stage of
    * data mixing): temperature-scaled language weights
    * `w_l ∝ (n_l)^(1/T)` with T = 2, i.e. `sqrt(n_l)` — the standard
    * up-weighting of under-resourced languages. T = 2 is chosen so
    * the exponent is `sqrt`, which IEEE 754 requires to be correctly
    * rounded — bit-identical across engines, unlike `pow`'s
    * implementation-defined last bit. The normalizer is the sum of
    * sqrts accumulated IN LANGUAGE ORDER via a running-sum window
    * (`ROWS UNBOUNDED PRECEDING`), not a free-order aggregate, so the
    * floating-point addition sequence — and therefore every output
    * bit — is pinned on both engines; the final weight is one IEEE
    * division of identical operands.
    *
    * Scale shape: the only corpus-sized work is the (lang) count
    * rollup (map-side combinable); everything after operates on a
    * language-cardinality frame, so the single-partition windows cost
    * nothing. */
  def mixtureWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cum = Window.orderBy($"lang")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.documents(s, dir)
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("s", sqrt($"n_docs".cast("double")))
      .withColumn("denom", max(sum($"s").over(cum)).over(all))
      .select($"lang", $"n_docs", ($"s" / $"denom").as("weight"))
  }

  val mixtureWeightsSql: String =
    """WITH c AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1
      |), w AS (
      |  SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS s FROM c
      |), d AS (
      |  SELECT lang, n_docs, s,
      |    SUM(s) OVER (ORDER BY lang ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM w
      |)
      |SELECT lang, n_docs, s / MAX(cum) OVER () AS weight FROM d""".stripMargin

  /** Oversampling factor of q79: the emitted stream targets
    * [[MixtureOversample]] × the corpus size, redistributed across
    * languages by the q70 weights. */
  val MixtureOversample = 3L

  /** Per-document repetition cap of q79 — the standard guard against
    * a vanishingly small language being upsampled without bound
    * (epoch counts beyond a handful measurably degrade training;
    * cf. the data-constrained scaling literature). Mirrored in the
    * oracle; never binds on the test corpus (max epochs ≈ 3.9). */
  val MaxEpochs = 16L

  /** q79 — mixture SAMPLING, the stage that realizes q70's weights
    * (q70 computes the target distribution; q79 materializes the
    * training stream drawn from it — the loop-closing pattern of
    * q69→q77). Each language's per-document epoch count is
    * `e_l = w_l · (oversample · N) / n_l`: every doc repeats
    * floor(e_l) times plus one more iff its md5-derived uniform
    * (the q62/q73 hex-fold device, hv/2^32 ∈ [0,1)) falls below
    * frac(e_l) — a DETERMINISTIC Bernoulli, so the realized per-lang
    * total is within n_l of the target w_l·B and the sample is
    * byte-reproducible across runs and engines. Copies are capped at
    * [[MaxEpochs]].
    *
    * The registered result is the per-lang audit of the MATERIALIZED
    * stream (the epoch-exploded frame a writer would shard): docs
    * sampled ≥ once (epoch-0 rows — one per surviving doc by
    * construction, the q74 device that avoids a distinct-agg
    * Expand), emitted copies, and the exact per-lang epoch rate.
    *
    * Scale shape: one broadcast of the 5-row weight frame, hv +
    * copies computed map-side on (doc_id, lang) — text never moves —
    * the explode is a map-side Generate, and the rollup is one
    * map-side-combinable (lang) aggregation. Single corpus-wide
    * exchange; epochs double arithmetic is pinned left-to-right on
    * both engines (the q70 weight chain extended by one multiply and
    * one divide of identical operands). */
  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val w = mixtureWeights(s, dir)
      .withColumn("total", sum($"n_docs").over(all))
      .withColumn("epochs",
        ($"weight" * ($"total" * lit(MixtureOversample)).cast("double")) /
          $"n_docs".cast("double"))
      .select($"lang", $"epochs")
    Tables.documents(s, dir).select($"doc_id", $"lang")
      .join(broadcast(w), "lang")
      .withColumn("hv",
        expr(s"CAST(${LayoutOps.md5HexValSpark("doc_id")} AS BIGINT)"))
      .withColumn("copies", least(
        floor($"epochs") +
          when($"hv".cast("double") / lit(4294967296.0) <
            ($"epochs" - floor($"epochs")), 1L).otherwise(0L),
        lit(MaxEpochs)))
      .where($"copies" > 0)
      .select($"lang", $"epochs",
        explode(expr("sequence(CAST(0 AS BIGINT), copies - 1)")).as("epoch"))
      .groupBy($"lang")
      .agg(sum(when($"epoch" === 0L, 1L).otherwise(0L)).as("n_docs_sampled"),
        count(lit(1)).as("n_emitted"),
        min($"epochs").as("epochs"))
  }

  /** DuckDB twin of [[mixtureSample]]: the q70 weight CTEs extended
    * by the epoch rate, the hex-fold Bernoulli, and an arithmetic
    * rollup (SUM(copies) ≡ counting the exploded rows). */
  val mixtureSampleSql: String =
    s"""WITH c AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1
       |), w0 AS (
       |  SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS s FROM c
       |), d AS (
       |  SELECT lang, n_docs, s,
       |    SUM(s) OVER (ORDER BY lang ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM w0
       |), w AS (
       |  SELECT lang, n_docs, s / MAX(cum) OVER () AS weight,
       |    SUM(n_docs) OVER () AS total
       |  FROM d
       |), e AS (
       |  SELECT lang,
       |    (weight * CAST(total * $MixtureOversample AS DOUBLE))
       |      / CAST(n_docs AS DOUBLE) AS epochs
       |  FROM w
       |), k AS (
       |  SELECT d.lang, e.epochs,
       |    LEAST(CAST(FLOOR(e.epochs) AS BIGINT) +
       |      CASE WHEN CAST(${LayoutOps.md5HexValDuck("doc_id")} AS DOUBLE)
       |          / 4294967296.0 < e.epochs - FLOOR(e.epochs)
       |        THEN 1 ELSE 0 END, $MaxEpochs) AS copies
       |  FROM documents d JOIN e USING (lang)
       |)
       |SELECT lang,
       |  CAST(SUM(CASE WHEN copies > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_sampled,
       |  CAST(SUM(copies) AS BIGINT) AS n_emitted,
       |  MIN(epochs) AS epochs
       |FROM k GROUP BY lang""".stripMargin

  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      // explicit class, not \s: Java \s includes \x0B (vertical tab),
      // DuckDB's RE2 \s does not — spelling the class out pins both
      // engines to the same normalization
      .withColumn("norm",
        trim(regexp_replace(lower($"text"), "[ \\t\\n\\x0B\\f\\r]+", " ")))
      .select($"doc_id",
        substring(md5($"norm"), 1, 16).as("fp"),
        substring(md5(substring($"norm", 1, 100)), 1, 16).as("fp_prefix"),
        length($"norm").cast("long").as("norm_len"))
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |  substr(md5(norm), 1, 16) AS fp,
      |  substr(md5(substr(norm, 1, 100)), 1, 16) AS fp_prefix,
      |  CAST(length(norm) AS BIGINT) AS norm_len
      |FROM (SELECT doc_id,
      |        trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))
      |          AS norm
      |      FROM documents)""".stripMargin

  /** q72 — PII scrub with per-document redaction accounting, the
    * redact-before-training stage every pipeline needs next to the
    * measuring stages (q26-q29/q57-q63): emails, phone numbers and
    * IPv4 literals are replaced by typed placeholders and the count of
    * each kind is reported alongside a fingerprint of the redacted
    * text (so downstream dedup runs on the SCRUBBED stream).
    *
    * The synthetic corpus carries no PII, so the registered query
    * first decorates each document with contact strings derived
    * deterministically from doc_id — ON BOTH ENGINES, the q33
    * stub-mirroring pattern — which makes the scrub itself (match,
    * replace, count, fingerprint) the thing the oracle hash-checks:
    * ~1/3 of docs get an email, 1/4 a phone, 1/5 an IP, with all 8
    * presence combinations realized. Patterns are RE2-safe and
    * spelled with explicit ASCII classes (`[0-9]`, never `\d` or
    * `\s`) so Java regex and DuckDB RE2 agree — the fingerprintSql
    * discipline. Counts are taken on the pre-redaction text per
    * pattern; the three patterns cannot overlap (emails need a
    * letter TLD, phones are space-separated digit groups, IPs are
    * dot-separated digit groups), so the sequential replaces and the
    * independent counts see the same matches.
    *
    * Scale shape: pure per-row regex expressions — ZERO shuffle,
    * embarrassingly parallel, the same map-only envelope as q26-q29. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\+[0-9]{3} [0-9]{3} [0-9]{3} [0-9]{3}"
  private[graft] val IpRe =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** The deterministic doc_id-derived contact decoration (mirrored in
    * SQL by [[piiScrubSql]] / [[graft.ops.PipelineOps]]): adds a
    * `full_text` column. Shared by q72 and the q74 pipeline so both
    * scrub the same non-vacuous stream. */
  private[graft] def decorateFrame(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.withColumn("full_text", concat($"text",
      when($"doc_id" % 3 === 0,
        concat(lit(" Contact: user"), ($"doc_id" % 97).cast("string"),
          lit("@mail"), ($"doc_id" % 7).cast("string"),
          lit(".example.com"))).otherwise(lit("")),
      when($"doc_id" % 4 === 0,
        concat(lit(" tel +421 9"),
          lpad((($"doc_id" * 13) % 100).cast("string"), 2, "0"), lit(" "),
          lpad((($"doc_id" * 7) % 1000).cast("string"), 3, "0"), lit(" "),
          lpad((($"doc_id" * 3) % 1000).cast("string"), 3, "0")))
        .otherwise(lit("")),
      when($"doc_id" % 5 === 0,
        concat(lit(" ip 10."), ($"doc_id" % 256).cast("string"), lit("."),
          (($"doc_id" * 3) % 256).cast("string"), lit("."),
          (($"doc_id" * 7) % 256).cast("string"))).otherwise(lit(""))))
  }

  /** The redaction core: `full_text` → `redacted` plus per-kind match
    * counts, patterns applied email → phone → IP on both engines. */
  private[graft] def scrubFrame(deco: DataFrame): DataFrame = {
    val s = deco.sparkSession
    import s.implicits._
    deco
      .withColumn("n_email",
        regexp_count($"full_text", lit(EmailRe)).cast("long"))
      .withColumn("n_phone",
        regexp_count($"full_text", lit(PhoneRe)).cast("long"))
      .withColumn("n_ip", regexp_count($"full_text", lit(IpRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace($"full_text",
          EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]"), IpRe, "[IP]"))
  }

  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    scrubFrame(decorateFrame(Tables.documents(s, dir)))
      .select($"doc_id", $"n_email", $"n_phone", $"n_ip",
        ($"n_email" + $"n_phone" + $"n_ip").as("n_redacted"),
        substring(md5($"redacted"), 1, 16).as("redacted_fp"))
  }

  /** The decoration as a DuckDB expression over (doc_id, text) — ONE
    * definition shared by [[piiScrubSql]] and the q74 pipeline oracle
    * so the mirrored stub cannot drift between them. */
  // NOTE: interpolated into outer .stripMargin strings — no line here
  // may begin with (whitespace +) '|', or the OUTER strip would eat
  // the first pipe of a '||' and break the SQL (r8 lesson)
  private[graft] val decorationSqlExpr: String =
    """text ||
      |    CASE WHEN doc_id % 3 = 0 THEN
      |      ' Contact: user' || CAST(doc_id % 97 AS VARCHAR) ||
      |      '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 4 = 0 THEN
      |      ' tel +421 9' || lpad(CAST((doc_id * 13) % 100 AS VARCHAR), 2, '0') ||
      |      ' ' || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0') ||
      |      ' ' || lpad(CAST((doc_id * 3) % 1000 AS VARCHAR), 3, '0')
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN
      |      ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) ||
      |      '.' || CAST((doc_id * 3) % 256 AS VARCHAR) ||
      |      '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
      |      ELSE '' END""".stripMargin

  /** The redaction as a DuckDB expression over `full_text` — shared
    * with the q74 pipeline oracle like [[decorationSqlExpr]]. */
  private[graft] val redactionSqlExpr: String =
    """regexp_replace(regexp_replace(regexp_replace(full_text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |      '\+[0-9]{3} [0-9]{3} [0-9]{3} [0-9]{3}', '[PHONE]', 'g'),
      |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g')"""
      .stripMargin

  val piiScrubSql: String =
    s"""WITH deco AS (
       |  SELECT doc_id, $decorationSqlExpr AS full_text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(full_text,
       |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
       |    AS n_email,
       |  CAST(len(regexp_extract_all(full_text,
       |    '\\+[0-9]{3} [0-9]{3} [0-9]{3} [0-9]{3}')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all(full_text,
       |    '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS BIGINT)
       |    AS n_ip,
       |  n_email + n_phone + n_ip AS n_redacted,
       |  substr(md5($redactionSqlExpr), 1, 16) AS redacted_fp
       |FROM deco""".stripMargin
}

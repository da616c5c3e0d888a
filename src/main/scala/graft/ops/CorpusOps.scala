package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Functions

/** Corpus-index analytics over the `documents` table — the
  * index-construction and cross-document-statistics family a
  * training-data pipeline runs beside the dedup/quality stages:
  * inverted-index postings (q81), term co-occurrence lift (q82),
  * character-diversity quality scoring (q85, native kernel), and
  * MassiveText-style cross-document n-gram duplication rate (q86).
  *
  * House rules (same as [[TextOps]]): tokenization is
  * `filter(split(lower(text), '[^a-z]+'), w -> w <> '')` in both
  * engines; every cross-engine float is a SINGLE IEEE division (or one
  * division + one subtraction) of identical exact-integer operands, so
  * the driver's string-repr hash compare cannot drift on summation
  * order or `ln` implementations.
  */
object CorpusOps {

  /** Posting-list preview length (doc_ids kept per word). The preview
    * — not the full posting list — is what bounds the operator at
    * corpus scale: a stop-word's full posting list is O(corpus) and
    * would both blow the row size cap and serialize the whole corpus
    * through one reducer key. Consumers needing full lists read the
    * (word, doc_id) long-form frame instead; this query is the
    * dictionary artifact (df + head sample) a search/index stage
    * actually ships. */
  val PostingPreviewK = 16

  /** q81 — inverted-index postings: per word, document frequency and
    * the first [[PostingPreviewK]] doc_ids (ascending). Hapax words
    * (df = 1) are dropped — at web scale they are typically typos and
    * dominate the vocabulary (Zipf tail) while contributing nothing to
    * retrieval.
    *
    * Scale shape: `array_distinct` runs per document BEFORE the
    * explode, so the exchange carries one (word, doc_id) row per
    * distinct pair, not per occurrence. The `row_number` window and
    * the `groupBy(word)` hash-partition on the SAME key, so Catalyst
    * plans ONE exchange for both; `collect_list` materializes at most
    * K ids per word (the `when` nulls out the rest and collect_list
    * skips nulls), so no reducer ever holds a corpus-sized posting
    * array. */
  def postings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wd = Tables.documents(s, dir)
      .select($"doc_id",
        explode(array_distinct(
          filter(split(lower($"text"), "[^a-z]+"), w => w =!= "")))
          .as("word"))
    val byWord = Window.partitionBy($"word").orderBy($"doc_id")
    wd.withColumn("rn", row_number().over(byWord))
      .groupBy($"word")
      .agg(count(lit(1)).as("df"),
        concat_ws(",",
          transform(
            sort_array(collect_list(
              when($"rn" <= PostingPreviewK, $"doc_id"))),
            _.cast("string"))).as("postings"))
      .where($"df" >= 2)
  }

  val postingsSql: String =
    s"""WITH wd AS (
       |  SELECT DISTINCT doc_id, x AS word
       |  FROM (SELECT doc_id,
       |          unnest(string_split_regex(lower(text), '[^a-z]+')) AS x
       |        FROM documents)
       |  WHERE x <> ''
       |), rn AS (
       |  SELECT doc_id, word,
       |    row_number() OVER (PARTITION BY word ORDER BY doc_id) AS rn
       |  FROM wd
       |)
       |SELECT word, CAST(count(*) AS BIGINT) AS df,
       |  string_agg(CASE WHEN rn <= $PostingPreviewK
       |               THEN CAST(doc_id AS VARCHAR) END,
       |             ',' ORDER BY doc_id) AS postings
       |FROM rn GROUP BY word HAVING count(*) >= 2""".stripMargin

  /** Vocabulary gate for q82: words must appear in ≥ [[LiftDfMin]]
    * docs and ≤ [[LiftDfMaxPct]]% of the corpus. The ceiling is
    * FRACTIONAL (not absolute) so the gate means the same thing at
    * every corpus size: near-universal words carry no association
    * signal (lift ≈ 1 by construction) but dominate the pair count. */
  val LiftDfMin = 2
  val LiftDfMaxPct = 95

  /** Per-document vocabulary cap for pair generation — THE scale
    * bound: pairs per doc ≤ C(cap, 2) regardless of document length,
    * so the pair exchange is O(docs · cap²), never O(docs · vocab²).
    * Deterministic keep rule: top by tf, word as tiebreak. */
  val LiftWordsPerDoc = 20

  /** Minimum co-occurrence support and per-word output cap. */
  val LiftPairMin = 3
  val LiftTopK = 5

  /** q82 — term co-occurrence lift: for each surviving word pair
    * (w1 < w2), `lift = P(w1,w2) / (P(w1)·P(w2)) =
    * n_ab·N / (n_a·n_b)`, top [[LiftTopK]] partners per w1. Lift is a
    * strictly monotone transform of PMI (PMI = log lift), so the
    * ranking is the PMI ranking WITHOUT trusting two engines' `ln` to
    * agree bit-for-bit — same reason q63 ranks by tf/df instead of
    * tf·log(N/df). The one float is a single division whose operands
    * (`n_ab·N`, `n_a·n_b`) are exact BIGINTs in both engines.
    *
    * Scale shape: the df gate and per-doc cap (above) bound the pair
    * space; pair counting is a map-side-combinable aggregate on the
    * (w1, w2) key; n_a/n_b joins are against the vocabulary-sized
    * capped-df frame; the final per-w1 top-k window plans as
    * WindowGroupLimit (partial rank below the exchange). */
  def termLift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val tf = docs
      .select($"doc_id",
        explode(filter(split(lower($"text"), "[^a-z]+"), w => w =!= ""))
          .as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy($"doc_id").orderBy($"tf".desc, $"word")
    val capped = tf.join(df, "word")
      .crossJoin(broadcast(nDocs))
      .where($"df" >= LiftDfMin &&
        $"df" * 100 <= lit(LiftDfMaxPct.toLong) * $"n_docs")
      .withColumn("rn", row_number().over(byDoc))
      .where($"rn" <= LiftWordsPerDoc)
      .select($"doc_id", $"word")
      .cache()
    // single-scan materialization: capped feeds FOUR consumers (both
    // sides of the pair self-join and both n_a/n_b lookups) — without
    // it each consumer re-runs tokenize → tf → df → gate → window
    // (relying on AQE exchange reuse to dedupe is not a contract).
    // Bounded: ≤ LiftWordsPerDoc rows per doc, two narrow columns.
    capped.count()
    val nw = capped.groupBy($"word").agg(count(lit(1)).as("n"))
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.word") < col("b.word"))
      .groupBy(col("a.word").as("w1"), col("b.word").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .where($"n_ab" >= LiftPairMin)
    val byW1 = Window.partitionBy($"w1").orderBy($"lift".desc, $"w2")
    pairs
      .join(nw.select($"word".as("w1"), $"n".as("na")), "w1")
      .join(nw.select($"word".as("w2"), $"n".as("nb")), "w2")
      .crossJoin(broadcast(nDocs))
      .withColumn("lift",
        ($"n_ab" * $"n_docs").cast("double") / ($"na" * $"nb").cast("double"))
      .withColumn("rn", row_number().over(byW1).cast("long"))
      .where($"rn" <= LiftTopK)
      .select($"w1", $"w2", $"n_ab", $"lift", $"rn")
  }

  val termLiftSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, x AS word, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id,
       |          unnest(string_split_regex(lower(text), '[^a-z]+')) AS x
       |        FROM documents)
       |  WHERE x <> '' GROUP BY 1, 2
       |), total AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |capped AS (
       |  SELECT doc_id, word FROM (
       |    SELECT tf.doc_id, tf.word,
       |      row_number() OVER (PARTITION BY tf.doc_id
       |        ORDER BY tf.tf DESC, tf.word) AS rn
       |    FROM tf JOIN df USING (word) CROSS JOIN total t
       |    WHERE df >= $LiftDfMin AND df * 100 <= $LiftDfMaxPct * t.n_docs)
       |  WHERE rn <= $LiftWordsPerDoc
       |), nw AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM capped GROUP BY 1),
       |pairs AS (
       |  SELECT a.word AS w1, b.word AS w2, CAST(count(*) AS BIGINT) AS n_ab
       |  FROM capped a JOIN capped b
       |    ON a.doc_id = b.doc_id AND a.word < b.word
       |  GROUP BY 1, 2 HAVING count(*) >= $LiftPairMin
       |)
       |SELECT w1, w2, n_ab, lift, rn FROM (
       |  SELECT p.w1, p.w2, p.n_ab,
       |    CAST(p.n_ab * t.n_docs AS DOUBLE) / CAST(na.n * nb.n AS DOUBLE)
       |      AS lift,
       |    row_number() OVER (PARTITION BY p.w1 ORDER BY
       |      CAST(p.n_ab * t.n_docs AS DOUBLE) / CAST(na.n * nb.n AS DOUBLE)
       |        DESC, p.w2) AS rn
       |  FROM pairs p JOIN nw na ON na.word = p.w1
       |  JOIN nw nb ON nb.word = p.w2
       |  CROSS JOIN total t)
       |WHERE rn <= $LiftTopK""".stripMargin

  /** q85 — character-diversity quality signal: Simpson diversity
    * `1 − Σcᵢ²/n²` over each document's ASCII-alphanumeric character
    * histogram (case-folded). Low diversity flags degenerate docs —
    * repeated-character runs, numeric dumps, single-token spam — the
    * cheap first-line quality filter before the shingle-level q57/q58
    * stages. Both histogram moments come from the native one-pass
    * [[graft.functions.AlnumSqStats]] kernel; the oracle twin counts
    * the same 36 characters via 36 `length(replace(...))` terms.
    * Everything up to the final `1.0 − sq/n²` is exact-integer.
    *
    * Scale shape: ZERO shuffle — one generated-code pass per document
    * inside the scan's codegen span (the explode-chars alternative
    * multiplies rows by document length and pays a corpus-wide
    * exchange). Docs with no alphanumerics score NULL rather than
    * being filtered: a `WHERE n_alnum > 0` predicate on the derived
    * column gets pushed below the projection and DUPLICATES the
    * kernel into the filter (verified on the executed plan) — the
    * CASE keeps the kernel evaluated exactly once per row. */
  def charDiversity(s: SparkSession, dir: String): DataFrame =
    charDiversityOf(Tables.documents(s, dir))

  /** [[charDiversity]] over an arbitrary (doc_id, text) frame —
    * frame-level core for spec-side synthetic corpora. */
  private[graft] def charDiversityOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    Functions.register(s)
    import s.implicits._
    docs
      .select($"doc_id", call_function("alnum_sq_stats", $"text").as("st"))
      .select($"doc_id",
        $"st".getItem(0).as("n_alnum"), $"st".getItem(1).as("sq_sum"))
      .withColumn("diversity",
        when($"n_alnum" > 0L,
          lit(1.0) -
            $"sq_sum".cast("double") /
            ($"n_alnum" * $"n_alnum").cast("double")))
  }

  val charDiversitySql: String = {
    val counts = (('a' to 'z') ++ ('0' to '9')).map(c =>
      s"(length(s)-length(replace(s,'$c',''))) * (length(s)-length(replace(s,'$c','')))")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, CAST(length(s) AS BIGINT) AS n_alnum,
       |    CAST($counts AS BIGINT) AS sq_sum
       |  FROM d
       |)
       |SELECT doc_id, n_alnum, sq_sum,
       |  CASE WHEN n_alnum > 0 THEN
       |    1.0 - CAST(sq_sum AS DOUBLE) / CAST(n_alnum * n_alnum AS DOUBLE)
       |  END AS diversity
       |FROM m""".stripMargin
  }

  /** q88 quality-gate thresholds. All three rules compare EXACT
    * integers — no float ever crosses the engine boundary:
    * `tokens < MinTokens`; `diversity < 0.92` is algebraically
    * rewritten to `100·Σc² > 8·n²` (1 − sq/n² < 92/100 ⇔
    * 100·sq > 8·n²); `digit_ratio > 0.3` to `10·digits > 3·alnum`. */
  val GateMinTokens = 15
  val GateDiversityPctFloor = 92
  val GateDigitPctCeil = 30

  /** q88 — quality-gate report: the FineWeb/Gopher-style first-fail
    * filter cascade over per-document signals, with the removal
    * accounting the reference's outcome counters (A10, q17) apply to
    * contract cleaning — each document lands in exactly ONE bucket,
    * the FIRST rule it fails (too_short → low_diversity →
    * digit_heavy → keep), so the report is a partition of the corpus
    * and rule counts reconcile exactly to the total.
    *
    * Signals: `[a-z]+` token count (the q26/q63 tokenizer), Simpson
    * concentration from the q85 `alnum_sq_stats` kernel, digit count.
    * The synthetic corpus exercises too_short and low_diversity;
    * digit_heavy cannot fire there (TESTDATA's documents carry no
    * digits) and is pinned by the spec's synthetic frame instead.
    *
    * Scale shape: every signal is a per-row expression over the scan
    * (one native kernel call + two codegen'd regex/size calls); the
    * only exchange is the final ≤ 4-row verdict rollup (map-side
    * combinable). This is the cheapest possible shape for a corpus
    * gate — the same plan family as q62's deterministic split. */
  def qualityGate(s: SparkSession, dir: String): DataFrame =
    qualityGateOf(Tables.documents(s, dir))

  /** [[qualityGate]] over an arbitrary (doc_id, text) frame —
    * frame-level core for spec-side synthetic corpora. */
  private[graft] def qualityGateOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    Functions.register(s)
    import s.implicits._
    docs
      .select($"doc_id",
        size(filter(split(lower($"text"), "[^a-z]+"), w => w =!= ""))
          .cast("long").as("n_tok"),
        length(regexp_replace($"text", "[^0-9]", "")).cast("long")
          .as("n_digit"),
        call_function("alnum_sq_stats", $"text").as("st"))
      .select($"doc_id", $"n_tok", $"n_digit",
        $"st".getItem(0).as("n_alnum"), $"st".getItem(1).as("sq_sum"))
      .withColumn("verdict",
        when($"n_tok" < GateMinTokens, "too_short")
          .when($"n_alnum" === 0L ||
            $"sq_sum" * 100L > lit(100L - GateDiversityPctFloor) *
              $"n_alnum" * $"n_alnum", "low_diversity")
          .when($"n_digit" * 10L > lit(GateDigitPctCeil / 10L) * $"n_alnum",
            "digit_heavy")
          .otherwise("keep"))
      .groupBy($"verdict")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
  }

  val qualityGateSql: String = {
    val counts = (('a' to 'z') ++ ('0' to '9')).map(c =>
      s"(length(s)-length(replace(s,'$c',''))) * (length(s)-length(replace(s,'$c','')))")
      .mkString(" + ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                         x -> x <> '')) AS BIGINT) AS n_tok,
       |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
       |      AS n_digit,
       |    CAST(length(s) AS BIGINT) AS n_alnum,
       |    CAST($counts AS BIGINT) AS sq_sum
       |  FROM (SELECT doc_id, text,
       |          regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
       |        FROM documents)
       |)
       |SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |FROM (
       |  SELECT n_tok,
       |    CASE WHEN n_tok < $GateMinTokens THEN 'too_short'
       |         WHEN n_alnum = 0 OR sq_sum * 100 >
       |           ${100 - GateDiversityPctFloor} * n_alnum * n_alnum
       |           THEN 'low_diversity'
       |         WHEN n_digit * 10 > ${GateDigitPctCeil / 10} * n_alnum
       |           THEN 'digit_heavy'
       |         ELSE 'keep' END AS verdict
       |  FROM m)
       |GROUP BY 1""".stripMargin
  }

  /** Word n-gram width for the cross-document duplication rate. */
  val DupNgramN = 5

  /** q86 — cross-document n-gram duplication rate (the MassiveText /
    * RefinedWeb "exact substring duplication" diagnostic): per
    * document, the fraction of its word 5-gram INSTANCES whose gram
    * also occurs in at least one other document. Distinct from q58
    * (repetition WITHIN a doc) and q23 (pairwise Jaccard): this is the
    * corpus-level signal that drives doc removal/trimming thresholds
    * (e.g. "drop if > 30% of 5-grams are duplicated").
    *
    * Scale shape: two exchanges — (doc, gram) instance counting
    * (map-side combinable) and gram document-frequency (vocabulary of
    * distinct grams, map-side combinable); the join back to (doc,
    * gram) re-uses the gram hash partitioning. Per-doc rollup carries
    * two exact BIGINT sums; the rate is the single terminal division.
    * At 100 TB the gram key would be `xxhash64(gram)` (8 bytes vs ~30
    * through both exchanges) — kept as the raw string here because the
    * oracle twin must hash identically, and DuckDB has no xxhash64. */
  def dupNgramRate(s: SparkSession, dir: String): DataFrame =
    dupNgramRateOf(Tables.documents(s, dir))

  /** [[dupNgramRate]] over an arbitrary (doc_id, text) frame —
    * frame-level core for spec-side synthetic corpora. */
  private[graft] def dupNgramRateOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs
      .select($"doc_id",
        filter(split(lower($"text"), "[^a-z]+"), w => w =!= "").as("toks"))
      .where(size($"toks") >= DupNgramN)
    val grams = toks.select($"doc_id",
      explode(transform(
        sequence(lit(0), size($"toks") - DupNgramN),
        i => concat_ws(" ", slice($"toks", i + 1, lit(DupNgramN)))))
        .as("gram"))
    val dg = grams.groupBy($"doc_id", $"gram").agg(count(lit(1)).as("n"))
    val gdf = dg.groupBy($"gram").agg(count(lit(1)).as("nd"))
    dg.join(gdf, "gram")
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_grams"),
        sum(when($"nd" >= 2, $"n").otherwise(0L)).as("n_dup"))
      .withColumn("dup_rate",
        $"n_dup".cast("double") / $"n_grams".cast("double"))
  }

  val dupNgramRateSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                x -> x <> '') AS toks
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    array_to_string(toks[(i+1):(i+$DupNgramN)], ' ') AS gram
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(len(toks) - ${DupNgramN - 1})) AS i
       |        FROM d WHERE len(toks) >= $DupNgramN)
       |), dg AS (
       |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS n
       |  FROM g GROUP BY 1, 2
       |), gdf AS (
       |  SELECT gram, CAST(count(*) AS BIGINT) AS nd FROM dg GROUP BY 1
       |)
       |SELECT dg.doc_id,
       |  CAST(sum(n) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN nd >= 2 THEN n ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(sum(CASE WHEN nd >= 2 THEN n ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(n) AS DOUBLE) AS dup_rate
       |FROM dg JOIN gdf USING (gram) GROUP BY 1""".stripMargin

  /** q97 sample size per source. */
  val SampleK = 5

  /** q97 — deterministic inspection sample: per source, [[SampleK]]
    * documents drawn uniformly WITHOUT replacement by ordering on
    * `md5(doc_id)` (the q65/q76 content-derived order convention) —
    * the human-eval / release-QA sample every corpus pipeline ships
    * alongside its stats. Unlike `TABLESAMPLE`/`rand()`, the draw is
    * reproducible across engines, partitionings and reruns, and
    * stratified exactly (exactly K per source, not K in expectation).
    *
    * Scale shape: one source-keyed exchange; the rank cut plans as
    * WindowGroupLimit (partial top-K below the exchange), so the
    * shuffle carries at most K rows per source per map task — never
    * the corpus. Text is NOT carried through the shuffle; the sample
    * joins back to the corpus by doc_id only if a consumer wants
    * bodies. */
  def sourceSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bySrc = Window.partitionBy($"source")
      .orderBy($"ord", $"doc_id")
    Tables.documents(s, dir)
      .select($"source", $"doc_id", $"lang",
        md5($"doc_id".cast("string")).as("ord"))
      .withColumn("rank", row_number().over(bySrc).cast("long"))
      .where($"rank" <= SampleK)
      .select($"source", $"rank", $"doc_id", $"lang")
  }

  val sourceSampleSql: String =
    s"""SELECT source, rank, doc_id, lang FROM (
       |  SELECT source, doc_id, lang,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
       |      AS rank
       |  FROM documents)
       |WHERE rank <= $SampleK""".stripMargin

  /** Per-source term-profile length for q95 — each source is
    * represented by its top-K terms by total tf (word as tiebreak),
    * so the pair stage is O(sources² · K) no matter how large the
    * vocabulary grows (a web corpus has millions of domains and tens
    * of millions of terms; uncapped profiles would make the word-keyed
    * pair join quadratic in df). */
  val SrcTermsK = 200

  /** q95 — source-similarity matrix: cosine² between per-source
    * term-count profiles, the corpus-composition audit a mixture
    * designer reads before setting q70's weights (two sources with
    * cos² ≈ 1 are redundant; a source orthogonal to the rest adds
    * diversity). Cosine SQUARED, not cosine: `cos² = dot² /
    * (‖a‖²·‖b‖²)` keeps every operand an exact integer until one
    * fixed-shape double expression — no sqrt crosses the engine
    * boundary (the q82 lift-not-PMI rule), and cos² is a strictly
    * monotone transform of cosine on non-negative counts so any
    * ranking consumer is unaffected.
    *
    * Scale shape: tf is one map-side-combinable aggregate; the top-K
    * profile window plans as WindowGroupLimit on the source exchange;
    * the pair join is keyed on WORD (each word joins the ≤ |sources|
    * profiles containing it), so the shuffle is profile-sized —
    * O(sources·K) rows — and the rollup output is the ≤ C(sources,2)
    * matrix. */
  def sourceSimilarity(s: SparkSession, dir: String): DataFrame = {
    val (matrix, prof) = sourceSimilarityFrames(s, dir)
    val checked = matrix.localCheckpoint(true)
    prof.unpersist()
    checked
  }

  /** (matrix, cached profile frame) pre-materialization — PlanSpec
    * asserts on the matrix plan; [[sourceSimilarity]] owns the cache
    * scope. */
  /** The uncached top-K profile plan — PlanSpec pins its
    * WindowGroupLimit shape here, where the window is still visible
    * (a cached frame explains as an InMemoryTableScan). */
  private[graft] def sourceSimilarityProfilePlan(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = Tables.documents(s, dir)
      .select($"source",
        explode(filter(split(lower($"text"), "[^a-z]+"), w => w =!= ""))
          .as("word"))
      .groupBy($"source", $"word").agg(count(lit(1)).as("tf"))
    val bySrc = Window.partitionBy($"source")
      .orderBy($"tf".desc, $"word")
    tf.withColumn("rn", row_number().over(bySrc))
      .where($"rn" <= SrcTermsK)
      .select($"source", $"word", $"tf")
  }

  private[graft] def sourceSimilarityFrames(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val prof = sourceSimilarityProfilePlan(s, dir).cache()
    // single-scan materialization: both sides of the pair join and
    // both norm lookups re-scan the profile frame
    prof.count()
    val norms = prof.groupBy($"source")
      .agg(sum($"tf" * $"tf").as("sq"))
    val dots = prof.as("a").join(prof.as("b"),
        col("a.word") === col("b.word") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
    val out = dots
      .join(norms.select($"source".as("src_a"), $"sq".as("sq_a")), "src_a")
      .join(norms.select($"source".as("src_b"), $"sq".as("sq_b")), "src_b")
      .select($"src_a", $"src_b", $"dot",
        (($"dot".cast("double") * $"dot".cast("double")) /
          ($"sq_a".cast("double") * $"sq_b".cast("double"))).as("cos2"))
    (out, prof)
  }

  val sourceSimilaritySql: String =
    s"""WITH tf AS (
       |  SELECT source, x AS word, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT source,
       |          unnest(string_split_regex(lower(text), '[^a-z]+')) AS x
       |        FROM documents)
       |  WHERE x <> '' GROUP BY 1, 2
       |), prof AS (
       |  SELECT source, word, tf FROM (
       |    SELECT source, word, tf,
       |      row_number() OVER (PARTITION BY source
       |        ORDER BY tf DESC, word) AS rn
       |    FROM tf)
       |  WHERE rn <= $SrcTermsK
       |), norms AS (
       |  SELECT source, CAST(sum(tf * tf) AS BIGINT) AS sq
       |  FROM prof GROUP BY 1
       |), dots AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
       |  FROM prof a JOIN prof b
       |    ON a.word = b.word AND a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT d.src_a, d.src_b, d.dot,
       |  (CAST(d.dot AS DOUBLE) * CAST(d.dot AS DOUBLE))
       |    / (CAST(na.sq AS DOUBLE) * CAST(nb.sq AS DOUBLE)) AS cos2
       |FROM dots d
       |JOIN norms na ON na.source = d.src_a
       |JOIN norms nb ON nb.source = d.src_b""".stripMargin

  /** q100 duplicated-window width in tokens. The window is the match
    * UNIT, not the minimum span — merged spans grow arbitrarily long.
    * Smaller than ExactSubstr's 50 bytes because the synthetic corpus
    * is short-doc; the merge logic is width-independent. */
  val DupSpanW = 8

  /** q100 — exact duplicated-passage SPANS, the actionable output of
    * substring-level dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better": remove the repeated substring
    * itself, not the whole document). q86 measures HOW MUCH of a doc
    * is duplicated; this query says WHERE — per document, the maximal
    * token ranges covered by [[DupSpanW]]-token windows that occur
    * more than once anywhere in the corpus (across docs or repeated
    * within one). Downstream trimming consumes these (doc_id,
    * span_start, span_end) rows directly.
    *
    * Windows are positional: (doc, pos, gram) for every token offset.
    * A window is duplicated iff its gram's global instance count ≥ 2.
    * Overlapping/adjacent duplicated windows merge into maximal spans
    * via gaps-and-islands: a window starts a new island iff its start
    * exceeds the running max end of all earlier windows + 1.
    *
    * Scale shape: ONE corpus scan + tokenize pass (the dominant cost —
    * the duplicated-window test is a count-over-gram-partition WINDOW,
    * not an agg + self-join that would tokenize the corpus twice),
    * one gram-hash exchange, then ONE doc_id exchange shared by both
    * island windows and the span rollup (doc_id partitioning satisfies
    * the (doc_id, island) clustering ⇒ Catalyst plans no third
    * exchange; PlanSpec pins all of this). The running-max window is
    * O(1) state per row. At 100 TB the gram through the exchange would
    * be `xxhash64(gram)` (8 bytes); kept raw here because the oracle
    * must hash identically and DuckDB has no xxhash64. */
  def dupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpansOf(Tables.documents(s, dir))

  private[graft] def dupSpansOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val W = DupSpanW
    val toks = docs
      .select($"doc_id",
        filter(split(lower($"text"), "[^a-z]+"), w => w =!= "").as("toks"))
      .where(size($"toks") >= W)
    val wins = toks.select($"doc_id",
      explode(transform(
        sequence(lit(0), size($"toks") - W),
        i => struct((i + 1).cast("long").as("pos"),
          concat_ws(" ", slice($"toks", i + 1, lit(W))).as("gram"))))
        .as("w"))
      .select($"doc_id", $"w.pos", $"w.gram")
    val byPos = Window.partitionBy($"doc_id").orderBy($"pos")
    val dup = wins
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"gram")))
      .where($"n" >= 2).select($"doc_id", $"pos")
      .withColumn("prev_end",
        max($"pos" + (W - 1)).over(
          byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("fresh",
        when($"prev_end".isNull || $"pos" > $"prev_end" + 1, 1L).otherwise(0L))
      .withColumn("island",
        sum($"fresh").over(
          byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    dup.groupBy($"doc_id", $"island")
      .agg(min($"pos").as("span_start"),
        (max($"pos") + (W - 1)).as("span_end"),
        (max($"pos") - min($"pos") + W).as("span_tokens"))
      .select($"doc_id", $"span_start", $"span_end", $"span_tokens")
  }

  val dupSpansSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                x -> x <> '') AS toks
       |  FROM documents
       |), w AS (
       |  SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
       |    array_to_string(toks[(i+1):(i+$DupSpanW)], ' ') AS gram
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(len(toks) - ${DupSpanW - 1})) AS i
       |        FROM d WHERE len(toks) >= $DupSpanW)
       |), g AS (
       |  SELECT gram FROM w GROUP BY gram HAVING count(*) >= 2
       |), dup AS (
       |  SELECT doc_id, pos,
       |    max(pos + ${DupSpanW - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM w JOIN g USING (gram)
       |), isl AS (
       |  SELECT doc_id, pos,
       |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
       |             THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS UNBOUNDED PRECEDING) AS island
       |  FROM dup
       |)
       |SELECT doc_id,
       |  CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) + ${DupSpanW - 1} AS BIGINT) AS span_end,
       |  CAST(max(pos) - min(pos) + $DupSpanW AS BIGINT) AS span_tokens
       |FROM isl GROUP BY doc_id, island""".stripMargin

  /** q103 — n-gram NOVELTY by ingest order: per document, the fraction
    * of its word-[[DupNgramN]]-gram instances whose gram first occurs
    * in THIS document (global first occurrence = min doc_id, the
    * ingest-order proxy the driver data encodes). The directional
    * complement of q86: q86 charges BOTH copies of a duplicated gram,
    * novelty charges only the laggard — it is the signal an
    * ingest-ordered pipeline uses to answer "how much NEW text did
    * this batch contribute" and to trim re-crawls (the doc-level
    * analogue of what q77's incremental labels do for near-dup sets).
    *
    * Scale shape: ONE corpus scan + tokenize pass (vs. the naive
    * agg-then-self-join that tokenizes twice): the (doc, gram)
    * instance-count exchange is map-side combinable, first-occurrence
    * attribution is a `min(doc_id)` WINDOW over the gram partition of
    * the already-reduced (doc, gram, n) frame, and the doc rollup is
    * the third, equally reduced exchange carrying two exact BIGINT
    * sums; `novelty_rate` is the single terminal IEEE division. In a
    * streaming deployment first-occurrence state lives in the
    * q80-style watermarked store; here min(doc_id) is its batch
    * closure. */
  def gramNovelty(s: SparkSession, dir: String): DataFrame =
    gramNoveltyOf(Tables.documents(s, dir))

  private[graft] def gramNoveltyOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs
      .select($"doc_id",
        filter(split(lower($"text"), "[^a-z]+"), w => w =!= "").as("toks"))
      .where(size($"toks") >= DupNgramN)
    val grams = toks.select($"doc_id",
      explode(transform(
        sequence(lit(0), size($"toks") - DupNgramN),
        i => concat_ws(" ", slice($"toks", i + 1, lit(DupNgramN)))))
        .as("gram"))
    val dg = grams.groupBy($"doc_id", $"gram").agg(count(lit(1)).as("n"))
    dg.withColumn("first_doc",
        min($"doc_id").over(Window.partitionBy($"gram")))
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_grams"),
        sum(when($"first_doc" === $"doc_id", $"n").otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_rate",
        $"n_novel".cast("double") / $"n_grams".cast("double"))
  }

  val gramNoveltySql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                x -> x <> '') AS toks
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    array_to_string(toks[(i+1):(i+$DupNgramN)], ' ') AS gram
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(len(toks) - ${DupNgramN - 1})) AS i
       |        FROM d WHERE len(toks) >= $DupNgramN)
       |), dg AS (
       |  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS n
       |  FROM g GROUP BY 1, 2
       |), f AS (
       |  SELECT gram, min(doc_id) AS first_doc FROM dg GROUP BY 1
       |)
       |SELECT dg.doc_id,
       |  CAST(sum(n) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN f.first_doc = dg.doc_id THEN n ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  CAST(sum(CASE WHEN f.first_doc = dg.doc_id THEN n ELSE 0 END)
       |      AS DOUBLE)
       |    / CAST(sum(n) AS DOUBLE) AS novelty_rate
       |FROM dg JOIN f USING (gram) GROUP BY 1""".stripMargin
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for a training-data pipeline — exact,
  * MinHash+LSH, SimHash and n-gram-Jaccard near-dup detection over the
  * `documents` corpus (BASELINE.json north-star; the reference's own
  * dedup is the exact first-seen family, SURVEY.md §2.5 D1-D3).
  *
  * Scale notes (100 TB):
  *  - nothing here compares all pairs: MinHash banding and the
  *    (lang, source) blocking bound candidate generation to hash-equal
  *    buckets, so the only shuffles are hash-partitioned groupBys and
  *    equi-joins on (band, key) / (block, gram);
  *  - signatures are fixed-width aggregates (8 minhashes / 16 simhash
  *    bits) built in ONE pass with conditional aggregation — no
  *    iterative driver loop;
  *  - md5 is used as the permutation family: deterministic across
  *    engines and executors, no RNG state to coordinate.
  */
object DedupOps {

  /** q20 — exact dedup by normalized content hash (D1's identity dedup
    * at content granularity, 02_filter_by_CIN.py:252-268): canonical id
    * = first-seen (min doc_id) per hash group. */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"h")
    Tables.documents(s, dir)
      .withColumn("h", md5(trim(lower($"text"))))
      .withColumn("canonical_id", min($"doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select($"doc_id", $"canonical_id",
        ($"doc_id" =!= $"canonical_id").as("is_dup"), $"group_size")
  }

  val dedupExactSql: String =
    """SELECT doc_id, canonical_id, doc_id <> canonical_id AS is_dup,
      |       group_size
      |FROM (
      |  SELECT doc_id,
      |    MIN(doc_id) OVER (PARTITION BY h) AS canonical_id,
      |    COUNT(*) OVER (PARTITION BY h) AS group_size
      |  FROM (SELECT doc_id, md5(trim(lower(text))) AS h FROM documents))"""
      .stripMargin

  private val nPerms = 8 // minhash permutations; 2 bands of 4 rows

  /** q21 — MinHash + LSH near-duplicate detection with exact-Jaccard
    * verification of the banded candidates.
    *
    * ZERO shuffles up to the (1-row-per-doc) signature frame: the
    * distinct 5-gram shingle set, its md5 digests, and the 8 minhash
    * slices are all computed WITHIN each document's row
    * (array_distinct ∘ transform over the character positions, then
    * array_min over digest slices) — per-document work proportional to
    * document length, embarrassingly parallel at any corpus size, and
    * an order of magnitude cheaper than the explode + groupBy shape
    * (no 10⁶-row shuffle, no object-hash collect_set aggregation).
    * Candidates come from band-key equality (2 bands × 4 rows) over
    * the signature frame; verification is a doc-level join of the
    * candidate pairs back to the per-doc sets — array_intersect, no
    * shingle-level shuffle.
    *
    * The permutation family: 8 disjoint 4-hex-char (16-bit) slices of
    * one md5(shingle) digest — independent uniform hashes from one
    * crypto-hash evaluation, deterministic across engines/executors.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    // Scope the signature cache to this call: materialize the (small)
    // verified-pair set eagerly, then free the per-doc shingle arrays
    // — the dominant memory consumer — exactly as q48 does before its
    // propagation loop. Without this the cache outlives the query and
    // taxes every later query in a long session (surfaced by the
    // round-8 volume soak: factor-4 timings swung 4-10× from storage
    // churn, and stabilized once the cache was scoped).
    val (pairs, sig) = minhashPairs(s, dir)
    val out = pairs.localCheckpoint(true)
    sig.unpersist()
    out
  }

  /** The two LSH band keys (band id → concatenated minima slice) from
    * a minima accessor — the SINGLE definition of the banding scheme.
    * Both the batch pipeline (q21/q48, via its cached sig columns)
    * and the streaming ingest probe (q69, via the struct field)
    * derive their buckets from this list, so band count, slice width,
    * and key layout cannot drift between them. Indices cover
    * [[nPerms]] minima: 2 bands × 4. */
  private def bandKeys(min: Int => Column): Seq[(Int, Column)] = Seq(
    0 -> concat(min(0), min(1), min(2), min(3)),
    1 -> concat(min(4), min(5), min(6), min(7)))

  /** The (doc_id, band, key) LSH index rows for an arbitrary
    * (doc_id, text) frame — the [[bandKeys]] banding as a reusable
    * single-pass plan (sig once, bands via explode — no second scan
    * of the source), shared with the streaming ingest probe (q69).
    * Works on batch and streaming frames alike. */
  private[graft] def bandFrame(docs: DataFrame): DataFrame =
    bandsOfSig(sigStruct(docs))

  /** THE signature source: (doc_id, sg) where sg is the native
    * minhash struct (shingle set `ss` + banding minima `mins`) over
    * `length >= 5` docs. Every consumer — banding ([[bandsOfSig]]),
    * the pair pipeline ([[minhashPairsOf]]), q77's verification —
    * projects from this ONE definition, so the length guard and the
    * normalization cannot drift between band keys and verification
    * sets. Works on batch and streaming frames alike. */
  private[graft] def sigStruct(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.Functions.register(s)
    docs.where(length($"text") >= 5)
      .select($"doc_id", expr("minhash_sig(lower(text))").as("sg"))
  }

  /** The (doc_id, band, key) LSH index rows from a [[sigStruct]]
    * frame (bands via explode — no second scan of the source). */
  private[graft] def bandsOfSig(sig: DataFrame): DataFrame = {
    val s = sig.sparkSession
    import s.implicits._
    val bk = array(bandKeys(p => $"sg.mins".getItem(p)).map {
      case (b, k) => struct(lit(b).as("band"), k.as("key"))
    }: _*)
    sig.select($"doc_id", explode(bk).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.key".as("key"))
  }

  /** Frequency cap on LSH band buckets: a band key shared by more
    * than this many documents is treated as non-discriminative and
    * generates NO candidates (the RefinedWeb/production-dedup
    * convention — an over-common band minimum carries no similarity
    * signal, and an uncapped hot bucket is the ONE quadratic term in
    * an otherwise linear pipeline). Never binds on the test corpora
    * (max bucket 20 at sf0.1) so registered results are unchanged;
    * the round-8 volume soak measured the pathology it prevents: at
    * 8× sf0.1 on the low-entropy synthetic vocabulary the largest
    * bucket reached 377 docs ≈ 71k candidate pairs from one key.
    * Mirrored in the DuckDB oracle ([[minhashCtes]]), so the cap is
    * part of the checked semantics, not a Spark-side shortcut. */
  val MaxBandBucket = 64

  /** Drop rows whose band bucket holds more than [[MaxBandBucket]]
    * members — THE cap implementation, shared by the batch pipeline
    * ([[minhashPairs]], on (band, key)), the materialized q69 index
    * ([[graft.ops.LayoutOps.ensureBandIndexLayout]], on the fused
    * bkey), and the spec expectations, so cap semantics cannot drift
    * between sites. `keyCols` is the bucket identity; the size
    * aggregation groups — and the restricting join runs — on exactly
    * those columns, so when the consumer shuffles on the same keys
    * the cap costs one extra map-side-combined aggregation, not a
    * new repartitioning. */
  private[graft] def capBandBuckets(df: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keep = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= MaxBandBucket)
      .select(keyCols.map(col): _*)
    df.join(keep, keyCols)
  }

  /** Jaccard threshold above which a verified pair is a near-dup
    * EDGE (q48 clustering, q75 survivors). Referenced by the
    * cluster-label artifact fingerprint
    * ([[graft.ops.LayoutOps.ensureClusterLabelLayout]]) — changing it
    * here changes the fingerprint, so stale artifacts rebuild instead
    * of being silently reused under the old semantics. */
  val JaccardThreshold = 0.8

  /** Shared implementation returning (pairs, cached signature frame) —
    * q48 materializes the pairs and then unpersists the signature
    * cache (the per-doc shingle arrays are the dominant memory
    * consumer and are unused during label propagation). */
  private def minhashPairs(s: SparkSession,
      dir: String): (DataFrame, DataFrame) =
    minhashPairsOf(Tables.documents(s, dir))

  /** [[minhashPairs]] over an arbitrary (doc_id, text) frame — the
    * frame-level core, so the incremental path (q77) can run the
    * identical pair pipeline on the corpus slice alone. */
  private def minhashPairsOf(docs: DataFrame): (DataFrame, DataFrame) = {
    val s = docs.sparkSession
    import s.implicits._
    val minCols = (0 until nPerms).map(p =>
      $"sg.mins".getItem(p).as(s"m$p"))
    val sig = sigStruct(docs)
      .select(($"doc_id" +: $"sg.ss".as("ss") +: minCols): _*)
      .cache()
    // single-scan materialization: bands reads sig twice and the
    // verify join twice more; a cold cache would recompute the
    // per-doc shingle/digest arrays once per concurrent scan
    sig.count()
    val bands = bandKeys(p => col(s"m$p")).map { case (b, k) =>
      sig.select($"doc_id", lit(b).as("band"), k.as("key"))
    }.reduce(_ union _)
    // frequency cap (see MaxBandBucket): drop over-common band keys
    // BEFORE the self-join — shared implementation with the q69 index
    val bounded = capBandBuckets(bands, Seq("band", "key"))
    val a = bounded.as("a"); val b = bounded.as("b")
    val cand = a.join(b,
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    val setsA = sig.select($"doc_id".as("doc_a"), $"ss".as("ssa"))
    val setsB = sig.select($"doc_id".as("doc_b"), $"ss".as("ssb"))
    val pairs = cand.join(setsA, "doc_a").join(setsB, "doc_b")
      .withColumn("n_inter",
        size(array_intersect($"ssa", $"ssb")).cast("long"))
      // zero-intersection candidates (possible when band minimums
      // coincide without shared shingles) must NOT emit a jaccard=0
      // row: the oracle's inner shingle join produces no row for them
      .where($"n_inter" > 0)
      .select($"doc_a", $"doc_b",
        ($"n_inter".cast("double") /
          (size($"ssa") + size($"ssb") - $"n_inter").cast("double"))
          .as("jaccard"))
    (pairs, sig)
  }

  /** The shingle → signature → bands prefix of the minhash WITH-chain
    * — everything a band-bucket consumer needs. The streaming ingest
    * oracle (q69) stops here; [[minhashCtes]] appends the exact-
    * Jaccard verification tail for the batch dedup oracles. */
  private[graft] def minhashBandCtes: String = {
    val minCols = (0 until nPerms)
      .map(p => s"min(substr(md5(shingle), ${p * 4 + 1}, 4)) m$p")
      .mkString(", ")
    s"""WITH RECURSIVE sh AS (
       |  SELECT DISTINCT doc_id, substr(t, i, 5) AS shingle
       |  FROM (SELECT doc_id, lower(text) AS t,
       |          unnest(range(1, length(text)-3)) AS i
       |        FROM documents WHERE length(text) >= 5)
       |), sig AS (
       |  SELECT doc_id, $minCols FROM sh GROUP BY doc_id
       |), bands AS (
       |  SELECT doc_id, 0 AS band, m0||m1||m2||m3 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1, m4||m5||m6||m7 FROM sig
       |)""".stripMargin
  }

  /** The WITH-chain of the minhash pipeline, shared by the q21 and q48
    * oracles (ends after `pairs`; callers append further CTEs or the
    * final SELECT). */
  private[graft] def minhashCtes: String =
    minhashBandCtes + s""", keep AS (
       |  SELECT band, key FROM bands GROUP BY band, key
       |  HAVING count(*) <= $MaxBandBucket
       |), bounded AS (
       |  SELECT b.doc_id, b.band, b.key FROM bands b JOIN keep USING (band, key)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bounded a JOIN bounded b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY c.doc_a, c.doc_b
       |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT i.doc_a, i.doc_b,
       |    CAST(n_inter AS DOUBLE) / CAST(za.n + zb.n - n_inter AS DOUBLE)
       |      AS jaccard
       |  FROM inter i
       |  JOIN sizes za ON za.doc_id = i.doc_a
       |  JOIN sizes zb ON zb.doc_id = i.doc_b)""".stripMargin

  val minhashLshSql: String =
    minhashCtes + "\nSELECT doc_a, doc_b, jaccard FROM pairs"

  /** q48 — near-duplicate clusters: connected components of the
    * verified-Jaccard graph (edges ≥ threshold), each doc labeled with
    * its component's minimum doc_id — the canonical-document selection
    * step that closes the dedup pipeline (keep canonical, drop the
    * rest).
    *
    * Implementation: min-label propagation with pointer jumping over
    * the symmetric edge list. Each round takes the min label over
    * {self} ∪ neighbors (one join+agg), then path-compresses with
    * label ← label(label) (one self-join) — the compression doubles
    * propagation reach per round, so a chain of diameter d converges
    * in O(log d) rounds instead of O(d). Change detection rides the
    * same aggregate (the self row carries the pre-round label), so a
    * round is exactly two jobs: the eager localCheckpoint and a count
    * over the checkpointed result. All data stays distributed; the
    * driver sees only the change counter. The oracle computes the same
    * labels via recursive reachability closure.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    clustersOf(Tables.documents(s, dir))

  /** [[dedupClusters]] over an arbitrary (doc_id, text) frame — the
    * frame-level core, so the incremental path (q77) can cluster the
    * already-ingested corpus slice with the identical algorithm. */
  private[graft] def clustersOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val threshold = JaccardThreshold
    val (pairs, sig) = minhashPairsOf(docs)
    val edges = pairs
      .where($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b")
      .cache()
    // single-scan materialization: the symmetric union below reads
    // edges twice, and the whole minhash pipeline would recompute per
    // branch if the first action found the cache cold
    edges.count()
    // the per-doc shingle arrays are dead weight from here on — free
    // them before the propagation loop competes for storage memory
    sig.unpersist()
    val labels = propagateMin(edges)
    edges.unpersist()
    labels.select($"id".as("doc_id"), $"label".as("canonical_id"))
      .withColumn("is_canonical", $"doc_id" === $"canonical_id")
  }

  /** Min-label propagation with pointer jumping over an undirected
    * edge set — the connected-components core shared by the shingle
    * dedup family (q48/q77 via [[clustersOf]]) and the embedding-space
    * dedup (q78, [[graft.ops.SimilarityOps.semanticDedup]]). Input is
    * ONE row per edge (doc_a, doc_b), already MATERIALIZED by the
    * caller (cached or checkpointed — the loop scans it every round);
    * output is (id, label) where label = min reachable id, one row per
    * endpoint. All data stays distributed; the driver sees only the
    * per-round change counter. */
  private[graft] def propagateMin(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val sym = edges
      .union(edges.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
    var labels = sym.select($"doc_a".as("id")).distinct()
      .withColumn("label", $"id")
      .cache()
    // single-scan materialization: round 1 scans labels twice (self
    // rows + the neighbor join) — a cold cache would recompute the
    // distinct shuffle per scan
    labels.count()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 35) {
      // min over {self} ∪ neighbor labels; the self row also carries
      // the pre-round label so the change count needs no extra join
      val viaNeighbors = sym
        .join(labels, sym("doc_a") === labels("id"))
        .select($"doc_b".as("id"), $"label",
          lit(null).cast("long").as("self"))
      val folded = labels.select($"id", $"label", $"label".as("self"))
        .union(viaNeighbors)
        .groupBy($"id")
        .agg(min($"label").as("label"), min($"self").as("old"))
      // pointer jump: label ← label(label). Monotone (label(x) ≤ x
      // throughout), and the fixed point is unchanged — only reached
      // exponentially faster.
      val ptr = folded.select($"id".as("pid"), $"label".as("plabel"))
      // localCheckpoint truncates lineage — without it every round's
      // plan embeds all previous rounds and analysis time compounds
      val next = folded.join(ptr, folded("label") === ptr("pid"), "left")
        .select(folded("id"),
          coalesce($"plabel", folded("label")).as("label"), $"old")
        .localCheckpoint(true)
      changed = next.where($"label" =!= $"old").count()
      labels.unpersist()
      labels = next.select($"id", $"label")
      rounds += 1
      if (sys.env.contains("GRAFT_CC_TRACE"))
        println(s"CC_TRACE round=$rounds changed=$changed " +
          s"t=${System.nanoTime() / 1000000}")
    }
    if (changed > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"propagateMin: propagation not converged after $rounds rounds " +
          s"($changed labels still moving) — results approximate; raise " +
          "the round cap or use large-star/small-star")
    labels
  }

  /** q84 — near-dup graph degree histogram: for every document, its
    * number of verified near-dup partners (edges with jaccard ≥
    * [[JaccardThreshold]] — the SAME edge set q48 clusters), rolled up
    * to degree → n_docs. This is the dedup-health diagnostic run
    * before committing to a removal pass: a heavy high-degree tail
    * means template/boilerplate explosion (clusters that will chain
    * into giant components), a near-all-zero histogram means the
    * corpus is already clean and the clustering pass can be skipped.
    *
    * Scale shape: rides the capped band pipeline (q21's bounded
    * candidate generator — no all-pairs anywhere); the symmetric
    * degree count is a map-side-combinable aggregate on doc_id; the
    * zero-degree docs come from a LEFT join of the corpus ids against
    * the degree frame (never a collect); the histogram output is at
    * most max-degree rows. Edges are cached because the symmetric
    * union scans them twice — and the signature cache is freed first,
    * as in q48. */
  def dupGraphDegree(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (pairs, sig) = minhashPairs(s, dir)
    val edges = pairs
      .where($"jaccard" >= JaccardThreshold)
      .select($"doc_a", $"doc_b")
      .cache()
    edges.count()
    sig.unpersist()
    val deg = edges.select($"doc_a".as("doc_id"))
      .union(edges.select($"doc_b".as("doc_id")))
      .groupBy($"doc_id").agg(count(lit(1)).as("degree"))
    Tables.documents(s, dir).select($"doc_id")
      .join(deg, Seq("doc_id"), "left")
      .select(coalesce($"degree", lit(0L)).as("degree"))
      .groupBy($"degree").agg(count(lit(1)).as("n_docs"))
  }

  val dupGraphDegreeSql: String =
    minhashCtes +
      s""",
        |edges AS (
        |  SELECT doc_a, doc_b FROM pairs WHERE jaccard >= $JaccardThreshold
        |),
        |deg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT doc_a AS doc_id FROM edges
        |    UNION ALL
        |    SELECT doc_b FROM edges) GROUP BY 1
        |)
        |SELECT CAST(coalesce(deg.degree, 0) AS BIGINT) AS degree,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents d LEFT JOIN deg ON deg.doc_id = d.doc_id
        |GROUP BY 1""".stripMargin

  /** The q48 cluster computation as a reusable CTE chain (transitive
    * closure over the ≥ 0.8-jaccard edge set) — shared by the q48
    * final SELECT and the q75 survivor rollup so the clustering the
    * two queries see cannot drift. */
  private val clustersCteSql: String =
    minhashCtes +
      s""",
        |edges AS (
        |  SELECT doc_a, doc_b FROM pairs WHERE jaccard >= $JaccardThreshold
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pairs WHERE jaccard >= $JaccardThreshold
        |),
        |reach(id, r) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM edges
        |  UNION
        |  SELECT reach.id, e.doc_b FROM reach JOIN edges e ON e.doc_a = reach.r
        |)""".stripMargin

  val dedupClustersSql: String =
    clustersCteSql +
      """
        |SELECT id AS doc_id, MIN(r) AS canonical_id,
        |       id = MIN(r) AS is_canonical
        |FROM reach GROUP BY id""".stripMargin

  /** q75 — near-dup SURVIVOR selection: the removal stage q48's
    * cluster labels exist to drive (the dedup family end-to-end:
    * q20 removes exact copies, q21 detects near-dup pairs, q48
    * clusters them, q75 drops every cluster member except its
    * canonical representative). A document survives iff it belongs
    * to no cluster, or is its cluster's min-id representative —
    * reported as a per-language audit (docs, survivors, removed).
    *
    * Scale shape: the labels come from the write-once artifact
    * ([[graft.ops.LayoutOps.ensureClusterLabelLayout]]) — clustering
    * runs once per corpus snapshot (q48 measures it), consumers read
    * the result. Cluster MEMBERSHIP is usually small next to the
    * corpus (only docs with a ≥ 0.8-jaccard partner) — but that is a
    * corpus property, not a guarantee, so the broadcast is GATED on a
    * measured count ([[Hints.broadcastIfSmall]]; the artifact is
    * parquet, so the count is a metadata read). Under the cap the
    * left join stays map-side; over it, AQE picks the strategy. The
    * rollup is a map-side-combinable (lang) aggregation. */
  def neardupSurvivors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = s.read
      .parquet(LayoutOps.ensureClusterLabelLayout(s, dir))
      .select($"doc_id", $"is_canonical")
    Tables.documents(s, dir).select($"doc_id", $"lang")
      .join(Hints.broadcastIfSmall(labels), Seq("doc_id"), "left")
      .withColumn("survives", coalesce($"is_canonical", lit(true)))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"survives", 1L).otherwise(0L)).as("n_survivors"),
        sum(when(!$"survives", 1L).otherwise(0L)).as("n_removed"))
  }

  val neardupSurvivorsSql: String =
    clustersCteSql +
      """
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN c.doc_id IS NULL OR c.is_canonical
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
        |  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL AND NOT c.is_canonical
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        |FROM documents d LEFT JOIN (
        |  SELECT id AS doc_id, id = MIN(r) AS is_canonical
        |  FROM reach GROUP BY id) c USING (doc_id)
        |GROUP BY lang""".stripMargin

  /** q77 — INCREMENTAL label assignment, the stage that closes the
    * continuous-ingest loop q69 opens: q69 detects that an arriving
    * document collides with the corpus band index; q77 decides what
    * label it gets — WITHOUT re-clustering the corpus. Each arriving
    * doc (the `doc_id % 10 = 0` ingest slice, q69's convention)
    * probes the MATERIALIZED capped band index, its candidates are
    * verified with exact shingle Jaccard (cost ∝ candidates, never
    * corpus²), and a verified ≥ [[JaccardThreshold]] match attaches
    * the doc to the matched corpus doc's cluster canonical (an
    * unclustered corpus partner is its own canonical). No match →
    * the doc founds its own cluster (canonical = itself).
    *
    * Two honest semantic bounds of incremental assignment, both
    * standard: (1) a new doc bridging TWO corpus clusters attaches to
    * the min canonical and does NOT merge them — merges happen at the
    * next full re-cluster (q48); (2) arriving docs are labeled
    * against the corpus only, not against each other — two near-dup
    * docs in the same arriving batch that match no corpus doc each
    * found their own cluster until the batch is folded in.
    *
    * Scale shape: the corpus-side labels here are computed inline by
    * [[clustersOf]] over the corpus slice (this query IS the
    * correctness contract for them); a deployment reads them from the
    * maintained label artifact
    * ([[graft.ops.LayoutOps.ensureClusterLabelLayout]]) so the
    * per-batch cost is probe + candidate-proportional verify + a
    * broadcast label join — no corpus-sized work per batch. */
  def incrementalLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val corpus = docs.where($"doc_id" % 10 =!= 0)
    val fresh = docs.where($"doc_id" % 10 === 0)
    // ONE kernel pass over the arriving slice serves both its band
    // keys and its verification sets (the q21 cache-scoping
    // convention: cache, consume, checkpoint the small result,
    // free). No pre-materializing count() is needed: the eager cand
    // checkpoint below is the first action and populates the cache
    // before any concurrent consumer exists.
    val freshSig = sigStruct(fresh).cache()
    // candidate (new, corpus) pairs from the materialized capped
    // index; checkpointed because both the corpus semi-join and the
    // verification read it
    val cand = LayoutOps
      .bandIndexProbe(s, dir, bandsOfSig(freshSig))
      .select($"doc_new", $"doc_corpus").distinct()
      .localCheckpoint(true)
    // corpus-side kernel work is CANDIDATE-proportional: only the
    // matched corpus docs (left-semi against the candidate id set)
    // compute signatures — never the whole corpus. The id set is
    // checkpointed so the gated-broadcast count reads the
    // materialization, not a re-run of the distinct.
    val candCorpusIds = cand.select($"doc_corpus".as("doc_id"))
      .distinct().localCheckpoint(true)
    val matchedCorpus = corpus.join(
      Hints.broadcastIfSmall(candCorpusIds), Seq("doc_id"), "left_semi")
    // exact-Jaccard verification of the candidate set only
    val verified = cand
      .join(freshSig.select($"doc_id".as("doc_new"),
        $"sg.ss".as("ssn")), "doc_new")
      .join(sigStruct(matchedCorpus).select($"doc_id".as("doc_corpus"),
        $"sg.ss".as("ssc")), "doc_corpus")
      .withColumn("n_inter",
        size(array_intersect($"ssn", $"ssc")).cast("long"))
      .where($"n_inter" > 0)
      .withColumn("jaccard",
        $"n_inter".cast("double") /
          (size($"ssn") + size($"ssc") - $"n_inter").cast("double"))
      .where($"jaccard" >= JaccardThreshold)
      .select($"doc_new", $"doc_corpus")
    // corpus cluster canonicals (labels cover only clustered docs;
    // an unclustered match is its own canonical)
    // label frame is checkpoint-backed (propagateMin's output), so
    // the gated-broadcast count is a narrow cached scan; attached is
    // checkpointed for the same reason (it would otherwise re-run the
    // verification join once for the count and once for the use)
    val labels = clustersOf(corpus)
      .select($"doc_id".as("doc_corpus"), $"canonical_id")
    val attached = verified
      .join(Hints.broadcastIfSmall(labels), Seq("doc_corpus"), "left")
      .withColumn("canon", coalesce($"canonical_id", $"doc_corpus"))
      .groupBy($"doc_new")
      .agg(min($"canon").as("existing_canonical"))
      .localCheckpoint(true)
    val out = fresh.select($"doc_id")
      .join(Hints.broadcastIfSmall(
        attached.select($"doc_new".as("doc_id"), $"existing_canonical")),
        Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"existing_canonical", $"doc_id").as("canonical_id"),
        $"existing_canonical".isNotNull.as("attached"))
      .localCheckpoint(true)
    freshSig.unpersist()
    out
  }

  /** The corpus-slice band rows + corpus-side bucket cap as CTEs —
    * the SQL mirror of [[capBandBuckets]] applied to the ingest
    * split, shared by the q69 and q77 oracles. Requires `bands` in
    * scope ([[minhashBandCtes]]). */
  private[graft] def corpusBandCtesSql: String =
    s""", corpus AS (
       |  SELECT doc_id, band, key FROM bands WHERE doc_id % 10 <> 0
       |), keepc AS (
       |  SELECT band, key FROM corpus GROUP BY band, key
       |  HAVING count(*) <= $MaxBandBucket
       |)""".stripMargin

  /** The (new × corpus) capped band-candidate set as a CTE — the
    * SQL mirror of [[graft.ops.LayoutOps.bandIndexProbe]], shared by
    * the q69 (final select) and q77 (verification input) oracles. */
  private[graft] def candNcCteSql: String =
    """, cand_nc AS (
      |  SELECT DISTINCT s.doc_id AS doc_new, c.doc_id AS doc_corpus
      |  FROM bands s
      |  JOIN corpus c ON s.band = c.band AND s.key = c.key
      |  JOIN keepc k ON k.band = c.band AND k.key = c.key
      |  WHERE s.doc_id % 10 = 0
      |)""".stripMargin

  /** Exact-Jaccard ≥ [[JaccardThreshold]] verification of a
    * candidate CTE, emitted as a CTE — ONE definition of the
    * shingle-join verification tail (q77 instantiates it for both
    * its candidate sets). Requires `sh` and `sizes` in scope. */
  private def jaccardVerifyCteSql(candCte: String, aCol: String,
      bCol: String, outCte: String): String =
    s""", $outCte AS (
       |  SELECT i.$aCol, i.$bCol
       |  FROM (
       |    SELECT c.$aCol, c.$bCol, count(*) AS n_inter
       |    FROM $candCte c
       |    JOIN sh sa ON sa.doc_id = c.$aCol
       |    JOIN sh sb ON sb.doc_id = c.$bCol AND sb.shingle = sa.shingle
       |    GROUP BY c.$aCol, c.$bCol
       |  ) i
       |  JOIN sizes za ON za.doc_id = i.$aCol
       |  JOIN sizes zb ON zb.doc_id = i.$bCol
       |  WHERE CAST(i.n_inter AS DOUBLE)
       |      / CAST(za.n + zb.n - i.n_inter AS DOUBLE)
       |    >= $JaccardThreshold
       |)""".stripMargin

  val incrementalLabelsSql: String =
    minhashBandCtes + corpusBandCtesSql + candNcCteSql +
      ", sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)" +
      jaccardVerifyCteSql("cand_nc", "doc_new", "doc_corpus", "matches") +
      s""", cand_cc AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM corpus a
        |  JOIN corpus b ON a.band = b.band AND a.key = b.key
        |    AND a.doc_id < b.doc_id
        |  JOIN keepc k ON k.band = a.band AND k.key = a.key
        |)""".stripMargin +
      jaccardVerifyCteSql("cand_cc", "doc_a", "doc_b", "pairs_cc") +
      s""", edges AS (
        |  SELECT doc_a, doc_b FROM pairs_cc
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pairs_cc
        |), reach(id, r) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM edges
        |  UNION
        |  SELECT reach.id, e.doc_b FROM reach JOIN edges e ON e.doc_a = reach.r
        |), labels AS (
        |  SELECT id AS doc_corpus, MIN(r) AS canonical_id
        |  FROM reach GROUP BY id
        |), attached AS (
        |  SELECT m.doc_new,
        |    MIN(COALESCE(l.canonical_id, m.doc_corpus)) AS existing_canonical
        |  FROM matches m LEFT JOIN labels l USING (doc_corpus)
        |  GROUP BY m.doc_new
        |)
        |SELECT d.doc_id,
        |  COALESCE(a.existing_canonical, d.doc_id) AS canonical_id,
        |  a.existing_canonical IS NOT NULL AS attached
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
        |LEFT JOIN attached a ON a.doc_new = d.doc_id""".stripMargin

  private val simhashBits = 16

  /** q22 — SimHash fingerprinting: 16-bit signature from
    * count-weighted word hashes (bit j set iff the weighted sum of
    * md5-hex-digit-j "high" bits is non-negative), plus the bucket
    * size — hamming-0 near-dup grouping. One wordcount shuffle + one
    * 16-column conditional aggregation. */
  /** (doc_id, simhash) signatures — shared by q22 (bucket sizes) and
    * q52 (hamming≤k pair search). */
  private def simhashSig(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("word"))
      .where($"word" =!= "")
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5($"word"))
    val bitCols: Seq[Column] = (1 to simhashBits).map { j =>
      when(sum(when(instr(lit("89abcdef"), substring($"h", j, 1)) > 0, $"cnt")
        .otherwise(-$"cnt")) >= 0, 1L).otherwise(0L).as(s"b$j")
    }
    val bits = words.groupBy($"doc_id").agg(bitCols.head, bitCols.tail: _*)
    val simhashCol = (1 to simhashBits)
      .map(j => col(s"b$j") * (1L << (simhashBits - j)))
      .reduce(_ + _)
    bits.withColumn("simhash", simhashCol).select($"doc_id", $"simhash")
  }

  def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"simhash")
    simhashSig(s, dir)
      .withColumn("bucket_size", count(lit(1)).over(w))
      .select($"doc_id", $"simhash", $"bucket_size")
  }

  val simhashSql: String = {
    val bitDefs = (1 to simhashBits).map { j =>
      s"""CASE WHEN SUM(CASE WHEN instr('89abcdef', substr(h, $j, 1)) > 0
         |  THEN cnt ELSE -cnt END) >= 0 THEN 1 ELSE 0 END AS b$j"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    val shVal = (1 to simhashBits)
      .map(j => s"b$j * ${1L << (simhashBits - j)}").mkString(" + ")
    s"""WITH w AS (
       |  SELECT doc_id, word, count(*) AS cnt
       |  FROM (SELECT doc_id,
       |          unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
       |        FROM documents)
       |  WHERE word <> '' GROUP BY doc_id, word
       |), d AS (SELECT doc_id, cnt, md5(word) AS h FROM w),
       |bits AS (SELECT doc_id, $bitDefs FROM d GROUP BY doc_id)
       |SELECT doc_id, CAST($shVal AS BIGINT) AS simhash,
       |       COUNT(*) OVER (PARTITION BY $shVal) AS bucket_size
       |FROM bits""".stripMargin
  }

  private val simhashBands = 4 // 4 bands × 4 bits over the 16-bit sig

  /** The band-join hamming≤2 pair search both signature widths share:
    * explode (band, band-value), equi-join, exact `bit_count(xor)`
    * filter BEFORE the pair-dedup exchange (far pairs — the bulk of
    * candidates — never ride the shuffle), then distinct (a pair may
    * share several intact bands). One parameterization, two widths —
    * a fix here fixes q52 and q54 together. */
  private def bandedHammingPairs(sig: DataFrame, sigCol: String,
      bandBits: Int): DataFrame = {
    val mask = (1 << bandBits) - 1
    val bandStructs = (0 until simhashBands).map { i =>
      struct(lit(i).as("band"),
        shiftright(col(sigCol), i * bandBits).bitwiseAND(mask).as("bval"))
    }
    val bands = sig.select(col("doc_id"), col(sigCol),
      explode(array(bandStructs: _*)).as("bv"))
      .select(col("doc_id"), col(sigCol), col("bv.band"), col("bv.bval"))
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bval") === col("b.bval") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col(s"a.$sigCol").as("sh_a"),
        col("b.doc_id").as("doc_b"), col(s"b.$sigCol").as("sh_b"))
      .withColumn("hamming",
        expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)"))
      .where(col("hamming") <= 2)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }

  /** q52 — SimHash hamming≤2 near-dup pairs, found WITHOUT an
    * all-pairs scan: the 16-bit signature is banded into 4 chunks of
    * 4 bits and candidates are generated by a per-band equi-join —
    * the standard LSH pigeonhole: 2 differing bits can dirty at most
    * 2 of 4 bands, so every hamming≤2 pair shares at least one intact
    * band and is guaranteed to surface (exact recall, k < bands).
    * Candidates are deduped, then filtered by the exact distance
    * `bit_count(xor(sig_a, sig_b))`.
    *
    * Scale note: band selectivity tracks signature width. A 4-bit
    * band has 16 values, fine at test scale but a 100 TB corpus needs
    * a 64-bit signature with 4×16-bit bands (65 536 values each) so
    * band buckets stay bounded — same plan, wider `simhashBits`. The
    * md5-hex trick caps this build at 16 bits ⇒ documented limit. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    bandedHammingPairs(simhashSig(s, dir), "simhash", bandBits = 4)

  /** Shared DuckDB tail of the banded pair search (the SQL twin of
    * [[bandedHammingPairs]]) — `sigCtes` must define a CTE `sig`
    * with (doc_id, `sigCol`). */
  private def bandedPairsSqlTail(sigCtes: String, sigCol: String,
      bandBits: Int): String = {
    val mask = (1 << bandBits) - 1
    s"""$sigCtes,
       |bands AS (
       |  SELECT doc_id, $sigCol, t.i AS band,
       |         ($sigCol >> (t.i * $bandBits)) & $mask AS bval
       |  FROM sig, range(0, $simhashBands) t(i)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, a.$sigCol AS sh_a,
       |         b.doc_id AS doc_b, b.$sigCol AS sh_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |       CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 2""".stripMargin
  }

  private val wordcountCtes =
    """WITH w AS (
      |  SELECT doc_id, word, count(*) AS cnt
      |  FROM (SELECT doc_id,
      |          unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
      |        FROM documents)
      |  WHERE word <> '' GROUP BY doc_id, word
      |), d AS (SELECT doc_id, cnt, md5(word) AS h FROM w)""".stripMargin

  val simhashPairsSql: String = {
    val bitDefs = (1 to simhashBits).map { j =>
      s"""CASE WHEN SUM(CASE WHEN instr('89abcdef', substr(h, $j, 1)) > 0
         |  THEN cnt ELSE -cnt END) >= 0 THEN 1 ELSE 0 END AS b$j"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    val shVal = (1 to simhashBits)
      .map(j => s"b$j * ${1L << (simhashBits - j)}").mkString(" + ")
    bandedPairsSqlTail(
      s"""$wordcountCtes,
         |bits AS (SELECT doc_id, $bitDefs FROM d GROUP BY doc_id),
         |sig AS (SELECT doc_id, CAST($shVal AS BIGINT) AS simhash
         |        FROM bits)""".stripMargin,
      "simhash", bandBits = 4)
  }

  private val simhash64Bits = 60     // 15 md5 hex digits × 4 bits —
  private val simhash64Digits = 15   // stays in positive BIGINT range
  private val simhash64BandBits = 15 // 4 bands × 15 bits (32 768 values)

  /** (doc_id, simhash64) — the WIDE signature [[simhashPairs]]'s
    * scaladoc promises for corpus scale: 60 bits derived from the
    * first 15 md5 hex digits (each digit contributes its 4 bits via
    * the count-weighted sum, same construction as the 16-bit
    * signature's high-bit rule, generalized to every bit). */
  private[graft] def simhash64Sig(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("word"))
      .where($"word" =!= "")
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5($"word"))
    // per-word hex-digit values once (narrow), then one 60-sum agg pass
    val withVals = words.select(($"doc_id" +: $"cnt" +:
      (1 to simhash64Digits).map(d =>
        expr(s"instr('0123456789abcdef', substring(h, $d, 1)) - 1")
          .as(s"v$d"))): _*)
    val bitCols: Seq[Column] = (0 until simhash64Bits).map { j =>
      val d = j / 4 + 1; val k = j % 4
      when(sum(when(expr(s"(v$d >> $k) & 1") === 1, $"cnt")
        .otherwise(-$"cnt")) >= 0, 1L).otherwise(0L).as(s"b$j")
    }
    val bits = withVals.groupBy($"doc_id").agg(bitCols.head, bitCols.tail: _*)
    val sigCol = (0 until simhash64Bits)
      .map(j => col(s"b$j") * (1L << (simhash64Bits - 1 - j)))
      .reduce(_ + _)
    bits.select($"doc_id", sigCol.as("simhash64"))
  }

  /** q54 — [[simhashPairs]] at the signature width a 100 TB corpus
    * needs: 60-bit signature, 4 bands × 15 bits ⇒ 32 768 values per
    * band, so band buckets stay tiny and the candidate join never
    * degenerates into the near-all-pairs behavior the 16-bit q52
    * exhibits on a clustered corpus (1.5 M pairs at sf0.1). Same
    * pigeonhole exactness: ≤ 2 dirty bits cannot cover 4 bands. */
  def simhash64Pairs(s: SparkSession, dir: String): DataFrame =
    bandedHammingPairs(simhash64Sig(s, dir), "simhash64",
      bandBits = simhash64BandBits)

  val simhash64PairsSql: String = {
    val vDefs = (1 to simhash64Digits).map(d =>
      s"strpos('0123456789abcdef', substr(h, $d, 1)) - 1 AS v$d")
      .mkString(", ")
    val bitDefs = (0 until simhash64Bits).map { j =>
      val d = j / 4 + 1; val k = j % 4
      s"""CASE WHEN SUM(CASE WHEN (v$d >> $k) & 1 = 1
         |  THEN cnt ELSE -cnt END) >= 0 THEN 1 ELSE 0 END AS b$j"""
        .stripMargin.replaceAll("\n", " ")
    }.mkString(", ")
    val sigVal = (0 until simhash64Bits)
      .map(j => s"b$j * ${1L << (simhash64Bits - 1 - j)}").mkString(" + ")
    bandedPairsSqlTail(
      s"""$wordcountCtes,
         |v AS (SELECT doc_id, cnt, $vDefs FROM d),
         |bits AS (SELECT doc_id, $bitDefs FROM v GROUP BY doc_id),
         |sig AS (SELECT doc_id, CAST($sigVal AS BIGINT) AS simhash64
         |        FROM bits)""".stripMargin,
      "simhash64", bandBits = simhash64BandBits)
  }

  /** q23 — word-bigram Jaccard near-dup, blocked by (lang, source) —
    * the blocking keys bound the pair space so the gram equi-join
    * never goes quadratic in the corpus (SURVEY.md §7.1.8 design).
    *
    * The distinct bigram set per document comes from the native
    * [[graft.functions.BigramSet]] kernel (one loop per doc — no
    * corpus-wide distinct shuffle, no interpreted HOF chain), and the
    * set size rides through the blocked equi-join as a grouping
    * column, so the query is one equi-join + one aggregation. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Functions.register(s)
    val bg = Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"source",
        expr("bigram_set(text)").as("bgs"))
      .select($"doc_id", $"lang", $"source",
        size($"bgs").cast("long").as("n"), explode($"bgs").as("bigram"))
      .cache()
    // single-scan materialization: the self-join reads bg twice; a
    // cold cache would run the kernel once per side
    bg.count()
    val a = bg.as("a"); val b = bg.as("b")
    val pairs = a.join(b,
        $"a.lang" === $"b.lang" && $"a.source" === $"b.source" &&
          $"a.bigram" === $"b.bigram" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.n".as("n_a"), $"b.n".as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .select($"doc_a", $"doc_b",
        ($"n_inter".cast("double") /
          ($"n_a" + $"n_b" - $"n_inter").cast("double")).as("jaccard"))
      .where($"jaccard" >= 0.05)
    // scope the exploded-bigram cache to this call (the q21
    // convention): materialize the small pair set, free the per-
    // bigram frame — it is larger than the output and would
    // otherwise outlive the query
    val out = pairs.localCheckpoint(true)
    bg.unpersist()
    out
  }

  /** q71 — LINE-level exact dedup (the C4/RefinedWeb pipeline stage:
    * duplicated boilerplate lines are removed corpus-WIDE, keeping one
    * canonical occurrence), the D1 first-seen semantics
    * (02_filter_by_CIN.py:252-268) applied at sub-document
    * granularity. The synthetic corpus carries no newlines, so the
    * registered query reflows each document into fixed
    * [[LineTokens]]-token lines first (the same trim+`' +'`-split
    * token convention as q28/q65/q67); on real data the reflow step
    * is replaced by `split(text, '\n')` and everything downstream is
    * unchanged. Survivorship is deterministic: first occurrence in
    * (md5(doc_id), line_no) order — a content-derived total order
    * with no timestamp or partition dependence, the q65/q68
    * convention. Output is the per-document audit a pipeline
    * operator wants: line count, surviving-line count, keep ratio.
    *
    * Scale shape: the window shuffle carries (doc_id, line_no,
    * line_hash) — the line TEXT is dropped before the exchange, so
    * at 100 TB the shuffle moves ~48 bytes per line, not documents;
    * the per-doc rollup then combines map-side. One wide exchange on
    * line_hash, one narrow on doc_id — never all-pairs, and a
    * pathological boilerplate line (billions of copies of "click
    * here") is one hot window partition, bounded by the same salting
    * escape hatch as q49 if it ever dominates. */
  val LineTokens = 10
  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"line_hash")
      .orderBy(md5($"doc_id".cast("string")), $"ln")
    Tables.documents(s, dir)
      .withColumn("toks", split(trim($"text"), " +"))
      .select($"doc_id", $"toks", explode(expr(
        s"sequence(1, CAST(ceil(size(toks) / ${LineTokens}.0) AS INT))"))
        .as("ln"))
      .select($"doc_id", $"ln",
        md5(expr(
          s"array_join(slice(toks, (ln - 1) * $LineTokens + 1, $LineTokens), ' ')"))
          .as("line_hash"))
      .withColumn("rn", row_number().over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_kept"))
      .withColumn("keep_ratio",
        $"n_kept".cast("double") / $"n_lines".cast("double"))
  }

  val lineDedupSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), ' +') AS t
       |  FROM documents),
       |lines AS (
       |  SELECT doc_id, ln,
       |    md5(array_to_string(
       |      t[(ln - 1) * $LineTokens + 1 : (ln - 1) * $LineTokens + $LineTokens],
       |      ' ')) AS line_hash
       |  FROM toks,
       |    unnest(generate_series(
       |      1, CAST(ceil(len(t) / ${LineTokens}.0) AS BIGINT))) AS u(ln)),
       |ranked AS (
       |  SELECT doc_id, line_hash,
       |    ROW_NUMBER() OVER (PARTITION BY line_hash
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), ln) AS rn
       |  FROM lines)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS keep_ratio
       |FROM ranked GROUP BY doc_id""".stripMargin

  val ngramJaccardSql: String =
    """WITH bg AS (
      |  SELECT DISTINCT doc_id, lang, source, bigram
      |  FROM (
      |    SELECT doc_id, lang, source,
      |      unnest(list_transform(range(1, len(ws)),
      |        i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |    FROM (SELECT doc_id, lang, source,
      |            list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |              w -> w <> '') AS ws
      |          FROM documents)
      |    WHERE len(ws) >= 2)
      |), sizes AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      |  FROM bg a JOIN bg b
      |    ON a.lang = b.lang AND a.source = b.source
      |   AND a.bigram = b.bigram AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT i.doc_a, i.doc_b,
      |    CAST(n_inter AS DOUBLE) / CAST(na.n + nb.n - n_inter AS DOUBLE)
      |      AS jaccard
      |  FROM inter i
      |  JOIN sizes na ON na.doc_id = i.doc_a
      |  JOIN sizes nb ON nb.doc_id = i.doc_b
      |) WHERE jaccard >= 0.05""".stripMargin

  /** Containment threshold for q92 — |A∩B| / min(|A|,|B|) at or above
    * this marks the smaller document as (mostly) contained in the
    * larger one. */
  val ContainmentThreshold = 0.25

  /** q92 — asymmetric CONTAINMENT near-dup (Broder's containment
    * coefficient `|A∩B| / min(|A|,|B|)`): catches quotation and
    * subset-duplication that symmetric Jaccard misses — a short doc
    * fully embedded in a long one has tiny Jaccard (union is the long
    * doc) but containment ≈ 1. The standard companion to q23 in a
    * training-data dedup stage (RefinedWeb/CCNet run both).
    *
    * Same scale shape as q23: (lang, source) blocking bounds the pair
    * space, the distinct-bigram sets come from the native
    * [[graft.functions.BigramSet]] kernel (one per-doc pass, no
    * corpus-wide distinct shuffle), set sizes ride the equi-join as
    * grouping columns — one blocked equi-join + one aggregation, never
    * all-pairs. The one float is a single division of exact integers.
    */
  def bigramContainment(s: SparkSession, dir: String): DataFrame = {
    val (pairs, bg) = bigramContainmentFrames(s, dir)
    val out = pairs.localCheckpoint(true)
    bg.unpersist()
    out
  }

  /** (pairs, cached bigram frame) pre-materialization — PlanSpec
    * asserts on the pair plan; [[bigramContainment]] owns the cache
    * scope. */
  private[graft] def bigramContainmentFrames(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    graft.functions.Functions.register(s)
    val bg = Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"source",
        expr("bigram_set(text)").as("bgs"))
      .select($"doc_id", $"lang", $"source",
        size($"bgs").cast("long").as("n"), explode($"bgs").as("bigram"))
      .cache()
    // single-scan materialization: the self-join reads bg twice; a
    // cold cache would run the kernel once per side
    bg.count()
    val a = bg.as("a"); val b = bg.as("b")
    val pairs = a.join(b,
        $"a.lang" === $"b.lang" && $"a.source" === $"b.source" &&
          $"a.bigram" === $"b.bigram" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.n".as("n_a"), $"b.n".as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .select($"doc_a", $"doc_b", $"n_inter",
        ($"n_inter".cast("double") /
          least($"n_a", $"n_b").cast("double")).as("containment"))
      .where($"containment" >= ContainmentThreshold)
    (pairs, bg)
  }

  val bigramContainmentSql: String =
    s"""WITH bg AS (
       |  SELECT DISTINCT doc_id, lang, source, bigram
       |  FROM (
       |    SELECT doc_id, lang, source,
       |      unnest(list_transform(range(1, len(ws)),
       |        i -> ws[i] || ' ' || ws[i+1])) AS bigram
       |    FROM (SELECT doc_id, lang, source,
       |            list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |              w -> w <> '') AS ws
       |          FROM documents)
       |    WHERE len(ws) >= 2)
       |), sizes AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         CAST(count(*) AS BIGINT) AS n_inter
       |  FROM bg a JOIN bg b
       |    ON a.lang = b.lang AND a.source = b.source
       |   AND a.bigram = b.bigram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, n_inter, containment FROM (
       |  SELECT i.doc_a, i.doc_b, i.n_inter,
       |    CAST(n_inter AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE)
       |      AS containment
       |  FROM inter i
       |  JOIN sizes na ON na.doc_id = i.doc_a
       |  JOIN sizes nb ON nb.doc_id = i.doc_b
       |) WHERE containment >= $ContainmentThreshold""".stripMargin

  /** q93 — MinHash sketch-quality audit: for every banded-candidate
    * pair, the signature-agreement ESTIMATE of Jaccard
    * (`#{p : mₚᴬ = mₚᴮ} / 8` — the unbiased MinHash estimator) next
    * to the EXACT shingle Jaccard, with the signed estimation error.
    * This is the calibration report a production dedup pipeline ships
    * alongside its sketch parameters: it answers "are 8 permutations
    * enough at our threshold?" from the live corpus instead of from
    * theory, and regressions in it catch a broken permutation family
    * (e.g. correlated slices) that the pair pipeline itself cannot
    * see.
    *
    * Reuses the ONE banding definition ([[sigStruct]] / [[bandKeys]] /
    * [[capBandBuckets]]), so the audited candidates are exactly the
    * q21 candidates. Scale shape identical to q21 — per-doc kernels,
    * capped band buckets, candidate-proportional verification. The
    * floats are `n_eq/8` (exact by construction: n_eq ∈ 0..8) and one
    * division + one subtraction of identical operands in both
    * engines.
    */
  def minhashEstError(s: SparkSession, dir: String): DataFrame = {
    val (audit, sig) = minhashEstErrorFrames(s, dir)
    val checked = audit.localCheckpoint(true)
    sig.unpersist()
    checked
  }

  /** (audit, cached signature frame) pre-materialization — PlanSpec
    * asserts on the audit plan; [[minhashEstError]] owns the cache
    * scope. */
  private[graft] def minhashEstErrorFrames(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val minCols = (0 until nPerms).map(p =>
      $"sg.mins".getItem(p).as(s"m$p"))
    val sig = sigStruct(Tables.documents(s, dir))
      .select(($"doc_id" +: $"sg.ss".as("ss") +: minCols): _*)
      .cache()
    // single-scan materialization (q21 convention): bands + both
    // sides of the verify join re-scan sig
    sig.count()
    val bands = bandKeys(p => col(s"m$p")).map { case (b, k) =>
      sig.select($"doc_id", lit(b).as("band"), k.as("key"))
    }.reduce(_ union _)
    val bounded = capBandBuckets(bands, Seq("band", "key"))
    val cand = bounded.as("a").join(bounded.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    def side(tag: String, idCol: String) = sig.select(
      ($"doc_id".as(idCol) +: $"ss".as(s"ss_$tag") +:
        (0 until nPerms).map(p => col(s"m$p").as(s"${tag}_m$p"))): _*)
    val nEq = (0 until nPerms).map(p =>
      when(col(s"a_m$p") === col(s"b_m$p"), 1L).otherwise(0L))
      .reduce(_ + _)
    val out = cand
      .join(side("a", "doc_a"), "doc_a")
      .join(side("b", "doc_b"), "doc_b")
      .withColumn("n_inter",
        size(array_intersect($"ss_a", $"ss_b")).cast("long"))
      .where($"n_inter" > 0)
      .withColumn("jaccard", $"n_inter".cast("double") /
        (size($"ss_a") + size($"ss_b") - $"n_inter").cast("double"))
      .withColumn("est", nEq.cast("double") / lit(nPerms.toDouble))
      .select($"doc_a", $"doc_b", $"jaccard", $"est",
        ($"est" - $"jaccard").as("err"))
    (out, sig)
  }

  val minhashEstErrorSql: String = {
    val nEq = (0 until nPerms).map(p =>
      s"CASE WHEN sa.m$p = sb.m$p THEN 1 ELSE 0 END").mkString(" + ")
    minhashCtes + s""", est AS (
       |  SELECT p.doc_a, p.doc_b, p.jaccard,
       |    CAST($nEq AS DOUBLE) / $nPerms.0 AS est
       |  FROM pairs p
       |  JOIN sig sa ON sa.doc_id = p.doc_a
       |  JOIN sig sb ON sb.doc_id = p.doc_b)
       |SELECT doc_a, doc_b, jaccard, est, est - jaccard AS err
       |FROM est""".stripMargin
  }
}

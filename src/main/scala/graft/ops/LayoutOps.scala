package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
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

  /** Fingerprint of the SOURCE parquet files a layout was built from:
    * (name, length, mtime) of every data file plus a layout-version
    * tag. A layout dir carrying a matching `_graft_fingerprint` marker
    * is up to date and its one-time write is skipped — the measured
    * query is then the pruned/co-located READ the layout exists for,
    * exactly as a real deployment that pays the write once. Files
    * starting with `_` are invisible to Spark's file index, so the
    * marker never pollutes the table itself.
    *
    * Staleness contract (make-style, documented limitation): the
    * fingerprint is metadata-only. A source file regenerated with
    * IDENTICAL byte length within the filesystem's mtime granularity
    * (1 s on many local filesystems, coarser on some object stores)
    * matches the marker and the stale layout is reused. That window
    * is acceptable here because testdata regeneration rewrites whole
    * parquet directories (part-file names embed fresh UUIDs, so the
    * `name` component changes); a deployment needing content-level
    * certainty should add a footer checksum to the tag or simply
    * delete the layout dir to force a rebuild. */
  private def sourceFingerprint(s: SparkSession, dir: String,
      tables: Seq[String], tag: String): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val parts = tables.flatMap { t =>
      val p = new Path(s"$dir/$t.parquet")
      val fs = p.getFileSystem(conf)
      val sts =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
            .sortBy(_.getPath.getName)
        else Array(fs.getFileStatus(p))
      sts.map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
    }
    (tag +: parts).mkString("|")
  }

  private def readMarker(fs: FileSystem, marker: Path): Option[String] =
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

  private def writeMarker(fs: FileSystem, marker: Path,
      value: String): Unit = {
    val out = fs.create(marker, true)
    try out.write(value.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Build (or reuse) the month-partitioned orders layout; returns its
    * path. The write runs only when the source fingerprint changed —
    * Bench warmup calls this so the measured q36 is the pruned read. */
  def ensureMonthLayout(s: SparkSession, dir: String): String = {
    val path = new Path(
      s.sessionState.conf.warehousePath, "graft_orders_by_month")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    // the session timezone is PART of the layout's identity: month
    // partition values come from date_format in the session zone, so
    // a layout built under one zone must not be silently reused by a
    // session in another (shifted boundary rows would diverge from
    // the UTC oracle with no rebuild ever triggered)
    val fp = sourceFingerprint(s, dir, Seq("orders"),
      s"month-layout-v1|tz=${s.sessionState.conf.sessionLocalTimeZone}")
    val marker = new Path(path, "_graft_fingerprint")
    if (!readMarker(fs, marker).contains(fp)) {
      writeDatePartitioned(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        "o_orderdate", path.toString)
      writeMarker(fs, marker, fp)
    }
    path.toString
  }

  /** q36 — the date layout end-to-end as a driver-checkable query:
    * orders written `month=`-partitioned (once per source fingerprint;
    * see [[ensureMonthLayout]]), then scanned with a month filter that
    * planning-time partition pruning resolves to exactly two
    * directories (PartitionFilters asserted in LayoutSpec). The oracle
    * computes the same counts from the UNPARTITIONED table — proving
    * the layout round-trip loses nothing. At 100 TB the pruned scan
    * reads ~2/80ths of the table; the unpartitioned one reads it all. */
  def prunedMonthlyOrderCounts(s: SparkSession, dir: String): DataFrame =
    prunedMonthlyCounts(s, ensureMonthLayout(s, dir), PrunedMonths)

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
    *
    * LIMITATION of the content-hash salt: rows that are EXACT full
    * duplicates of each other hash to the same salt bucket, so a hot
    * key whose skew comes from duplicated rows is not spread at all.
    * When rows can be full duplicates, include a unique id column in
    * `df` (it participates in the hash) — that is what SkewOps does
    * with o_orderkey. The alternative (rand()-based salt) was
    * rejected: Catalyst marks it nondeterministic, and a shuffle
    * retry could re-salt rows into different buckets mid-aggregation.
    */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int): DataFrame =
    // deterministic content-hash salt, the SkewOps convention — the
    // previous spark_partition_id + monotonically_increasing_id salt
    // was Catalyst-nondeterministic (shuffle retries could re-salt)
    df.withColumn("_salt",
        pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("partial")).as("n"))

  /** Bucket count of the REGISTERED q53 query — Bench warmup must
    * build the very same layout (a different count changes the
    * fingerprint tag and the measured query would silently re-pay the
    * write), so both call sites share this constant. */
  val DefaultBuckets = 8

  /** Build (or reuse) the two bucketed tables [[bucketedJoin]] joins.
    * Reuse has two tiers: same-session (catalog entry + matching
    * fingerprint → no work), and cross-session (the in-memory catalog
    * is empty but the bucketed files + marker survive on disk → the
    * location is re-registered as an external `CLUSTERED BY` table, no
    * rewrite). Only a fingerprint miss pays the write. */
  def ensureBucketedTables(s: SparkSession, dir: String,
      buckets: Int = DefaultBuckets): Unit = {
    val fp = sourceFingerprint(s, dir, Seq("lineitem", "orders"),
      s"bucketed-v1-b$buckets")
    val specs = Seq(
      ("graft_li_bucketed",
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity")),
        "l_orderkey"),
      ("graft_o_bucketed",
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        "o_orderkey"))
    specs.foreach { case (t, df, key) =>
      ensureBucketedTable(s, t, df, key, buckets, fp)
    }
  }

  /** The generic write-once bucketed-table tier shared by
    * [[ensureBucketedTables]] (q53) and [[ensureBandIndexLayout]]
    * (q69): same-session reuse (catalog entry + matching fingerprint),
    * cross-session reuse (files + marker survive; re-register as an
    * external `CLUSTERED BY` table), and only a fingerprint miss pays
    * the write. */
  private def ensureBucketedTable(s: SparkSession, t: String,
      df: DataFrame, key: String, buckets: Int, fp: String): Unit = {
    val loc = new Path(s.sessionState.conf.warehousePath, t)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new Path(loc, "_graft_fingerprint")
    val fresh = readMarker(fs, marker).contains(fp)
    if (!(fresh && s.catalog.tableExists(t))) {
      if (fresh) {
        // files from a previous session; catalog lost (in-memory) —
        // point an external bucketed table at them
        s.sql(s"""CREATE TABLE $t (${df.schema.toDDL}) USING parquet
                 |CLUSTERED BY ($key) SORTED BY ($key)
                 |INTO $buckets BUCKETS
                 |LOCATION '$loc'""".stripMargin)
      } else {
        s.sql(s"DROP TABLE IF EXISTS $t")
        if (fs.exists(loc)) fs.delete(loc, true)
        // EXTERNAL (explicit path): the engine owns the files'
        // lifecycle through the fingerprint marker, so a catalog
        // drop must never take the one-time layout with it — that
        // is what makes the cross-session re-register tier above
        // possible (and testable) at all
        df.write.mode("overwrite")
          .bucketBy(buckets, key).sortBy(key)
          .option("path", loc.toString)
          .saveAsTable(t)
        writeMarker(fs, marker, fp)
      }
    }
  }

  /** Table name of the q69 corpus band index — shared between the
    * builder, the streaming probe, and Bench warmup (same reason as
    * [[DefaultBuckets]]: the measured query must probe the layout the
    * warmup built, never rebuild its own). */
  val BandIndexTable = "graft_band_index"

  /** (band, key) fused into the ONE equi-join column the bucketed
    * index lives on. Fusing matters for the plan, not the semantics:
    * joining on `key` with a `band = band` residual is rewritten by
    * Catalyst into a two-key equi-join, and Spark requires the join
    * keys to equal the bucket spec EXACTLY for a shuffle-free bucketed
    * scan (`requireAllClusterKeysForCoPartition`) — so band must be
    * inside the key, not beside it. `|` is unambiguous: band is a
    * digit and key is fixed-width hex. */
  private def fuseBandKey(banded: DataFrame): DataFrame =
    banded.select(col("doc_id"),
      concat_ws("|", col("band"), col("key")).as("bkey"))

  /** Build (or reuse) the corpus-side LSH band index as a MATERIALIZED
    * bucketed table — the batch-pipeline half of the q69 ingest gate.
    * One row per corpus document per band (`doc_id, bkey`), from the
    * single [[graft.ops.DedupOps.bandFrame]] banding definition,
    * bucketed+sorted by `bkey` so the streaming probe's equi-join
    * reads the index without a scan-side exchange (LayoutSpec pins
    * that). The corpus is the already-ingested slice
    * (`doc_id % 10 != 0`); the banding-scheme version lives in the
    * fingerprint tag — a change to [[graft.ops.DedupOps.bandFrame]]'s
    * layout must bump it or stale indexes would be probed with
    * mismatched keys.
    *
    * At 100 TB: the index is tiny relative to the text it summarizes
    * (two ~17-byte keys per document), rebuilt incrementally by the
    * batch pipeline as ingest batches land, and every streaming
    * micro-batch — and every later session — probes the same files
    * instead of re-hashing the corpus per trigger. */
  def ensureBandIndexLayout(s: SparkSession, dir: String,
      buckets: Int = DefaultBuckets): String = {
    val fp = sourceFingerprint(s, dir, Seq("documents"),
      s"band-index-v3-b$buckets-cap${graft.ops.DedupOps.MaxBandBucket}")
    def banded = fuseBandKey(graft.ops.DedupOps.bandFrame(
      Tables.documents(s, dir).where(col("doc_id") % 10 =!= 0)))
    // Cache the banded frame ONLY when a rebuild is actually due (the
    // cap aggregation and its restricting join each rescan it, and a
    // cold scan re-runs the minhash kernel over the whole corpus —
    // the dominant build cost). On the fresh-marker path the frame
    // stays lazy: at most its SCHEMA is consulted, so every q69 call
    // after the first pays zero kernel work.
    val loc = new Path(s.sessionState.conf.warehousePath, BandIndexTable)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stale =
      !readMarker(fs, new Path(loc, "_graft_fingerprint")).contains(fp)
    val cached = if (stale) Some(banded.cache()) else None
    cached.foreach(_.count()) // materialize once before the two scans
    // the q21/q48 frequency cap, applied at INDEX BUILD time: a band
    // key shared by more than MaxBandBucket corpus docs carries no
    // similarity signal and would emit bucket-size candidates per
    // arriving doc, every micro-batch, forever — drop it once here
    // instead. Mirrored in the q69 oracle; never binds at test SFs.
    val idx = graft.ops.DedupOps
      .capBandBuckets(cached.getOrElse(banded), Seq("bkey"))
      .select(col("doc_id"), col("bkey"))
    ensureBucketedTable(s, BandIndexTable, idx, "bkey", buckets, fp)
    cached.foreach(_.unpersist())
    BandIndexTable
  }

  /** Probe the materialized band index with an arbitrary banded frame
    * (batch or streaming): candidate (new, corpus) pairs whose band
    * AND key agree — via equality of the fused `bkey`, which is
    * exactly the index's bucket spec, so the index scan plans
    * shuffle-free. */
  def bandIndexProbe(s: SparkSession, dir: String,
      probe: DataFrame): DataFrame = {
    val corpus = s.table(ensureBandIndexLayout(s, dir))
    fuseBandKey(probe).as("n")
      .join(corpus.as("c"), col("n.bkey") === col("c.bkey"))
      .select(col("n.doc_id").as("doc_new"),
        col("c.doc_id").as("doc_corpus"))
  }

  /** Directory name of the materialized near-dup cluster labels —
    * shared by the builder, q75, and Bench warmup (same contract as
    * [[BandIndexTable]]: consumers must read the artifact the warmup
    * built, never rebuild their own). */
  val ClusterLabelDir = "graft_cluster_labels"

  /** Build (or reuse) the near-dup cluster labels (q48's output:
    * `doc_id, canonical_id, is_canonical`) as a write-once parquet
    * artifact; returns its path. Production shape: clustering runs
    * ONCE per corpus snapshot (the full MinHash → LSH → verified-
    * Jaccard → label-propagation chain, which q48 measures), and
    * every downstream consumer — survivor selection (q75), reshard,
    * audit — READS the labels instead of re-running the chain per
    * stage. At 100 TB the artifact is two longs + a boolean per
    * CLUSTERED doc (only docs with a ≥ threshold partner appear),
    * orders of magnitude smaller than the text it labels.
    *
    * The fingerprint ties the artifact to the source corpus AND the
    * dedup parameters (band-bucket cap, Jaccard threshold) — a
    * parameter change must rebuild, or consumers would silently read
    * labels computed under different semantics. */
  def ensureClusterLabelLayout(s: SparkSession, dir: String): String = {
    val path = new Path(
      s.sessionState.conf.warehousePath, ClusterLabelDir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val fp = sourceFingerprint(s, dir, Seq("documents"),
      s"cluster-labels-v1-cap${DedupOps.MaxBandBucket}" +
        s"-j${DedupOps.JaccardThreshold}")
    val marker = new Path(path, "_graft_fingerprint")
    if (!readMarker(fs, marker).contains(fp)) {
      // overwrite clears the dir (stale marker included); the fresh
      // marker lands only after the write commits
      DedupOps.dedupClusters(s, dir)
        .write.mode("overwrite").parquet(path.toString)
      writeMarker(fs, marker, fp)
    }
    path.toString
  }

  /** Bucketed co-located join: write both sides bucketed+sorted on the
    * join key (`bucketBy` + `saveAsTable`), then join — Spark reads
    * bucket metadata and skips BOTH shuffle exchanges. At 100 TB this
    * is the difference between re-shuffling the fact table on every
    * join and a one-time layout cost (SURVEY.md §4 "bucketed by
    * contract id"). Returns the joined aggregate; LayoutSpec asserts
    * the plan has no Exchange over the scans.
    */
  def bucketedJoin(s: SparkSession, dir: String, buckets: Int): DataFrame = {
    // layout cost is proportional to what you bucket: the one-time
    // bucketed write projects to the join/agg columns, and runs only
    // when the source fingerprint changed (see ensureBucketedTables)
    ensureBucketedTables(s, dir, buckets)
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
    bucketedJoin(s, dir, DefaultBuckets)
      .withColumn("sum_qty", col("sum_qty").cast("double"))

  val bucketedOrderPrioritySql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Shard count of [[shardManifest]] — 16 at test scale; a 100 TB
    * deployment raises it to (corpus bytes / target shard bytes) with
    * no other change, since assignment is pure per-row arithmetic. */
  val NShards = 16

  /** q73 — deterministic training-shard assignment + manifest, the
    * audit half of the "write the training corpus" stage: every
    * document maps to `md5(doc_id)-derived 32-bit value mod
    * [[NShards]]` (content-stable — re-running on re-partitioned or
    * incrementally-grown input reassigns nothing, unlike
    * `spark_partition_id`/round-robin), and the manifest reports per
    * shard the doc count, token total (q28 trim+`' +'` convention,
    * so manifests reconcile with the budget/packing stages) and an
    * order-independent XOR checksum of the per-doc hash — the value
    * a resumed or re-run writer compares to detect a silently
    * changed shard. The writer itself is `.write.partitionBy` over
    * the same `shard` column ([[writeDatePartitioned]] machinery);
    * the manifest is the part with checkable semantics.
    *
    * Scale shape: one map-side-combinable groupBy on shard —
    * NShards × partials per partition, then NShards output rows; the
    * md5 nibble arithmetic is the q62 cross-engine bucket device
    * (hex-char strpos fold, identical in Spark SQL and DuckDB). */
  /** The q62 cross-engine bucket device, hoisted for q73/q76: the
    * first 8 hex digits of md5(doc_id) as a BIGINT, via a hex-char
    * position fold that is expressible identically in Spark SQL
    * ([[md5HexValSpark]]) and DuckDB ([[md5HexValDuck]]).
    * CAST each term to BIGINT BEFORE the multiply: instr returns INT
    * and 16^7 scales past Int.MaxValue — ANSI mode (Spark 4 default)
    * throws ARITHMETIC_OVERFLOW on the int product. */
  private[graft] def md5HexValSpark(c: String): String = (1 to 8).map(d =>
    s"(CAST(instr('0123456789abcdef', substring(md5(cast($c AS string)), $d, 1)) AS BIGINT) - 1) * ${math.pow(16, 8 - d).toLong}")
    .mkString(" + ")

  private[graft] def md5HexValDuck(c: String): String = (1 to 8).map(d =>
    s"(strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), $d, 1)) - 1) * ${math.pow(16, 8 - d).toLong}")
    .mkString(" + ")

  def shardManifest(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .withColumn("h", expr(s"CAST(${md5HexValSpark("doc_id")} AS BIGINT)"))
      .withColumn("shard", pmod(col("h"), lit(NShards.toLong)))
      .withColumn("toks",
        size(split(trim(col("text")), " +")).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        expr("bit_xor(h)").as("checksum"))
  }

  val shardManifestSql: String =
    s"""SELECT hv % $NShards AS shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(bit_xor(hv) AS BIGINT) AS checksum
       |FROM (
       |  SELECT CAST(${md5HexValDuck("doc_id")} AS BIGINT) AS hv,
       |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
       |      AS n_toks
       |  FROM documents)
       |GROUP BY 1""".stripMargin

  /** Bin count of [[trainingBins]] — like [[NShards]], a deployment
    * sets it to the writer parallelism it wants. */
  val NBins = 8

  /** q76 — balanced training-order bins: the COMPLEMENT of q73's
    * content-hash sharding. Documents are ranked per language in the
    * same deterministic md5(doc_id) order the packing/mixing stages
    * use (q65/q68 convention), then round-robined over [[NBins]]
    * bins — so within every language the bin DOC COUNTS are exactly
    * balanced (max-min ≤ 1 by construction), where q73's mod-hash
    * shards are only balanced in expectation. The trade, stated
    * honestly: q73's assignment is content-stable under corpus
    * growth (a new doc moves nothing); q76's rank-based assignment
    * is stable only for a fixed corpus snapshot (a new doc shifts
    * every later rank in its language) — which is fine for its job,
    * binning one frozen training corpus for parallel writers. The
    * audit is the q73 manifest shape per (lang, bin): docs, q28-
    * convention tokens, order-independent XOR checksum.
    *
    * Scale shape: ONE exchange on lang for the rank window (O(1)
    * running state per partition — q68's shape; a skewed language
    * salts like q49), then a map-side-combinable (lang, bin) rollup.
    * No global window: ranks are per-language by design, so no
    * single-partition bottleneck exists. */
  def trainingBins(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("ord"), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("h", expr(s"CAST(${md5HexValSpark("doc_id")} AS BIGINT)"))
      .withColumn("ord", md5(col("doc_id").cast("string")))
      .withColumn("toks",
        size(split(trim(col("text")), " +")).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("bin", pmod(col("rn") - 1, lit(NBins.toLong)))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        expr("bit_xor(h)").as("checksum"))
  }

  val trainingBinsSql: String =
    s"""SELECT lang, (rn - 1) % $NBins AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(bit_xor(hv) AS BIGINT) AS checksum
       |FROM (
       |  SELECT lang,
       |    CAST(${md5HexValDuck("doc_id")} AS BIGINT) AS hv,
       |    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
       |      AS n_toks,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |GROUP BY 1, 2""".stripMargin

  /** Epoch seed for q91 — a training run derives one seed per epoch
    * (epoch 2 would be "e2"), giving a fresh deterministic global
    * order with no RNG state to coordinate across executors. */
  val EpochSeed = "e1"

  /** q91 — deterministic epoch shuffle: the training-data-loader
    * "global shuffle" as a manifest. Every document gets an epoch-
    * seeded pseudo-random key `md5(doc_id || ':' || seed)`; the key's
    * hash value picks the shard and the key's hex string orders
    * documents WITHIN the shard — so (shard, pos) is a uniformly
    * shuffled, fully deterministic training order that any reader can
    * reproduce from (doc_id, seed) alone. This is the piece q73/q76
    * don't cover: q73 shards by content hash (stable, but epoch-
    * invariant), q76 balances a frozen snapshot; q91 is the per-epoch
    * reshuffle between them.
    *
    * Scale shape: NO global sort — the naive `ORDER BY rand()` form
    * is a single-partition row_number at any size. The shard
    * assignment is a stateless per-row expression, and the position
    * window partitions BY SHARD, so the one exchange hash-partitions
    * on shard and each shard sorts independently (exactly how the
    * shards are consumed); shard count scales with writer parallelism
    * via [[NShards]]. Everything crossing the engine boundary is an
    * integer or the md5 hex string both engines order identically
    * (ASCII). */
  def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = s"concat(CAST(doc_id AS string), ':$EpochSeed')"
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ord"), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("ord", expr(s"md5($key)"))
      .withColumn("shard",
        pmod(expr(s"CAST(${md5HexValSpark(key)} AS BIGINT)"),
          lit(NShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  val epochShuffleSql: String = {
    val key = s"concat(CAST(doc_id AS VARCHAR), ':$EpochSeed')"
    s"""SELECT doc_id,
       |  CAST(${md5HexValDuck(key)} AS BIGINT) % $NShards AS shard,
       |  CAST(ROW_NUMBER() OVER (
       |    PARTITION BY CAST(${md5HexValDuck(key)} AS BIGINT) % $NShards
       |    ORDER BY md5($key), doc_id) AS BIGINT) AS pos
       |FROM documents""".stripMargin
  }

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

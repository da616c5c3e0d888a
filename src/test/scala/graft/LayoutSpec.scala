package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.LayoutOps

/** Layout + skew operators: partition pruning must be visible in the
  * plan, salted counts must equal plain counts. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned write prunes partitions on read") {
    val out = Files.createTempDirectory("graft_layout").toString
    LayoutOps.writeDatePartitioned(
      Tables.orders(spark, sf0001), "o_orderdate", out)
    val q = LayoutOps.prunedMonthlyCounts(spark, out,
      Seq("1996-01", "1996-02"))
    val plan = q.queryExecution.executedPlan.toString
    // a scan prints "PartitionFilters: []" even when NOTHING is pruned
    // — assert the month predicate actually landed in the filter list
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(!pf.contains("PartitionFilters: []") && pf.contains("month"))
    // only the two requested months come back, with correct totals
    val got = q.as[(String, Long)].collect().toMap
    val expected = Tables.orders(spark, sf0001)
      .withColumn("m", date_format($"o_orderdate", "yyyy-MM"))
      .where($"m".isin("1996-01", "1996-02"))
      .groupBy($"m").count().as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("layout fingerprint: unchanged sources skip the rewrite, a " +
      "changed source forces one") {
    import org.apache.hadoop.fs.Path
    val first = LayoutOps.ensureMonthLayout(spark, sf0001)
    val p = new Path(first)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def newestDataMtime: Long = fs.listStatus(p)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(_.getModificationTime).max
    val before = newestDataMtime
    // second call with identical sources: marker matches, no write
    LayoutOps.ensureMonthLayout(spark, sf0001)
    assert(newestDataMtime == before)
    // corrupt the marker (≡ source fingerprint changed): must rebuild
    Thread.sleep(1100) // mtime granularity can be a full second
    val marker = new Path(p, "_graft_fingerprint")
    val out = fs.create(marker, true)
    out.write("stale".getBytes("UTF-8")); out.close()
    LayoutOps.ensureMonthLayout(spark, sf0001)
    assert(newestDataMtime > before)
    // and the rebuilt layout still answers the pruned query correctly
    assert(LayoutOps.prunedMonthlyCounts(spark, first,
      Seq("1996-01")).count() > 0)
  }

  test("bucketed tables survive a catalog drop: re-register points at " +
      "the existing files, no rewrite, join still co-located") {
    import org.apache.hadoop.fs.Path
    LayoutOps.ensureBucketedTables(spark, sf0001)
    val loc = new Path(spark.sessionState.conf.warehousePath,
      "graft_li_bucketed")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def newestDataMtime: Long = fs.listStatus(loc)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(_.getModificationTime).max
    val before = newestDataMtime
    // simulate the next session: in-memory catalog lost, files kept
    // (the tables are EXTERNAL precisely so the drop spares the data)
    spark.sql("DROP TABLE graft_li_bucketed")
    spark.sql("DROP TABLE graft_o_bucketed")
    assert(fs.exists(loc))
    val q = LayoutOps.bucketedOrderPriority(spark, sf0001)
    val got = q.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(newestDataMtime == before) // re-registered, not rewritten
    // the re-registered table still joins shuffle-free...
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"))
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"))
    // ...and correctly: totals equal the plain unbucketed join
    val expect = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(graft.Money.dec2($"l_quantity")).cast("double").as("s"))
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect)
  }

  test("salted count equals plain count for every key") {
    val ev = Tables.events(spark, sf0001)
    val salted = LayoutOps.saltedCount(ev, "event_type", 8)
      .as[(String, Long)].collect().toMap
    val plain = ev.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("bucketed join avoids shuffle exchanges on both sides") {
    // bucketing disables broadcast here so the bucket metadata is what
    // kills the exchanges, not a broadcast fallback; the PRIOR value
    // is captured so the restore never clobbers a session override
    val priorThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.ops.LayoutOps.bucketedJoin(spark, sf0001, 4)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the only exchange allowed is the final groupBy aggregation —
      // neither scan side may re-shuffle on the join key
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"))
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"))
      // and the result is right
      val total = q.agg(org.apache.spark.sql.functions.sum($"n")).head().getLong(0)
      assert(total == Tables.lineitem(spark, sf0001).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        priorThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_o_bucketed")
    }
  }

  test("band index materializes once and the probe join leaves the " +
      "index scan unshuffled") {
    import org.apache.hadoop.fs.Path
    val t = LayoutOps.ensureBandIndexLayout(spark, sf0001)
    val loc = new Path(spark.sessionState.conf.warehousePath, t)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def newestDataMtime: Long = fs.listStatus(loc)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(_.getModificationTime).max
    val before = newestDataMtime
    // unchanged source: second ensure is a no-op, the layout is reused
    LayoutOps.ensureBandIndexLayout(spark, sf0001)
    assert(newestDataMtime == before)
    // stale marker (≡ source fingerprint changed, e.g. new ingest
    // batch landed): the bucketed tier must REBUILD, not reuse — the
    // month-layout test covers this for the partitioned tier; this
    // covers it for the shared bucketed tier
    Thread.sleep(1100) // mtime granularity can be a full second
    val marker = new Path(loc, "_graft_fingerprint")
    val out0 = fs.create(marker, true)
    out0.write("stale".getBytes("UTF-8")); out0.close()
    LayoutOps.ensureBandIndexLayout(spark, sf0001)
    assert(newestDataMtime > before)
    // broadcast disabled so bucket metadata — not a broadcast
    // fallback — is what kills the index-side exchange; restore the
    // CAPTURED prior value, never a hard-coded default
    val priorThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val arriving = graft.ops.DedupOps.bandFrame(
        Tables.documents(spark, sf0001).where($"doc_id" % 10 === 0))
      val q = LayoutOps.bandIndexProbe(spark, sf0001, arriving).distinct()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // both join sides hash on the fused `bkey`; exactly ONE such
      // exchange may appear (the probe side) — the bucketed index
      // scan plans none
      val hits = "Exchange hashpartitioning\\(bkey".r
        .findAllIn(plan).size
      assert(hits == 1, s"expected 1 bkey exchange, got $hits:\n$plan")
      // and the probe is RIGHT: identical pairs to the inline banding
      // join q69 used before the index was materialized (with the
      // index's corpus-side bucket cap mirrored — it never binds at
      // fixture scale, but the expectation matches by construction)
      val got = q.as[(Long, Long)].collect().toSet
      val corpus = graft.ops.DedupOps.capBandBuckets(
        graft.ops.DedupOps.bandFrame(
          Tables.documents(spark, sf0001).where($"doc_id" % 10 =!= 0)),
        Seq("band", "key"))
      val expect = arriving.as("n").join(corpus.as("c"),
          $"n.band" === $"c.band" && $"n.key" === $"c.key")
        .select($"n.doc_id", $"c.doc_id")
        .as[(Long, Long)].collect().toSet
      assert(got == expect && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        priorThreshold)
    }
  }

  test("cluster labels materialize once, rebuild on a stale marker, " +
      "and the artifact equals a direct q48 run") {
    import org.apache.hadoop.fs.Path
    val first = LayoutOps.ensureClusterLabelLayout(spark, sf0001)
    val p = new Path(first)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def newestDataMtime: Long = fs.listStatus(p)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(_.getModificationTime).max
    val before = newestDataMtime
    // unchanged corpus: second ensure reuses the artifact, no rewrite
    LayoutOps.ensureClusterLabelLayout(spark, sf0001)
    assert(newestDataMtime == before)
    // stale marker (≡ corpus or dedup parameters changed): rebuild
    Thread.sleep(1100) // mtime granularity can be a full second
    val marker = new Path(p, "_graft_fingerprint")
    val out = fs.create(marker, true)
    out.write("stale".getBytes("UTF-8")); out.close()
    LayoutOps.ensureClusterLabelLayout(spark, sf0001)
    assert(newestDataMtime > before)
    // the artifact IS q48's output — same rows, nothing dropped or
    // invented by the parquet round-trip
    val art = spark.read.parquet(first)
      .as[(Long, Long, Boolean)].collect().toSet
    val direct = graft.ops.DedupOps.dedupClusters(spark, sf0001)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(art == direct && art.nonEmpty)
  }

  test("training bins: per-language doc counts balanced to ±1, corpus " +
      "partitioned exactly once, assignment deterministic") {
    val out = LayoutOps.trainingBins(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    // round-robin balance is BY CONSTRUCTION: within each language
    // max and min bin population differ by at most 1
    out.groupBy(_._1).foreach { case (lang, bins) =>
      val counts = bins.map(_._3)
      assert(counts.max - counts.min <= 1, s"lang $lang: $counts")
      // every bin id in [0, NBins)
      assert(bins.forall(b => b._2 >= 0 && b._2 < LayoutOps.NBins))
    }
    // bins partition the corpus: doc totals reconcile exactly
    assert(out.map(_._3).sum ==
      Tables.documents(spark, sf0001).count())
    // token totals reconcile with the q28 convention corpus-wide
    val tokTotal = Tables.documents(spark, sf0001)
      .select(sum(size(split(trim($"text"), " +")).cast("long")))
      .head().getLong(0)
    assert(out.map(_._4).sum == tokTotal)
    // content-derived order ⇒ bit-identical re-run
    val again = LayoutOps.trainingBins(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("approx distinct is within rsd of exact") {
    val d = LayoutOps.approxDistinct(spark, sf0001)
    val bad = d.where(
      abs($"approx_users" - $"exact_users") >
        $"exact_users" * 0.2 + lit(2)).count()
    assert(bad == 0)
  }

  test("q91 epoch shuffle: a permutation — every doc exactly once, " +
      "positions contiguous per shard, order reproducible") {
    val sh = LayoutOps.epochShuffle(spark, sf0001).cache()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(sh.count() == nDocs)
    assert(sh.select($"doc_id").distinct().count() == nDocs)
    assert(sh.where($"shard" < 0 ||
      $"shard" >= LayoutOps.NShards).count() == 0)
    // positions within each shard are exactly 1..n_shard
    val bad = sh.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"),
        max($"pos").as("hi"), countDistinct($"pos").as("nd"))
      .where($"lo" =!= 1 || $"hi" =!= $"n" || $"nd" =!= $"n")
    assert(bad.count() == 0)
    // deterministic: a re-run reproduces the identical manifest
    val again = LayoutOps.epochShuffle(spark, sf0001)
    assert(sh.except(again).count() == 0 &&
      again.except(sh).count() == 0)
    // and the epoch order differs from plain doc_id order somewhere
    // (the shuffle actually shuffles): within some shard, ascending
    // pos must not be ascending doc_id
    val disorder = sh.as[(Long, Long, Long)].collect()
      .groupBy(_._2).values.exists { rows =>
        val byPos = rows.sortBy(_._3).map(_._1).toSeq
        byPos != byPos.sorted
      }
    assert(disorder, "epoch order degenerated to doc_id order")
    sh.unpersist()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.ops.{Relational, SimilarityOps, TextOps}

/** Physical-plan assertions (SURVEY.md §7 / PLANS.md): the properties
  * the 100 TB design depends on — filter pushdown to the parquet scan,
  * dimension broadcasts, map-side partial aggregation, no cartesian
  * products — locked in as tests so a refactor that silently loses one
  * fails here, not on a cluster.
  */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01: price/date predicates are pushed to the orders scan") {
    val plan = formatted(Relational.cleanFilter(spark, sf0001))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(o_totalprice"))
    // column pruning: the scan must not read the wide comment column
    assert(!plan.contains("o_comment"))
  }

  test("q03: customer dimension joins as a broadcast, not a shuffle") {
    val plan = formatted(Relational.revenueJoin(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("q02: aggregation is partial (map-side) + final — two HashAggregates") {
    // formatted explain prints every node TWICE (tree line + detail
    // header), so one HashAggregate already matches twice; partial +
    // final therefore requires >= 4 occurrences
    val plan = formatted(Relational.pricingSummary(spark, sf0001))
    assert("HashAggregate".r.findAllIn(plan).length >= 4)
  }

  test("q24: brute-force pairs use broadcast NL join, never CartesianProduct") {
    val plan = formatted(SimilarityOps.cosineTopK(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q09: keyword dimension is broadcast against the corpus") {
    val plan = formatted(TextOps.keywordTf(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("q61: the eval shingle set broadcasts — the corpus side joins " +
      "map-side, no corpus-wide pre-join exchange") {
    val plan = formatted(TextOps.contamination(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q62: split assignment is per-row — the only exchange is the " +
      "count rollup") {
    val plan = formatted(TextOps.detSplit(spark, sf0001))
    // partial + final agg around ONE shuffle; formatted prints each
    // node twice (detail section), so 1 exchange ⇒ 2 mentions
    assert(plan.split("Exchange").length - 1 <= 2)
    assert(plan.contains("HashAggregate"))
  }

  test("q63: per-doc top-3 plans a bounded window (WindowGroupLimit), " +
      "never a global sort") {
    val plan = formatted(TextOps.salientTerms(spark, sf0001))
    assert(plan.contains("WindowGroupLimit"))
    assert(!plan.contains("GlobalLimit"))
  }

  test("q65: budget cut is one lang-keyed window — a single exchange, " +
      "no join") {
    val plan = formatted(TextOps.tokenBudget(spark, sf0001))
    assert(plan.contains("Window"))
    assert(plan.split("Exchange").length - 1 <= 2) // 1 node × 2 prints
    assert(!plan.contains("Join"))
  }

  test("q67: chunking is map-only — generate + project, ZERO exchanges") {
    val plan = formatted(TextOps.chunkWindows(spark, sf0001))
    assert(plan.contains("Generate"))
    assert(!plan.contains("Exchange"))
    assert(!plan.contains("Join"))
  }

  test("q68: packing is q65's one lang window plus one rollup — at most " +
      "two exchanges, no join") {
    val plan = formatted(TextOps.sequencePack(spark, sf0001))
    assert(plan.contains("Window"))
    assert(plan.contains("HashAggregate"))
    // 2 exchange nodes (window key + rollup) × 2 prints in formatted
    assert(plan.split("Exchange").length - 1 <= 4)
    assert(!plan.contains("Join"))
  }

  test("q04: contains-semijoin stays a broadcast NL semi join") {
    val plan = formatted(Relational.containsSemiJoin(spark, sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("LeftSemi"))
  }

  test("q51: centroid assignment is broadcast-only — no exchange " +
      "before the bucket pair join") {
    val plan = formatted(SimilarityOps.annQuantized(spark, sf0001))
    // the one-row centroid array arrives via broadcast, never shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
    // the HOF argmax must appear as a projection (map-side), not an
    // aggregate: no n x k explode-and-regroup
    assert(plan.contains("aggregate("))
  }

  test("q52/q54: band candidates come from an equi-join (hash/merge), " +
      "never a nested-loop pair scan") {
    for (q <- Seq(graft.ops.DedupOps.simhashPairs(spark, sf0001),
        graft.ops.DedupOps.simhash64Pairs(spark, sf0001))) {
      val plan = formatted(q)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"))
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("q78: semantic-dedup candidates come from an equi-join on the " +
      "k-means bucket — never a nested-loop or cartesian pair scan") {
    // the assignment frame shape semanticDedup feeds the edge builder;
    // buckets faked per-row so the lock is on the JOIN STRUCTURE, not
    // on Lloyd (whose broadcast-only assignment q51's lock covers)
    import org.apache.spark.sql.functions._
    val assigned = Tables.embeddings(spark, sf0001)
      .withColumn("unit",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("bucket", col("vec_id") % 8)
      .select(col("vec_id"), col("unit"), col("bucket"))
    val plan = formatted(SimilarityOps.semanticEdgesOf(assigned))
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // the cosine gate stays a filter on the joined rows (codegen'd
    // HOF fold), not a post-join aggregate
    assert(plan.contains("aggregate("))
  }

  test("q36: the registered pruned-counts query plans PartitionFilters " +
      "on month, reading 2 of the written partitions") {
    val q = graft.ops.LayoutOps.prunedMonthlyOrderCounts(spark, sf0001)
    val plan = formatted(q)
    assert(plan.contains("PartitionFilters: [month"))
    // planning-time pruning, not a post-scan filter on the partition col
    assert(plan.contains("month#") || plan.contains("in(month"))
  }
  test("q71: the wide exchange carries line hashes, not line text, " +
      "and only two exchanges exist") {
    val plan = formatted(graft.ops.DedupOps.lineDedup(spark, sf0001))
    // exchange 1: window partition on line_hash; exchange 2: doc rollup
    // (formatted mode puts the keys on the Arguments detail line)
    assert("hashpartitioning\\(line_hash".r.findAllIn(plan).nonEmpty)
    // "Exchange " (trailing space) hits only the TREE line of each
    // node — the detail header "(N) Exchange" has none — so the count
    // is per-NODE, not per-print (verified against real formatted
    // output; the old x2 bound silently allowed twice the shuffles)
    assert("Exchange ".r.findAllIn(plan).length <= 2) // 2 nodes
    // the shuffled row is (doc_id, ln, line_hash) - the token array
    // must be projected away BEFORE the exchange, so no `toks`
    // attribute may survive into the window stage
    val afterEx = plan.substring(plan.indexOf("hashpartitioning(line_hash"))
    assert(!afterEx.contains("toks"))
  }

  test("q73: shard manifest is one partial+final aggregation pass") {
    val plan = formatted(graft.ops.LayoutOps.shardManifest(spark, sf0001))
    assert("Exchange ".r.findAllIn(plan).length <= 1) // per-node count
    assert("HashAggregate".r.findAllIn(plan).length >= 4) // partial+final
  }

  test("q76: training bins plan ONE lang exchange that does not carry " +
      "text, and the (lang, bin) rollup reuses the lang partitioning") {
    val plan = formatted(graft.ops.LayoutOps.trainingBins(spark, sf0001))
    // one Exchange node total (the trailing-space pattern hits only
    // tree lines, so this counts NODES): the window's lang hop; the
    // rollup groups on (lang, bin) — a refinement of the existing
    // partitioning, so it must NOT add a second shuffle
    assert("Exchange ".r.findAllIn(plan).length <= 1,
      s"expected a single exchange:\n$plan")
    // the shuffle row is (doc_id, lang, h, ord, toks) — the text
    // column must be projected away BEFORE the exchange
    val exchangeDetail = plan.linesIterator
      .dropWhile(!_.matches("""\(\d+\) Exchange\s*""")).take(3)
      .mkString("\n")
    assert(exchangeDetail.nonEmpty && !exchangeDetail.contains("text"),
      s"text crossed the shuffle:\n$exchangeDetail")
  }

  test("q79: mixture sampling broadcasts the weight frame, explodes " +
      "map-side, and no exchange carries text") {
    val plan = formatted(TextOps.mixtureSample(spark, sf0001))
    // the 5-row epoch-rate frame arrives via broadcast, never shuffle
    assert(plan.contains("BroadcastExchange"))
    // the epoch expansion is a map-side Generate on the joined rows
    assert(plan.contains("Generate"))
    // the epoch-0 doc count is a conditional sum, not a distinct agg
    assert(!plan.contains("Expand"))
    // exchange NODES (trailing-space = tree lines): the weight frame's
    // lang rollup + its single-partition window hop + the final lang
    // rollup — all carrying per-lang partials, never corpus rows; the
    // BroadcastExchange tree line also matches the pattern
    assert("Exchange ".r.findAllIn(plan).length <= 4,
      s"unexpected exchange count:\n$plan")
    // no exchange moves document text: every shuffle row is partials
    val details = plan.split("""\n(?=\(\d+\) )""").filter(b =>
      b.startsWith("(") && b.linesIterator.next().matches(
        """\(\d+\) (Broadcast)?Exchange\s*"""))
    assert(details.nonEmpty)
    details.foreach(b => assert(!b.contains("text"),
      s"text crossed an exchange:\n$b"))
  }

  test("q74: the composed pipeline has ONE corpus-wide exchange and " +
      "Catalyst turns the dedup into a map-side WindowGroupLimit") {
    val plan = formatted(graft.ops.PipelineOps.trainingPipeline(spark, sf0001))
    // dedup rn=1 must plan as WindowGroupLimit (top-1 per md5 group
    // pre-filtered BEFORE the exchange), not a full window sort
    assert(plan.contains("WindowGroupLimit"))
    // exchanges: md5(text) window + ONE rollup hop - nothing else.
    // Counted per NODE via the trailing-space tree-line pattern — the
    // previous "Exchange hashpartitioning" pattern NEVER occurs in
    // formatted mode (node args print on their own line), so the old
    // assertion was vacuous. The doc count is a conditional sum on
    // chunk_id=0, so no distinct-agg Expand
    assert("Exchange ".r.findAllIn(plan).length <= 2)
    assert(!plan.contains("Expand"))
    // gate predicate evaluated at the scan stage, corpus columns pruned
    assert(!plan.contains("n_chars"))
  }

  test("q91: epoch shuffle windows BY SHARD — no single-partition " +
      "global sort, and the one exchange carries no text") {
    val plan = formatted(graft.ops.LayoutOps.epochShuffle(spark, sf0001))
    // a global ORDER BY rand()-style plan would print SinglePartition
    assert(!plan.contains("SinglePartition"))
    assert("Exchange ".r.findAllIn(plan).length <= 1)
    assert(!plan.contains("text#"), "shuffle must not carry document text")
  }

  test("q95: the pair stage is an equi-join over the cached profile — " +
      "never a nested loop — and the profile plan bounds its window") {
    val (matrix, prof) =
      graft.ops.CorpusOps.sourceSimilarityFrames(spark, sf0001)
    val plan = formatted(matrix)
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    // the top-K profile cut plans as a bounded window, not a full sort
    val profPlan = formatted(
      graft.ops.CorpusOps.sourceSimilarityProfilePlan(spark, sf0001))
    assert(profPlan.contains("WindowGroupLimit"))
    prof.unpersist()
  }

  test("q96: PQ encode/decode is broadcast-only (codebooks join with " +
      "no exchange) and candidates stay an equi-join on the bucket") {
    val plan = formatted(graft.ops.SimilarityOps.annPq(spark, sf0001))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // the pair stage must join on bucket equality, never a pure
    // theta-join pair scan of the corpus against itself
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"))
  }

  test("q92/q93: containment and the minhash audit generate candidates " +
      "from equi-joins — no nested-loop pair scan anywhere") {
    val (cPairs, bg) =
      graft.ops.DedupOps.bigramContainmentFrames(spark, sf0001)
    val (audit, sig) =
      graft.ops.DedupOps.minhashEstErrorFrames(spark, sf0001)
    for (df <- Seq(cPairs, audit)) {
      val plan = formatted(df)
      assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"))
    }
    bg.unpersist(); sig.unpersist()
  }

  test("q94: retention is ONE user-keyed corpus exchange + the rollup " +
      "hop — single events scan, no join, no count-distinct Expand") {
    val plan = formatted(graft.ops.StatsOps.cohortRetention(spark, sf0001))
    // nodes print twice in formatted mode (tree line + detail header)
    assert("Scan parquet".r.findAllIn(plan).length <= 2, "one scan")
    assert("Exchange ".r.findAllIn(plan).length <= 4, "two exchanges")
    assert(!plan.contains("Expand") && !plan.contains("Join"))
  }

  test("q100: dup spans tokenize the corpus ONCE — window-count dup " +
      "test, and the island windows + span rollup share one doc exchange") {
    val plan = formatted(graft.ops.CorpusOps.dupSpans(spark, sf0001))
    assert("Scan parquet".r.findAllIn(plan).length <= 2, "one scan")
    // gram exchange + doc exchange only; the (doc, island) rollup must
    // ride the doc_id partitioning, not add a third
    assert("Exchange ".r.findAllIn(plan).length <= 4, "two exchanges")
    assert(!plan.contains("Join"))
  }

  test("q103: novelty tokenizes ONCE; first-occurrence is a window over " +
      "the reduced (doc, gram) frame, not a second corpus pass") {
    val plan = formatted(graft.ops.CorpusOps.gramNovelty(spark, sf0001))
    assert("Scan parquet".r.findAllIn(plan).length <= 2, "one scan")
    assert(!plan.contains("Join"))
  }

  test("q101: snapshot diff hashes map-side — no Exchange carries the " +
      "text column, and the diff is one full-outer SMJ") {
    val df = graft.ops.MaintenanceOps.snapshotDiff(spark, sf0001)
    val plan = formatted(df)
    assert(plan.contains("SortMergeJoin FullOuter") ||
      plan.contains("ShuffledHashJoin FullOuter"))
    // formatted lists each Exchange's output columns in its detail
    // block; md5 must be computed below the exchange so no shuffled
    // attribute is the raw text
    val exchangeOutputs = "\\(\\d+\\) Exchange\\n(Input \\[[^\\]]*\\])".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchangeOutputs.nonEmpty)
    exchangeOutputs.foreach(cols =>
      assert(!cols.contains("text"), s"text shuffled: $cols"))
  }

  test("q102: z-order report is scan → codegen'd bit math → partial+" +
      "final agg with ONE exchange — no join, no window, no UDF") {
    val plan = formatted(graft.ops.MaintenanceOps.zorderReport(spark, sf0001))
    assert("Scan parquet".r.findAllIn(plan).length <= 2, "one scan")
    assert("Exchange ".r.findAllIn(plan).length <= 2, "one exchange")
    assert("HashAggregate".r.findAllIn(plan).length >= 4, "partial+final")
    assert(!plan.contains("Join") && !plan.contains("Window"))
    // '*(n)' is the executed-plan codegen-stage marker: the z bit math
    // must live inside a whole-stage codegen span, not eval'd rows.
    // AQE finalizes the physical plan only on execution — collect()
    // drives THIS df's QueryExecution (count() would plan a new one)
    val df = graft.ops.MaintenanceOps.zorderReport(spark, sf0001)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("*(1)"), s"not codegen'd:\n$executed")
  }

  test("runtime bloom filter: Spark's InjectRuntimeFilter fires on the " +
      "selective-dim shuffle join shape (the 100 TB scan-pruning path)") {
    // AQE/broadcast off so the join shuffles; thresholds opened so the
    // tiny test tables qualify — restore EVERY conf to its prior value
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = spark.read
        .parquet(s"$sf0001/orders.parquet")
        .where(org.apache.spark.sql.functions.col("o_orderpriority") ===
          "1-URGENT")
      val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("BloomFilter"),
        s"runtime filter not injected:\n${optimized.take(2000)}")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

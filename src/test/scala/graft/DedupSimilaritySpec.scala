package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SimilarityOps}

/** Dedup/similarity invariants at sf0.001. */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("simhash band-join pair search ≡ brute-force hamming<=2 " +
      "(exact recall: 2 dirty bits can't cover 4 bands)") {
    val sig = DedupOps.simhash(spark, sf0001)
      .select($"doc_id", $"simhash").cache()
    val a = sig.select($"doc_id".as("doc_a"), $"simhash".as("sh_a"))
    val b = sig.select($"doc_id".as("doc_b"), $"simhash".as("sh_b"))
    val brute = a.join(b, $"doc_a" < $"doc_b")
      .withColumn("hamming", expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)"))
      .where($"hamming" <= 2)
      .select($"doc_a", $"doc_b", $"hamming")
    val banded = DedupOps.simhashPairs(spark, sf0001)
    assert(banded.count() > 0)
    // set equality both ways — banding must neither invent nor drop pairs
    assert(banded.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(banded).count() == 0)
    sig.unpersist()
  }

  test("simhash64 band-join ≡ brute-force hamming<=2, and the wide " +
      "signature collapses the candidate space vs 16-bit") {
    val sig = DedupOps.simhash64Sig(spark, sf0001)
      .select($"doc_id", $"simhash64").cache()
    val a = sig.select($"doc_id".as("doc_a"), $"simhash64".as("sh_a"))
    val b = sig.select($"doc_id".as("doc_b"), $"simhash64".as("sh_b"))
    val brute = a.join(b, $"doc_a" < $"doc_b")
      .withColumn("hamming", expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)"))
      .where($"hamming" <= 2)
      .select($"doc_a", $"doc_b", $"hamming")
    val banded = DedupOps.simhash64Pairs(spark, sf0001)
    assert(banded.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(banded).count() == 0)
    // the scale property the width buys: far fewer near-pairs than the
    // 16-bit signature admits on the same corpus
    assert(banded.count() < DedupOps.simhashPairs(spark, sf0001).count())
    sig.unpersist()
  }

  test("q51 buckets = independent argmax over seed centroids; " +
      "neighbors stay in-bucket") {
    val fold = "aggregate(zip_with(%s, %s, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), " +
      "(acc, x) -> acc + x)"
    val e = graft.Tables.embeddings(spark, sf0001)
      .withColumn("nrm", sqrt(expr(fold.format("embedding", "embedding"))))
    val c = e.where($"vec_id" < SimilarityOps.QuantizerK)
      .select($"vec_id".as("cid"), $"embedding".as("cemb"),
        $"nrm".as("cnrm"))
    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid")
    val expected = e.crossJoin(broadcast(c))
      .withColumn("sim",
        expr(fold.format("embedding", "cemb")) / ($"nrm" * $"cnrm"))
      .withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"vec_id", $"cid".as("expected_bucket"))
    val got = SimilarityOps.annQuantized(spark, sf0001)
      .select($"vec_id", $"bucket").distinct()
    assert(got.count() > 0)
    assert(got.join(expected, "vec_id")
      .where($"bucket" =!= $"expected_bucket").count() == 0)
  }

  test("parameterized nlist: non-default k keeps the argmax-assignment " +
      "invariant and occupies more buckets (the scaling dial is real)") {
    val k = 2 * SimilarityOps.QuantizerK
    val fold = "aggregate(zip_with(%s, %s, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), " +
      "(acc, x) -> acc + x)"
    val e = graft.Tables.embeddings(spark, sf0001)
      .withColumn("nrm", sqrt(expr(fold.format("embedding", "embedding"))))
    val c = e.where($"vec_id" < k)
      .select($"vec_id".as("cid"), $"embedding".as("cemb"),
        $"nrm".as("cnrm"))
    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid")
    val expected = e.crossJoin(broadcast(c))
      .withColumn("sim",
        expr(fold.format("embedding", "cemb")) / ($"nrm" * $"cnrm"))
      .withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"vec_id", $"cid".as("expected_bucket"))
    val got = SimilarityOps.annQuantized(spark, sf0001, k = k)
      .select($"vec_id", $"bucket").distinct()
    assert(got.count() > 0)
    assert(got.join(expected, "vec_id")
      .where($"bucket" =!= $"expected_bucket").count() == 0)
    // doubling k must spread the corpus over MORE occupied buckets —
    // this is exactly what keeps per-bucket work bounded at scale
    val defaultOccupied = SimilarityOps.annQuantized(spark, sf0001)
      .select($"bucket").distinct().count()
    val scaledOccupied = got.select($"bucket").distinct().count()
    assert(scaledOccupied > defaultOccupied,
      s"k=$k occupies $scaledOccupied buckets vs $defaultOccupied at default")
    // multi-probe at the same non-default k still answers every
    // single-probe vector at least as well (the q55 monotonicity
    // invariant survives the parameterization)
    val one = SimilarityOps.annQuantized(spark, sf0001, k = k)
      .where($"rn" === 1L).select($"vec_id", $"cos_sim".as("s1"))
    val two = SimilarityOps.annMultiProbe(spark, sf0001, k = k)
      .where($"rn" === 1L).select($"vec_id", $"cos_sim".as("s2"))
    assert(one.join(two, "vec_id").where($"s2" < $"s1").count() == 0)
  }

  test("q55 multi-probe: per-vector best neighbor is never worse than " +
      "single-probe q51 (recall is monotone in nprobe)") {
    val one = SimilarityOps.annQuantized(spark, sf0001)
      .where($"rn" === 1L)
      .select($"vec_id", $"cos_sim".as("s1"))
    val two = SimilarityOps.annMultiProbe(spark, sf0001)
      .where($"rn" === 1L)
      .select($"vec_id", $"cos_sim".as("s2"))
    // every vector q51 answers, q55 answers at least as well
    assert(one.join(two, "vec_id").where($"s2" < $"s1").count() == 0)
    // ...and q55 covers at least as many vectors (2 probed buckets)
    assert(two.count() >= one.count())
    // self never appears as its own neighbor
    assert(SimilarityOps.annMultiProbe(spark, sf0001)
      .where($"vec_id" === $"neighbor_id").count() == 0)
  }

  test("q66 ANN recall assertion: both variants clear their floors " +
      "against brute-force ground truth, multi-probe strictly ahead") {
    val rows = SimilarityOps.annRecall(spark, sf0001)
      .collect().map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.size == 2)
    // the registered assertion: every method clears its floor — a
    // broken bucket assignment craters recall to ~1/K ≈ 0.12
    rows.values.foreach { r =>
      assert(r.getAs[Boolean]("pass"),
        s"${r.getAs[String]("method")} recall ${r.getAs[Double]("recall")} " +
          s"under floor ${r.getAs[Double]("floor")}")
    }
    // recall is counted over the full truth set: total = 3 per vector
    val total = rows("ivf_quantized").getAs[Long]("total")
    assert(total == 3L * Tables.embeddings(spark, sf0001).count())
    // the recall gate is self-protecting: q66's NULL-pass-on-empty-
    // truth shape means an accidentally-empty embeddings read would
    // "not fail" AS REGISTERED — so the fixture-scale truth set is
    // pinned NON-EMPTY here, making that silent shape unreachable
    // without this spec going red first
    assert(total > 0, "q66 truth set is empty at fixture scale")
    // probing 2 centroids must buy real recall over probing 1
    assert(rows("ivf_multiprobe").getAs[Double]("recall") >
      rows("ivf_quantized").getAs[Double]("recall"))
  }

  test("q66 empty truth set: one row per method with NULL recall/pass, " +
      "matching the oracle's GROUP-BY-less aggregate shape") {
    // a single vector has no non-self pairs, so the brute-force truth
    // is empty; the method dimension must still drive 2 output rows
    // (DuckDB's aggregate emits COUNT(*)=0 rows — verified 0.0/0.0
    // division yields NULL there, as the null-propagating division
    // does here)
    val one = Tables.embeddings(spark, sf0001).limit(1)
    val tmp = java.nio.file.Files.createTempDirectory("onevec").toString
    one.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = SimilarityOps.annRecall(spark, tmp).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") == 0L)
      assert(r.getAs[Long]("total") == 0L)
      assert(r.isNullAt(r.fieldIndex("recall")))
      assert(r.isNullAt(r.fieldIndex("pass")))
    }
  }

  test("q56 Lloyd refinement: the spherical-kmeans objective is " +
      "monotone over rounds and strictly covers the seed assignment") {
    def objective(rounds: Int): Double =
      SimilarityOps.annLloyd(spark, sf0001, rounds)
        .agg(sum($"best_sim")).head().getDouble(0)
    val o0 = objective(0) // seed centroids, argmax assignment only
    val o1 = objective(1)
    val o2 = objective(2)
    // mean-of-unit-vectors update never decreases summed cosine
    // (1e-9 absorbs float-reduction noise at sf0.001 magnitudes)
    assert(o1 >= o0 - 1e-9, s"round 1 regressed: $o1 < $o0")
    assert(o2 >= o1 - 1e-9, s"round 2 regressed: $o2 < $o1")
    val out = SimilarityOps.annLloyd(spark, sf0001)
    assert(out.count() ==
      Tables.embeddings(spark, sf0001).count()) // every vector assigned
    assert(out.where($"bucket" < 0 ||
      $"bucket" >= SimilarityOps.QuantizerK).count() == 0)
  }

  test("q56 Lloyd result is bit-identical under a different shuffle " +
      "partitioning (decimal centroid sums are order-free)") {
    def run(): Set[(Long, Long, Double)] =
      SimilarityOps.annLloyd(spark, sf0001).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bucket"),
          r.getAs[Double]("best_sim"))).toSet
    val base = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try assert(run() == base)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("exact dedup: canonical ids are fixpoints and group sizes >= 1") {
    val d = DedupOps.dedupExact(spark, sf0001)
    assert(d.where($"canonical_id" > $"doc_id").count() == 0)
    assert(d.where($"group_size" < 1).count() == 0)
    // canonical rows are never marked dup
    assert(d.where($"doc_id" === $"canonical_id" && $"is_dup").count() == 0)
  }

  test("minhash: verified jaccard is within (0, 1] and symmetric-free (a < b)") {
    val m = DedupOps.minhashLsh(spark, sf0001).cache()
    assert(m.where($"jaccard" <= 0 || $"jaccard" > 1).count() == 0)
    assert(m.where($"doc_a" >= $"doc_b").count() == 0)
    // banding with 2x4 on a self-similar corpus must surface candidates
    assert(m.count() > 0)
  }

  test("minhash_sig kernel ≡ composed substring/md5/min expressions " +
      "(incl. diacritics — codepoint semantics)") {
    graft.functions.Functions.register(spark)
    val docs = Seq("zmluva o dielo číslo 42 — údržba ciest",
      "aaaaa", "abcde abcde", "krátky text s ľľľ ňň diakritikou")
      .toDF("t")
    val composedExprs =
      ("array_sort(array_distinct(transform(sequence(1, length(t) - 4), " +
        "i -> substring(t, i, 5)))) AS ss_ref") +:
        (0 until 8).map(p =>
          s"array_min(transform(array_distinct(transform(" +
            s"sequence(1, length(t) - 4), i -> substring(t, i, 5))), " +
            s"s -> substring(md5(s), ${p * 4 + 1}, 4))) AS r$p")
    val composed = docs.selectExpr(composedExprs: _*)
    val kernelExprs = "array_sort(sg.ss) AS ss_kern" +:
      (0 until 8).map(p => s"sg.mins[$p] AS k$p")
    val kernel = docs.selectExpr("minhash_sig(t) AS sg")
      .selectExpr(kernelExprs: _*)
    val both = composed.collect().zip(kernel.collect())
    both.foreach { case (c, k) =>
      assert(c.getSeq[String](0) == k.getSeq[String](0)) // same shingle set
      (1 to 8).foreach(p => assert(c.getString(p) == k.getString(p)))
    }
  }

  test("bigram_set kernel ≡ composed split/transform/array_distinct " +
      "(diacritics separate tokens, duplicates collapse)") {
    graft.functions.Functions.register(spark)
    val docs = Seq("Zmluva o dielo o dielo", "a b a b a", "single",
      "", "čaj a káva a čaj", "  spaces   everywhere  ")
      .toDF("t")
    val composed = docs
      .selectExpr("filter(split(lower(t), '[^a-z]+'), w -> w <> '') AS ws")
      .selectExpr(
        "array_sort(CASE WHEN size(ws) >= 2 THEN " +
          "array_distinct(transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END) AS ref")
    val kernel = docs.selectExpr("array_sort(bigram_set(t)) AS kern")
    composed.collect().zip(kernel.collect()).foreach { case (c, k) =>
      assert(c.getSeq[String](0) == k.getSeq[String](0))
    }
  }

  test("simhash: 16-bit range and identical docs hash equal") {
    val sh = DedupOps.simhash(spark, sf0001)
    assert(sh.where($"simhash" < 0 || $"simhash" > 65535).count() == 0)
    assert(sh.count() == Tables.documents(spark, sf0001).count())
  }

  test("cosine top-k: k rows per vector, similarity in [-1, 1], self excluded") {
    val t = SimilarityOps.cosineTopK(spark, sf0001).cache()
    assert(t.where($"vec_id" === $"neighbor_id").count() == 0)
    assert(t.where($"cos_sim" > 1.0 || $"cos_sim" < -1.0).count() == 0)
    val perVec = t.groupBy($"vec_id").count()
    assert(perVec.where($"count" =!= 5).count() == 0)
  }

  test("topk_neighbors aggregate ≡ row_number window top-k (ties included)") {
    graft.functions.Functions.register(spark)
    import org.apache.spark.sql.functions._
    // synthetic frame WITH score ties to exercise the (score DESC,
    // id ASC) tie-break on both paths
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.8), (1L, 13L, 0.95),
      (2L, 20L, 0.5), (2L, 21L, 0.5), (2L, 22L, 0.5),
      // NaN must rank FIRST under desc (Spark sorts NaN above all
      // doubles) and -0.0 must tie +0.0 — both paths must agree
      (3L, 30L, Double.NaN), (3L, 31L, 1.0), (3L, 32L, 0.99),
      (4L, 40L, -0.0), (4L, 41L, 0.0), (4L, 42L, -1.0)).toDF("g", "id", "s")
    val viaAgg = rows.groupBy($"g")
      .agg(expr("topk_neighbors(struct(s, id), 2)").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", ($"pos" + 1).cast("long").as("rn"),
        $"t.id".as("id"), $"t.score".as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"s".desc, $"id")
    val viaWindow = rows
      .withColumn("rn", row_number().over(w).cast("long"))
      .where($"rn" <= 2)
      .select($"g", $"rn", $"id", $"s")
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
    // partial-aggregation shape: the plan must carry a partial_topk
    // before the exchange (map-side combine), i.e. two ObjectHashAggregates
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2)
  }

  test("IVF top-k equals an independent per-bucket brute-force ranking") {
    val ivf = SimilarityOps.annIvf(spark, sf0001)
      .select($"vec_id", $"neighbor_id", $"rn")
      .as[(Long, Long, Long)].collect().toSet
    // independent oracle: collect the (small) sf0.001 bucket and rank
    // in plain Scala with the SAME left-to-right double arithmetic as
    // the vec_dot kernel — bit-identical cosines, so ranks must match
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, String, Array[Float])].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = emb.map { case (id, _, e) => id -> math.sqrt(dot(e, e)) }.toMap
    val expected = (for {
      (ida, la, ea) <- emb
      ranked = emb.filter { case (idb, lb, _) => idb != ida && lb == la }
        .map { case (idb, _, eb) => (idb, dot(ea, eb) / (nrm(ida) * nrm(idb))) }
        .sortBy { case (idb, cos) => (-cos, idb) }
        .take(3).zipWithIndex
      ((idb, _), i) <- ranked
    } yield (ida, idb, (i + 1).toLong)).toSet
    assert(ivf == expected)
  }
  test("line dedup keeps exactly one survivor per distinct line and " +
      "audits every document") {
    val d = graft.ops.DedupOps.lineDedup(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    // every document is audited, none invented
    assert(d.count() == docs.count())
    // total kept == number of DISTINCT reflowed lines in the corpus
    // (one canonical survivor per line, the C4 keep-first contract)
    val lt = graft.ops.DedupOps.LineTokens
    val distinctLines = docs
      .withColumn("toks", split(trim($"text"), " +"))
      .select($"doc_id", $"toks", explode(expr(
        s"sequence(1, CAST(ceil(size(toks) / $lt.0) AS INT))")).as("ln"))
      .select(expr(
        s"array_join(slice(toks, (ln - 1) * $lt + 1, $lt), ' ')").as("l"))
      .distinct().count()
    val kept = d.agg(sum($"n_kept")).head().getLong(0)
    val total = d.agg(sum($"n_lines")).head().getLong(0)
    assert(kept == distinctLines)
    // non-vacuous at fixture scale: duplicates exist and are removed
    assert(kept < total)
    // ratio is the audited division, bounded and exact at the edges
    val bad = d.where($"keep_ratio" < 0.0 || $"keep_ratio" > 1.0 ||
      ($"n_kept" === $"n_lines" && $"keep_ratio" =!= 1.0)).count()
    assert(bad == 0)
  }

  test("incremental labels: every arriving doc labeled exactly once, " +
      "attachments reconcile with an inline band+jaccard+label rebuild") {
    import org.apache.spark.sql.functions.{broadcast, coalesce}
    val docs = Tables.documents(spark, sf0001)
    val corpusDocs = docs.where($"doc_id" % 10 =!= 0)
    val freshDocs = docs.where($"doc_id" % 10 === 0)
    val got = DedupOps.incrementalLabels(spark, sf0001)
      .as[(Long, Long, Boolean)].collect().toSet
    // one label per arriving doc, no extras
    assert(got.size == freshDocs.count())
    assert(got.map(_._1) == freshDocs.select($"doc_id")
      .as[Long].collect().toSet)
    // unattached docs found their own cluster
    got.filter(!_._3).foreach { case (id, canon, _) =>
      assert(canon == id, s"unattached $id got canonical $canon")
    }
    // independent rebuild: inline capped band join (the q69 spec's
    // device), exact jaccard >= threshold, min corpus canonical
    def ss(d: org.apache.spark.sql.DataFrame) = {
      graft.functions.Functions.register(spark)
      d.where(length($"text") >= 5)
        .select($"doc_id", expr("minhash_sig(lower(text)).ss").as("ss"))
    }
    val corpusBands = DedupOps.capBandBuckets(
      DedupOps.bandFrame(corpusDocs), Seq("band", "key"))
    val cand = DedupOps.bandFrame(freshDocs).as("n")
      .join(corpusBands.as("c"),
        $"n.band" === $"c.band" && $"n.key" === $"c.key")
      .select($"n.doc_id".as("doc_new"), $"c.doc_id".as("doc_corpus"))
      .distinct()
    val verified = cand
      .join(ss(freshDocs).select($"doc_id".as("doc_new"), $"ss".as("sn")),
        "doc_new")
      .join(ss(corpusDocs).select($"doc_id".as("doc_corpus"),
        $"ss".as("sc")), "doc_corpus")
      .withColumn("ni", size(array_intersect($"sn", $"sc")).cast("long"))
      .where($"ni" > 0)
      .where($"ni".cast("double") /
        (size($"sn") + size($"sc") - $"ni").cast("double") >=
          DedupOps.JaccardThreshold)
    val labels = DedupOps.clustersOf(corpusDocs)
      .select($"doc_id".as("doc_corpus"), $"canonical_id")
    val expected = verified
      .join(broadcast(labels), Seq("doc_corpus"), "left")
      .groupBy($"doc_new")
      .agg(min(coalesce($"canonical_id", $"doc_corpus")).as("canon"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (id, canon, attached) =>
      assert(attached == expected.contains(id),
        s"doc $id attachment mismatch")
      if (attached) assert(canon == expected(id),
        s"doc $id canonical $canon != expected ${expected(id)}")
    }
    // non-vacuous at fixture scale: someone attaches
    assert(got.exists(_._3))
  }

  test("near-dup survivor selection reconciles with the q48 labels " +
      "and removes someone") {
    val out = graft.ops.DedupOps.neardupSurvivors(spark, sf0001)
      .collect().map(r => (r.getAs[String]("lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_survivors"),
        r.getAs[Long]("n_removed")))
    // partition per language: survivors + removed == docs
    out.foreach { case (l, d, s, r) => assert(s + r == d, s"lang $l") }
    // totals cover the whole corpus exactly once
    assert(out.map(_._2).sum == Tables.documents(spark, sf0001).count())
    // removed == the non-canonical members q48 labels
    val expectRemoved = graft.ops.DedupOps.dedupClusters(spark, sf0001)
      .where(!$"is_canonical").count()
    assert(out.map(_._4).sum == expectRemoved)
    // non-vacuous at fixture scale: the corpus has near-dup clusters
    assert(expectRemoved > 0)
  }

  test("q78 semantic dedup: groups = connected components of the " +
      "in-bucket cosine graph; keeper = the group's (best_sim, id) argmin") {
    val out = SimilarityOps.semanticDedup(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("group_id"), r.getAs[Long]("keeper_id"),
        r.getAs[Boolean]("is_keeper")))
    assert(out.nonEmpty)
    // independent reference: the q56 assignment gives buckets and
    // centroid sims; units recomputed from the raw table
    val assigned = SimilarityOps.annLloyd(spark, sf0001).cache()
    val fold = "aggregate(zip_with(%s, %s, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), " +
      "(acc, x) -> acc + x)"
    val e = graft.Tables.embeddings(spark, sf0001)
      .withColumn("nrm", sqrt(expr(fold.format("embedding", "embedding"))))
      .withColumn("unit", expr("transform(embedding, x -> CAST(x AS DOUBLE) / nrm)"))
      .join(assigned.select($"vec_id", $"bucket"), "vec_id")
    val a = e.select($"vec_id".as("doc_a"), $"unit".as("ua"), $"bucket")
    val b = e.select($"vec_id".as("doc_b"), $"unit".as("ub"), $"bucket")
    val edges = a.join(b, Seq("bucket"))
      .where($"doc_a" < $"doc_b" &&
        expr("aggregate(zip_with(ua, ub, (x, y) -> x * y), " +
          "CAST(0 AS DOUBLE), (acc, x) -> acc + x)") >=
          SimilarityOps.SemDedupThreshold)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    // driver-side union-find over the (tiny) fixture edge set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    val members = parent.keys.toSeq.groupBy(find)
    val expectGroups = members.map { case (_, ms) => (ms.min, ms.toSet) }
    val gotGroups = out.groupBy(_._2)
      .map { case (g, ms) => (g, ms.map(_._1).toSet) }
    assert(gotGroups == expectGroups.toMap)
    // keeper rule on the reference sims; exactly one keeper per group
    val sims = assigned.select($"vec_id", $"best_sim")
      .as[(Long, Double)].collect().toMap
    out.groupBy(_._2).foreach { case (g, ms) =>
      val keeper = ms.map(_._1).minBy(id => (sims(id), id))
      assert(ms.forall(_._3 == keeper), s"group $g keeper")
      assert(ms.count(_._4) == 1 &&
        ms.find(_._4).get._1 == keeper, s"group $g is_keeper")
      assert(ms.size >= 2, s"group $g has no duplicate partner")
    }
    // non-vacuous: the diversity rule must actually bite somewhere —
    // a keeper that differs from the min-id member (= group_id)
    assert(out.exists(r => r._4 && r._1 != r._2))
    assigned.unpersist()
  }

  test("q96 IVF-PQ: top-3 per vector by ADC, distances non-negative, " +
      "and a SEED neighbor's code reconstructs itself exactly (ADC ≡ " +
      "true squared L2)") {
    val pq = SimilarityOps.annPq(spark, sf0001).cache()
    assert(pq.count() > 0)
    // shape: rn ∈ 1..3, ≤ 3 rows per vec, adc >= 0 (up to fp rounding)
    assert(pq.where($"rn" < 1 || $"rn" > 3).count() == 0)
    assert(pq.groupBy($"vec_id").count().where($"count" > 3).count() == 0)
    assert(pq.where($"adc_dist" < -1e-9).count() == 0)
    // codes: PqM comma-separated ids, each in [0, QuantizerK)
    val codeOk = pq.select($"codes").as[String].collect().forall { c =>
      val ids = c.split(",").map(_.toLong)
      ids.length == SimilarityOps.PqM &&
        ids.forall(i => i >= 0 && i < SimilarityOps.QuantizerK)
    }
    assert(codeOk)
    // a seed vector (vec_id < K) IS a codebook entry in every
    // subspace, so its own code reconstructs it exactly: for pairs
    // whose NEIGHBOR is a seed, ADC must equal the true ||a - b||²
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id".as("neighbor_id"), $"embedding".as("eb"))
    val seedPairs = pq.where($"neighbor_id" < SimilarityOps.QuantizerK)
      .join(e, "neighbor_id")
      .join(Tables.embeddings(spark, sf0001)
        .select($"vec_id", $"embedding".as("ea")), "vec_id")
      .withColumn("true_l2",
        expr("vec_dot(ea, ea) - 2 * vec_dot(ea, eb) + vec_dot(eb, eb)"))
      .select($"adc_dist", $"true_l2").as[(Double, Double)].collect()
    assert(seedPairs.nonEmpty, "buckets must surface some seed neighbor")
    seedPairs.foreach { case (adc, l2) =>
      assert(math.abs(adc - l2) < 1e-9, s"ADC $adc != true L2 $l2")
    }
    pq.unpersist()
  }

  test("q92 containment: bounds, ordering, and containment >= the " +
      "same pair's symmetric jaccard") {
    val c = DedupOps.bigramContainment(spark, sf0001).cache()
    assert(c.count() > 0)
    assert(c.where($"doc_a" >= $"doc_b").count() == 0)
    assert(c.where($"containment" < DedupOps.ContainmentThreshold ||
      $"containment" > 1.0).count() == 0)
    // containment divides the same intersection by the SMALLER set, so
    // wherever q23 also surfaced the pair, containment >= jaccard
    val j = DedupOps.ngramJaccard(spark, sf0001)
      .select($"doc_a", $"doc_b", $"jaccard")
    val both = c.join(j, Seq("doc_a", "doc_b"))
    assert(both.count() > 0)
    assert(both.where($"containment" < $"jaccard").count() == 0)
    c.unpersist()
  }

  test("q92 containment: a doc whose bigrams are a strict subset of " +
      "another's scores exactly 1.0") {
    graft.functions.Functions.register(spark)
    // same (lang, source) block; doc 2's word sequence embeds doc 1's
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en", "s"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s"),
      (3L, "iota kappa lambda mu nu xi", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val bg = docs.select($"doc_id", $"lang", $"source",
        explode(expr("bigram_set(text)")).as("bigram"),
        size(expr("bigram_set(text)")).cast("long").as("n"))
    val inter = bg.as("a").join(bg.as("b"),
        $"a.lang" === $"b.lang" && $"a.source" === $"b.source" &&
          $"a.bigram" === $"b.bigram" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("da"), $"b.doc_id".as("db"),
        $"a.n".as("na"), $"b.n".as("nb"))
      .agg(count(lit(1)).as("ni"))
      .select($"da", $"db",
        ($"ni".cast("double") / least($"na", $"nb").cast("double"))
          .as("containment"))
      .collect()
    assert(inter.length == 1)
    assert(inter.head.getAs[Long]("da") == 1L)
    assert(inter.head.getAs[Double]("containment") == 1.0)
  }

  test("q93 minhash estimation audit: est in {0/8..8/8}, err ≡ " +
      "est − jaccard, candidate set ≡ q21's pairs") {
    val audit = DedupOps.minhashEstError(spark, sf0001).cache()
    val pairs = DedupOps.minhashLsh(spark, sf0001)
      .select($"doc_a", $"doc_b", $"jaccard").cache()
    assert(audit.count() == pairs.count())
    assert(audit.join(pairs, Seq("doc_a", "doc_b"), "left_anti")
      .count() == 0)
    val rows = audit.select($"jaccard", $"est", $"err")
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (j, e, r) =>
      assert(e >= 0.0 && e <= 1.0 && (e * 8.0) == math.rint(e * 8.0),
        s"est $e is not a multiple of 1/8")
      assert(r == e - j, s"err $r != est - jaccard ${e - j}")
    }
    // a banded candidate shares at least one 4-slice band, so est >= 1/2
    // of that band's fraction — concretely n_eq >= 0 is trivial, but at
    // least ONE pair must have full agreement on some band: est >= 0.5
    // for identical docs; non-vacuity: some est > 0
    assert(rows.exists(_._2 > 0.0))
    audit.unpersist(); pairs.unpersist()
  }

}

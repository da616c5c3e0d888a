package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CharStatsKernels
import graft.ops.{CorpusOps, DedupOps, StatsOps}

/** Round-12 corpus-index family: postings (q81), term lift (q82),
  * funnel (q83), dup-graph degree (q84), char diversity (q85), dup
  * n-gram rate (q86). */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- q81

  test("q81 postings: df >= 2, previews sorted ascending and capped at K") {
    val p = CorpusOps.postings(spark, sf0001).cache()
    assert(p.where($"df" < 2).count() == 0)
    val rows = p.select($"df", $"postings").as[(Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (df, postings) =>
      val ids = postings.split(",").map(_.toLong).toSeq
      assert(ids == ids.sorted, s"unsorted preview: $postings")
      assert(ids.size == math.min(df, CorpusOps.PostingPreviewK.toLong),
        s"preview size ${ids.size} for df=$df")
    }
    p.unpersist()
  }

  test("q81 postings: the preview is exactly the K SMALLEST doc_ids " +
      "of the word's full posting set") {
    val word = CorpusOps.postings(spark, sf0001)
      .where($"df" > CorpusOps.PostingPreviewK)
      .orderBy($"word").select($"word", $"postings")
      .as[(String, String)].head()
    val expected = Tables.documents(spark, sf0001)
      .select($"doc_id",
        explode(array_distinct(
          filter(split(lower($"text"), "[^a-z]+"), w => w =!= "")))
          .as("w"))
      .where($"w" === word._1)
      .select($"doc_id").as[Long].collect().sorted
      .take(CorpusOps.PostingPreviewK)
    assert(word._2.split(",").map(_.toLong).toSeq == expected.toSeq)
  }

  // ---------------------------------------------------------------- q82

  test("q82 term lift: pair ordering, support floor, per-word top-k cap") {
    val l = CorpusOps.termLift(spark, sf0001).cache()
    assert(l.count() > 0)
    assert(l.where($"w1" >= $"w2").count() == 0, "pairs must be w1 < w2")
    assert(l.where($"n_ab" < CorpusOps.LiftPairMin).count() == 0)
    assert(l.where($"lift" <= 0.0).count() == 0)
    val perW1 = l.groupBy($"w1").agg(count(lit(1)).as("n"))
      .where($"n" > CorpusOps.LiftTopK).count()
    assert(perW1 == 0, s"some w1 exceeds top-${CorpusOps.LiftTopK}")
    // rn is a 1..k prefix per w1 (rank regression guard)
    val bad = l.groupBy($"w1")
      .agg(sort_array(collect_list($"rn")).as("rns"), count(lit(1)).as("n"))
      .where(expr("rns <> sequence(1L, n)")).count()
    assert(bad == 0)
    l.unpersist()
  }

  // ---------------------------------------------------------------- q83

  test("q83 funnel: stages require strict temporal order over the " +
      "previous stage's FIRST occurrence") {
    def ts(sec: Int) = new Timestamp(sec * 1000L)
    val events = Seq(
      // u1: full ordered funnel
      (1L, ts(1), 10L, "view"), (1L, ts(2), 11L, "click"),
      (1L, ts(3), 12L, "purchase"),
      // u2: click only BEFORE first view -> stops at view
      (2L, ts(1), 20L, "click"), (2L, ts(2), 21L, "view"),
      // u3: purchase without any click -> stops at view
      (3L, ts(1), 30L, "view"), (3L, ts(2), 31L, "purchase"),
      // u4: no view at all -> none
      (4L, ts(1), 40L, "click"), (4L, ts(2), 41L, "purchase"),
      // u5: click at the SAME ts as first view does not count (strict >)
      (5L, ts(1), 50L, "view"), (5L, ts(1), 51L, "click"),
      // u6: purchase strictly after a click that is strictly after view
      (6L, ts(1), 60L, "view"), (6L, ts(2), 61L, "click"),
      (6L, ts(2), 62L, "purchase"), // same ts as click -> not counted
      (6L, ts(3), 63L, "purchase")  // this one counts
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = StatsOps.funnelStagesOf(events)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "purchase" -> 2L, // u1, u6
      "view" -> 3L,     // u2, u3, u5
      "none" -> 1L))    // u4
  }

  test("q83 funnel on sf data: stage counts partition the user base") {
    val f = StatsOps.funnelStages(spark, sf0001)
      .as[(String, Long)].collect().toMap
    val users = Tables.events(spark, sf0001)
      .select($"user_id").distinct().count()
    assert(f.values.sum == users)
    assert(f.keySet.subsetOf(Set("view", "click", "purchase", "none")))
  }

  // ---------------------------------------------------------------- q84

  test("q84 degree histogram: mass balances the corpus and the edge set") {
    val h = DedupOps.dupGraphDegree(spark, sf0001).cache()
    val nDocs = Tables.documents(spark, sf0001).count()
    val counts = h.as[(Long, Long)].collect()
    assert(counts.map(_._2).sum == nDocs,
      "every doc appears in exactly one degree bucket")
    // sum of degrees = 2 * |edges| -> even
    val degreeMass = counts.map { case (d, n) => d * n }.sum
    assert(degreeMass % 2 == 0, s"odd total degree $degreeMass")
    assert(counts.exists { case (d, n) => d > 0 && n > 0 },
      "self-similar synthetic corpus must produce at least one edge")
    h.unpersist()
  }

  // ---------------------------------------------------------------- q85

  test("q85 kernel: exact integer moments, ASCII fold, multibyte skip") {
    def k(s: String) = {
      val a = CharStatsKernels.alnumSq(UTF8String.fromString(s))
      (a.getLong(0), a.getLong(1))
    }
    assert(k("aabb") == (4L, 8L))
    assert(k("") == (0L, 0L))
    assert(k("aA1") == (3L, 5L))          // a:2 -> 4, 1:1 -> 1
    assert(k("áb") == (1L, 1L))      // á is multibyte: skipped
    assert(k("zzzz") == (4L, 16L))        // single-char doc: sq = n²
    assert(k("a b\nc!") == (3L, 3L))      // separators dropped
  }

  test("q85 diversity: agrees with the explode-chars reference " +
      "computation and a single-char doc scores 0") {
    val got = CorpusOps.charDiversity(spark, sf0001).cache()
    assert(got.where($"diversity" < 0.0 || $"diversity" >= 1.0).count() == 0)
    // engine-internal cross-check: same moments via explode (the slow
    // plan q85's kernel replaces)
    val ref = Tables.documents(spark, sf0001)
      .select($"doc_id", explode(split(
        regexp_replace(lower($"text"), "[^a-z0-9]", ""), "")).as("c"))
      .where($"c" =!= "")
      .groupBy($"doc_id", $"c").agg(count(lit(1)).as("n"))
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_alnum"), sum($"n" * $"n").as("sq_sum"))
    val joined = got.alias("g")
      .join(ref.alias("r"), "doc_id")
      .where(col("g.n_alnum") =!= col("r.n_alnum") ||
        col("g.sq_sum") =!= col("r.sq_sum"))
    assert(joined.count() == 0, "kernel and explode moments disagree")
    assert(got.count() == ref.count())
    got.unpersist()
  }

  test("q85 plan: ZERO exchanges, whole-stage codegen, and the kernel " +
      "appears exactly ONCE (no filter-pushdown duplication)") {
    val plan = CorpusOps.charDiversity(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // '*(n)' is the executed-plan marker for a codegen stage
    assert(plan.contains("*(1)"), s"not codegen'd:\n$plan")
    val kernelCalls = "alnumsqstats".r.findAllIn(plan).size
    assert(kernelCalls == 1,
      s"kernel evaluated $kernelCalls times in the plan:\n$plan")
  }

  test("q85 empty-alnum docs score NULL diversity, not a dropped row " +
      "or a division error") {
    val docs = Seq((1L, "abc"), (2L, "!!! ???"), (3L, ""))
      .toDF("doc_id", "text")
    val got = CorpusOps.charDiversityOf(docs)
      .select($"doc_id", $"n_alnum", $"diversity")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got(1L)._1 == 3L && got(1L)._2.isDefined)
    assert(got(2L) == ((0L, None)))
    assert(got(3L) == ((0L, None)))
  }

  // ---------------------------------------------------------------- q86

  test("q86 dup n-gram rate: a shared 5-gram marks both docs, " +
      "unshared grams stay clean") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five")
    ).toDF("doc_id", "text")
    val got = CorpusOps.dupNgramRateOf(docs)
      .select($"doc_id", $"n_grams", $"n_dup", $"dup_rate")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs 1/2: 2 grams each, exactly one shared ("alpha ... epsilon")
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((1L, 0L, 0.0)))
  }

  test("q86 on sf data: rates well-formed, short docs excluded, " +
      "repeated gram INSTANCES all count") {
    val r = CorpusOps.dupNgramRate(spark, sf0001).cache()
    assert(r.where($"n_dup" > $"n_grams").count() == 0)
    assert(r.where($"dup_rate" < 0.0 || $"dup_rate" > 1.0).count() == 0)
    val shortDocs = Tables.documents(spark, sf0001)
      .where(size(filter(split(lower($"text"), "[^a-z]+"),
        w => w =!= "")) < CorpusOps.DupNgramN)
      .count()
    assert(r.count() ==
      Tables.documents(spark, sf0001).count() - shortDocs)
    r.unpersist()
  }

  // ---------------------------------------------------------------- q87

  test("q87 confusion matrix: cells partition the corpus and the " +
      "diagonal equals q26's correct count") {
    val m = graft.ops.TextOps.langIdConfusion(spark, sf0001).cache()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(m.agg(sum($"n_docs")).as[Long].head() == nDocs)
    val diag = m.where($"lang" === $"pred_lang")
      .agg(coalesce(sum($"n_docs"), lit(0L))).as[Long].head()
    val correct = graft.ops.TextOps.langId(spark, sf0001)
      .where($"correct").count()
    assert(diag == correct)
    m.unpersist()
  }

  // ---------------------------------------------------------------- q88

  test("q88 quality gate: verdicts partition the corpus; too_short " +
      "fires on the sf corpus short tail") {
    val g = CorpusOps.qualityGate(spark, sf0001).cache()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(g.agg(sum($"n_docs")).as[Long].head() == nDocs)
    val verdicts = g.select($"verdict").as[String].collect().toSet
    assert(verdicts.subsetOf(
      Set("keep", "too_short", "low_diversity", "digit_heavy")))
    assert(verdicts.contains("keep"))
    assert(verdicts.contains("too_short"),
      "sf0.001 has 26 docs under the token floor")
    g.unpersist()
  }

  test("q88 first-fail ordering: each rule catches its document, " +
      "earlier rules shadow later ones") {
    val docs = Seq(
      // 1: only 3 tokens -> too_short (even though also digit-heavy)
      (1L, "ab cd 99999999"),
      // 2: 16 tokens, single letter -> low_diversity
      (2L, Seq.fill(16)("a").mkString(" ")),
      // 3: 16 diverse words + enough digits -> digit_heavy
      (3L, "the quick brown fox jumps over the lazy dog while five " +
        "wizards mix juice quietly 0123456789 0123456789 0123456789 " +
        "0123456789"),
      // 4: ordinary diverse prose -> keep
      (4L, "the quick brown fox jumps over the lazy dog while five " +
        "wizards mix their juice quietly and everyone watches")
    ).toDF("doc_id", "text")
    val got = CorpusOps.qualityGateOf(docs)
      .select($"verdict", $"n_docs").as[(String, Long)].collect().toMap
    assert(got == Map("too_short" -> 1L, "low_diversity" -> 1L,
      "digit_heavy" -> 1L, "keep" -> 1L))
  }

  test("q86 instance counting: a gram occurring twice in the same doc " +
      "contributes BOTH instances once it is duplicated elsewhere") {
    val docs = Seq(
      (1L, "a b c d e a b c d e"), // "a b c d e" twice + bridging grams
      (2L, "a b c d e x")
    ).toDF("doc_id", "text")
    val got = CorpusOps.dupNgramRateOf(docs)
      .where($"doc_id" === 1L)
      .select($"n_grams", $"n_dup").as[(Long, Long)].head()
    // doc1 has 6 grams; the two "a b c d e" instances are dup'd via doc2
    assert(got._1 == 6L)
    assert(got._2 == 2L)
  }

  // ---------------------------------------------------------------- q94

  test("q94 cohort retention: day-0 row per cohort counts the whole " +
      "cohort, offsets non-negative, actives never exceed cohort size") {
    val r = StatsOps.cohortRetention(spark, sf0001).cache()
    assert(r.count() > 0)
    assert(r.where($"day_offset" < 0).count() == 0)
    // day 0 of each cohort = every member was active that day (it IS
    // their first day), so n_active(offset 0) = cohort size, and every
    // later offset's actives <= cohort size
    val day0 = r.where($"day_offset" === 0)
      .select($"cohort_day", $"n_active".as("cohort_size"))
    assert(day0.count() ==
      r.select($"cohort_day").distinct().count())
    val overflow = r.join(day0, "cohort_day")
      .where($"n_active" > $"cohort_size")
    assert(overflow.count() == 0)
    // total day-0 mass = all users exactly once
    val users = Tables.events(spark, sf0001)
      .select($"user_id").distinct().count()
    assert(day0.agg(sum($"cohort_size")).as[Long].head() == users)
    r.unpersist()
  }

  // ---------------------------------------------------------------- q97

  test("q97 source sample: exactly K per source (or all of a smaller " +
      "source), ranks contiguous, deterministic, and not id-ordered") {
    val smp = CorpusOps.sourceSample(spark, sf0001).cache()
    val perSrc = Tables.documents(spark, sf0001)
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val bad = smp.groupBy($"source")
      .agg(count(lit(1)).as("k"), max($"rank").as("mx"),
        min($"rank").as("mn"))
      .join(perSrc, "source")
      .where($"k" =!= least($"n", lit(CorpusOps.SampleK.toLong)) ||
        $"mn" =!= 1 || $"mx" =!= $"k")
    assert(bad.count() == 0)
    // reproducible draw
    val again = CorpusOps.sourceSample(spark, sf0001)
    assert(smp.except(again).count() == 0 && again.except(smp).count() == 0)
    // the sample is md5-ordered, not doc_id-ordered: somewhere rank
    // order must disagree with ascending doc_id
    val disorder = smp.as[(String, Long, Long, String)].collect()
      .groupBy(_._1).values.exists { rows =>
        val ids = rows.sortBy(_._2).map(_._3).toSeq
        ids != ids.sorted
      }
    assert(disorder, "sample degenerated to doc_id order")
    smp.unpersist()
  }

  // ---------------------------------------------------------------- q95

  test("q95 source similarity: full upper triangle, cos² bounds, and " +
      "a duplicated source scores cos² = 1 against itself") {
    val m = CorpusOps.sourceSimilarity(spark, sf0001).cache()
    val nSrc = Tables.documents(spark, sf0001)
      .select($"source").distinct().count()
    // the synthetic sources share the tiny vocabulary, so every pair
    // shares at least one profile term -> complete upper triangle
    assert(m.count() == nSrc * (nSrc - 1) / 2)
    assert(m.where($"src_a" >= $"src_b").count() == 0)
    assert(m.where($"cos2" <= 0.0 || $"cos2" > 1.0000000001).count() == 0)
    m.unpersist()
  }

  test("q95 profile cap: no source carries more than SrcTermsK terms " +
      "and identical term profiles give cos² exactly 1") {
    // hand corpus: s1 and s2 identical text (identical profiles),
    // s3 disjoint vocabulary -> no s3 pairs survive the word join
    val docs = Seq(
      (1L, "alpha beta beta gamma", "en", "s1"),
      (2L, "alpha beta beta gamma", "en", "s2"),
      (3L, "delta epsilon zeta", "en", "s3"))
      .toDF("doc_id", "text", "lang", "source")
    val tf = docs.select($"source",
        explode(split(lower($"text"), "[^a-z]+")).as("word"))
      .where($"word" =!= "")
      .groupBy($"source", $"word").agg(count(lit(1)).as("tf"))
    val norms = tf.groupBy($"source").agg(sum($"tf" * $"tf").as("sq"))
    val dots = tf.as("a").join(tf.as("b"),
        col("a.word") === col("b.word") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
    val got = dots
      .join(norms.select($"source".as("src_a"), $"sq".as("sq_a")), "src_a")
      .join(norms.select($"source".as("src_b"), $"sq".as("sq_b")), "src_b")
      .select($"src_a", $"src_b",
        (($"dot".cast("double") * $"dot".cast("double")) /
          ($"sq_a".cast("double") * $"sq_b".cast("double"))).as("cos2"))
      .as[(String, String, Double)].collect()
    assert(got.toSeq == Seq(("s1", "s2", 1.0)))
    // cap property on the real corpus
    val over = CorpusOps.sourceSimilarity(spark, sf0001)
    val profSizes = Tables.documents(spark, sf0001)
      .select($"source",
        explode(filter(split(lower($"text"), "[^a-z]+"), w => w =!= ""))
          .as("word"))
      .groupBy($"source").agg(countDistinct($"word").as("nw"))
      .as[(String, Long)].collect()
    // vocabulary is far below the cap at sf0.001 — the cap must not
    // have dropped any term (dot over full profiles ⇒ cos2 for the
    // duplicated-text hand case above is the uncapped value)
    assert(profSizes.forall(_._2 <= CorpusOps.SrcTermsK))
    assert(over.count() > 0)
  }

  // ---------------------------------------------------------------- q100

  test("q100 dup spans: planted passages produce exact merged spans; " +
      "unique text produces none; within-doc repeats split on the gap") {
    // 10 shared tokens — the [a-z]+ tokenizer keeps them whole
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two $passage three four"),      // passage at pos 3..12
      (2L, s"$passage five six seven eight"),    // passage at pos 1..10
      (3L, "plainly unique words that never repeat anywhere in this corpus"),
      (4L, s"$passage filler $passage"))         // copies at 1..10 and 12..21
      .toDF("doc_id", "text")
    val got = CorpusOps.dupSpansOf(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 12L, 10L),
      (2L, 1L, 10L, 10L),
      (4L, 1L, 10L, 10L), (4L, 12L, 21L, 10L)))
  }

  test("q100 spans at sf0.001: disjoint with a real gap, arithmetic " +
      "consistent, never narrower than the window") {
    val spans = CorpusOps.dupSpans(spark, sf0001)
      .orderBy($"doc_id", $"span_start")
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.nonEmpty)
    spans.foreach { case (_, s, e, n) =>
      assert(n == e - s + 1)
      assert(n >= CorpusOps.DupSpanW)
    }
    spans.toSeq.groupBy(_._1).values.foreach { perDoc =>
      perDoc.sliding(2).foreach {
        case Seq((_, _, e1, _), (_, s2, _, _)) =>
          // maximal merge: consecutive spans are separated by >= 1
          // uncovered token, else they would be one island
          assert(s2 > e1 + 1, s"overlapping/adjacent spans: $perDoc")
        case _ =>
      }
    }
  }

  // ---------------------------------------------------------------- q103

  test("q103 novelty: a verbatim re-crawl scores 0, its original 1") {
    val t = "alpha beta gamma delta epsilon zeta"
    val docs = Seq((10L, t), (20L, t),
      (30L, "plainly unique words appearing nowhere else at all"))
      .toDF("doc_id", "text")
    val got = CorpusOps.gramNoveltyOf(docs)
      .select($"doc_id", $"novelty_rate").as[(Long, Double)]
      .collect().toMap
    assert(got(10L) == 1.0)
    assert(got(20L) == 0.0)
    assert(got(30L) == 1.0)
  }

  test("q103 at sf0.001: rates bounded, gram mass identical to q86, " +
      "novel mass equals first-doc attribution") {
    val nov = CorpusOps.gramNovelty(spark, sf0001).cache()
    assert(nov.where($"novelty_rate" < 0.0 || $"novelty_rate" > 1.0 ||
      $"n_novel" > $"n_grams").count() == 0)
    // same tokenizer + same N ⇒ per-doc instance mass must agree with
    // q86's n_grams column exactly (cross-operator consistency)
    val q86 = CorpusOps.dupNgramRate(spark, sf0001)
      .select($"doc_id", $"n_grams".as("g86"))
    assert(nov.join(q86, "doc_id")
      .where($"n_grams" =!= $"g86").count() == 0)
    // every gram's instances in its FIRST doc are novel by definition:
    // corpus-wide novel mass > 0 and < total mass (sf0.001 has dups)
    val (tot, novl) = nov
      .agg(sum($"n_grams"), sum($"n_novel")).as[(Long, Long)].head()
    assert(novl > 0 && novl < tot)
    nov.unpersist()
  }
}

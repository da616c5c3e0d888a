package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Tokenizer/sort/TF properties (SURVEY.md §5.2-5.3). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("natural sort: src2 ranks before src10") {
    val ranks = TextOps.naturalSort(spark, sf0001)
      .select($"source", $"natural_rank")
      .as[(String, Long)].collect().toMap
    assert(ranks("src2") < ranks("src10"))
    assert(ranks("src9") < ranks("src11"))
  }

  test("natural key compares EVERY digit run, matching the reference's " +
    "re.split list key (04_convert_contracts_to_text.py:51-54)") {
    val names = Seq("p2_x10", "p2_x9", "p10_x1", "doc10", "doc-2", "Doc3")
    val sorted = names.toDF("source")
      .orderBy(TextOps.naturalKey($"source"), $"source")
      .as[String].collect().toSeq
    // Python: key('doc-2')=['doc-',2,''] > key('doc10')=['doc',10,'']
    // because 'doc' < 'doc-'; p2_x9 < p2_x10 needs the SECOND run.
    assert(sorted == Seq("Doc3", "doc10", "doc-2", "p2_x9", "p2_x10", "p10_x1"))
  }

  test("tokenizer drops empty tokens and non-letters") {
    val toks = Seq("a-b  c!! d").toDF("text")
      .select(explode(expr(
        "filter(split(lower(text), '[^a-z]+'), w -> w <> '')")).as("w"))
      .as[String].collect().toSeq
    assert(toks == Seq("a", "b", "c", "d"))
  }

  test("TF is invariant under document concatenation order") {
    graft.functions.Functions.register(spark)
    val df1 = Seq("spark join spark").toDF("t")
    val df2 = Seq("join spark spark").toDF("t")
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select(graft.functions.Functions
        .countOccurrences($"t", lit("spark")).as("h"))
        .head().getLong(0)
    assert(hits(df1) == hits(df2))
    assert(hits(df1) == 2L)
  }

  test("doc rank is a permutation: every doc exactly once, ranks 1..n") {
    val r = TextOps.docRank(spark, sf0001)
    val n = r.count()
    assert(r.select("doc_id").distinct().count() == n)
    val ranks = r.select("rank").as[Long].collect().sorted
    // full-sequence check: endpoints alone would accept duplicate
    // middle ranks (e.g. a row_number -> rank() regression on ties)
    assert(ranks.toSeq == (1L to n))
  }

  test("pivot zero-fill activates when a pivot value is absent for a key") {
    // synthetic frame: user 2 has no 'b' events — the q43 fill path
    // (dormant on the dense sf corpus) must yield 0, not null
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("user_id", "event_type")
    val wide = df.groupBy($"user_id")
      .pivot("event_type", Seq("a", "b"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("a", "b"))
    val u2 = wide.where($"user_id" === 2L).head()
    assert(u2.getAs[Long]("a") == 1L)
    assert(u2.getAs[Long]("b") == 0L)
  }

  test("boilerplate ratios are well-formed and the rule actually " +
      "fires on the self-similar corpus") {
    val b = TextOps.boilerplate(spark, sf0001).cache()
    assert(b.where($"boiler_ratio" < 0.0 || $"boiler_ratio" > 1.0)
      .count() == 0)
    assert(b.where($"n_boiler" > $"n_shingles").count() == 0)
    // the synthetic corpus reuses template phrasing across docs at
    // sub-sentence granularity — word 5-grams span ≥ BoilerMinDocs
    // docs at every SF, so a detector that never fires would be
    // vacuous (this assertion is the non-vacuity guard)
    assert(b.where($"n_boiler" > 0).count() > 0)
    b.unpersist()
  }

  test("boilerplate flags a shingle shared by BoilerMinDocs synthetic " +
      "docs and not a shingle unique to one") {
    // three docs share one exact 5-word run; each also has unique tail
    val shared = "the quick brown fox jumps"
    val docs = Seq(
      (1L, s"$shared over a lazy dog"),
      (2L, s"$shared under a red fence"),
      (3L, s"$shared beside a tall tree"),
      (4L, "entirely different words live in this document here"),
      (5L, "too short"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("boiler").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val b = TextOps.boilerplate(spark, tmp)
    val byDoc = b.collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(byDoc(1L).getAs[Long]("n_boiler") > 0)
    assert(byDoc(2L).getAs[Long]("n_boiler") > 0)
    assert(byDoc(3L).getAs[Long]("n_boiler") > 0)
    assert(byDoc(4L).getAs[Long]("n_boiler") == 0L)
    // full-coverage row-set contract: a doc shorter than the shingle
    // width still appears — (0, 0, null), never silently dropped
    assert(byDoc(5L).getAs[Long]("n_shingles") == 0L)
    assert(byDoc(5L).getAs[Long]("n_boiler") == 0L)
    assert(byDoc(5L).isNullAt(byDoc(5L).fieldIndex("boiler_ratio")))
  }

  test("contamination flags corpus docs sharing an eval 8-gram and " +
      "only those") {
    // corpus overlap exists at sf0.001 (6 contaminated docs) — a
    // detector that never fires would be vacuous
    val c = TextOps.contamination(spark, sf0001)
    assert(c.count() > 0)
    assert(c.where($"doc_id" < TextOps.ContamEvalMaxId).count() == 0)
    assert(c.where($"n_shared" <= 0).count() == 0)
    // synthetic: doc 100 lifts an 8-word run from eval doc 1; doc 101
    // shares only a 7-word run — one word short of the threshold
    val run = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, s"eval doc with $run inside it"),
      (100L, s"training doc copying $run verbatim"),
      // neighbors ('has' / 'broken') differ from eval's ('with' /
      // 'hotel'), so no 8-gram forms around the 7-word run
      (101L, s"training doc has alpha bravo charlie delta echo " +
        "foxtrot golf broken here"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("contam").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.contamination(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(got.contains(100L) && got(100L) >= 1L)
    assert(!got.contains(101L))
  }

  test("det split matches an independent md5-bucket computation and " +
      "covers every doc exactly once") {
    val got = TextOps.detSplit(spark, sf0001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("split")) ->
        r.getAs[Long]("n_docs")).toMap
    // independent oracle: JDK MessageDigest, not Spark's md5
    def bucket(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.take(2).map("%02x".format(_)).mkString
      Integer.parseInt(hex, 16) % 100
    }
    def split(id: Long): String = {
      val b = bucket(id)
      if (b < TextOps.SplitTrainPct) "train"
      else if (b < TextOps.SplitValPct) "val" else "test"
    }
    val expected = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang").collect()
      .map(r => (r.getAs[String]("lang"), split(r.getAs[Long]("doc_id"))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == expected)
    assert(got.values.sum ==
      Tables.documents(spark, sf0001).count())
    // all three splits materialize at this corpus size
    assert(got.keys.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("salient terms rank a doc's rare repeated word above ubiquitous " +
      "fillers") {
    val docs = Seq(
      (1L, "apple apple apple common common"),
      (2L, "common banana"),
      (3L, "common cherry cherry"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("salient").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val top = TextOps.salientTerms(spark, tmp).where($"rn" === 1L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("word"))
      .toMap
    // tf/df: apple 3/1=3 beats common 2/3; cherry 2/1 beats common 1/3
    assert(top == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
  }

  test("token budget keeps a per-lang prefix: under budget, maximal, " +
      "and deterministic in md5 order") {
    val kept = TextOps.tokenBudget(spark, sf0001).cache()
    // every language truncates at this corpus size — both branches live
    val langs = Tables.documents(spark, sf0001)
      .select("lang").distinct().count()
    assert(kept.select("lang").distinct().count() == langs)
    assert(kept.count() > 0)
    assert(kept.where($"cum_tokens" > TextOps.BudgetTokensPerLang)
      .count() == 0)
    // maximality: per lang, adding the NEXT doc in md5 order would
    // break the budget ⇔ kept tokens + min dropped-doc tokens > budget
    // (checked via the kept count vs a recomputed running sum)
    val perLang = kept.groupBy($"lang")
      .agg(org.apache.spark.sql.functions.max($"cum_tokens").as("used"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("used"), r.getAs[Long]("n"))).toMap
    val all = Tables.documents(spark, sf0001)
      .withColumn("n_tokens", org.apache.spark.sql.functions
        .size(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim($"text"), " +")).cast("long"))
      .withColumn("ord", org.apache.spark.sql.functions
        .md5($"doc_id".cast("string")))
      .select($"lang", $"ord", $"doc_id", $"n_tokens")
      .collect()
      .groupBy(_.getAs[String]("lang"))
    all.foreach { case (lang, rows) =>
      val sorted = rows.sortBy(r =>
        (r.getAs[String]("ord"), r.getAs[Long]("doc_id")))
      var cum = 0L; var n = 0L
      sorted.foreach { r =>
        cum += r.getAs[Long]("n_tokens")
        if (cum <= TextOps.BudgetTokensPerLang) n += 1
      }
      val expectUsed = sorted.map(_.getAs[Long]("n_tokens"))
        .scanLeft(0L)(_ + _).drop(1)
        .takeWhile(_ <= TextOps.BudgetTokensPerLang)
      assert(perLang(lang)._2 == n, s"lang $lang kept count")
      assert(perLang(lang)._1 == expectUsed.last, s"lang $lang used")
    }
    kept.unpersist()
  }

  test("repetition ratio is (0,1] and a fully-repeated doc scores 1") {
    val r = TextOps.repetition(spark, sf0001)
    assert(r.where($"rep_ratio" <= 0.0 || $"rep_ratio" > 1.0).count() == 0)
    // synthetic single-doc check through the same pipeline shape
    val one = Seq((1L, "spam spam spam spam")).toDF("doc_id", "text")
      .withColumn("ws",
        expr("filter(split(lower(text), '[^a-z]+'), w -> w <> '')"))
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .as("bigram"))
      .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg((max($"c").cast("double") / sum($"c").cast("double"))
        .as("rep_ratio"))
    assert(one.head().getDouble(1) == 1.0)
  }

  test("subject extraction snippet starts at the matched keyword") {
    val snips = TextOps.subjectExtract(spark, sf0001)
      .select("snippet").as[String].collect()
    assert(snips.nonEmpty)
    assert(snips.forall(_.startsWith("order")))
  }

  test("chunk windows match an independent recomputation exactly: " +
    "every token covered, stride overlap, short tail chunk kept") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(docs.nonEmpty)
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.trim.split(" +").toSeq
      val maxStart =
        math.max(toks.length - 1 - TextOps.ChunkOverlap, 0)
      val starts = 0 to maxStart by TextOps.ChunkStride
      starts.map { st =>
        val chunk = toks.slice(st, st + TextOps.ChunkTokens)
        (id, (st / TextOps.ChunkStride).toLong, chunk.length.toLong,
          chunk.mkString(" "))
      }
    }.toSet
    // at least one doc must actually exercise the overlap (≥ 2 chunks)
    assert(expected.exists(_._2 >= 1L))
    val got = TextOps.chunkWindows(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expected)
    // every token is covered (last chunk reaches the doc's end) and
    // every chunk past the first adds tokens its predecessor did not
    // cover (no fully-contained duplicate tail chunk)
    docs.foreach { case (id, text) =>
      val n = text.trim.split(" +").length.toLong
      val chunks = got.filter(_._1 == id).toSeq.sortBy(_._2)
      val ends = chunks.map(c =>
        c._2 * TextOps.ChunkStride + c._3) // start + len
      assert(ends.last == n)
      ends.sliding(2).foreach {
        case Seq(a, b) => assert(b > a)
        case _         =>
      }
    }
  }

  test("mixture weights match an independent sqrt-temperature " +
      "recomputation bit-for-bit and form a distribution") {
    val counts = Tables.documents(spark, sf0001)
      .groupBy($"lang").count()
      .as[(String, Long)].collect().sortBy(_._1)
    // same addition order as the windowed normalizer: language order
    var denom = 0.0
    counts.foreach { case (_, n) => denom += math.sqrt(n.toDouble) }
    val expected = counts.map { case (lang, n) =>
      (lang, n, math.sqrt(n.toDouble) / denom)
    }.toSet
    val got = TextOps.mixtureWeights(spark, sf0001)
      .as[(String, Long, Double)].collect().toSet
    assert(got == expected) // exact equality — sqrt/ordered-sum/div only
    val ws = got.toSeq.map(_._3)
    assert(ws.forall(w => w > 0 && w < 1))
    assert(math.abs(ws.sum - 1.0) < 1e-9)
    // temperature flattens: rarest lang gains share, commonest loses
    val byCount = got.toSeq.sortBy(_._2)
    val total = counts.map(_._2).sum.toDouble
    assert(byCount.head._3 > byCount.head._2 / total)
    assert(byCount.last._3 < byCount.last._2 / total)
  }

  test("mixture sample matches an independent closed-form recomputation " +
      "exactly, and each lang's emitted total is within n_l of target") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val counts = docs.groupBy(_._2).map { case (l, d) => l -> d.length.toLong }
    val langs = counts.keys.toSeq.sorted
    var denom = 0.0
    langs.foreach(l => denom += math.sqrt(counts(l).toDouble))
    val total = docs.length.toLong
    val epochs = langs.map { l =>
      val w = math.sqrt(counts(l).toDouble) / denom
      l -> (w * (total * TextOps.MixtureOversample).toDouble /
        counts(l).toDouble)
    }.toMap
    def copies(id: Long, lang: String): Long = {
      val hv = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16)
      val e = epochs(lang)
      val extra =
        if (hv.toDouble / 4294967296.0 < e - math.floor(e)) 1L else 0L
      math.min(math.floor(e).toLong + extra, TextOps.MaxEpochs)
    }
    val expect = docs.groupBy(_._2).map { case (l, ds) =>
      val cs = ds.map(d => copies(d._1, l))
      (l, cs.count(_ > 0).toLong, cs.sum, epochs(l))
    }.toSet
    val got = TextOps.mixtureSample(spark, sf0001)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == expect) // exact — epochs doubles included
    // deterministic Bernoulli bound: each doc emits floor(e) or
    // ceil(e) copies, so the lang total sits within n_l of w_l·B
    got.foreach { case (l, _, emitted, e) =>
      assert(math.abs(emitted - e * counts(l)) <= counts(l), s"lang $l")
    }
    // the fractional rule must bite: some lang emits strictly between
    // n·floor(e) and n·ceil(e) — both branches of the Bernoulli taken
    assert(got.exists { case (l, _, emitted, e) =>
      val bern = emitted - counts(l) * math.floor(e).toLong
      bern > 0 && bern < counts(l)
    })
  }

  test("chunk boundary lengths: docs in the dead zone (stride < n ≤ " +
      "stride + overlap) yield ONE chunk, one past it yields two") {
    // 30 tokens sits between stride 24 and stride+overlap 32: a chunk
    // at start 24 would cover tokens 25-30, all inside chunk 0 — the
    // fully-contained duplicate the start rule must not emit
    def doc(n: Int) = (n.toLong, (1 to n).map("t" + _).mkString(" "))
    val docs = Seq(8, 24, 25, 30, 32, 33, 56, 57).map(doc)
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("chunks").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val byDoc = TextOps.chunkWindows(spark, tmp).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.length).toMap
    assert(byDoc == Map(8L -> 1, 24L -> 1, 25L -> 1, 30L -> 1,
      32L -> 1, 33L -> 2, 56L -> 2, 57L -> 3))
  }

  test("sequence packing matches an independent concatenate-and-cut " +
    "recomputation and the bins partition the corpus token-exactly") {
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(v: String): String =
      md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.toSeq
      .map { case (id, lang, text) =>
        (lang, md5hex(id.toString), id,
          text.trim.split(" +").length.toLong)
      }
      .groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
        var cum = 0L
        rows.sortBy(r => (r._2, r._3)).map { r =>
          val bin = cum / TextOps.PackBudget
          cum += r._4
          (lang, bin, r._4)
        }
      }
      .groupBy(r => (r._1, r._2)).map { case ((lang, bin), rs) =>
        (lang, bin, rs.size.toLong, rs.map(_._3).sum)
      }.toSet
    val got = TextOps.sequencePack(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // partition property: nothing truncated — bin tokens sum to corpus
    val corpusTokens =
      docs.map(_._3.trim.split(" +").length.toLong).sum
    assert(got.toSeq.map(_._4).sum == corpusTokens)
  }
  test("pii scrub: clean docs keep their exact text fingerprint, " +
      "decorated docs redact to the typed placeholders") {
    import java.security.MessageDigest
    def md5hex(x: String): String =
      MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val out = graft.ops.TextOps.piiScrub(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    val texts = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // counts follow the decoration rule exactly
    out.values.foreach { case (id, ne, np, ni, nr, _) =>
      assert(ne == (if (id % 3 == 0) 1 else 0), s"doc $id email")
      assert(np == (if (id % 4 == 0) 1 else 0), s"doc $id phone")
      assert(ni == (if (id % 5 == 0) 1 else 0), s"doc $id ip")
      assert(nr == ne + np + ni)
    }
    // a clean doc (no decoration) is byte-identical after the scrub
    val clean = out.keys.filter(id =>
      id % 3 != 0 && id % 4 != 0 && id % 5 != 0)
    assert(clean.nonEmpty)
    clean.foreach { id =>
      assert(out(id)._6 == md5hex(texts(id)).take(16), s"doc $id mutated")
    }
    // a fully-decorated doc redacts every kind to its placeholder —
    // the expected string is built INDEPENDENTLY (no regex) here
    val all3 = out.keys.filter(id =>
      id % 3 == 0 && id % 4 == 0 && id % 5 == 0)
    assert(all3.nonEmpty)
    all3.foreach { id =>
      val expect = texts(id) + " Contact: [EMAIL] tel [PHONE] ip [IP]"
      assert(out(id)._6 == md5hex(expect).take(16), s"doc $id redaction")
    }
  }

}

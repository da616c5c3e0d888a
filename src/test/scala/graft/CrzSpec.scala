package graft

import org.apache.spark.sql.functions._

import graft.crz._

/** Golden end-to-end fixtures for the CRZ-domain pipeline (SURVEY.md
  * §5.4, FIXTURES.md family A). */
class CrzSpec extends SparkSpec {
  import spark.implicits._

  private val fx = "fixtures/crz"

  /** Write `lines` to a self-deleting temp file (one place for the
    * encoding/cleanup convention all fixture-writing tests share). */
  private def tmpFile(suffix: String, lines: String*): String = {
    val f = java.nio.file.Files.createTempFile("graft_fixture", suffix)
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    f.toString
  }

  // ---- A1: XML source with quarantine (S3/S4) ----

  test("XML scan: good rows parsed, malformed row quarantined") {
    val (good, bad) = Sources.readContractsXml(spark, s"$fx/xml")
    assert(good.count() == 2)
    assert(bad.count() == 1)
    val t = Sources.typedContracts(good)
    val c1 = t.where($"id" === "100001").head()
    // P1: embedded newline in nazov normalized to space
    assert(c1.getAs[String]("nazov") == "Zmluva o dielo IS modernizacia")
    val atts = c1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("prilohy")
    assert(atts.size == 2)
    assert(atts.head.getAs[Long]("sizeBytes") == 52344L)
    // F26: relative filename becomes an absolute crz URL
    assert(atts(1).getAs[String]("url")
      == "https://www.crz.gov.sk/data/att/priloha_100001.pdf")
  }

  test("dodatky: 2-level nesting survives typing (supplement → attachments)") {
    val (good, _) = Sources.readContractsXml(spark, s"$fx/xml")
    val t = Sources.typedContracts(good)
    val suppAtts = t.where($"id" === "100001")
      .select(explode($"dodatky").as("d"))
      .select($"d.suppId", $"d.name", explode($"d.attachments").as("a"))
      .select($"suppId", $"a.filename", $"a.sizeBytes")
      .collect()
    assert(suppAtts.length == 1)
    assert(suppAtts.head.getAs[String]("suppId") == "700001")
    assert(suppAtts.head.getAs[Long]("sizeBytes") == 2048L)
    // contracts without supplements get an empty array, not null
    assert(t.where($"id" === "100002")
      .select(size($"dodatky")).head().getInt(0) == 0)
  }

  // ---- A2: legacy CSV + clean-filter cascade (02_filter_by_CIN) ----

  private lazy val typed = Sources.typedFromLegacyCsv(
    Sources.readPipeCsv(spark, s"$fx/CRZ_DB_with_supplements.csv"))
  private lazy val companies = spark.read.option("sep", "|")
    .option("header", "true").csv(s"$fx/companies.csv")
  private lazy val resorts = spark.read.option("header", "true")
    .csv(s"$fx/resorts.csv")
  private lazy val params = CleanFilter.Params(
    minPrice = new java.math.BigDecimal("1000"))

  test("clean-filter cascade: every tosslevel reason hit exactly as designed") {
    val audit = CleanFilter.audit(typed, companies, resorts, params)
      .as[(String, Long)].collect().toMap
    assert(audit == Map(
      "kept" -> 3L, "no_cin" -> 1L, "no_resort" -> 1L,
      "no_attachment" -> 2L, "price_below_min" -> 1L,
      "date_below_min" -> 1L, "duplicate" -> 1L))
  }

  test("clean output: expected ids, first-seen duplicate kept") {
    val kept = CleanFilter.clean(typed, companies, resorts, params)
    assert(kept.select("id").as[String].collect().toSet
      == Set("100001", "100005", "100010"))
    // D1 first-seen: the earlier innerId of the duplicate pair survives
    assert(kept.where($"id" === "100005").select("innerId")
      .as[String].head() == "900005")
  }

  test("F27 repair: ' nan,' size parses to null, https link classified") {
    val row = typed.where($"id" === "100006")
      .select(explode($"prilohy").as("a")).select("a.*").head()
    assert(row.isNullAt(row.fieldIndex("sizeBytes")))
    assert(row.isNullAt(row.fieldIndex("url"))) // no https element
    assert(row.getAs[String]("attId") == "500007")
  }

  test("F27/F28: apostrophe names survive, multi-attachment cells segment") {
    // Python repr double-quotes strings containing apostrophes — a
    // quote-rewriting JSON parse corrupts them and nulls the array
    val cells = Seq(
      """['500001', "O'Brien zmluva", 'ob.pdf', 100, """ +
        """'https://crz/ob.pdf', '2021-01-01 10:00:00']""",
      """['1', 'a', 'a.doc', 10, 'x', '2020-01-01 00:00:00', """ +
        """'2', 'b', 'b.pdf', 20, 'https://crz/b.pdf', """ +
        """'2020-01-02 00:00:00']""").toDF("Prilohy")
    val parsed = cells
      .select(Sources.parseLegacyAttachments($"Prilohy").as("p"))
      .select(explode($"p").as("a")).select("a.*").collect()
    assert(parsed.length == 3) // 1 + 2 attachments, none dropped
    val ob = parsed.head
    assert(ob.getAs[String]("name") == "O'Brien zmluva")
    assert(ob.getAs[Long]("sizeBytes") == 100L)
    assert(ob.getAs[String]("url") == "https://crz/ob.pdf")
    // second cell: per-attachment fields stay with THEIR attachment —
    // no chimera mixing attachment 1's id with attachment 2's link
    val a1 = parsed(1); val a2 = parsed(2)
    assert(a1.getAs[String]("attId") == "1" && a1.isNullAt(a1.fieldIndex("url")))
    assert(a2.getAs[String]("attId") == "2" &&
      a2.getAs[String]("url") == "https://crz/b.pdf" &&
      a2.getAs[Long]("sizeBytes") == 20L &&
      a2.getAs[String]("filename") == "b.pdf")
  }

  // ---- A5/A6: tagging + subject + dictionary ----

  private lazy val corpus =
    Sources.readTextCorpus(spark, s"$fx/contracts_text")
  private lazy val keywords =
    Pipeline.loadKeywords(spark, s"$fx/keywords.txt")

  test("corpus scan derives contract_id from the directory (S8/F23)") {
    val ids = corpus.select("contract_id").distinct()
      .as[String].collect().toSet
    assert(ids == Set("100001", "100002", "100003", "100005"))
  }

  test("tagging: str.count semantics and zero-hit filter (A1/A2/P8/O1)") {
    val tagged = Tagging.tagLong(corpus, keywords)
    val hits = tagged.where($"contract_id" === "100001")
      .groupBy().agg(sum($"hits")).head().getLong(0)
    assert(hits > 0)
    val ranked = Tagging.ranked(corpus, keywords,
      CleanFilter.clean(typed, companies, resorts, params))
    val rankedIds = ranked.select("contract_id").as[String].collect().toSet
    // 100003 is tagged but not kept (join excludes it)...
    assert(!rankedIds.contains("100003"))
    // ...and 100005 is KEPT and IN the corpus but has zero keyword
    // hits — only the P8 vyskyty > 0 filter can exclude it, so this
    // assertion fails if that filter is dropped
    assert(!rankedIds.contains("100005"))
    assert(rankedIds.contains("100001"))
  }

  test("wide export pivots only at the edge (F29)") {
    val wide = Tagging.exportWide(Tagging.tagLong(corpus, keywords))
    assert(wide.columns.contains("vyskyty"))
    assert(wide.columns.exists(_.startsWith("Pozícia_")))
  }

  test("subject extraction: heading, fallback, Nenájdené (O6/F5)") {
    val subj = Subject.extract(corpus)
      .as[(String, String)].collect().toMap
    assert(subj("100001").startsWith("Predmet zmluvy"))
    assert(subj("100002").toLowerCase.startsWith("úvodné ustanovenia"))
    assert(subj("100003") == Subject.NotFound)
    assert(subj("100005") == Subject.NotFound)
  }

  test("dictionary mining: known words excluded, OOV mined (A4/F21/F22)") {
    val dic = Dictionary.loadDic(spark, s"$fx/dictionary/sk_fixture.dic")
    val mined = Dictionary.mineSpecialWords(corpus, dic, minCount = 0L)
      .select("word").as[String].collect().toSet
    assert(mined.contains("aaaa"))       // OOV
    assert(!mined.contains("zmluva"))    // in dictionary
  }

  test("spellOk: digit-bearing price tokens known, punctuation-only not") {
    val words = Seq("100,00", "15%", "100 €", "slovo", "-", "€", "...", "qzx")
      .toDF("word")
    val dict = Seq("slovo").toDF("word")
    val known = Dictionary.spellOk(words, dict)
      .as[(String, Boolean)].collect().toMap
    assert(known("100,00") && known("15%") && known("100 €") && known("slovo"))
    // hunspell accepts numbers, not bare punctuation — a column of
    // dash placeholders must still read as misspelled (dummy)
    assert(!known("-") && !known("€") && !known("...") && !known("qzx"))
  }

  test("dedup only among cascade survivors: a discarded earlier row " +
      "does not shadow a later valid row (02:252-268 semantics)") {
    // same (nazov, id): the EARLIER row fails CIN, the LATER passes
    // everything — reference keeps the later row because discarded
    // rows never enter the control_db
    val rows = spark.sql(
      """SELECT * FROM VALUES
        |  ('Z', '1', 'a', '99999999', 'Ministerstvo financii SR',
        |   TIMESTAMP '2021-01-01 00:00:00', CAST(100000 AS DECIMAL(18,2))),
        |  ('Z', '1', 'b', '12345678', 'Ministerstvo financii SR',
        |   TIMESTAMP '2021-01-02 00:00:00', CAST(100000 AS DECIMAL(18,2)))
        |AS t(nazov, id, innerId, dodavatelIco, objednavatel,
        |     datumZverejnenia, cenaKonecna)""".stripMargin)
      .withColumn("prilohy", expr(
        "array(named_struct('attId','1','name','n','filename','f'," +
          "'sizeBytes',CAST(1 AS BIGINT),'url','https://x/f'," +
          "'attDate',CAST(NULL AS TIMESTAMP)))"))
    val reasons = CleanFilter.withReason(rows, companies, resorts,
        CleanFilter.Params(minPrice = new java.math.BigDecimal("1000")))
      .select($"innerId", $"reason").as[(String, String)].collect().toMap
    assert(reasons("a") == "no_cin")
    assert(reasons("b") == "kept") // NOT 'duplicate'
  }

  test("null purchaser fails the resort check, not silently 'kept'") {
    // contains(NULL) nulls through exists(); without the coalesce guard
    // when(!NULL) skips the no_resort branch entirely — the reference
    // str()'s NaN to 'nan', matches no resort, and discards
    val rows = spark.sql(
      """SELECT * FROM VALUES
        |  ('Z', '1', 'a', '12345678', CAST(NULL AS STRING),
        |   TIMESTAMP '2021-01-01 00:00:00', CAST(100000 AS DECIMAL(18,2)))
        |AS t(nazov, id, innerId, dodavatelIco, objednavatel,
        |     datumZverejnenia, cenaKonecna)""".stripMargin)
      .withColumn("prilohy", expr(
        "array(named_struct('attId','1','name','n','filename','f'," +
          "'sizeBytes',CAST(1 AS BIGINT),'url','https://x/f'," +
          "'attDate',CAST(NULL AS TIMESTAMP)))"))
    val reasons = CleanFilter.withReason(rows, companies, resorts,
        CleanFilter.Params(minPrice = new java.math.BigDecimal("1000")))
      .select($"reason").as[String].collect()
    assert(reasons.toSeq == Seq("no_resort"))
  }

  test("Pipeline.run wires every stage over XML + legacy CSV inputs") {
    val out = Pipeline.run(spark, Pipeline.Config(
      xmlDir = s"$fx/xml",
      legacyCsv = Some(s"$fx/CRZ_DB_with_supplements.csv"),
      companiesCsv = s"$fx/companies.csv",
      resortsCsv = s"$fx/resorts.csv",
      keywordsTxt = s"$fx/keywords.txt",
      corpusDir = s"$fx/contracts_text",
      dictionaryDic = s"$fx/dictionary/sk_fixture.dic",
      dictionaryAff = Some(s"$fx/dictionary/sk_fixture.aff"),
      params = CleanFilter.Params(minPrice = new java.math.BigDecimal("1000")),
      dictMinCount = 0L, // fixture corpus: every OOV word is rare
      tables = Some(Pipeline.TablesConfig(
        tables = Seq(1, 2, 3).map(n =>
          (s"$fx/tables/100001/table_zmluva_100001_$n.csv", "100001", n)),
        keywords = tableKws))))
    assert(out.contracts.count() == 12)   // 2 XML + 10 legacy rows
    assert(out.quarantined.count() == 1)
    // 100001 appears in both sources => one extra 'duplicate' vs the
    // CSV-only cascade; kept set unchanged
    assert(out.clean.select("id").as[String].collect().toSet
      == Set("100001", "100005", "100010"))
    assert(out.audit.as[(String, Long)].collect().toMap
      .getOrElse("duplicate", 0L) == 2L)
    assert(out.ranked.count() >= 1)
    assert(out.subjects.count() == 4)
    assert(out.minedWords.count() > 0)
    // the .aff expansion rode through the facade: REP variants and
    // flag-gated affix forms of dictionary words are not OOV, so the
    // mined list can never contain e.g. the REP-covered 'nájomná'
    assert(out.minedWords.where($"word".isin("nájomná", "zmluvy"))
      .count() == 0)
    // 07→09 rode along in the same run: the facade's table outputs
    // agree with the directly-wired stage results asserted below
    val t = out.tables.get
    assert(t.tableGate.collect().map(r =>
      r.getAs[Int]("table_no") -> r.getAs[Boolean]("price_table")).toMap
      == Map(1 -> true, 2 -> true, 3 -> false))
    assert(t.cleanedCells.where($"table_no" === 3).count() == 0)
    assert(t.relevantTables.select("table_no").as[Int].collect()
      .toSet.contains(1))
    assert(t.suggestedKeywords.count() > 0)
    assert(t.columnStats.where($"empty_col" || $"dummy_col").count() > 0)
  }

  test("pipe-CSV sink/scan round-trip preserves rows (S5/S6)") {
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val original = Sources.readPipeCsv(spark, s"$fx/CRZ_DB_with_supplements.csv")
    Sources.writePipeCsv(original, out)
    val back = spark.read.option("sep", "|").option("header", "true")
      .schema(crz.Schemas.rawCsv).csv(out)
    assert(back.count() == original.count())
    // exceptAll: MULTISET equality — plain except() is distinct-based
    // and would miss duplicate-row redistribution
    assert(original.exceptAll(back).count() == 0)
    assert(back.exceptAll(original).count() == 0)
  }

  // ---- A7: tables pipeline (07 + 09) ----

  private lazy val tableKws = TablesPipeline.Keywords(
    position = Seq("konzultant", "analytik", "vývojár", "architekt", "tester"),
    header = Seq("pozícia", "sadzba", "cena", "počet", "jednotka"),
    // real-cased like keywords.txt — the header-restriction match is
    // case-sensitive (reference: `keyword in column`, 09:283-286)
    priceHeader = Seq("Cena", "DPH", "€"))

  private lazy val allCells = Seq(1, 2, 3).map { n =>
    TablesPipeline.readTableCsv(spark,
      s"$fx/tables/100001/table_zmluva_100001_$n.csv", "100001", n)
  }.reduce(_ union _).cache()

  private lazy val spellDict = {
    val dic = Dictionary.loadDic(spark, s"$fx/dictionary/sk_fixture.dic")
    val kwWords = keywords.select(explode(split(lower($"keyword"), " "))
      .as("word"))
    // reference: dictionaries ∪ keywords (09:85,134)
    dic.select("word").union(kwWords)
  }

  test("S7: multiline quoted cell survives the CSV scan") {
    val t3 = allCells.where($"table_no" === 3)
    assert(t3.select(max($"row_idx")).head().getInt(0) == 2) // 3 rows
    assert(t3.where($"cell".contains("viacriadkova\nbunka")).count() == 1)
  }

  test("H1/P14: header detected by keyword score, VAT flag set") {
    val hdr = TablesPipeline.tableHeader(allCells, tableKws)
      .orderBy($"table_no")
    val rows = hdr.collect()
    assert(rows(0).getAs[Boolean]("has_header"))   // table 1: score 3 > 2
    assert(rows(0).getAs[Boolean]("vat_incl"))
    assert(!rows(2).getAs[Boolean]("has_header"))  // table 3: no keywords
  }

  test("H1/P14 are per-cell, like the reference's per-column-name " +
      "loops: a keyword straddling two header cells never scores") {
    // cells ('cena spolu bez', 'dph') would join to '... bez dph' —
    // the reference iterates column names ('s DPH' in column, 09:342),
    // so the split form must NOT set the flag or score
    def cells(row0: String*) =
      row0.zipWithIndex.map { case (c, i) => ("c1", 1, 0, i, c) }
        .toDF("contract_id", "table_no", "row_idx", "col_idx", "cell")
    val split = TablesPipeline.tableHeader(
      cells("cena spolu bez", "dph"), tableKws).head()
    assert(!split.getAs[Boolean]("vat_excl"))
    val whole = TablesPipeline.tableHeader(
      cells("cena spolu bez dph"), tableKws).head()
    assert(whole.getAs[Boolean]("vat_excl"))
    // header keywords count per cell too: 'sadzba' and 'cena' in ONE
    // cell each score, a straddle ('sadz' + 'ba') does not
    assert(whole.getAs[Long]("header_score") == 1L) // 'cena' only
    val straddle = TablesPipeline.tableHeader(
      cells("pozícia sadz", "ba cena"), tableKws).head()
    assert(straddle.getAs[Long]("header_score") == 2L) // pozícia + cena
  }

  test("S6/S7: RFC-4180 doubled quotes decode (the pandas dialect)") {
    val p = tmpFile(".csv", "a|b", "1|\"x \"\"y\"\" z\"")
    val row = Sources.readMultilineCsv(spark, p).head()
    assert(row.getString(1) == "x \"y\" z")
  }

  test("P10/P11/P12/H2/H3/P13: column stats drive drops and the price gate") {
    val dataCells = allCells.where($"row_idx" > 0) // stats on data rows
    val stats = TablesPipeline.columnStats(dataCells, spellDict, tableKws)
    val hdr = TablesPipeline.tableHeader(allCells, tableKws)
    val gate = TablesPipeline.tableGate(stats, hdr, allCells, tableKws)

    val t2stats = stats.where($"table_no" === 2).collect()
      .map(r => r.getAs[Int]("col_idx") -> r).toMap
    assert(t2stats(1).getAs[Boolean]("empty_col"))   // 'prazdny' column
    assert(t2stats(2).getAs[Boolean]("dummy_col"))   // gibberish column
    assert(!t2stats(0).getAs[Boolean]("dummy_col"))  // position names known
    assert(t2stats(3).getAs[Boolean]("numeric_col")) // price column
    // numeric tokens count as spelled-OK (hunspell accepts numbers,
    // 09:91-93): the price column must NOT be flagged dummy
    assert(!t2stats(3).getAs[Boolean]("dummy_col"))

    val gates = gate.collect().map(r =>
      r.getAs[Int]("table_no") -> r.getAs[Boolean]("price_table")).toMap
    assert(gates == Map(1 -> true, 2 -> true, 3 -> false))

    // H3 header-restricted path: table 1 has a header and its 'Cena s
    // DPH' column matches a Hlavička-cena keyword, so the all-digit
    // quantity column 'Počet MD' (col 1) must NOT gate as a price
    // column — price candidates restrict to header-matched columns
    val t1 = gate.where($"table_no" === 1).head()
    assert(t1.getAs[Long]("n_price_cols") == 1L)
    assert(t1.getAs[scala.collection.Seq[Int]]("price_cols") == Seq(2))

    val cleaned = TablesPipeline.cleanedCells(dataCells, stats, gate)
    // table 3 gated out; empty+dummy columns of table 2 dropped
    assert(cleaned.where($"table_no" === 3).count() == 0)
    assert(cleaned.where($"table_no" === 2 && $"col_idx".isin(1, 2))
      .count() == 0)
    // ...and the price column the gate identified SURVIVES the clean
    assert(cleaned.where($"table_no" === 2 && $"col_idx" === 3).count() > 0)
  }

  test("A5/D5: suggested keywords accumulate ratio, exclude existing") {
    val dataCells = allCells.where($"row_idx" > 0)
    val stats = TablesPipeline.columnStats(dataCells, spellDict, tableKws)
    val hdr = TablesPipeline.tableHeader(allCells, tableKws)
    val gate = TablesPipeline.tableGate(stats, hdr, allCells, tableKws)
    val sugg = TablesPipeline.suggestedKeywords(dataCells, stats, gate,
        keywords)
      .select("word").as[String].collect().toSet
    assert(sugg.contains("senior"))      // new token from a position col
    assert(!sugg.contains("konzultant")) // existing keyword excluded
  }

  test("P9/A3: relevance filter keeps keyword-bearing tables only") {
    val rel = TablesPipeline.relevantTables(allCells, keywords)
      .select("table_no").as[Int].collect().toSet
    assert(rel.contains(1))
    assert(!rel.contains(3))
  }

  test("S1/O7 dump-fetch plan: full date range minus landed days, " +
      "reference URL shape, re-run plans nothing twice") {
    val landed = Seq("2024-01-02", "2024-01-05", "2024-01-09")
      .toDF("fetch_date")
    val plan = Sources.dumpFetchPlan(spark, "2024-01-01", "2024-01-10",
      landed).cache()
    assert(plan.count() == 7) // 10 days - 3 landed
    val first = plan.head()
    assert(first.getDate(0).toString == "2024-01-01")
    assert(first.getString(1) ==
      "http://www.crz.gov.sk//export/2024-01-01.zip")
    assert(plan.where($"fetch_date".isin("2024-01-02", "2024-01-05",
      "2024-01-09")).count() == 0)
    // resume idempotence: planning against everything-landed is empty
    val all = Sources.dumpFetchPlan(spark, "2024-01-01", "2024-01-10",
      plan.select($"fetch_date").union(landed.select($"fetch_date".cast("date"))))
    assert(all.count() == 0)
    plan.unpersist()
  }

  test("F22 REP expansion: the .aff substitution table accepts an " +
      "inflected form the bare wordlist rejects") {
    val dic = Dictionary.loadDic(spark, s"$fx/dictionary/sk_fixture.dic")
    val rep = Dictionary.loadRepRules(spark, s"$fx/dictionary/sk_fixture.aff")
    // the 'REP 4' count header must not parse as a rule
    assert(rep.count() == 4)
    // 'nájomná' = diacritic form of wordlist entry 'najomna'; REP
    // 'a á' covers it (applied to BOTH a's — all-occurrence rule)
    val words = Seq("nájomná").toDF("word")
    assert(!Dictionary.spellOk(words, dic)
      .select("known").as[Boolean].head())
    assert(Dictionary.spellOk(words, Dictionary.expandWithRep(dic, rep))
      .select("known").as[Boolean].head())
  }

  test("S15 proxy rotation: retryRotating hands attempt i proxy " +
      "i % size; empty list means direct") {
    val used = scala.collection.mutable.ArrayBuffer[Option[String]]()
    val proxies = Seq("http://p0:3128", "http://p1:3128", "http://p2:3128")
    var calls = 0
    val out = Retry.retryRotating(Retry.Policy(tries = 5),
      proxies, sleep = _ => ()) { px =>
      used.append(px); calls += 1
      if (calls < 5) throw new java.io.IOException("through " + px)
      "ok"
    }
    assert(out == "ok")
    // round-robin across attempts, wrapping past the list end
    assert(used.toSeq == Seq(Some("http://p0:3128"),
      Some("http://p1:3128"), Some("http://p2:3128"),
      Some("http://p0:3128"), Some("http://p1:3128")))
    // no proxy list → every attempt is a direct connection
    val direct = Retry.retryRotating(Retry.Policy(tries = 2),
      Nil, sleep = _ => ()) { px => px }
    assert(direct.isEmpty)
  }

  test("F22 SFX/PFX expansion: flag-gated affix forms pass spell " +
      "membership; unflagged words take no affixes") {
    val dic = Dictionary.loadDic(spark, s"$fx/dictionary/sk_fixture.dic")
    val rules = Dictionary.loadAffixRules(spark,
      s"$fx/dictionary/sk_fixture.aff")
    // 4 rule lines parse; the 4-token block headers must not (they
    // contribute the cross flag instead)
    assert(rules.count() == 4)
    assert(rules.where($"kind" === "PFX" && $"flag" === "1" &&
      $"strip" === "" && $"append" === "naj" && $"cross").count() == 1)
    assert(rules.where($"kind" === "SFX" && $"flag" === "9" &&
      !$"cross").count() == 1)
    // flagMode is explicit: the fixture uses FLAG num flags, while the
    // function default is hunspell's directive-less default ("char")
    val expanded = Dictionary.expandWithAffixes(dic, rules,
      flagMode = "num")
    def known(w: String): Boolean =
      Dictionary.spellOk(Seq(w).toDF("word"), expanded)
        .select("known").as[Boolean].head()
    // zmluva/8 + `SFX 8 a y a` → zmluvy; dodavatelec/9,1 →
    // dodavatelca (SFX 9, multi-flag split) and najdodavatelec (PFX 1)
    assert(known("zmluvy"))
    assert(known("dodavatelca"))
    assert(known("najdodavatelec"))
    // sadzba ends in 'a' but carries no flag: hunspell gives
    // unflagged words no affixes, so sadzby stays misspelled
    assert(!known("sadzby"))
    // cross products: lacna/10,1 with SFX 10 (cross=Y) and PFX 1
    // (cross=Y) yields the prefixed superlative of the suffixed form
    assert(known("lacnejsia"))
    assert(known("najlacnejsia"))
    // but SFX 9 is a cross=N block: dodavatelca never takes naj-
    assert(!known("najdodavatelca"))
    // flag-blind mode is the bare-wordlist over-approximation: every
    // condition-matching rule applies, so sadzby IS accepted there
    assert(Dictionary.spellOk(Seq("sadzby").toDF("word"),
      Dictionary.expandWithAffixes(dic, rules, flagAware = false))
      .select("known").as[Boolean].head())
  }

  test("F22 .aff robustness: truncated SFX lines are ignored (not an " +
      "ANSI error) and FLAG long fails loudly, FLAG UTF-8 does not") {
    def tmpAff(lines: String*): String = tmpFile(".aff", lines: _*)
    // a malformed line starting with SFX but carrying fewer than 4
    // tokens must be skipped by the shape test, not explode the load
    // with INVALID_ARRAY_INDEX under ANSI mode
    val rules = Dictionary.loadAffixRules(spark, tmpAff(
      "SFX 8 Y 1", "SFX 8 a y a", "SFX 8", "PFX oops"))
    assert(rules.count() == 1)
    assert(rules.where($"flag" === "8" && $"cross").count() == 1)
    // FLAG long = two-char flags: neither parser fits — per-character
    // splitting would silently mis-gate every rule, so it must throw
    val ex = intercept[IllegalArgumentException] {
      Dictionary.affUsesNumFlags(spark, tmpAff("FLAG long"))
    }
    assert(ex.getMessage.contains("FLAG long"))
    // UTF-8 flags are still one character per flag → char mode
    assert(!Dictionary.affUsesNumFlags(spark, tmpAff("FLAG UTF-8")))
    assert(Dictionary.affUsesNumFlags(spark, tmpAff("FLAG num")))
    assert(Dictionary.affFlagMode(spark, tmpAff("SET UTF-8")) == "char")
    // hunspell allows ONE FLAG directive: conflicting values must
    // fail loudly, never depend on scan order (ADVICE r6); repeated
    // identical lines are harmless and tolerated
    val dup = intercept[IllegalArgumentException] {
      Dictionary.affFlagMode(spark, tmpAff("FLAG num", "FLAG UTF-8"))
    }
    assert(dup.getMessage.contains("conflicting FLAG"))
    assert(Dictionary.affFlagMode(spark,
      tmpAff("FLAG num", "FLAG num")) == "num")
  }

  test("F22 continuation classes: a rule's /flags give the derived " +
      "form one more flag-gated affix pass (two-step chain)") {
    // SFX 1 derives `-able` forms carrying continuation flags 2,3:
    // flag 2 is a second suffix (-ness), flag 3 a prefix (un-)
    val aff = tmpFile(".aff",
      "FLAG num",
      "SFX 1 Y 1",
      "SFX 1 0 able/2,3 .",
      "SFX 2 Y 1",
      "SFX 2 0 ness .",
      "PFX 3 Y 1",
      "PFX 3 0 un .",
      "SFX 4 Y 1",
      "SFX 4 0 0/2 .", // zero-append WITH a continuation class
      "PFX 7 Y 1",
      "PFX 7 0 pre/9,8 .", // prefix with continuation classes 9 (SFX), 8 (PFX)
      "SFX 9 Y 1",
      "SFX 9 0 ly .",
      "PFX 8 Y 1",
      "PFX 8 0 anti .")
    val dic = Dictionary.loadDic(spark,
      tmpFile(".dic", "4", "work/1", "rest", "plain/4", "view/7"))
    val rules = Dictionary.loadAffixRules(spark, aff)
    // the continuation class is parsed off the append field, not
    // baked into the appended text
    assert(rules.where($"flag" === "1" && $"append" === "able" &&
      $"cont" === "2,3").count() == 1)
    assert(rules.where($"flag" === "2" && $"cont".isNull).count() == 1)
    val expanded = Dictionary.expandWithAffixes(dic, rules,
      flagMode = "num").as[String].collect().toSet
    // step 1: work/1 → workable; step 2 (continuation): the derived
    // form's flags 2,3 license -ness and un- on workABLE
    assert(expanded("workable"))
    assert(expanded("workableness"))
    assert(expanded("unworkable"))
    // flag 2/3 are NOT on the stem: no workness/unwork; hunspell
    // stops after one continuation level: no un+ness double chain;
    // unflagged words still take nothing
    assert(!expanded("workness"))
    assert(!expanded("unwork"))
    assert(!expanded("unworkableness"))
    assert(!expanded("restable"))
    // hunspell's zero-affix-with-continuation form `SFX 4 0 0/2 .`:
    // appends NOTHING (the "0" before the slash is the empty-append
    // marker, not a literal) and hands flag 2 to the unchanged word
    assert(expanded("plainness"))
    assert(!expanded.exists(_.contains("0")))
    // a PREFIXED form's continuation may license a suffix (preview →
    // previewly) but never a second prefix: twofold prefix stripping
    // does not exist without COMPLEXPREFIXES, so flag 8 (anti-) on
    // preview's continuation must not over-generate
    assert(expanded("preview"))
    assert(expanded("previewly"))
    assert(!expanded("antipreview"))
    // flag-blind mode never chains: each form is one rule application
    val blind = Dictionary.expandWithAffixes(dic, rules,
      flagAware = false).as[String].collect().toSet
    assert(blind("workable") && blind("workness"))
    assert(!blind("workableness"))
  }

  test("F22 dictionary robustness: morph fields, anchored REP, " +
      "commented REP header, full-strip refusal, NBSP prices, " +
      "char default") {
    import spark.implicits._
    // .dic morphological fields after the entry are not word or flags
    val dic = Dictionary.loadDic(spark, tmpFile(".dic",
      "3", "slovo/12\tpo:noun", "dom po:noun", "cena/3"))
    val byWord = dic.collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byWord("slovo") == Some("12"))
    assert(byWord("dom") == None)
    assert(byWord("cena") == Some("3"))
    // anchored REP entries: prefix, suffix, whole-word — and the
    // commented count header is not a rule
    val rep = Dictionary.loadRepRules(spark, tmpFile(".aff",
      "REP 3 # substitutions",
      "REP ^f ph",
      "REP ou$ ow",
      "REP ^celo$ cele"))
    assert(rep.count() == 3)
    val rexp = Dictionary.expandWithRep(
      Seq("fyzika", "bacou", "celo").toDF("word"), rep)
      .as[String].collect().toSet
    assert(rexp("phyzika")) // ^f rewrites the prefix
    assert(rexp("bacow"))   // ou$ rewrites the suffix
    assert(rexp("cele"))    // ^celo$ rewrites the whole word
    assert(!rexp.exists(w => w.contains("^") || w.contains("$")))
    // full strip is refused without FULLSTRIP: 'a' + `SFX 8 a y a`
    // must NOT accept the bare append 'y'
    val frules = Dictionary.loadAffixRules(spark, tmpFile(".aff",
      "SFX 8 Y 1", "SFX 8 a y a"))
    val full = Dictionary.expandWithAffixes(
      Seq(("a", "8"), ("zmluva", "8")).toDF("word", "flags"), frules,
      flagMode = "num").as[String].collect().toSet
    assert(full("zmluvy"))
    assert(!full("y"))
    // NBSP / narrow-NBSP thousands separators count as numeric tokens
    val prices = Seq("1\u00A0000,00", "1\u202F000\u00A0€").toDF("word")
    assert(Dictionary.spellOk(prices, Seq("x").toDF("word"))
      .select("known").as[Boolean].collect().forall(identity))
    // the flagMode default is hunspell's directive-less default: char
    val crules = Dictionary.loadAffixRules(spark, tmpFile(".aff",
      "SFX A Y 1", "SFX A 0 s ."))
    val cexp = Dictionary.expandWithAffixes(
      Seq(("kniha", "AB")).toDF("word", "flags"), crules)
      .as[String].collect().toSet
    assert(cexp("knihas"))
  }

  test("F22 FLAG long: two-character flags parse as pairs — " +
      "word/ABCD takes rules AB and CD, never the straddle BC") {
    val affPath = tmpFile(".aff",
      "FLAG long",
      "SFX AB Y 1",
      "SFX AB 0 able .",
      "SFX BC Y 1",
      "SFX BC 0 ish .",
      "PFX CD Y 1",
      "PFX CD 0 un .")
    // work/ABCD = flags AB, CD; trap/BA = flag BA (NOT rule AB —
    // two-char flags are atomic, not character sets)
    val dic = Dictionary.loadDic(spark,
      tmpFile(".dic", "2", "work/ABCD", "trap/BA"))
    val rules = Dictionary.loadAffixRules(spark, affPath)
    // the directive reads "long"; the legacy boolean view still
    // refuses it (it cannot represent pair parsing) — the supported
    // path is flagMode below
    assert(Dictionary.affFlagMode(spark, affPath) == "long")
    val expanded = Dictionary.expandWithAffixes(dic, rules,
      flagMode = Dictionary.affFlagMode(spark, affPath))
      .as[String].collect().toSet
    assert(expanded("workable")) // flag AB
    assert(expanded("unwork")) // flag CD
    // BC is the character straddle between AB|CD — a per-char or
    // substring parser would wrongly license it
    assert(!expanded("workish"))
    // BA shares both characters with AB but is a different flag
    assert(!expanded("trapable"))
    // odd-length flag string = malformed input: complete pairs still
    // apply, the dangling char is ignored (hunspell's lenient read)
    val odd = Dictionary.expandWithAffixes(
      Dictionary.loadDic(spark, tmpFile(".dic", "1", "odd/ABC")),
      rules, flagMode = "long").as[String].collect().toSet
    assert(odd("oddable") && !odd.exists(_.endsWith("ish")))
  }

  test("S15 retry envelope: reference schedule (6 tries, 3s, 2x), " +
      "recovery, exhaustion, non-retryable passthrough") {
    assert(Retry.schedule(Retry.Policy())
      == Seq(3000L, 6000L, 12000L, 24000L, 48000L))
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val out = Retry.retry(sleep = sleeps.append(_)) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("flaky")
      "ok"
    }
    assert(out == "ok" && calls == 3 && sleeps.toSeq == Seq(3000L, 6000L))
    calls = 0; sleeps.clear()
    intercept[java.io.IOException] {
      Retry.retry(sleep = sleeps.append(_)) {
        calls += 1; throw new java.io.IOException("down")
      }
    }
    // 6 total attempts (tries), 5 sleeps — the last attempt is bare
    assert(calls == 6 && sleeps.size == 5)
    calls = 0
    intercept[IllegalStateException] {
      Retry.retry(sleep = _ => ()) {
        calls += 1; throw new IllegalStateException("bug")
      }
    }
    assert(calls == 1) // not in retryOn => no retries
  }
}

package graft.crz

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The one-call orchestration of the reference's stage graph
  * (SURVEY.md §3): a user of the CRZ-scraper scripts switches to
  * `Pipeline.run(spark, config)` and gets every stage output as a
  * DataFrame bundle — no CSV-files-on-disk choreography between
  * stages (the reference's only composition mechanism).
  *
  * Stage wiring mirrors 00→01→02→04_tag→05→08 (+ 06→07→09 when table
  * fixtures are present); each output is lazily composable Spark, so
  * downstream stages fuse where Catalyst allows.
  */
object Pipeline {

  /** Where the inputs live + filter params (the reference's
    * interactive prompts, made declarative). */
  final case class Config(
      xmlDir: String,
      legacyCsv: Option[String],
      companiesCsv: String,
      resortsCsv: String,
      keywordsTxt: String,
      corpusDir: String,
      dictionaryDic: String,
      // optional hunspell .aff: its REP table expands the wordlist
      // before broadcast (F22 affix approximation)
      dictionaryAff: Option[String] = None,
      params: CleanFilter.Params = CleanFilter.Params(),
      // stage-05 OOV threshold; the reference keeps count > 5
      // (05_build_special_dictionary.py:141) — tests pass 0 for
      // fixture-scale corpora
      dictMinCount: Long = 5L,
      // entry point 3 (06→07→09): present when extracted-table CSVs
      // (camelot's 06 output shape) exist for this corpus
      tables: Option[TablesConfig] = None)

  /** Extracted-table inputs: (csvPath, contractId, tableNo) triples —
    * the files stage 06 wrote — plus the keyword sets 07/09 use. */
  final case class TablesConfig(
      tables: Seq[(String, String, Int)],
      keywords: TablesPipeline.Keywords)

  /** Stage 07/09 outputs (only when [[Config.tables]] is set). */
  final case class TableOutputs(
      relevantTables: DataFrame,     // P9/A3 relevance filter (07)
      columnStats: DataFrame,        // A6 one-pass per-column stats (09)
      tableGate: DataFrame,          // H1/H3/P13/P14 price-table gate (09)
      cleanedCells: DataFrame,       // P10/P11 cleaned cells (09)
      suggestedKeywords: DataFrame)  // A5 suggested keywords (09)

  /** Every stage output of one pipeline run. */
  final case class Outputs(
      contracts: DataFrame,        // typed, pre-filter (01)
      quarantined: DataFrame,      // corrupt XML rows (01)
      clean: DataFrame,            // kept contracts (02)
      audit: DataFrame,            // discard-reason counts (02/A10)
      tagged: DataFrame,           // long-form keyword hits (04_tag)
      ranked: DataFrame,           // ranked relevant contracts (04_tag)
      subjects: DataFrame,         // per-contract subject (08)
      minedWords: DataFrame,       // OOV dictionary (05_build)
      tables: Option[TableOutputs]) // 07/09 bundle (when configured)

  /** keywords.txt (first CSV token = category) through the Spark text
    * reader — works on any Hadoop-compatible path, no driver-side file
    * handles. */
  def loadKeywords(s: SparkSession, path: String): DataFrame =
    s.read.text(path)
      .select(split(col("value"), ",").as("parts"))
      .select(trim(element_at(col("parts"), 1)).as("category"),
        explode(expr("slice(parts, 2, size(parts) - 1)")).as("kw"))
      .select(col("category"), trim(col("kw")).as("keyword"))
      .where(col("keyword") =!= "")

  def run(s: SparkSession, cfg: Config): Outputs = {
    // stage 01 — XML scan + typing (with quarantine)
    val (goodXml, quarantined) = Sources.readContractsXml(s, cfg.xmlDir)
    val fromXml = Sources.typedContracts(goodXml)
    // optional legacy CSV union (same canonical schema minus dodatky)
    val contracts = cfg.legacyCsv match {
      case Some(p) =>
        val legacy = Sources.typedFromLegacyCsv(Sources.readPipeCsv(s, p))
          .withColumn("dodatky", expr(
            "CAST(array() AS array<struct<suppId:string,name:string," +
              "suppDate:timestamp,attachments:array<struct<attId:string," +
              "name:string,filename:string,sizeBytes:bigint,url:string," +
              "attDate:timestamp>>>>)"))
        fromXml.unionByName(legacy.select(fromXml.columns.toIndexedSeq.map(col): _*))
      case None => fromXml
    }
    // stage 02 — clean-filter cascade + audit
    val companies = s.read.option("sep", "|").option("header", "true")
      .csv(cfg.companiesCsv)
    val resorts = s.read.option("header", "true").csv(cfg.resortsCsv)
    // one reason-classified frame feeds both outputs — clean and audit
    // must not each re-run the joins/window over the contracts union
    val reasons = CleanFilter
      .withReason(contracts, companies, resorts, cfg.params).cache()
    val clean = reasons.where(col("reason") === "kept").drop("reason")
    val audit = reasons.groupBy(col("reason")).agg(count(lit(1)).as("n"))
    // stage 04_tag — corpus tagging + ranking
    val corpus = Sources.readTextCorpus(s, cfg.corpusDir)
    val keywords = loadKeywords(s, cfg.keywordsTxt)
    // the TF long frame feeds both outputs — build it once
    val tagged = Tagging.tagLong(corpus, keywords)
    val ranked = Tagging.rankedFromTagged(tagged, corpus, clean)
    // stage 08 — subjects; stage 05_build — dictionary mining
    val subjects = Subject.extract(corpus)
    val dicBase = Dictionary.loadDic(s, cfg.dictionaryDic)
    // .aff expansion: REP substitutions ∪ flag-gated SFX/PFX affix
    // forms, both applied to the base wordlist dimension-side
    val dic = cfg.dictionaryAff
      .map { a =>
        Dictionary.expandWithRep(dicBase, Dictionary.loadRepRules(s, a))
          .union(Dictionary.expandWithAffixes(dicBase,
            Dictionary.loadAffixRules(s, a),
            flagMode = Dictionary.affFlagMode(s, a)))
          .distinct()
      }
      .getOrElse(dicBase)
    val minedWords = Dictionary.mineSpecialWords(corpus, dic, cfg.dictMinCount)
    // entry point 3 — 06→07→09 when extracted-table fixtures exist
    val tables = cfg.tables.map { tc =>
      // "configured but nothing landed yet" must fail with the cause,
      // not an empty.reduceLeft from deep inside the union
      require(tc.tables.nonEmpty,
        "TablesConfig.tables is empty: pass None for Config.tables when " +
          "stage 06 has produced no table CSVs yet")
      val cells = tc.tables.map { case (path, cid, n) =>
        TablesPipeline.readTableCsv(s, path, cid, n)
      }.reduce(_ unionByName _).cache()
      // spell dictionary = wordlist ∪ taxonomy words (09:86-93 loads
      // both hunspell and the keyword file)
      val spellDict = dic.select("word").union(keywords
        .select(explode(split(lower(col("keyword")), " ")).as("word")))
      val dataCells = cells.where(col("row_idx") > 0)
      val stats = TablesPipeline.columnStats(dataCells, spellDict, tc.keywords)
      val hdr = TablesPipeline.tableHeader(cells, tc.keywords)
      val gate = TablesPipeline.tableGate(stats, hdr, cells, tc.keywords)
      TableOutputs(
        relevantTables = TablesPipeline.relevantTables(cells, keywords),
        columnStats = stats,
        tableGate = gate,
        cleanedCells = TablesPipeline.cleanedCells(dataCells, stats, gate),
        suggestedKeywords =
          TablesPipeline.suggestedKeywords(dataCells, stats, gate, keywords))
    }
    Outputs(contracts, quarantined, clean, audit, tagged, ranked,
      subjects, minedWords, tables)
  }
}

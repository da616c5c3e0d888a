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
      params: CleanFilter.Params = CleanFilter.Params(),
      // stage-05 OOV threshold; the reference keeps count > 5
      // (05_build_special_dictionary.py:141) — tests pass 0 for
      // fixture-scale corpora
      dictMinCount: Long = 5L)

  /** Every stage output of one pipeline run. */
  final case class Outputs(
      contracts: DataFrame,        // typed, pre-filter (01)
      quarantined: DataFrame,      // corrupt XML rows (01)
      clean: DataFrame,            // kept contracts (02)
      audit: DataFrame,            // discard-reason counts (02/A10)
      tagged: DataFrame,           // long-form keyword hits (04_tag)
      ranked: DataFrame,           // ranked relevant contracts (04_tag)
      subjects: DataFrame,         // per-contract subject (08)
      minedWords: DataFrame)       // OOV dictionary (05_build)

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
    val dic = Dictionary.loadDic(s, cfg.dictionaryDic)
    val minedWords = Dictionary.mineSpecialWords(corpus, dic, cfg.dictMinCount)
    Outputs(contracts, quarantined, clean, audit, tagged, ranked,
      subjects, minedWords)
  }
}

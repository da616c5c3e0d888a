package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.crz._

/** End-to-end CRZ pipeline demo over the reference-shaped fixtures:
  * XML dump → quarantine split → typed contracts → clean-filter with
  * audit → corpus tagging → subject extraction → dictionary mining →
  * tables pipeline → sinks. The runnable face of SURVEY.md §3's three
  * entry points.
  *
  *   sbt "runMain graft.tools.CrzDemo fixtures/crz /tmp/crz_out"
  */
object CrzDemo {
  def main(args: Array[String]): Unit = {
    val fx = if (args.nonEmpty) args(0) else "fixtures/crz"
    val out = if (args.length > 1) args(1) else "/tmp/crz_out"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // all three entry points — the one-call facade over the stage graph
    val kws = TablesPipeline.Keywords(
      position = Seq("konzultant", "analytik", "vývojár", "architekt", "tester"),
      header = Seq("pozícia", "sadzba", "cena", "počet", "jednotka"),
      priceHeader = Seq("Cena", "DPH", "€"))
    val run = Pipeline.run(spark, Pipeline.Config(
      xmlDir = s"$fx/xml",
      legacyCsv = Some(s"$fx/CRZ_DB_with_supplements.csv"),
      companiesCsv = s"$fx/companies.csv",
      resortsCsv = s"$fx/resorts.csv",
      keywordsTxt = s"$fx/keywords.txt",
      corpusDir = s"$fx/contracts_text",
      dictionaryDic = s"$fx/dictionary/sk_fixture.dic",
      params = CleanFilter.Params(minPrice = new java.math.BigDecimal("1000")),
      dictMinCount = 0L, // fixture corpus: every OOV word is rare
      tables = Some(Pipeline.TablesConfig(
        tables = Seq(1, 2, 3).map(n =>
          (s"$fx/tables/100001/table_zmluva_100001_$n.csv", "100001", n)),
        keywords = kws))))
    val typedXml = Sources.typedContracts(
      Sources.readContractsXml(spark, s"$fx/xml")._1)
    println(s"[xml] contracts=${run.contracts.count()} " +
      s"quarantined=${run.quarantined.count()}")
    println("[audit]")
    run.audit.orderBy($"reason").collect()
      .foreach(r => println(s"  ${r.getString(0)} -> ${r.getLong(1)}"))
    Sources.writePipeCsv(run.clean.drop("prilohy", "dodatky"),
      s"$out/CRZ_DB_clean")
    println(s"[clean] kept=${run.clean.count()} -> $out/CRZ_DB_clean")
    println(s"[tagged] ranked=${run.ranked.count()}")
    run.ranked.select("rank", "contract_id", "vyskyty", "pocetZnakov")
      .orderBy($"rank").show(5, truncate = false)
    run.subjects.show(3, truncate = 40)
    Sources.writeDictionary(run.minedWords, "word", "n", s"$out/special_dict")
    println(s"[dict] mined=${run.minedWords.count()} -> $out/special_dict")
    // entry point 3 came back in the same bundle (07/09 outputs)
    val t = run.tables.get
    Sources.writeSuggestedKeywords(t.suggestedKeywords, "word", "weight",
      s"$out/suggested_keywords")
    println(s"[tables] relevant=${t.relevantTables.count()} " +
      s"cleaned_cells=${t.cleanedCells.count()} " +
      s"price_tables=${t.tableGate.where($"price_table").count()} " +
      s"suggested=${t.suggestedKeywords.count()} -> $out/suggested_keywords")

    val suppAtts = typedXml
      .select(explode($"dodatky").as("d"))
      .select(explode($"d.attachments").as("a"))
      .select($"a.filename", $"a.sizeBytes")
    println(s"[xml-typed] ${typedXml.count()} contracts from XML; " +
      s"supplement attachments (2-level nesting): ${suppAtts.count()}")
    suppAtts.show(3, truncate = false)
    spark.stop()
  }
}

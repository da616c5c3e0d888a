package graft.crz

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources & sinks of the CRZ pipeline (SURVEY.md §2.1), Spark-first.
  *
  * Scale notes: every reader is a real datasource (CSV/XML/text) so
  * partition-parallel scan, column pruning and predicate pushdown come
  * from Catalyst; the quarantine split is a filter on the
  * corrupt-record column, not a per-file try/except
  * (01_parse_xml.py:69-74,197-200).
  */
object Sources {

  /** S6 — pipe-CSV scan, all-string, explicit schema (the reference's
    * dtype=str reads: 02_filter_by_CIN.py:94 etc.). escape = quote
    * selects RFC-4180 doubled-quote decoding — the dialect pandas
    * writes (doublequote=True is its default) — instead of Spark's
    * backslash-escape default, which would leave `""` undecoded in
    * exactly the apostrophe/quote-bearing cells the legacy-list
    * parser exists for. */
  def readPipeCsv(s: SparkSession, path: String): DataFrame =
    s.read
      .option("sep", "|")
      .option("header", "true")
      .option("escape", "\"")
      .schema(Schemas.rawCsv)
      .csv(path)

  /** S5 — pipe-CSV sink with header (01_parse_xml.py:205-208). */
  def writePipeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "|").option("header", "true")
      .csv(path)

  /** S1/O7 — the daily-dump fetch PLAN as a relational operator: every
    * day in [start, end] (the reference's rrule(DAILY) loop,
    * 00_download_CRZ_DB.py:179-183) anti-joined against the dates
    * already landed — re-running never re-plans a fetched day, which
    * is the resume semantics the reference gets from files-on-disk —
    * each with its export URL (00:206). The fetch itself is the
    * external seam: feed these rows to [[graft.ops.ExternalTool]]
    * under the [[Retry]] envelope.
    *
    * `landed`: one `fetch_date` (DATE) row per already-downloaded
    * day — typically a projection of the landing directory listing. */
  def dumpFetchPlan(s: SparkSession, start: String, end: String,
      landed: DataFrame): DataFrame = {
    // validate driver-side (the range comes from user-facing config):
    // a malformed or inverted range is a clear error here, not an
    // AnalysisException from inside sequence(); the dates reach SQL
    // as named parameters, never by string interpolation
    val s0 = java.time.LocalDate.parse(start)
    val e0 = java.time.LocalDate.parse(end)
    require(!s0.isAfter(e0), s"empty dump fetch range: $start > $end")
    s.sql("SELECT explode(sequence(to_date(:s), to_date(:e), " +
        "INTERVAL 1 DAY)) AS fetch_date",
        Map("s" -> start, "e" -> end))
      .join(landed.select(col("fetch_date").cast("date").as("fetch_date")),
        Seq("fetch_date"), "left_anti")
      // the double slash and plain http are VERBATIM from the
      // reference (00_download_CRZ_DB.py:206) — do not "fix" them
      .withColumn("url", concat(lit("http://www.crz.gov.sk//export/"),
        date_format(col("fetch_date"), "yyyy-MM-dd"), lit(".zip")))
      .orderBy(col("fetch_date"))
  }

  /** S7 — quote-aware multiline CSV scan: the reference's hand-rolled
    * quote-parity newline repair (09_clean_tables.py:153-180) is just
    * multiLine=true on a real CSV reader. */
  def readMultilineCsv(s: SparkSession, path: String): DataFrame =
    s.read
      .option("sep", "|").option("header", "true")
      .option("multiLine", "true").option("quote", "\"")
      .option("escape", "\"") // RFC-4180 doubled quotes (pandas dialect)
      .csv(path)

  /** S3/S4 — recovering XML scan: rowTag=zmluva with PERMISSIVE mode;
    * malformed elements land in _corrupt_record instead of crashing
    * the job. Returns (good, quarantined) — the reference copies bad
    * files to Corrupted_XML_files/ (01_parse_xml.py:197-200); here the
    * quarantine is a DataFrame you can write anywhere. */
  def readContractsXml(s: SparkSession, path: String): (DataFrame, DataFrame) = {
    // the cache is LOAD-BEARING, not an optimization: Spark disallows
    // querying only _corrupt_record from a raw file scan, and callers
    // may hold the quarantine frame indefinitely — so the handle must
    // stay cached for the session (releasing a previous invocation's
    // cache here was tried and breaks any still-held quarantine frame)
    val raw = s.read
      .format("xml")
      .option("rowTag", "zmluva")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(Schemas.zmluvaXml)
      .load(path)
      .cache()
    val good = raw.where(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantined = raw.where(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    (good, quarantined)
  }

  /** Typed contract frame from the XML shape: casts + whitespace
    * normalization (P1: trim + newline→space, 01_parse_xml.py:87-101)
    * + attachment struct typing (sizes to long, dates to timestamp,
    * absolute URL per F26: 01:151,161,179). */
  def typedContracts(xml: DataFrame): DataFrame = {
    val norm = (c: String) =>
      trim(regexp_replace(col(c), "\\s+", " ")).as(c)
    xml.select(
      norm("nazov"), norm("id"), norm("innerId"),
      norm("objednavatelIco"), norm("objednavatel"), norm("objednavatelAdresa"),
      norm("dodavatelIco"), norm("dodavatel"), norm("dodavatelAdresa"),
      to_timestamp(col("datumZverejnenia")).as("datumZverejnenia"),
      to_timestamp(col("datumPodpisu")).as("datumPodpisu"),
      to_timestamp(col("datumPlatnosti")).as("datumPlatnosti"),
      to_timestamp(col("datumUcinnosti")).as("datumUcinnosti"),
      to_timestamp(col("poslednaZmena")).as("poslednaZmena"),
      expr("try_cast(cenaKonecna AS DECIMAL(18,2))").as("cenaKonecna"),
      expr("try_cast(cenaPodpisana AS DECIMAL(18,2))").as("cenaPodpisana"),
      norm("rezort"), norm("typ"), norm("stav"),
      expr("""transform(coalesce(priloha, array()), a -> struct(
          a.attId AS attId, a.name AS name, a.filename AS filename,
          try_cast(a.size AS BIGINT) AS sizeBytes,
          CASE WHEN a.link LIKE 'http%' THEN a.link
               ELSE concat('https://www.crz.gov.sk/data/att/', a.filename)
          END AS url,
          try_cast(a.date AS TIMESTAMP) AS attDate))""").as("prilohy"),
      // dodatky: the 2-level nesting of SURVEY.md §1.1 — supplements
      // whose attachments are typed with the same rules as prilohy
      expr("""transform(coalesce(dodatok, array()), d -> struct(
          d.suppId AS suppId, d.name AS name,
          try_cast(d.date AS TIMESTAMP) AS suppDate,
          transform(coalesce(d.priloha, array()), a -> struct(
            a.attId AS attId, a.name AS name, a.filename AS filename,
            try_cast(a.size AS BIGINT) AS sizeBytes,
            CASE WHEN a.link LIKE 'http%' THEN a.link
                 ELSE concat('https://www.crz.gov.sk/data/att/', a.filename)
            END AS url,
            try_cast(a.date AS TIMESTAMP) AS attDate)) AS attachments))""")
        .as("dodatky"))
  }

  /** F27+F28 — legacy stringified-Python-list attachment cell →
    * Array[Attachment], via the native [[LegacyAttachments]] parser
    * (handles apostrophes in names — Python repr double-quotes those,
    * which a quote-rewriting JSON round-trip corrupts — bare `nan`
    * sizes, the quoted-ID vs bare-int distinction the reference's
    * classifier keys on, and multi-attachment cells segmented at each
    * quoted numeric ID). attDate converts through the session zone. */
  def parseLegacyAttachments(cell: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val parsed = call_function("legacy_attachments", cell)
    transform(parsed, a => struct(
      a.getField("attId").as("attId"),
      a.getField("name").as("name"),
      a.getField("filename").as("filename"),
      a.getField("sizeBytes").as("sizeBytes"),
      a.getField("url").as("url"),
      to_timestamp(a.getField("attDate")).as("attDate")))
  }

  /** Typed contract frame from the legacy pipe-CSV (A2 fixture shape):
    * rename to canonical names, try_cast prices (P6 discard
    * semantics), timestamp casts, and re-hydrate the stringified
    * attachment list through [[parseLegacyAttachments]] +
    * [[classifyAttachment]] (F27+F28). */
  def typedFromLegacyCsv(raw: DataFrame): DataFrame = {
    graft.functions.Functions.register(raw.sparkSession)
    val renames = Seq(
      "Nazov" -> "nazov", "ID" -> "id", "Inner-ID" -> "innerId",
      "Objednavatel_ICO" -> "objednavatelIco",
      "Objednavatel" -> "objednavatel",
      "Objednavatel_adresa" -> "objednavatelAdresa",
      "Dodavatel_ICO" -> "dodavatelIco", "Dodavatel" -> "dodavatel",
      "Dodavatel_adresa" -> "dodavatelAdresa", "Rezort" -> "rezort",
      "Typ" -> "typ", "Stav" -> "stav")
    val renamed = renames.foldLeft(raw) { case (df, (a, b)) =>
      df.withColumnRenamed(a, b)
    }
    renamed
      .withColumn("datumZverejnenia", to_timestamp(col("Datum_zverejnenia")))
      .withColumn("datumPodpisu", to_timestamp(col("Datum_podpisu")))
      .withColumn("datumPlatnosti", to_timestamp(col("Datum_platnosti")))
      .withColumn("datumUcinnosti", to_timestamp(col("Datum_ucinnosti")))
      .withColumn("poslednaZmena", to_timestamp(col("Posledna_zmena")))
      .withColumn("cenaKonecna",
        expr("try_cast(Cena_konecna AS DECIMAL(18,2))"))
      .withColumn("cenaPodpisana",
        expr("try_cast(Cena_podpisana AS DECIMAL(18,2))"))
      // note: withColumn/drop resolve names case-insensitively, so the
      // typed array gets a temp name until the legacy Prilohy is gone
      .withColumn("prilohy_typed", parseLegacyAttachments(col("Prilohy")))
      .drop("Index", "Datum_zverejnenia", "Datum_podpisu",
        "Datum_platnosti", "Datum_ucinnosti", "Posledna_zmena",
        "Cena_konecna", "Cena_podpisana", "Prilohy", "Dodatky")
      .withColumnRenamed("prilohy_typed", "prilohy")
  }

  /** S8 — directory-as-table text corpus: `contracts_text/<ID>/` txt
    * members → (contract_id, file, text). The id is the second-to-last
    * path segment (F23: 03_download_contracts.py:261-266). */
  def readTextCorpus(s: SparkSession, root: String): DataFrame = {
    // wholetext: one row per file, so line order inside a document is
    // the file's own order — a groupBy+collect_list reassembly would
    // scramble lines whenever a file spans input splits.
    s.read.format("text")
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.txt")
      .option("recursiveFileLookup", "true")
      .load(root)
      .withColumn("path", input_file_name())
      .select(
        element_at(split(col("path"), "/"), -2).as("contract_id"),
        element_at(split(col("path"), "/"), -1).as("file"),
        col("value").as("text"))
  }

  /** S12 — dictionary sink: first line = word count, then words in
    * count-desc order (05_build_special_dictionary.py:144-155). The
    * header-first guarantee comes from an explicit sort key — union
    * partition order is NOT a contract once shuffles are involved. */
  def writeDictionary(df: DataFrame, wordCol: String, countCol: String,
      path: String): Unit = {
    val s = df.sparkSession
    // cache: the header line needs count() and the body needs the same
    // frame — without it the whole mining pipeline runs twice
    val cached = df.cache()
    val n = cached.count()
    val body = cached.select(col(wordCol).as("value"), lit(1).as("ord"),
      col(countCol).cast("long").as("k"))
    val head = s.range(1).select(lit(n.toString).as("value"),
      lit(0).as("ord"), lit(Long.MaxValue).as("k"))
    head.union(body)
      .orderBy(col("ord"), col("k").desc, col("value"))
      .select("value").coalesce(1)
      .write.mode("overwrite").text(path)
    cached.unpersist()
  }

  /** S13 — suggested-keywords sink: `word\t\tweight`, weight desc
    * (09_clean_tables.py:358-364). The word tiebreak keeps
    * equal-weight line order deterministic across runs — a
    * weight-only sort leaves ties to shuffle order. */
  def writeSuggestedKeywords(df: DataFrame, wordCol: String,
      weightCol: String, path: String): Unit =
    df.orderBy(col(weightCol).desc, col(wordCol))
      .select(concat_ws("\t\t", col(wordCol), col(weightCol)))
      .coalesce(1).write.mode("overwrite").text(path)
}

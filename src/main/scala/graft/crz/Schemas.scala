package graft.crz

import org.apache.spark.sql.types._

/** Canonical contract schema (SURVEY.md §1.3) — the single
  * authoritative StructType replacing the reference's copy-pasted
  * positional header lists (01_parse_xml.py:202-203,
  * 02_filter_by_CIN.py:307-308, 04_tag_text_contracts.py:78-80).
  *
  * IDs stay strings (leading zeros in ICO, SURVEY.md §1.2); money is
  * Decimal(18,2); nested attachments are a real ArrayType column, never
  * a stringified list in a CSV cell.
  */
object Schemas {

  val attachment: StructType = StructType(Seq(
    StructField("attId", StringType),
    StructField("name", StringType),
    StructField("filename", StringType),
    StructField("sizeBytes", LongType),
    StructField("url", StringType),
    StructField("attDate", TimestampType)))

  /** Supplement (Dodatok) — SURVEY.md §1.1: a second nested list per
    * contract with attachments nested one level deeper
    * (03_download_contracts.py:637-653). */
  val supplement: StructType = StructType(Seq(
    StructField("suppId", StringType),
    StructField("name", StringType),
    StructField("suppDate", TimestampType),
    StructField("attachments", ArrayType(attachment))))

  val contract: StructType = StructType(Seq(
    StructField("nazov", StringType),
    StructField("id", StringType),
    StructField("innerId", StringType),
    StructField("objednavatelIco", StringType),
    StructField("objednavatel", StringType),
    StructField("objednavatelAdresa", StringType),
    StructField("dodavatelIco", StringType),
    StructField("dodavatel", StringType),
    StructField("dodavatelAdresa", StringType),
    StructField("datumZverejnenia", TimestampType),
    StructField("datumPodpisu", TimestampType),
    StructField("datumPlatnosti", TimestampType),
    StructField("datumUcinnosti", TimestampType),
    StructField("poslednaZmena", TimestampType),
    StructField("cenaKonecna", DecimalType(18, 2)),
    StructField("cenaPodpisana", DecimalType(18, 2)),
    StructField("rezort", StringType),
    StructField("typ", StringType),
    StructField("stav", StringType),
    StructField("prilohy", ArrayType(attachment)),
    StructField("dodatky", ArrayType(supplement))))

  /** Raw pipe-CSV header of the legacy interchange format
    * (01_parse_xml.py:202-203; FIXTURES.md A2) — everything string,
    * attachments still a stringified Python list. */
  val rawCsvColumns: Seq[String] = Seq(
    "Index", "Nazov", "ID", "Inner-ID", "Objednavatel_ICO", "Objednavatel",
    "Objednavatel_adresa", "Dodavatel_ICO", "Dodavatel", "Dodavatel_adresa",
    "Datum_zverejnenia", "Datum_podpisu", "Datum_platnosti",
    "Datum_ucinnosti", "Posledna_zmena", "Cena_konecna", "Cena_podpisana",
    "Rezort", "Typ", "Stav", "Prilohy", "Dodatky")

  val rawCsv: StructType =
    StructType(rawCsvColumns.map(StructField(_, StringType)))

  /** XML shape of one `zmluva` element (FIXTURES.md A1; field list from
    * the positional extraction 01_parse_xml.py:87-116, named instead of
    * positional — SURVEY.md §7.4.2). */
  val zmluvaXml: StructType = StructType(Seq(
    StructField("innerId", StringType),
    StructField("id", StringType),
    StructField("objednavatel", StringType),
    StructField("dodavatel", StringType),
    StructField("nazov", StringType),
    StructField("datumUcinnosti", StringType),
    StructField("datumPlatnosti", StringType),
    StructField("cenaPodpisana", StringType),
    StructField("cenaKonecna", StringType),
    StructField("rezort", StringType),
    StructField("datumZverejnenia", StringType),
    StructField("dodavatelIco", StringType),
    StructField("stav", StringType),
    StructField("poslednaZmena", StringType),
    StructField("dodavatelAdresa", StringType),
    StructField("objednavatelIco", StringType),
    StructField("objednavatelAdresa", StringType),
    StructField("typ", StringType),
    StructField("datumPodpisu", StringType),
    StructField("priloha", ArrayType(StructType(Seq(
      StructField("attId", StringType),
      StructField("name", StringType),
      StructField("filename", StringType),
      StructField("size", StringType),
      StructField("link", StringType),
      StructField("date", StringType))))),
    StructField("dodatok", ArrayType(StructType(Seq(
      StructField("suppId", StringType),
      StructField("name", StringType),
      StructField("date", StringType),
      StructField("priloha", ArrayType(StructType(Seq(
        StructField("attId", StringType),
        StructField("name", StringType),
        StructField("filename", StringType),
        StructField("size", StringType),
        StructField("link", StringType),
        StructField("date", StringType))))))))),
    StructField("_corrupt_record", StringType)))
}

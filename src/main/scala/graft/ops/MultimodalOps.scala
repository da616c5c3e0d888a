package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column operators: media payloads as opaque binary
  * columns with typed metadata, decoded/feature-extracted inside the
  * executors (BASELINE.json north-star; the reference's analogue is
  * the binary PDF → text/OCR stage, SURVEY.md §2.1 S9-S11).
  *
  * Scale notes (100 TB):
  *  - payloads stay in executor space end to end (binary column →
  *    mapPartitions → feature rows); nothing is collected;
  *  - the decoder is invoked per PARTITION, so a real codec (libjpeg,
  *    ffmpeg, tesseract — the reference shells to pdftotext/tesseract
  *    the same way, 04_convert_contracts_to_text.py:265-392) amortizes
  *    its process/model startup across the partition, exactly like the
  *    reference's per-directory batching;
  *  - partition count is the parallelism knob: repartition(n) before
  *    decode to match executor-core budget at 100 TB.
  */
object MultimodalOps {

  /** One media record: payload + metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String,
      payload: Array[Byte])

  /** Extracted features (fixed schema regardless of media type). */
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, mean_byte: Double, width: Int, height: Int,
      histogram: Array[Long])

  /** The decode step. The container ships no image/audio codecs, so
    * this is a clearly-marked deterministic STUB standing in for e.g.
    * `ImageIO.read`/ffmpeg: it derives fake width/height and a 16-bin
    * byte histogram from the payload bytes. The Spark-side plumbing —
    * binary column, per-partition batching, fixed output schema — is
    * the real, tested surface; swap this function for a codec to go
    * to production.
    */
  private[ops] def decodeStub(rec: MediaRecord): MediaFeatures = {
    val bytes = rec.payload
    val n = bytes.length.toLong
    var sum = 0L
    val hist = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      hist(b >> 4) += 1
      i += 1
    }
    val mean = if (n == 0) 0.0 else sum.toDouble / n.toDouble
    // fake dimensions: deterministic in content length (stands in for
    // the codec-reported frame size)
    val w = 16 + (n % 64).toInt
    val h = 16 + (n % 48).toInt
    MediaFeatures(rec.doc_id, rec.media_type, n, mean, w, h, hist)
  }

  /** q33 — multimodal feature extraction: documents→binary payloads →
    * per-partition decode → typed feature rows. The measured
    * (stub-decode) configuration is deterministic byte arithmetic, so
    * it carries a full DuckDB oracle ([[mediaFeaturesSql]]) despite
    * the decode living in executor code.
    *
    * Feature flag `spark.graft.media.cmd` (argv, whitespace-split;
    * optional `spark.graft.media.timeoutMs`, default 10 000 — the
    * reference's camelot guard, 06_extract_tables.py:197-205): when
    * set, each document is piped through that external CLI via
    * [[ExternalTool]] with per-partition process reuse, and the
    * features are computed over the TOOL'S output bytes — the real
    * pdftotext/tesseract shape (04_convert_contracts_to_text.py:
    * 265-392). A timed-out/crashed record is quarantined (media_type
    * suffixed `!quarantine`, empty payload) instead of failing the
    * task, mirroring the reference's failure counters (04:334-340).
    * Unset (the default, and what the driver measures): the in-JVM
    * [[decodeStub]] stands in for the codec. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"text").as[(Long, String)]
    // trim BEFORE the emptiness test and the argv split: a cmd of
    // " /bin/sh x.sh" would otherwise split to a leading "" argv
    // element, ProcessBuilder would throw on every record, and
    // ExternalTool's per-record quarantine would convert the config
    // typo into a 100%-quarantined "successful" run
    val cmd = s.conf.get("spark.graft.media.cmd", "").trim
    val media: Dataset[MediaRecord] =
      if (cmd.isEmpty) {
        docs.map { case (id, text) =>
          // documents.text is non-null by generator contract; treat a
          // null defensively as an empty payload rather than NPE-ing
          // the whole query on one corrupt row
          MediaRecord(id, if (id % 2 == 0) "image" else "audio",
            Option(text).getOrElse("").getBytes("UTF-8"))
        }
      } else {
        val conf = ExternalTool.ToolConf(
          command = cmd.split("\\s+").toIndexedSeq,
          timeoutMs = s.conf.get("spark.graft.media.timeoutMs", "10000").toLong)
        // the worker line protocol is one-line-in/one-line-out: an
        // embedded newline would desync every later record in the
        // partition (ExternalTool rejects such rows), so flatten
        // newlines to spaces before piping — same normalization the
        // whitespace stage applies anyway (P1)
        val lineSafe = docs.map { case (id, text) =>
          (id, Option(text).getOrElse("")
            .replace('\n', ' ').replace('\r', ' '))
        }
        ExternalTool.pipe(lineSafe, conf).map { r =>
          val kind = if (r.id % 2 == 0) "image" else "audio"
          if (r.ok) MediaRecord(r.id, kind, r.out.getBytes("UTF-8"))
          else MediaRecord(r.id, kind + "!quarantine", Array.emptyByteArray)
        }
      }
    media
      .mapPartitions { it =>
        // per-partition seam: a real codec initializes here, once,
        // then streams the partition through (cf. reference S9's
        // per-directory tool invocation)
        it.map(decodeStub)
      }
      .toDF()
      .select($"doc_id", $"media_type", $"n_bytes", $"mean_byte",
        $"width", $"height", element_at($"histogram", 1).as("hist_bin0"))
  }

  /** DuckDB twin of [[mediaFeatures]] in its measured (stub-decode)
    * configuration — what upgrades q33 from rows-only to a full
    * rows+schema+hash CORRECTNESS row (VERDICT r6 #4). The stub is
    * pure byte arithmetic over the UTF-8 payload, so it mirrors
    * exactly in SQL: `hex(encode(text))` exposes the payload bytes,
    * a `strpos`-against-'0123456789ABCDEF' pair decodes each one, and
    * mean/width/height/histogram follow. The integer byte sum stays
    * exact (≤ 255·n ≪ 2^53), so `CAST(sum AS DOUBLE) / CAST(n AS
    * DOUBLE)` is the same single IEEE division [[decodeStub]]
    * performs. The external-CLI path (`spark.graft.media.cmd`) has no
    * SQL twin by design — its output is whatever the tool prints —
    * and stays covered by ExternalToolSpec. */
  val mediaFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
      |      AS media_type,
      |    hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS n
      |  FROM documents
      |), v AS (
      |  SELECT doc_id, media_type, n,
      |    list_transform(range(1, n + 1), i ->
      |      (strpos('0123456789ABCDEF',
      |         substr(hx, CAST(i*2-1 AS INT), 1)) - 1) * 16
      |      + (strpos('0123456789ABCDEF',
      |           substr(hx, CAST(i*2 AS INT), 1)) - 1)) AS bytes
      |  FROM b
      |)
      |SELECT doc_id, media_type, CAST(n AS BIGINT) AS n_bytes,
      |  CASE WHEN n = 0 THEN 0.0
      |       ELSE CAST(list_sum(bytes) AS DOUBLE) / CAST(n AS DOUBLE)
      |  END AS mean_byte,
      |  CAST(16 + n % 64 AS INT) AS width,
      |  CAST(16 + n % 48 AS INT) AS height,
      |  CAST(len(list_filter(bytes, x -> x < 16)) AS BIGINT)
      |    AS hist_bin0
      |FROM v""".stripMargin

  /** q32 — binary-column metadata (the pure-relational face of the
    * multimodal table: byte length, checksum, leading byte — all
    * pushdown-friendly column expressions, no decode). */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("payload", $"text".cast("binary"))
      .select($"doc_id",
        octet_length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("checksum"),
        ascii(substring($"text", 1, 1)).cast("long").as("first_byte"))
  }

  val binaryMetaSql: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      |       md5(text) AS checksum,
      |       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
      |FROM documents""".stripMargin
}

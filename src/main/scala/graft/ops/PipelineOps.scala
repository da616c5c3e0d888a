package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end pipeline COMPOSITION — the proof that the operator
  * family composes the way a real training-data pipeline is built,
  * not just that each stage passes in isolation. q74 chains four
  * already-proven stages over shared frame-level cores (the same
  * code paths q20/q67/q72 register individually):
  *
  *   quality gate → exact dedup (first-seen) → PII scrub → chunking
  *
  * and reports the per-language corpus the chain would hand to
  * training. The DuckDB oracle is the same four stages as composed
  * CTEs, with the decoration/redaction SQL shared verbatim from
  * [[TextOps]] so the mirrored stub cannot drift.
  *
  * Scale shape (100 TB): gate and scrub are map-only; dedup is ONE
  * window shuffle on md5(text) — identical to q20's — and chunking
  * is map-only again, so the whole pipeline is one wide exchange plus
  * the final (lang) rollup. Stages run fused in one Spark job: no
  * intermediate materialization, whole-stage codegen spans the
  * gate+scrub maps on either side of the exchange.
  */
object PipelineOps {

  /** Minimum token count a document must reach to enter the corpus —
    * cuts ~21% of the synthetic corpus at every SF, so the gate is
    * exercised, not decorative. */
  val MinTokens = 30

  /** q74 — the composed training pipeline (gate → dedup → scrub →
    * chunk), rolled up per language: surviving docs, emitted chunks,
    * chunk tokens, and total redactions the scrub removed on the way. */
  def trainingPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gated = Tables.documents(s, dir)
      .where(size(split(trim($"text"), " +")) >= MinTokens)
    // q20's first-seen convention: one survivor per exact text, the
    // smallest doc_id wins — deterministic, partition-independent
    val w = Window.partitionBy(md5($"text")).orderBy($"doc_id")
    val survivors = gated
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"doc_id", $"lang", $"text")
    val scrubbed = TextOps.scrubFrame(TextOps.decorateFrame(survivors))
      .select($"doc_id", $"lang", $"redacted".as("text"))
    TextOps.chunkFrame(scrubbed, keep = Seq("lang"))
      .groupBy($"lang")
      .agg(
        // every document emits exactly one chunk_id=0 row (the start
        // sequence always contains 0), so the doc count is a plain
        // conditional sum — countDistinct here would pay the Expand +
        // extra exchange of a distinct aggregation for nothing
        sum(when($"chunk_id" === 0, 1L).otherwise(0L)).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum($"n_chunk_tokens").as("n_tokens"))
  }

  val trainingPipelineSql: String = {
    val ct = TextOps.ChunkTokens
    val ov = TextOps.ChunkOverlap
    val st = TextOps.ChunkStride
    s"""WITH gated AS (
       |  SELECT doc_id, lang, text FROM documents
       |  WHERE len(string_split_regex(trim(text), ' +')) >= $MinTokens),
       |survivors AS (
       |  SELECT doc_id, lang, text FROM (
       |    SELECT doc_id, lang, text,
       |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id)
       |        AS rn
       |    FROM gated) WHERE rn = 1),
       |deco AS (
       |  SELECT doc_id, lang, ${TextOps.decorationSqlExpr} AS full_text
       |  FROM survivors),
       |scrubbed AS (
       |  SELECT doc_id, lang, ${TextOps.redactionSqlExpr} AS rtext
       |  FROM deco),
       |toks AS (
       |  SELECT doc_id, lang, string_split_regex(trim(rtext), ' +') AS t
       |  FROM scrubbed),
       |chunks AS (
       |  SELECT doc_id, lang,
       |    CAST(len(t[start + 1 : start + $ct]) AS BIGINT) AS n_chunk_tokens
       |  FROM toks,
       |    unnest(generate_series(0, greatest(len(t) - 1 - $ov, 0), $st))
       |      AS u(start))
       |SELECT lang,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(SUM(n_chunk_tokens) AS BIGINT) AS n_tokens
       |FROM chunks GROUP BY lang""".stripMargin
  }
}

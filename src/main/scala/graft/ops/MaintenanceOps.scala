package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table-maintenance operators a lakehouse deployment runs BESIDE the
  * analytics: snapshot-to-snapshot hash diff (q101, the incremental
  * refresh/audit primitive) and Morton z-order clustering (q102, the
  * multi-dimensional layout primitive behind "cluster by (user, time)"
  * so that BOTH `user_id = ?` and time-range predicates prune files).
  *
  * House rules match [[CorpusOps]]: every cross-engine number is exact
  * integer arithmetic (bit ops, counts, min/max) — no floats anywhere
  * in these two operators.
  */
object MaintenanceOps {

  // ------------------------------------------------------------- q101

  /** q101 — snapshot hash-diff: given two versions of the documents
    * table, classify every doc_id as added / removed / changed /
    * unchanged by comparing `md5(text)` across a full-outer join, and
    * roll the classification up per source. This is the audit artifact
    * an incremental pipeline publishes with each refresh ("what did
    * this crawl replace?") and the input to incremental recompute
    * (only `added`/`changed` docs re-enter the dedup/quality stages —
    * the batch analogue of q77's incremental labels).
    *
    * Scale shape: ONE doc_id-hash exchange per side for the full-outer
    * join; `md5` reduces each side to (id, 32-byte hash, source)
    * map-side, so the exchange never carries document text. The rollup
    * is map-side combinable. At 100 TB both snapshots would be
    * bucketed by doc_id (q53's layout) making the diff exchange-free,
    * and partition-level content hashes would prune unchanged
    * partitions before any row-level work — this operator is the
    * per-partition inner loop of that scheme.
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.documents(s, dir)
    snapshotDiffOf(a, deriveSnapshotB(a))
  }

  /** The second snapshot, derived DETERMINISTICALLY from the first so
    * the DuckDB oracle can reconstruct it bit-for-bit: docs with
    * `doc_id % 11 = 0` are deleted, surviving docs with
    * `doc_id % 7 = 0` get re-crawled text (suffix edit), and docs with
    * `doc_id % 13 = 0` contribute a NEW doc at `doc_id + 1000000`. */
  private[graft] def deriveSnapshotB(a: DataFrame): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    val kept = a.where($"doc_id" % 11 =!= 0)
      .select($"doc_id",
        when($"doc_id" % 7 === 0, concat($"text", lit(" rev2")))
          .otherwise($"text").as("text"),
        $"source")
    val added = a.where($"doc_id" % 13 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text", $"source")
    kept.unionByName(added)
  }

  private[graft] def snapshotDiffOf(a: DataFrame, b: DataFrame): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    val ha = a.select($"doc_id", md5($"text").as("h_a"), $"source".as("src_a"))
    val hb = b.select($"doc_id", md5($"text").as("h_b"), $"source".as("src_b"))
    ha.join(hb, Seq("doc_id"), "full_outer")
      .select(
        coalesce($"src_b", $"src_a").as("source"),
        when($"h_a".isNull, "added")
          .when($"h_b".isNull, "removed")
          .when($"h_a" =!= $"h_b", "changed")
          .otherwise("unchanged").as("change_type"))
      .groupBy($"source", $"change_type")
      .agg(count(lit(1)).as("n_docs"))
  }

  val snapshotDiffSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text,
      |    source
      |  FROM documents WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, source
      |  FROM documents WHERE doc_id % 13 = 0
      |), ha AS (SELECT doc_id, md5(text) AS h_a, source AS src_a
      |          FROM documents),
      |hb AS (SELECT doc_id, md5(text) AS h_b, source AS src_b FROM b)
      |SELECT coalesce(src_b, src_a) AS source,
      |  CASE WHEN h_a IS NULL THEN 'added'
      |       WHEN h_b IS NULL THEN 'removed'
      |       WHEN h_a <> h_b THEN 'changed'
      |       ELSE 'unchanged' END AS change_type,
      |  CAST(count(*) AS BIGINT) AS n_docs
      |FROM ha FULL OUTER JOIN hb USING (doc_id)
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- q102

  /** Bucket prefix width: the top [[ZBucketBits]] bits of the 32-bit
    * z-value form the bucket id (1024 buckets), leaving 11 interleaved
    * bits of EACH dimension inside a bucket — so every bucket bounds
    * both dimensions to a range < 2^11 (the invariant MaintenanceSpec
    * pins). */
  val ZBucketBits = 10

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit value (Morton/z-curve bit interleave, one half). Four
    * shift-or-mask rounds — pure codegen'd integer ops, and the SAME
    * four-round arithmetic is spelled out in the oracle SQL so both
    * engines compute identical z-values. */
  private[graft] def spreadBits(v: Column): Column = {
    val m1 = lit(0x00FF00FFL); val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L); val m4 = lit(0x55555555L)
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(m1)
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(m2)
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(m3)
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(m4)
  }

  /** 32-bit Morton z-value of two 16-bit inputs (x in even bits, y in
    * odd bits). */
  private[graft] def mortonZ(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** The (x, y) clustering dimensions for the events table:
    * x = `user_id & 0xFFFF`, y = `epoch-minute & 0xFFFF`. Both masks
    * are the 16-bit domain the interleave consumes; minute wraps every
    * ~45 days, which a production layout would absorb by adding the
    * date partition (q36's layout) ABOVE the z-clustering — z-order
    * sorts within a date partition, it does not replace it. */
  private[graft] def eventZ(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.withColumn("ux", $"user_id".bitwiseAND(lit(0xFFFFL)))
      .withColumn("tm",
        floor(unix_timestamp($"ts") / 60).bitwiseAND(lit(0xFFFFL)))
      .withColumn("z", mortonZ($"ux", $"tm"))
  }

  /** q102 — z-order clustering report: Morton-interleave
    * (user_id, epoch-minute) into a 32-bit z-value, bucket by the top
    * [[ZBucketBits]] bits, and report per-bucket row count plus the
    * min/max extent of BOTH dimensions. The report IS the layout
    * contract: every bucket's user extent AND minute extent are
    * < 2^11, so a file written per bucket (repartitionByRange(z), see
    * [[zorderedEvents]]) serves min/max-pruned scans for point-user
    * queries and time-range queries alike — the property a
    * single-column sort gives only one of.
    *
    * Scale shape: the z-value is four shift-or-mask rounds per row
    * inside whole-stage codegen (no UDF, no shuffle to compute);
    * the report is one map-side-combinable aggregation on the bucket
    * key. The write path is ONE range exchange on z — exactly what a
    * `CLUSTER BY` implementation does. */
  def zorderReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    eventZ(Tables.events(s, dir))
      .groupBy(shiftright($"z", 32 - ZBucketBits).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min($"ux").as("u_min"), max($"ux").as("u_max"),
        min($"tm").as("t_min"), max($"tm").as("t_max"))
  }

  /** The write path q102's report certifies: events range-partitioned
    * by z-value, ready for a per-partition file write whose footer
    * min/max on BOTH user_id and ts stay tight. Spec-checked
    * (MaintenanceSpec) rather than oracle-checked — partition file
    * layout is not SQL-visible. */
  def zorderedEvents(s: SparkSession, dir: String, parts: Int): DataFrame =
    eventZ(Tables.events(s, dir)).repartitionByRange(parts, col("z"))

  val zorderReportSql: String = {
    // the four spread rounds as SQL text, applied to operand `v`
    def spread(v: String): String = {
      val a = s"(($v | ($v << 8)) & 16711935)"           // 0x00FF00FF
      val b = s"(($a | ($a << 4)) & 252645135)"          // 0x0F0F0F0F
      val c = s"(($b | ($b << 2)) & 858993459)"          // 0x33333333
      s"(($c | ($c << 1)) & 1431655765)"                 // 0x55555555
    }
    s"""WITH e AS (
       |  SELECT user_id & 65535 AS ux,
       |    CAST(floor(epoch(ts) / 60) AS BIGINT) & 65535 AS tm
       |  FROM events
       |), z AS (
       |  SELECT ux, tm,
       |    (${spread("ux")} | (${spread("tm")} << 1)) AS z
       |  FROM e
       |)
       |SELECT z >> ${32 - ZBucketBits} AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  min(ux) AS u_min, max(ux) AS u_max,
       |  min(tm) AS t_min, max(tm) AS t_max
       |FROM z GROUP BY 1""".stripMargin
  }
}

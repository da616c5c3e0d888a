package graft

import org.apache.spark.sql.functions._

import graft.ops.{LayoutOps, PipelineOps, TextOps}

/** q73 shard manifest + q74 composed pipeline: cross-stage invariants
  * the per-query oracles cannot see. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("shard manifest partitions the corpus: totals reconcile, " +
      "assignment is content-stable across runs") {
    val m1 = LayoutOps.shardManifest(spark, sf0001)
      .orderBy($"shard").collect()
    val docs = Tables.documents(spark, sf0001)
    // every doc lands in exactly one shard
    assert(m1.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // shard ids are the full [0, NShards) range at fixture scale
    assert(m1.map(_.getAs[Long]("shard")).toSet ==
      (0L until LayoutOps.NShards.toLong).toSet)
    // token totals reconcile with the q28 corpus-wide convention
    val totalToks = docs
      .select(size(split(trim($"text"), " +")).cast("long").as("n"))
      .agg(sum($"n")).head().getLong(0)
    assert(m1.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    // content-stable: a second run reproduces every cell (doc_id-hash
    // assignment has no partition/order dependence)
    val m2 = LayoutOps.shardManifest(spark, sf0001)
      .orderBy($"shard").collect()
    assert(m1.map(_.toSeq.toList).toList == m2.map(_.toSeq.toList).toList)
  }

  test("composed pipeline reconciles with its stages run separately") {
    val out = PipelineOps.trainingPipeline(spark, sf0001).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    // stage the pipeline by hand from the same frame-level cores
    val gated = Tables.documents(spark, sf0001)
      .where(size(split(trim($"text"), " +")) >= PipelineOps.MinTokens)
    val survivors = gated
      .groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("doc_id"))
      .join(gated, "doc_id")
      .select($"doc_id", $"lang", $"text")
    // the gate cuts something and the dedup keeps at most gated rows
    assert(gated.count() < Tables.documents(spark, sf0001).count())
    assert(survivors.count() <= gated.count())
    // per-lang doc totals equal the hand-staged survivor counts
    val expectDocs = survivors.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    assert(out.view.mapValues(_.getAs[Long]("n_docs")).toMap == expectDocs)
    // chunk totals equal chunking the hand-staged scrubbed stream
    val scrubbed = TextOps.scrubFrame(TextOps.decorateFrame(survivors))
      .select($"doc_id", $"lang", $"redacted".as("text"))
    val expectChunks = TextOps.chunkFrame(scrubbed, keep = Seq("lang"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("c"), sum($"n_chunk_tokens").as("t"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { case (lang, r) =>
      assert((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_tokens")) ==
        expectChunks(lang), s"lang $lang")
    }
  }

  test("chunkFrame keep-columns pass-through leaves the q67 shape " +
      "untouched and threads extras verbatim") {
    val base = TextOps.chunkFrame(Tables.documents(spark, sf0001))
    assert(base.columns.toSeq ==
      Seq("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text"))
    val kept = TextOps.chunkFrame(Tables.documents(spark, sf0001),
      keep = Seq("lang"))
    assert(kept.columns.toSeq ==
      Seq("doc_id", "lang", "chunk_id", "n_chunk_tokens", "chunk_text"))
    // the kept column is the document's own lang on every chunk row
    val bad = kept.join(
        Tables.documents(spark, sf0001).select($"doc_id", $"lang".as("l2")),
        "doc_id")
      .where($"lang" =!= $"l2").count()
    assert(bad == 0)
  }
}

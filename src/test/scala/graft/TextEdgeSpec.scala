package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** ONE shared edge-corpus property for the whole text family (the
  * round-7 null-text guards, promoted from piecemeal fixes to a
  * standing gate): every registered text-analysis query must survive
  * null, empty, whitespace-only, NBSP-bearing and single-token
  * documents without throwing, and its counts/ratios must stay sane.
  * A new text operator added to [[SparkEntry.queries]] joins the gate
  * by being appended to ONE list here. */
class TextEdgeSpec extends SparkSpec {

  /** The registered text-family queries: everything that consumes
    * documents.text in batch — analysis, dedup, and pipeline stages.
    * Streaming (q59/q60/q64/q69) and embedding-family queries have
    * their own suites. */
  private val family = Seq(
    "q20_dedup_exact", "q21_minhash_lsh", "q22_simhash",
    "q23_ngram_jaccard", "q26_lang_id", "q27_quality_score",
    "q28_token_count", "q29_fingerprint", "q48_dedup_clusters", "q75_neardup_survivors",
    "q52_simhash_pairs", "q54_simhash64_pairs", "q57_boilerplate",
    "q58_repetition", "q61_contamination", "q62_det_split",
    "q63_salient_terms", "q65_token_budget", "q67_chunk_windows",
    "q68_sequence_pack", "q70_mixture_weights", "q71_line_dedup",
    "q72_pii_scrub", "q73_shard_manifest", "q74_training_pipeline",
    "q76_training_bins", "q77_incremental_labels")

  /** Fixed adversarial docs + ScalaCheck-generated whitespace/NBSP
    * mixes. doc_ids are stable so failures reproduce. */
  private lazy val edgeDir: String = {
    val fixed: Seq[String] = Seq(
      null, "", " ", "   ", "\t", "\n", "\u00A0", "\u00A0\u00A0",
      "a", " a ", "a b", "a\u00A0b", "word", "the the the",
      "\t\n x ", "é", "a" * 500, ("ab " * 50).trim)
    val alphabet =
      Gen.oneOf('a', 'b', ' ', '\t', '\u00A0', '\n', 'é')
    val gen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, alphabet).map(_.mkString))
    val random = (1 to 60).map(_ => gen.sample.getOrElse(""))
    val rows = (fixed ++ random).zipWithIndex.map { case (t, i) =>
      Row(i.toLong, t, if (i % 2 == 0) "en" else "sk", "edge",
        if (t == null) 0L else t.length.toLong)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = Files.createTempDirectory("graft_edge").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // local Row import for the builder above
  private type Row = org.apache.spark.sql.Row
  private def Row(vs: Any*): Row = org.apache.spark.sql.Row(vs: _*)

  family.foreach { name =>
    test(s"$name survives the null/empty/NBSP edge corpus with sane " +
        "counts and ratios") {
      val out = SparkEntry.queries(name)(spark, edgeDir)
      val rows = out.collect() // the first assertion: no throw
      out.schema.fields.zipWithIndex.foreach { case (f, i) =>
        val countish = f.name.startsWith("n_") || f.name == "hits" ||
          f.name == "total_hits"
        val ratioish = f.name.endsWith("_ratio") || f.name == "weight"
        rows.foreach { r =>
          if (!r.isNullAt(i)) {
            if (countish) f.dataType match {
              case LongType =>
                assert(r.getLong(i) >= 0L, s"$name.${f.name} negative")
              case IntegerType =>
                assert(r.getInt(i) >= 0, s"$name.${f.name} negative")
              case _ => ()
            }
            if (ratioish && f.dataType == DoubleType) {
              val v = r.getDouble(i)
              assert(!v.isNaN, s"$name.${f.name} is NaN")
              assert(v >= 0.0 && v <= 1.0,
                s"$name.${f.name} out of [0,1]: $v")
            }
          }
        }
      }
    }
  }
}

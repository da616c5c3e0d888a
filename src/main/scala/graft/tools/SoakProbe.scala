package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume-scaling soak for the document family (PLANS.md "would this
  * hold at 1000×?"): builds a k×-replicated documents corpus and
  * times the heavy registered queries on it, so the scaling SLOPE is
  * measured, not asserted.
  *
  * Replication preserves the workload's structure instead of
  * degenerating it: each replica's text is Caesar-rotated by its
  * replica index (`translate` over the a-z alphabet), so replicas
  * are shingle-disjoint on ALPHABETIC runs (no wholesale
  * cross-replica duplicate blowup — a 10×-duplicated corpus would
  * quadratically explode every LSH bucket) while each replica keeps
  * the original's near-dup pairs exactly. Two honest limits of the
  * trick: shingles made of digits/punctuation/whitespace are NOT
  * rotated and stay shared across replicas (one source of the
  * low-jaccard cross-replica pairs and hot band buckets observed at
  * high factors — the regime the MaxBandBucket cap exists for), and
  * the alphabet has 26 rotations, so factors above 26 would
  * reintroduce exact duplicate replicas (rejected at startup).
  * Expected behavior of a scale-correct operator: wall-clock ~linear
  * in k, ≥ threshold structure counts exactly k×.
  *
  * `runMain graft.tools.SoakProbe <sfDir> <factors...>` e.g.
  * `... /root/testdata/sf0.1 1 2 4 8`. Output: one JSON line per
  * factor with per-query seconds and result cardinalities.
  */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 2, 4)
    require(factors.forall(f => f >= 1 && f <= 26),
      s"factors must be in [1, 26] (got $factors): replica 26 would " +
        "Caesar-rotate back to an exact duplicate of replica 0")
    // NOTE: driver heap cannot be set here — the JVM is already
    // running (sbt runMain / java -cp). Size it at launch:
    // SPARK_DRIVER_MEM for sbt (build.sbt javaOptions) or -Xmx for
    // bare java. A spark.driver.memory config at this point is a
    // silent no-op.
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      ("q20_dedup_exact", graft.ops.DedupOps.dedupExact _),
      ("q21_minhash_lsh", graft.ops.DedupOps.minhashLsh _),
      ("q23_ngram_jaccard", graft.ops.DedupOps.ngramJaccard _),
      ("q48_dedup_clusters", graft.ops.DedupOps.dedupClusters _),
      ("q71_line_dedup", graft.ops.DedupOps.lineDedup _),
      ("q73_shard_manifest", graft.ops.LayoutOps.shardManifest _),
      ("q74_training_pipeline", graft.ops.PipelineOps.trainingPipeline _),
      ("q75_neardup_survivors", graft.ops.DedupOps.neardupSurvivors _),
      ("q76_training_bins", graft.ops.LayoutOps.trainingBins _),
      ("q77_incremental_labels", graft.ops.DedupOps.incrementalLabels _),
      // round-12 corpus-index family (documents-only, so replication
      // applies). Caesar-rotated replicas have disjoint vocabularies
      // (factor ≤ 26), so the expected structure slopes are: q81
      // postings rows k× (per-replica vocab, df flat), q82 pair rows
      // k× (co-occurrence never crosses replicas), q85/q86 rows k×
      // with per-doc values IDENTICAL across replicas (translate is a
      // bijection on a-z: char histograms permute, moments and gram
      // structure are invariant), q88 stays ≤ 4 verdict rows with
      // n_docs k× (flat-family, like q73's fixed manifest)
      ("q81_postings", graft.ops.CorpusOps.postings _),
      ("q82_term_lift", graft.ops.CorpusOps.termLift _),
      ("q85_char_diversity", graft.ops.CorpusOps.charDiversity _),
      ("q86_dup_ngram_rate", graft.ops.CorpusOps.dupNgramRate _),
      ("q88_quality_gate", graft.ops.CorpusOps.qualityGate _),
      // round-12 third batch. Expected slopes under Caesar-rotated
      // replication (disjoint per-replica vocabularies): q92
      // containment and q93 audit pairs stay per-replica (gram/band
      // equality never crosses replicas) → candidates k×, same family
      // as q23/q21; q91 is map + shard-window → rows k×, flat
      // structure; q95 source profiles absorb k rotated vocabularies
      // until SrcTermsK binds — the CAP is what holds the pair stage
      // flat, which is exactly the bound worth soaking.
      ("q91_epoch_shuffle", graft.ops.LayoutOps.epochShuffle _),
      ("q92_containment", graft.ops.DedupOps.bigramContainment _),
      ("q93_minhash_est_error", graft.ops.DedupOps.minhashEstError _),
      ("q95_source_similarity", graft.ops.CorpusOps.sourceSimilarity _))

    // The IVF nlist scaling rule, measured: fixed k holds per-bucket
    // size growing with the corpus (in-bucket pair work ~ n²/k →
    // quadratic), scaled k (k ∝ corpus) holds bucket size constant
    // (~linear). Fixed-k cells are capped at factor 4 — beyond that
    // they are the measured pathology, not information.
    def annQueries(factor: Int): Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
      val k0 = graft.ops.SimilarityOps.QuantizerK
      val scaled = Seq(
        ("q51_scaledK", (s: SparkSession, d: String) =>
          graft.ops.SimilarityOps.annQuantized(s, d, k = k0 * factor)),
        ("q55_scaledK", (s: SparkSession, d: String) =>
          graft.ops.SimilarityOps.annMultiProbe(s, d, k = k0 * factor)))
      val fixed = if (factor > 4) Nil else Seq(
        ("q51_fixedK", (s: SparkSession, d: String) =>
          graft.ops.SimilarityOps.annQuantized(s, d)))
      scaled ++ fixed
    }

    factors.foreach { k =>
      val soakDir = s"/tmp/graft_soak_f$k"
      val docs = graft.Tables.documents(spark, dir)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val reps = (0 until k).map { r =>
        val rot = alpha.drop(r % 26) + alpha.take(r % 26)
        docs.select(
          (col("doc_id") + lit(r.toLong * maxId)).as("doc_id"),
          translate(col("text"), alpha, rot).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _)
      reps.write.mode("overwrite").parquet(s"$soakDir/documents.parquet")
      // embeddings scale by per-replica DIMENSION rotation (the vector
      // analogue of the Caesar trick): norms and within-replica
      // geometry are preserved exactly, replicas land in different
      // IVF buckets, and the seed-centroid fold sees k× the corpus
      val emb = graft.Tables.embeddings(spark, dir)
      val maxVid = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
      val dims = emb.select(size(col("embedding"))).head().getInt(0)
      val embReps = (0 until k).map { r =>
        val rot = r % dims
        emb.select(
          (col("vec_id") + lit(r.toLong * maxVid)).as("vec_id"),
          expr(s"concat(slice(embedding, ${rot + 1}, ${dims - rot}), " +
            s"slice(embedding, 1, $rot))").as("embedding"),
          col("label"))
      }.reduce(_ unionAll _)
      embReps.write.mode("overwrite").parquet(s"$soakDir/embeddings.parquet")
      val cells = (queries ++ annQueries(k)).map { case (name, fn) =>
        val t0 = System.nanoTime()
        // count() forces the full plan; cardinality doubles as a
        // sanity check that structure scaled as predicted
        val n = fn(spark, soakDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        // the Bench isolation policy, plus the blocks Bench's
        // clearCache can't see: localCheckpoint RDDs (q21's pair set,
        // q48's label rounds) persist outside the catalog cache and
        // accumulated across cells — a round-8 soak measured q48 at
        // 48 s in-session vs 7.5-8.4 s isolated from exactly that
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(true))
        s""""$name":{"sec":${"%.2f".formatLocal(java.util.Locale.ROOT, secs)},"rows":$n}"""
      }
      // actual row count, not max(doc_id)+1 × k — sparse ids would
      // overstate the corpus and skew per-doc slope readings
      val nDocs = spark.read.parquet(s"$soakDir/documents.parquet").count()
      println(s"""{"soak_factor":$k,"docs":$nDocs,${cells.mkString(",")}}""")
    }
    spark.stop()
  }
}

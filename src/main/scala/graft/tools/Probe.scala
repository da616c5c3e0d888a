package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkEntry

/** Dev CLI: run one registered query (or a named extra op) against an
  * sf dir, print row count, optionally the formatted physical plan.
  *
  *   sbt "runMain graft.tools.Probe q03_revenue_join /root/testdata/sf0.01 --explain"
  *   sbt "runMain graft.tools.Probe streamDedup /root/testdata/sf0.01"
  */
object Probe {

  private def stage(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"STAGE $label n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  /** The q24 pair frame (both sides + native dot), shared by the
    * cosineStages / cosineTopkAgg decompositions so the two time the
    * same pair-generation work. */
  private def cosinePairs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, sfDir)
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
    val a = e.select($"vec_id", $"embedding".as("ea"), $"nrm".as("na"))
    val b = e.select($"vec_id".as("neighbor_id"), $"embedding".as("eb"),
      $"nrm".as("nb"))
    a.join(b, $"vec_id" =!= $"neighbor_id")
      .withColumn("cos_sim", expr("vec_dot(ea, eb)") / ($"na" * $"nb"))
  }

  def main(args: Array[String]): Unit = {
    // flags are not positional operands: `Probe q03 --bench` must use
    // the default sf dir, not try to read parquet under "--bench"
    val positional = args.filterNot(_.startsWith("--"))
    val name = positional(0)
    val sfDir =
      if (positional.length > 1) positional(1) else "/root/testdata/sf0.01"
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // extensions applied at build time — every Functions.all entry is
    // SQL-visible with no imperative register() (GraftExtensions)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = name match {
      case "streamDedup" => graft.streaming.StreamOps.streamDedup(spark, sfDir)
      case "statefulUserCounts" =>
        graft.streaming.StreamOps.statefulUserCounts(spark, sfDir)
      case "bucketedJoin" =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        graft.ops.LayoutOps.bucketedJoin(spark, sfDir, 4)
      case "crzXmlOnly" =>
        // Pipeline facade with no legacy CSV: XML-only contract source
        val run = graft.crz.Pipeline.run(spark, graft.crz.Pipeline.Config(
          xmlDir = "fixtures/crz/xml",
          legacyCsv = None,
          companiesCsv = "fixtures/crz/companies.csv",
          resortsCsv = "fixtures/crz/resorts.csv",
          keywordsTxt = "fixtures/crz/keywords.txt",
          corpusDir = "fixtures/crz/contracts_text",
          dictionaryDic = "fixtures/crz/dictionary/sk_fixture.dic",
          params = graft.crz.CleanFilter.Params(
            minPrice = new java.math.BigDecimal("1000"))))
        println(s"PROBE contracts=${run.contracts.count()} " +
          s"quarantined=${run.quarantined.count()} kept=${run.clean.count()}")
        run.audit
      case "extensionsDemo" =>
        // no Functions.register anywhere on this path: the functions
        // resolve because GraftExtensions injected them at build time
        spark.sql(
          "SELECT count_occurrences('aaaa', 'aa') AS cnt, " +
            "vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
            "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot")
      case "minhashStages" =>
        // timing decomposition of the ROUND-1 composed-expression
        // minhash shape — kept as the comparison baseline for the
        // shipped native minhash_sig kernel (see PLANS.md), NOT the
        // pipeline q21 executes today. Every stage aggregates OVER the
        // computed column — a bare count() would let ColumnPruning
        // delete the very work being timed.
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val docs = graft.Tables.documents(spark, sfDir)
        stage("scan+length")(
          docs.select(sum(length($"text"))).head().getLong(0))
        val withSet = docs.where(length($"text") >= 5)
          .select($"doc_id", lower($"text").as("t"))
          .select($"doc_id", expr(
            "array_distinct(transform(sequence(1, length(t) - 4), " +
              "i -> substring(t, i, 5)))").as("ss"))
        stage("shingle-sets")(
          withSet.select(sum(hash($"ss")).cast("long")).head().getLong(0))
        val withDg = withSet.withColumn("dg", expr("transform(ss, s -> md5(s))"))
        stage("digests")(
          withDg.select(sum(hash($"dg")).cast("long")).head().getLong(0))
        val sigExprs = (0 until 8).map(p =>
          expr(s"array_min(transform(dg, d -> substring(d, ${p * 4 + 1}, 4)))")
            .as(s"m$p"))
        val sig = withDg.select(($"doc_id" +: $"ss" +: sigExprs): _*).cache()
        stage("sig-mins+cache")(sig.count())
        val bands = sig.select($"doc_id", lit(0).as("band"),
            concat($"m0", $"m1", $"m2", $"m3").as("key"))
          .union(sig.select($"doc_id", lit(1).as("band"),
            concat($"m4", $"m5", $"m6", $"m7").as("key")))
        val a = bands.as("a"); val b = bands.as("b")
        val cand = a.join(b,
            $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
              $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
          .distinct().cache()
        stage("candidates")(cand.count())
        val setsA = sig.select($"doc_id".as("doc_a"), $"ss".as("ssa"))
        val setsB = sig.select($"doc_id".as("doc_b"), $"ss".as("ssb"))
        val inter = cand.join(setsA, "doc_a").join(setsB, "doc_b")
          .withColumn("n_inter", size(array_intersect($"ssa", $"ssb")))
        stage("verify-intersect")(
          inter.select(sum($"n_inter").cast("long")).head().getLong(0))
        spark.emptyDataFrame
      case "cosineStages" =>
        // timing decomposition of q24: pair generation + dot vs window
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val pairs = cosinePairs(spark, sfDir)
        stage("pairs+dot")(pairs.select($"vec_id", $"neighbor_id", $"cos_sim")
          .filter($"cos_sim" > 2.0).count()) // forces dot eval, empty result
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id").orderBy($"cos_sim".desc, $"neighbor_id")
        stage("window-top5")(pairs
          .select($"vec_id", $"neighbor_id", $"cos_sim")
          .withColumn("rn", row_number().over(w)).where($"rn" <= 5).count())
        spark.emptyDataFrame
      case "cosineTopkAgg" =>
        // q24 alternative: bounded topk_neighbors aggregate instead of
        // the row_number window — compare timings with cosineStages
        import org.apache.spark.sql.functions._
        import spark.implicits._
        stage("agg-top5")(cosinePairs(spark, sfDir)
          .groupBy($"vec_id")
          .agg(expr("topk_neighbors(struct(cos_sim, neighbor_id), 5)").as("top"))
          .select($"vec_id", posexplode($"top"))
          .count())
        spark.emptyDataFrame
      case "mediaFeatures" => graft.ops.MultimodalOps.mediaFeatures(spark, sfDir)
      case "layoutDemo" =>
        val out = java.nio.file.Files.createTempDirectory("graft_layout").toString
        graft.ops.LayoutOps.writeDatePartitioned(
          graft.Tables.orders(spark, sfDir), "o_orderdate", out)
        println(s"PROBE layout written to $out")
        graft.ops.LayoutOps.prunedMonthlyCounts(spark, out,
          Seq("1996-01", "1996-02"))
      case q => SparkEntry.queries(q)(spark, sfDir)
    }
    if (explain) df.explain("formatted")
    println(s"PROBE name=$name rows=${df.count()}")
    if (args.contains("--bench")) {
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          // bench-style timing: two further full executions on the warm
          // JVM (the first run above absorbed JIT + parquet footers)
          for (i <- 1 to 2) {
            spark.catalog.clearCache()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            println(f"PROBE bench run$i=${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
        case None =>
          println(s"PROBE --bench skipped: '$name' is a probe-only op, " +
            "not a registered query")
      }
    }
    df.show(5, truncate = false)
    spark.stop()
  }
}

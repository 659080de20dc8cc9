package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-cliff probe (round-11 stretch): run the scale-sensitive
  * corpus queries against a [[MakeScaledData]] dir (≈ sf1) at the
  * bench's local[32] shape and print one BENCH-style JSON line with
  * per-query minimums — the artifact that shows whether any operator's
  * cost curve bends worse than the ~10× the data grew (shuffle spill,
  * broadcast-threshold flips, quadratic candidate growth).
  *
  * Round 12 adds the most expensive `lake_*` SCENARIO queries: their
  * builders read the probe dir's (10×) orders table, so the whole
  * scenario — table build, commits, CoW/MoR mutation, read-back —
  * scales with the input and the probe sees the commit protocol's cost
  * curve, not just the analytics operators'. The fresh-catalog
  * scenarios rebuild per rep (every rep times the full mutation); the
  * memoized SQL scenario (`lake_sql_merge_full`) mutates on rep 1 and
  * times the steady-state read after — its min is the read path.
  *
  * Usage: runMain graft.tools.BenchScaled [scaledDir] [reps]
  */
object BenchScaled {
  /** Queries whose input is the testdata corpus (scale with SF),
    * picked for scale risk: wide shuffles, window sorts, candidate
    * joins, banded dedup, broadcast gates, commit-protocol scenarios. */
  val Targets: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q_running_frames", "q_ev_sliding", "q_ev_sessionize",
    "contamination_check", "dedup_ngram_jaccard", "dedup_clusters",
    "dedup_minhash", "dedup_simhash", "dedup_substring",
    "dedup_retention", "data_mixture", "keyword_extraction",
    "doc_packing", "token_frequency", "cosine_topk_brute", "ann_lsh",
    "semdedup", "lm_perplexity", "dsir_select", "bm25_topk",
    "pipeline_funnel", "knn_classify", "cluster_cap_sample",
    "perplexity_buckets", "nb_quality_classify", "rrf_fusion",
    "ngram_novelty", "image_phash_dedup", "audio_fingerprint_dedup",
    "passage_dedup", "bloom_dedup", "heavy_hitters", "graph_pagerank",
    "q_ev_cohort_retention", "mmr_diversify", "q_ev_resample_ffill",
    "q_weighted_median", "q_ev_anomaly_mad", "bpe_learn_merges",
    "q_market_basket", "q_ev_markov", "q_ev_rfm",
    // round-13 additions: the labels twins (the modal dedups' runnable
    // 100-TB path must SHOW sublinear), the element/corr-agg row-level
    // scenarios, and the round-12 stragglers the verdict listed unprobed
    "image_phash_clusters", "audio_fingerprint_clusters",
    "lake_sql_update_element", "lake_sql_update_corr_agg",
    "lang_confusion", "q_k_anonymity", "c4_filter", "q_sql_lateral_topn",
    // round-13 second wave: retrieval artifacts, tokenizer encode,
    // graph ops, the kmeans trainer, and the event-analytics additions
    "textrank_keywords", "inverted_index", "vocab_growth", "bpe_encode",
    "collocations", "hash_split", "winnow_fingerprint", "kmeans_train",
    "graph_triangles", "q_ev_attribution", "q_ev_ab_readout",
    "q_ev_percentiles", "q_ev_ltv", "q_ev_twa", "q_ev_overlap",
    "q_ev_forecast", "sq8_error", "q_sql_recursive",
    "lake_changelog", "lake_compact", "lake_merge_mor", "lake_prune",
    "lake_merge_upsert", "lake_sql_merge_full",
    // round-13 third wave: PQ encode (corpus-sized fan-out/rollup), the
    // skyline (pruning must hold the verify window small), the big-big
    // Q18 join, and the new event statistics
    "pq_encode", "pq_recall", "q_pareto_frontier", "q_large_orders",
    "q_ev_autocorr", "q_ev_changepoint", "q_ev_seq_patterns", "q_ev_paths",
    "q_ev_survival", "q_ev_cuped", "q_ev_seasonality",
    "lake_row_lineage", "q_text_roundtrip",
    // round-14: the Y4M codec (decode is the modal family's cost
    // center), the simhash linear twin (the pair path's escape must
    // show sublinear), the embedding-family additions, and the
    // incremental-MV scenario (refresh cost must track the delta)
    "multimodal_video_codec", "simhash_clusters", "hard_negatives",
    "ngram_diversity", "embedding_drift", "lake_incr_mv",
    "q_trade_volume", "q_multi_supplier_orders", "split_contamination",
    "minhash_accuracy", "q_ev_bounce_rate",
    // round-15: the ANN hard-negative swap-in (its whole point is the
    // scale posture vs the brute twin) and its recall scorer
    "hard_negatives_ann", "hard_negatives_recall", "ivf_ann",
    // round-16: the filtered incremental view (delta filter + rescan
    // must stay delta-proportional) and the variant life cycle (binary
    // re-encode rides every rewrite)
    "lake_incr_mv_filtered", "q_ev_variant", "lake_changelog_stream",
    // round-18: the derived-output and dim-enriched MV scenarios get
    // build/query phase decomposition at scale (round-17 ask #9), and
    // the three new MV capabilities ride the same probe — the star
    // join's dual broadcast, the distinct companion's second slot
    // table, and the transparent rewrite's view-read fast path
    "lake_incr_mv_avg", "lake_incr_mv_dim", "lake_incr_mv_star",
    "lake_incr_mv_distinct", "lake_mv_rewrite")

  /** Every [[graft.queries.Corpus.prepare]] artifact, the targets that
    * read it (directly or through a wrapper query), and its builder —
    * the ONE place subset prep derives from. The exact-jaccard pair
    * artifact is quadratic-OUTPUT in the replica corpus by construction
    * (every doc gains C−1 near-dup twins above the 0.5 threshold — at
    * C=100 that is ~99 true pairs per doc, ~70 GB of verify-join
    * spill), so the 100× probe must not pay for it when no target
    * consumes it. */
  private val PrepArtifacts: Seq[(String, Set[String],
      (SparkSession, String) => Unit)] = Seq(
    ("bucketed_tables", Set("q_bucketed_join"),
      graft.queries.JoinExtraQueries.prepareBucketed),
    ("ivf_index", Set("ivf_ann", "ivf_recall", "semdedup",
      "cluster_cap_sample", "ctfidf_topics", "hard_negatives_ann",
      "hard_negatives_recall"),
      graft.queries.SimilarityQueries.prepareIvfIndex),
    ("lsh_index", Set("ann_lsh", "ann_recall", "dedup_embedding"),
      graft.queries.SimilarityQueries.prepareLshIndex),
    ("jaccard_pairs", Set("dedup_ngram_jaccard", "dedup_clusters",
      "dedup_retention", "minhash_accuracy"),
      graft.queries.TextQueries.prepareJaccardPairs))

  /** Fixed-work calibration (round-15 verdict ask): data-INDEPENDENT
    * probes of the three machine dimensions the targets actually
    * exercise — pure CPU (a hash loop over a constant range), one
    * fixed-size shuffle (8M rows → 100k groups), and disk (write +
    * read-back + delete of a constant ~150 MB incompressible parquet).
    * Run before and after every probe so two probe runs (sf1 vs sf10,
    * or r(N) vs r(N−1)) can be compared RAW and NORMALIZED: a target
    * ratio that survives dividing by the matching calibration ratio is
    * a real cost-curve bend; one that vanishes is machine drift — the
    * distinction round 15 asserted but could not prove. */
  def calibrate(spark: SparkSession): Map[String, Double] = {
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val cpu = time {
      spark.range(0L, 256000000L, 1L, 32)
        .selectExpr("sum(hash(id, id + 1, id + 2))").collect()
    }
    val shuffle = time {
      spark.range(0L, 8000000L, 1L, 32).selectExpr("id % 100000 AS k")
        .groupBy("k").count().selectExpr("sum(count)").collect()
    }
    // memory-BANDWIDTH probe: 64M rows hashed into 16M groups makes the
    // aggregation hash tables outgrow cache, so this component degrades
    // under host-level memory-bus contention that the cache-resident
    // cpu loop cannot see — the signature suspected behind sf10-only
    // regressions with flat sf0.1 floors
    val mem = time {
      spark.range(0L, 64000000L, 1L, 32)
        .selectExpr("(id * 2654435761) % 16000000 AS k")
        .groupBy("k").count().selectExpr("sum(count)").collect()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_calib_")
    val disk = time {
      // hash(id) twice → ~16 incompressible bytes/row × 10M rows
      spark.range(0L, 10000000L, 1L, 32)
        .selectExpr("hash(id) AS a", "hash(id + 7) AS b",
          "hash(id + 13) AS c", "hash(id + 29) AS d")
        .write.mode("overwrite").parquet(dir.toString)
      spark.read.parquet(dir.toString).selectExpr("sum(a)").collect()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    Map("cpu" -> cpu, "shuffle" -> shuffle, "mem" -> mem, "disk" -> disk)
  }

  /** MoR read-cost attribution (round-16 verdict ask #5): the
    * lake_merge_mor scenario's QUERY phase grows with ACCUMULATED
    * tombstones — exactly the degradation maintenance cadence exists
    * to bound. This probe makes the curve attributable: it rebuilds
    * the scenario, reports the LIVE tombstone population (equality
    * delete files + their key rows), times the MoR read before
    * maintenance, runs `rewritePositionDeletes` (the cadence step),
    * and times the read again — the claim under test is that the
    * post-compaction read returns to the flat tombstone-free cost at
    * every scale. */
  private def morProbe(spark: SparkSession, sfDir: String)
      : Seq[(String, Double)] = {
    import org.apache.spark.sql.functions.col
    val src = graft.queries.Tables.orders(spark, sfDir)
    val cat = graft.lake.LakeCatalog.open(
      java.nio.file.Files.createTempDirectory("graft_morprobe_").toString)
    val t = cat.createTable("probe", "orders_mor", src.schema)
    t.appendData(src, numFiles = 4)
    val tenth = src.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = tenth.withColumn("o_orderkey",
      col("o_orderkey") + 100000000L)
    t.refresh().mergeIntoMoR(spark, tenth.unionByName(inserts),
      Seq("o_orderkey"))
    val snap = t.refresh().metadata.currentSnapshot.get
    def readSec(): Double = {
      val t0 = System.nanoTime()
      t.refresh().newScan().toDF(spark).count()
      (System.nanoTime() - t0) / 1e9
    }
    val pre = Seq(readSec(), readSec()).min
    val m0 = System.nanoTime()
    t.refresh().rewritePositionDeletes(spark)
    val maint = (System.nanoTime() - m0) / 1e9
    val post = Seq(readSec(), readSec()).min
    Seq(
      "eq_delete_files" -> snap.eqDeleteFiles.size.toDouble,
      "tombstone_rows" -> snap.eqDeleteFiles.map(_.recordCount).sum.toDouble,
      "pos_delete_files" -> snap.deleteFiles.size.toDouble,
      "dv_files" -> snap.dvFiles.size.toDouble,
      "query_pre_maintenance_sec" -> pre,
      "rewrite_position_deletes_sec" -> maint,
      "query_post_maintenance_sec" -> post)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val reps = if (args.length > 1) args(1).toInt else 2
    // optional third arg: comma-separated target subset — the sf10
    // (100×) probe runs only the scale-sensitive dozen, not all 93
    val targets =
      if (args.length > 2) { val w = args(2).split(',').map(_.trim).toSet
        Targets.filter(w) } else Targets
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.lake.sql.LakeSqlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the dedup_simhash pair-budget gate FIRES at this replica's dup
    // rate × 10 (the protective refusal working as designed — the
    // probe that motivated it); disable it here so the probe still
    // measures the pair path's cost CURVE rather than a refusal
    spark.conf.set("graft.simhashDedup.pairBudget", "0")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    val prep0 = System.nanoTime()
    // Subset runs prepare ONLY the artifacts their targets read,
    // derived from the artifact→consumers map below (round-15 advice:
    // no hand-listed family sets inside the branch) and LOG what was
    // skipped — a future target reading an unlisted artifact still
    // self-builds through SessionMemo inside its first rep, but the
    // skip line makes that attribution explicit instead of silent.
    if (args.length <= 2) graft.queries.Corpus.prepare(spark, sfDir)
    else PrepArtifacts.foreach { case (artifact, consumers, build) =>
      if (targets.exists(consumers)) build(spark, sfDir)
      else println(s"""{"prep_skipped":"$artifact"}""")
    }
    val prepSec = (System.nanoTime() - prep0) / 1e9
    val calibBefore = calibrate(spark)
    val wall0 = System.nanoTime()
    // per rep: (build_sec, query_sec). The lake SCENARIO queries do
    // their catalog build + commits + mutations EAGERLY inside the
    // queries() call and return a lazy scan, so the call itself is the
    // build/ingest phase and the count() is the query phase (round-15
    // verdict ask #4: lake_prune's 7.17× needed decomposing into
    // ~linear ingest vs ~flat pruned scan). For pure analytics targets
    // the call is lazy and build_sec ≈ 0.
    val times = scala.collection.mutable.Map
      .empty[String, Vector[(Double, Double)]]
      .withDefaultValue(Vector.empty)
    for (_ <- 0 until reps; name <- targets) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val sample = try {
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      } catch { case _: Throwable => (-1.0, -1.0) }
        finally graft.queries.QueryCaches.clear()
      times(name) = times(name) :+ sample
    }
    // min over reps of the TOTAL (comparable with every prior round);
    // build/query report the phases of the rep that achieved it
    val mins = targets.map(n => n -> {
      val ts = times(n)
      if (ts.exists(_._1 < 0)) (-1.0, -1.0, -1.0)
      else {
        val (b, q) = ts.minBy { case (b, q) => b + q }
        (b + q, b, q)
      }
    })
    val wall = (System.nanoTime() - wall0) / 1e9
    val mor = if (targets.contains("lake_merge_mor"))
      Some(morProbe(spark, sfDir)) else None
    val calibAfter = calibrate(spark)
    // Locale.ROOT: default-locale %.3f renders comma decimals on e.g.
    // de_DE JVMs — invalid JSON, the same artifact-parse failure class
    // as the round-9 sbt-prefix bug
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def cjson(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${f3(v)}""" }
        .mkString("{", ",", "}")
    val qjson = mins.map { case (n, (t, _, _)) => s""""$n":${f3(t)}""" }
      .mkString("{", ",", "}")
    val bjson = mins.map { case (n, (_, b, _)) => s""""$n":${f3(b)}""" }
      .mkString("{", ",", "}")
    val sjson = mins.map { case (n, (_, _, q)) => s""""$n":${f3(q)}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scaled_total","value":${f3(
      mins.map(_._2._1).filter(_ >= 0).sum)},"unit":"sec",""" +
      s""""queries":$qjson,"queries_build":$bjson,""" +
      s""""queries_query":$sjson,"sf":"$sfDir","reps":$reps,""" +
      s""""calib_before":${cjson(calibBefore)},""" +
      s""""calib_after":${cjson(calibAfter)},""" +
      mor.map(m => "\"mor_probe\":" + m.map { case (k, v) =>
        s""""$k":${f3(v)}""" }.mkString("{", ",", "},")).getOrElse("") +
      s""""prep":${f3(prepSec)},"wall":${f3(wall)}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sensitivity harness behind BASELINE.md's validation tables.
  *
  * Mode `docs` (default): documents/embeddings replicated k× (ids
  * shifted per replica, so every doc exists in k byte-identical copies —
  * the near-dup worst case) and the dedup / similarity / pipeline-prep
  * queries timed at each factor.
  *
  * Mode `tpch`: lineitem/orders replicated k× with co-shifted order keys
  * (joins stay 1:1 per replica; customers unchanged, so each customer
  * accumulates k× orders — realistic fact-table growth over a stable
  * dimension) and the relational queries timed at each factor.
  *
  * Prints one JSON line per (factor, query) with secs + rows.
  *
  * Mode `events`: the events table replicated k× with co-shifted
  * event/user ids (disjoint users per replica — the stream grows in user
  * count, the realistic direction) and the sessionization / event-
  * analytics queries timed at each factor.
  *
  * Mode `layout`: lineitem/orders replicated as in tpch mode, then the
  * order-revenue join (join + groupBy, both on the order key) timed over
  * plain parquet versus co-bucketed tables — auto-broadcast disabled so
  * the plan shows what a both-sides-large join does. Prints the one-time
  * bucketed-write cost and asserts the bucketed plan executed with ZERO
  * Exchange (the LayoutsSpec contract, demonstrated here at benchmark
  * scale: the write-time shuffle is paid once, every keyed query after
  * rides it for free).
  *
  * Mode `skew`: events replicated k×, then 90% of all rows re-keyed
  * onto ONE hot user (the celebrity-key pathology) and the user-dimension
  * join timed three ways — AQE skew-split (Spark's runtime answer), AQE
  * off (what a 1000-executor job does when one partition holds a third
  * of the corpus), and `Skew.saltedJoin` (the explicit fallback, AQE
  * off). Row counts are asserted equal across all three.
  *
  * Mode `hotsource`: documents replicated k×, then 90% of ALL rows
  * re-keyed onto ONE source (the dominant-feed pathology) and the
  * per-source rank-statistic queries timed — these must stay flat
  * because `Ranking.prefixCum` splits a hot source across rank buckets
  * (q198 further reduces to the per-source score-frequency table); a
  * `partitionBy(source)` window would serialize 90% of the corpus
  * through one task here.
  *
  * Mode `maintain`: embeddings replicated k× with DISTINCT content per
  * replica (a per-replica sign-flip pattern — byte-identical replicas
  * would be absorbed by the dedup-first rep election and the base
  * would never grow), then the incremental route-index maintenance
  * (`VecStreams.maintainRouteEdges`) timed at each BASE size with a
  * FIXED 200-vector delta — the axis the round-12 verdict named: with
  * the signature table carried in the state, per-fold cost must track
  * the delta + touched buckets, not the base corpus. Plane count grows
  * with the corpus (r = log2(reps/64) bits per band) so band-bucket
  * occupancy stays bounded — the q293 scale rule, without which
  * candidate volume per delta vector grows linearly in the base and
  * the measurement would conflate geometry with maintenance cost.
  * Prints the one-time init (base build) and TWO successive folds
  * (fold2 is the steady state; fold1 additionally pays JIT).
  *
  * Usage: ScaleBench [docs|tpch|events|layout|skew|stream|hotsource|
  *        maintain] [outBaseDir] [factors...]
  *        (defaults: docs /tmp/graft_scale 1 3 10)
  */
object ScaleBench {

  private val docQueries = Seq(
    "q13_exact_duplicates", "q14_minhash_signatures", "q15_minhash_candidates",
    "q16_jaccard_pairs", "q18_cosine_near_dup_pairs",
    "q27_simhash", "q28_simhash_near_dups",
    "q39_deduped_jaccard", "q41_dedup_clusters",
    "q17_cosine_topk", "q19_ann_ivf_topk", "q31_srp_lsh_ann",
    "q45_doc_chunks", "q46_quality_topk_per_lang", "q47_stratified_sample",
    "q48_text_cleaning", "q49_char_bigram_profile", "q50_label_centroid_stats",
    "q51_cosine_near_dup_lsh", "q52_repetition_ratio", "q53_boilerplate_phrases",
    "q54_knn_graph", "q55_quantization_error", "q56_training_mix",
    "q67_tfidf_top_terms", "q68_sequence_packing", "q69_semantic_dedup",
    "q70_pagerank_knn", "q72_embedding_decontamination", "q73_quality_classifier",
    "q74_kmeans_assign", "q75_source_reputation", "q76_temperature_mix",
    "q77_duplicated_windows", "q78_gopher_rules", "q79_incremental_dedup",
    "q80_substring_dedup_cut", "q81_gram_novelty", "q82_knn_triangles",
    "q83_balanced_sample", "q84_bigram_pmi", "q85_contamination_report",
    "q86_bm25_topk", "q87_source_divergence", "q88_containment_pairs",
    "q89_char_profile", "q90_cross_source_dups", "q91_winnowing",
    "q92_perplexity_buckets", "q93_winnowing_candidates", "q94_shard_manifest",
    "q95_source_vocab_overlap", "q97_bigram_logprob", "q98_knn_label_vote",
    "q99_minhash_estimate", "q100_source_health", "q101_inverted_index",
    "q102_phrase_search", "q103_snapshot_diff", "q104_blocklist_scrub",
    "q105_principal_component", "q106_quality_keeper", "q107_training_order",
    "q119_zipf_profile",
    "q121_pii_scrub", "q127_vocab_oov", "q128_split_assign",
    "q130_frame_manifest", "q131_vocab_growth", "q132_lsh_purity",
    "q134_resize_audit", "q135_kcore", "q137_skipgram_pmi",
    // q145 edit-verify is deliberately absent: its cost is
    // candidate-pair-bound (exact Levenshtein per pair), and the
    // replicated corpus — every doc duplicated k ways — maximizes the
    // candidate set by construction; run it via
    // SPARK_GRAFT_SCALE_QUERIES when the pair budget is understood
    "q138_sketch_union", "q148_prefix_join",
    "q152_token_entropy", "q154_weighted_sample", "q155_vocab_gini",
    "q158_mi_lang_source", "q159_weighted_median",
    // q162 carries the q16 pair hazard (Σ df² quadratic in per-shingle
    // duplication on the replicated corpus) — its scale row documents
    // the same dedup-first remedy rather than hiding it
    "q162_tfidf_cosine_pairs", "q164_dataset_card", "q166_mg_heavy_hitters",
    "q170_label_propagation", "q171_triplet_mining",
    "q172_source_keyness", "q174_kcenter_coreset", "q175_lpa_modularity",
    "q176_bpe_merges", "q177_adamic_adar", "q179_roc_auc",
    "q180_token_budget", "q181_calibration_bins", "q182_em_mixture",
    // q186 dedup-eval is deliberately absent for the q145 reason: its
    // ground-truth arm is the exact-Jaccard pair join, and the
    // replicated corpus maximizes the pair count by construction; the
    // md5-sampled twin q222 IS in the sweep — its scale row is the
    // evidence that the sample bounds the truth arm
    "q183_burrows_delta", "q184_pq_codebook", "q185_bpe_fertility",
    "q187_coverage_curve", "q189_embedding_outliers",
    "q190_optimal_threshold", "q191_group_split", "q192_knn_hubness",
    // q196 shares q186's exact-Jaccard arm and its replicated-corpus
    // hazard — its sampled twin q223 runs in its place
    "q194_frequent_pairs", "q195_rule_ablation", "q197_compaction_plan",
    "q198_sliced_auc", "q199_negative_sampling", "q201_retrieval_agreement",
    "q202_k_anonymity", "q203_sentence_stats", "q205_temperature_ess",
    "q206_cluster_profile", "q207_cramers_v", "q209_assortativity",
    // q212 is deliberately absent: its 16x1 arm is the
    // maximal-candidate regime by construction on a replicated corpus
    "q210_zipf_fit", "q211_rank_biased_overlap", "q213_bfs_levels",
    "q214_query_expansion", "q215_weighted_jaccard",
    "q216_knn_components", "q220_kcore_fixpoint", "q221_bfs_complete",
    "q222_dedup_eval_sampled", "q223_s_curve_sampled",
    "q224_lpa_fixpoint", "q225_pagerank_fixpoint", "q226_domain_cap",
    "q227_dsir_weights", "q228_kmv_source_overlap", "q229_lang_mixture",
    "q230_kmv_source_distinct", "q231_kmeans_fixpoint",
    "q232_stupid_backoff", "q233_label_centroid_cosine",
    "q234_kmeans_silhouette", "q235_lr_quality_train", "q236_scd2_history",
    "q237_hits_fixpoint", "q238_weighted_sample", "q239_label_dispersion",
    "q240_readability", "q241_margin_alignment", "q242_knn_outliers",
    "q243_decontam_bloom", "q244_harmonic_centrality",
    "q245_distinct_ngrams", "q246_wasserstein_drift", "q247_ndcg_at_k",
    "q248_matryoshka_audit", "q249_clustering_coeff", "q250_cdc_chunks",
    "q251_cdc_sweep", "q252_label_noise", "q253_bpe_encode",
    "q254_contamination_gate", "q255_top_eigenvector",
    "q256_spectral_energy", "q257_personalized_pagerank",
    "q261_score_lift", "q262_dominant_share", "q263_png_roundtrip",
    "q264_label_spectral_energy", "q265_real_codec_audit",
    "q268_ingest_audit", "q269_pq_adc_topk", "q270_adc_recall",
    "q271_trained_pq_recall", "q275_decontam_excise",
    "q276_residual_pq", "q277_pq_codebook_sweep", "q280_ivf_pq_topk",
    "q293_graph_route_ann", "q294_beam_route_ann",
    "q295_ivf_pq_trained_topk", "q296_graph_route_wide",
    "q297_beam_route_wide", "q298_route_edges",
    "q299_maintained_route_edges", "q300_filtered_ivf_topk",
    "q301_filtered_ivf_selectivity", "q302_cell_partitioned_ivf",
    "q303_filtered_adc_topk", "q304_route_entry_compare",
    "q305_ann_family_table")

  private val tpchQueries = Seq(
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_orders",
    "q06_top_orders_per_customer", "q12_brand_revenue_by_region",
    "q29_approx_distinct", "q37_price_quantiles", "q42_moving_revenue",
    "q44_correlated_subquery", "q71_column_profile",
    "q111_zorder_locality", "q114_bloom_prune", "q115_numeric_correlation",
    "q120_key_skew", "q149_spearman_corr", "q150_benford_prices",
    "q151_scd2_history", "q156_interval_merge", "q173_rfm_segments",
    "q217_fk_audit", "q218_order_reconciliation",
    "q259_small_qty_revenue", "q260_order_holding_suppliers",
    "q266_dominant_part_suppliers", "q267_lapsed_customers",
    "q273_part_value_concentration", "q274_part_supplier_census",
    "q278_customer_order_distribution", "q279_top_revenue_supplier",
    "q281_min_cost_supplier", "q282_late_priority_census",
    "q283_local_supplier_volume", "q284_forecast_revenue",
    "q285_nation_pair_volume", "q286_national_market_share",
    "q287_product_line_profit", "q288_returned_item_customers",
    "q289_lateness_priority_census", "q290_promo_revenue_share",
    "q291_large_volume_customers", "q292_disjunctive_revenue")

  private val eventQueries = Seq(
    "q25_user_sessions", "q26_hourly_event_counts", "q34_session_windows",
    "q35_asof_attribution", "q36_range_join_conversions", "q40_json_props",
    "q60_funnel", "q61_retention_cohorts", "q62_value_outliers",
    "q96_user_burstiness", "q112_event_gapfill", "q113_decayed_engagement",
    "q116_event_paths", "q117_daily_autocorr", "q118_dow_seasonality",
    "q122_rolling_active", "q123_changepoint", "q124_ewma_daily",
    "q125_mad_outliers", "q126_psi_drift", "q129_transition_matrix",
    "q133_anomaly_days", "q136_daily_trend", "q139_asof_forward",
    "q153_ks_drift", "q157_event_mode", "q160_novelty_curve",
    "q161_markov_stationary", "q163_winsorized_stats",
    "q165_audience_overlap", "q167_jackknife_ci", "q168_ab_lift",
    "q169_funnel_latency", "q178_kaplan_meier", "q188_lagged_xcorr",
    "q193_sax_symbols", "q200_simpson_check", "q204_conversion_windows",
    "q208_entropy_rate", "q258_position_attribution",
    "q272_event_stream_audit")

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("docs")
    val base = args.drop(1).headOption.getOrElse("/tmp/graft_scale")
    val factors = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 3, 10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build()
    import spark.implicits._

    /** Replicate `table` k× shifting every column in `shiftCols` by
      * rep × (global max over those columns + 1) — co-shifted keys keep
      * intra-replica joins intact and replicas disjoint.
      */
    def replicate(table: String, shiftCols: Seq[String], k: Int, outDir: String,
        shiftBase: Long): Unit = {
      val df = spark.read.parquet(s"$srcDir/$table.parquet")
      val reps = spark.range(k).select($"id".as("rep"))
      val shifted = shiftCols.foldLeft(df.crossJoin(reps)) { (d, c) =>
        d.withColumn(c, col(c) + $"rep" * shiftBase)
      }
      shifted.drop("rep").write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }

    // byte copy, not read→write: unchanged tables keep their exact
    // physical schema (events.parquet is TIMESTAMP(NANOS), which a plain
    // Spark read rejects — its readers opt in via nanosAsLong)
    def copyTable(table: String, outDir: String): Unit = {
      import java.nio.file._
      val src = Paths.get(s"$srcDir/$table.parquet")
      val dst = Paths.get(s"$outDir/$table.parquet")
      Files.createDirectories(dst.getParent)
      if (Files.isDirectory(dst)) { // stale Spark-written dir from a prior run
        import scala.jdk.CollectionConverters._
        Files.walk(dst).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }

    // max over ALL shifted columns + 1, as replicate()'s contract needs:
    // shifting event_id and user_id by max(event_id)+1 alone only keeps
    // replica user spaces disjoint while user ids happen to stay below
    // event ids — sparse event ids or dense user ids would silently
    // create cross-replica user collisions (per-user depth, not count)
    def maxOf(table: String, idCols: String*): Long = {
      val widest = // greatest() requires 2+ args
        if (idCols.sizeIs == 1) col(idCols.head) else greatest(idCols.map(col): _*)
      spark.read.parquet(s"$srcDir/$table.parquet")
        .agg(max(widest)).head().getLong(0) + 1
    }

    val allQueries = mode match {
      case "tpch" => tpchQueries
      case "events" => eventQueries
      case "layout" => Seq("layout_join") // custom runner below, not SparkEntry
      case "skew" => Seq("skew_join")     // custom runner below, not SparkEntry
      case "stream" => Seq("stream_ingest") // custom runner below, not SparkEntry
      case "maintain" => Seq("maintain_fold") // custom runner below, not SparkEntry
      case "keeperskew" => Seq("keeper_skew_q39") // custom runner below, not SparkEntry
      case "hotsource" =>
        // q226 is the purpose-built victim: a per-source top-k where 90%
        // of the corpus shares ONE source — flat iff the salt split works.
        // Round-8 source-keyed additions ride the same harness: q245's
        // (source, gram) rollup, q246's per-source prefixCum ranks,
        // q250's (source, chunk) distinct rollup.
        Seq("q144_quantile_normalize", "q198_sliced_auc", "q226_domain_cap",
          "q245_distinct_ngrams", "q246_wasserstein_drift",
          "q250_cdc_chunks")
      case _ => docQueries
    }
    // optional csv filter (e.g. SPARK_GRAFT_SCALE_QUERIES=q27,q28) to
    // refresh individual table rows without the full multi-minute sweep
    val queries = sys.env.get("SPARK_GRAFT_SCALE_QUERIES") match {
      case Some(csv) =>
        val wanted = csv.split(",").map(_.trim).filter(_.nonEmpty)
        // exact name or prefix up to the first underscore (the Bench
        // rule): "q16" must not also select q160-q169
        allQueries.filter(q =>
          wanted.exists(w => q == w || q.startsWith(w + "_")))
      case None => allQueries
    }
    if (queries.isEmpty) {
      // a stale/typo'd filter must not silently run the multi-minute
      // replication sweep and print nothing
      System.err.println(s"No $mode-mode query matches " +
        s"SPARK_GRAFT_SCALE_QUERIES=${sys.env("SPARK_GRAFT_SCALE_QUERIES")} — aborting")
      spark.stop()
      sys.exit(2)
    }
    /** Noop-materialized wall time — the same timed action Bench uses.
      * Shared by the layout and skew comparisons so the two benches
      * cannot drift onto different measurement definitions.
      */
    def timeNoop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    /** The layout comparison: one keyed join+agg, three numbers —
      * plain-parquet secs (pays the shuffle per query), one-time
      * bucketed-write secs (pays it once), bucketed-query secs (pays it
      * never). Zero-Exchange is ASSERTED on the executed plan, so the
      * printed number can't silently come from a shuffling plan, and the
      * bucketed row count is asserted equal to the plain one so the
      * speedup can't come from a wrong-answer plan either.
      */
    def layoutBench(dir: String, k: Int): Unit = {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        def joinAgg(li: DataFrame, ord: DataFrame): DataFrame =
          li.join(ord, $"l_orderkey" === $"o_orderkey")
            .groupBy($"l_orderkey")
            .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
              .as("revenue"), count(lit(1)).as("n_lines"))
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        val ord = spark.read.parquet(s"$dir/orders.parquet")
        // untimed warm-up: JIT + page cache absorb the first execution,
        // so the first TIMED variant isn't penalized by measurement order
        timeNoop(joinAgg(li, ord))
        val plainSecs = timeNoop(joinAgg(li, ord))
        val rows = joinAgg(li, ord).count()
        val t0 = System.nanoTime()
        graft.sources.Layouts.writeBucketed(li, s"li_bkt_x$k", 32,
          Seq("l_orderkey"), Some(s"$dir/bucketed/lineitem"))
        graft.sources.Layouts.writeBucketed(ord, s"ord_bkt_x$k", 32,
          Seq("o_orderkey"), Some(s"$dir/bucketed/orders"))
        val writeSecs = (System.nanoTime() - t0) / 1e9
        val bkt = joinAgg(spark.table(s"li_bkt_x$k"), spark.table(s"ord_bkt_x$k"))
        timeNoop(bkt) // warm-up: freshly written files, cold reader state
        val bktSecs = timeNoop(bkt)
        val bktRows = bkt.count()
        assert(bktRows == rows, s"bucketed join drifted: $bktRows != $rows")
        val plan = bkt.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
        println(f"""{"factor":$k,"query":"layout_join_plain","secs":$plainSecs%.2f,"rows":$rows}""")
        println(f"""{"factor":$k,"query":"layout_bucketed_write","secs":$writeSecs%.2f,"rows":-1}""")
        println(f"""{"factor":$k,"query":"layout_join_bucketed","secs":$bktSecs%.2f,"rows":$bktRows,"zero_exchange":true}""")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
        spark.sql(s"DROP TABLE IF EXISTS li_bkt_x$k")
        spark.sql(s"DROP TABLE IF EXISTS ord_bkt_x$k")
      }
    }

    /** Celebrity-key join three ways. The noop-materialized timings share
      * one definition with layoutBench's; dim is user-sized (grows with
      * the corpus) so broadcast is disabled — the regime where skew
      * actually bites.
      */
    def skewBench(dir: String, k: Int): Unit = {
      val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val ev = graft.ops.Tables.eventsNs(spark, dir)
          .select($"event_id", $"user_id", $"value")
          // 90% of the corpus lands on user 0 — the null-key/default-value
          // pathology, where one shuffle partition IS the dataset
          .withColumn("user_id",
            when(pmod($"event_id", lit(10)) < 9, lit(0L)).otherwise($"user_id"))
        val dim = ev.select($"user_id").distinct()
          .withColumn("segment", pmod($"user_id", lit(10)))
        def agg(j: DataFrame): DataFrame =
          j.groupBy($"segment")
            .agg(round(sum($"value"), 2).as("total"), count(lit(1)).as("n"))
        val hot = graft.ops.Skew.keyHistogram(ev, $"user_id", 1).head()
        // untimed warm-up (JIT + page cache), so the first timed variant
        // isn't penalized by measurement order
        timeNoop(agg(ev.join(dim, "user_id")))
        val aqeSecs = timeNoop(agg(ev.join(dim, "user_id")))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val plainSecs = timeNoop(agg(ev.join(dim, "user_id")))
        val saltedSecs = timeNoop(agg(graft.ops.Skew.saltedJoin(ev, dim, "user_id")))
        val rows = agg(ev.join(dim, "user_id")).count()
        val saltedRows = agg(graft.ops.Skew.saltedJoin(ev, dim, "user_id")).count()
        assert(saltedRows == rows, s"salted join drifted: $saltedRows != $rows")
        println(f"""{"factor":$k,"query":"skew_hot_key_share","secs":0.0,"rows":${hot.getLong(1)}}""")
        println(f"""{"factor":$k,"query":"skew_join_aqe","secs":$aqeSecs%.2f,"rows":$rows}""")
        println(f"""{"factor":$k,"query":"skew_join_plain_noaqe","secs":$plainSecs%.2f,"rows":$rows}""")
        println(f"""{"factor":$k,"query":"skew_join_salted_noaqe","secs":$saltedSecs%.2f,"rows":$rows}""")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      }
    }

    /** Streaming ingest throughput: the WHOLE DocStreams.ingestPipeline
      * (rule gate → prep → classifier → watermarked dedup) replayed
      * through a real file-source micro-batch run into the noop sink,
      * reported as wall seconds + docs/sec. Timestamps stay within one
      * minute (the DocStreamsSpec convention) so unordered file replay
      * can never push a row past the dedup watermark; a fresh checkpoint
      * per run keeps every measurement a full replay, not a resume.
      */
    def streamBench(dir: String, k: Int): Unit = {
      import org.apache.spark.sql.types.{StructType, StructField, TimestampType}
      val tsDir = s"$dir/stream_docs"
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("ingest_ts",
          to_timestamp(from_unixtime(lit(1700000000L) + col("doc_id") % 60)))
        .repartition(8).write.mode("overwrite").parquet(tsDir)
      val nDocs = spark.read.parquet(tsDir).count()
      val ckpt = java.nio.file.Paths.get(s"$dir/stream_ckpt")
      if (java.nio.file.Files.exists(ckpt)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      val tsSchema = StructType(
        graft.streaming.DocStreams.docSchema.fields :+
          StructField("ingest_ts", TimestampType))
      val t0 = System.nanoTime()
      val q = graft.streaming.DocStreams.ingestPipeline(
          spark.readStream.schema(tsSchema)
            .option("maxFilesPerTrigger", "2").parquet(tsDir),
          "ingest_ts")
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = if (secs > 0) nDocs / secs else 0.0
      println(f"""{"factor":$k,"query":"stream_ingest","secs":$secs%.2f,"rows":$nDocs,"docs_per_sec":$rate%.0f}""")
    }

    /** Incremental route-index maintenance vs base size at fixed delta.
      * init = the one-time base build (grows with the base, as a build
      * must); fold1/fold2 = two successive 200-vector maintenance steps
      * (fold2 is steady-state). The fold's dominant compute — delta
      * signatures, bucket probe, candidate rescore, affected-src re-cut
      * — is delta + occupancy bound; the residual base-size term in a
      * local run is the untouched-edge anti-join + ranked re-checkpoint
      * (a compact (src,dst,rn) memcpy) plus base-table scans that a
      * bucketed 100-TB layout serves as point lookups.
      */
    def maintainBench(dir: String, k: Int): Unit = {
      import graft.streaming.VecStreams
      val nBands = 4
      val baseEmb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nBase = baseEmb.count()
      // plane count grows with the corpus: r bits per band such that
      // band-bucket occupancy ≈ reps / 2^r stays ~64
      val r = math.max(4,
        math.ceil(math.log(nBase / 64.0) / math.log(2.0)).toInt)
      val nPlanes = nBands * r
      val planes = baseEmb.filter($"vec_id" < nPlanes)
        .select($"vec_id", $"embedding").collect()
        .map(x => (x.getLong(0).toInt, x.getSeq[Float](1).toSeq)).toSeq
      val maxBase = baseEmb.agg(max($"vec_id")).head().getLong(0)
      // two FIXED 200-vector deltas of fresh content (a constant offset
      // per component — distinct from every sign-flipped base vector),
      // checkpointed so fold timing excludes the source read
      def delta(slot: Int): DataFrame =
        spark.read.parquet(s"$srcDir/embeddings.parquet")
          .filter($"vec_id" >= slot * 200 && $"vec_id" < (slot + 1) * 200)
          .select(($"vec_id" + lit(maxBase + 1L)).as("vec_id"),
            expr("transform(embedding, x -> x + cast(0.123 as float))")
              .as("embedding"))
          .localCheckpoint(true)
      val (d1, d2) = (delta(0), delta(1))
      var t0 = System.nanoTime()
      var state = VecStreams.initRouteState(spark, dir, planes, nPlanes,
        nBands)
      val initSecs = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      state = VecStreams.maintainRouteEdges(spark, state, d1, planes,
        nBands, nPlanes)
      val fold1Secs = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      state = VecStreams.maintainRouteEdges(spark, state, d2, planes,
        nBands, nPlanes)
      val fold2Secs = (System.nanoTime() - t0) / 1e9
      val edges = state.ranked.count()
      println(f"""{"factor":$k,"query":"maintain_init","secs":$initSecs%.2f,"rows":$nBase,"n_planes":$nPlanes}""")
      println(f"""{"factor":$k,"query":"maintain_fold1","secs":$fold1Secs%.2f,"rows":200,"n_planes":$nPlanes}""")
      println(f"""{"factor":$k,"query":"maintain_fold2","secs":$fold2Secs%.2f,"rows":200,"n_planes":$nPlanes,"edges":$edges}""")
    }

    /** The keeper hot-shingle pathology (round-14, VERDICT r13 "what's
      * wrong" #3): a FIXED 4000-document slice shares one appended
      * boilerplate phrase, so those shingles' document frequency stays
      * 4000 at EVERY factor — above the 256 cap, the regime where the
      * plain self-join lands one key's 4000 rows on one task and fans
      * ~8M pair rows out of it. The timed q39 build now runs
      * `keeperPairRows`' df-adaptive grid split; the row reports the
      * measured boilerplate df next to the wall so the table shows the
      * heavy branch engaged (df > cap) without a df² task. NO warm-up
      * on purpose: the first call IS the memoized table's build, the
      * object under test (a second call would read the memo).
      */
    def keeperSkewBench(dir: String, k: Int): Unit = {
      val fn = SparkEntry.queries("q39_deduped_jaccard")
      val secs = timeNoop(fn(spark, dir))
      val rows = fn(spark, dir).count() // memo-served, untimed
      // measured df of the planted phrase (distinct keepers carrying it)
      val hotDf = spark.read.parquet(s"$dir/documents.parquet")
        .filter($"text".contains("shared boiler plate phrase"))
        .select($"text").distinct().count()
      println(f"""{"factor":$k,"query":"keeper_skew_q39","secs":$secs%.2f,"rows":$rows,"hot_df":$hotDf}""")
    }

    for (k <- factors) {
      val dir = s"$base/x$k"
      mode match {
        case "tpch" | "layout" =>
          val orderShift = maxOf("orders", "o_orderkey")
          replicate("lineitem", Seq("l_orderkey"), k, dir, orderShift)
          replicate("orders", Seq("o_orderkey"), k, dir, orderShift)
          // q44 registers the full view catalog (ops.Tables), so every
          // table must exist in the scale dir; only the two facts scale
          // (layout mode reads only the two facts, but the copies are
          // cheap and keep the dir a complete, reusable scale fixture)
          Seq("customer", "nation", "region", "part", "supplier",
            "documents", "embeddings", "events").foreach(copyTable(_, dir))
        case "events" | "skew" =>
          // nanosAsLong: the source file is TIMESTAMP(NANOS); the replica
          // stores plain INT64 nanos, which every events reader already
          // handles (they derive sec/us with integer div)
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          // one shift base covers both id spaces — replicas get disjoint
          // users, so per-user state grows in count, not depth
          replicate("events", Seq("event_id", "user_id"), k, dir,
            maxOf("events", "event_id", "user_id"))
        case "hotsource" =>
          // replicate, then collapse 90% of rows onto one source — the
          // queries under test read only documents.parquet
          val reps = spark.range(k).select($"id".as("rep"))
          spark.read.parquet(s"$srcDir/documents.parquet")
            .crossJoin(reps)
            .withColumn("doc_id",
              $"doc_id" + $"rep" * maxOf("documents", "doc_id"))
            .drop("rep")
            .withColumn("source",
              when(pmod($"doc_id", lit(10)) < 9, lit("src_hot"))
                .otherwise($"source"))
            .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        case "maintain" =>
          // replicas get DISTINCT content: a per-replica sign-flip
          // pattern over the components (rep 0 keeps the original, so
          // the head plane vectors are the source corpus'). Identical
          // replicas would dedup away and the base would never grow.
          val reps = spark.range(k).select($"id".as("rep"))
          spark.read.parquet(s"$srcDir/embeddings.parquet")
            .crossJoin(reps)
            .withColumn("vec_id",
              $"vec_id" + $"rep" * maxOf("embeddings", "vec_id"))
            .withColumn("embedding", expr(
              "transform(embedding, (x, i) -> x * cast(1 - 2 * " +
                "((rep >> (i % 8)) & 1) as float))"))
            .drop("rep")
            .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        case "keeperskew" =>
          // replicas get DISTINCT text (a per-replica suffix — identical
          // replicas would collapse to one keeper and the join input
          // would never grow with the factor) and the fixed 4000-doc
          // base slice carries the constant-df boilerplate phrase
          val reps = spark.range(k).select($"id".as("rep"))
          spark.read.parquet(s"$srcDir/documents.parquet")
            .crossJoin(reps)
            .withColumn("doc_id",
              $"doc_id" + $"rep" * maxOf("documents", "doc_id"))
            .withColumn("text",
              when($"rep" > 0, concat($"text", lit(" replica marker "),
                $"rep")).otherwise($"text"))
            .withColumn("text",
              when($"doc_id" < 4000, concat($"text",
                lit(" shared boiler plate phrase every skewed keeper repeats")))
                .otherwise($"text"))
            .drop("rep")
            .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        case _ =>
          replicate("documents", Seq("doc_id"), k, dir, maxOf("documents", "doc_id"))
          replicate("embeddings", Seq("vec_id"), k, dir, maxOf("embeddings", "vec_id"))
      }
      if (mode == "layout") { layoutBench(dir, k) }
      else if (mode == "skew") { skewBench(dir, k) }
      else if (mode == "stream") { streamBench(dir, k) }
      else if (mode == "maintain") { maintainBench(dir, k) }
      else if (mode == "keeperskew") { keeperSkewBench(dir, k) }
      else for (name <- queries) {
        val fn = SparkEntry.queries(name)
        // timed: the noop materialization only (same action Bench times);
        // the row count runs separately, untimed — count()+write would
        // execute the query twice and double every number
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"$name@x$k: $e"); false }
        val secs = (System.nanoTime() - t0) / 1e9
        val rows = if (ok) fn(spark, dir).count() else -1L
        println(f"""{"factor":$k,"query":"$name","secs":$secs%.2f,"rows":$rows}""")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.{Multimodal, Phash, AudioFp}
import graft.queries.{Advanced, Classifier, Cluster, Corpus, Curation, Dedup, Dsir, Embeddings, EventOps, Kmeans, Parity, Pipeline, Pq, Relational, Sharding, Similarity, Sketches, Skew, Temporal, TextOps, Tokenize, Tpch, Unigram, Winnow, QualityRules, Wordpiece, Privacy, SpanMask, Features, DataQuality, SqlSurface, CorpusCard, Recommend, Stats, Graphs, Profiling, Markov, Trees, Bayes, Mf, Coreset, Readability, SeqMine, Conformal, Holt, Preference, Mlm, JoinEst, Kfold, Behavior, Fuzzy, Intervals, Knn, Decompose, Regress, Blocklist, Summarize, Stickiness, QualityLift, Scurve, Entropy, Passage, Neyman, TextLaws, Evals}
import graft.sources.Formats

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-module registries; every entry
  * with SQL-expressible semantics also appears in [[oracleSql]] with
  * IDENTICAL column names (the driver sorts columns by name before
  * hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-join Q5 exercises scan→filter→join(broadcast dims)→agg.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Parity.queries ++ Relational.queries ++ Advanced.queries ++ Dedup.queries ++
      Similarity.queries ++ TextOps.queries ++ EventOps.queries ++ Temporal.queries ++
      Sketches.queries ++ Skew.queries ++ Formats.queries ++ Multimodal.queries ++
      Cluster.queries ++ Sharding.queries ++ Corpus.queries ++ Tokenize.queries ++
      Kmeans.queries ++ Embeddings.queries ++ Pipeline.queries ++ Curation.queries ++
      Classifier.queries ++ Unigram.queries ++ Pq.queries ++ Dsir.queries ++
      Tpch.queries ++ Winnow.queries ++ QualityRules.queries ++ Wordpiece.queries ++ Privacy.queries ++ SpanMask.queries ++ Features.queries ++ DataQuality.queries ++ SqlSurface.queries ++ CorpusCard.queries ++ Recommend.queries ++ Stats.queries ++ Graphs.queries ++ Profiling.queries ++ Markov.queries ++
      Trees.queries ++ Bayes.queries ++ Mf.queries ++ Coreset.queries ++ Readability.queries ++ SeqMine.queries ++ Conformal.queries ++ Holt.queries ++ Preference.queries ++ Mlm.queries ++ JoinEst.queries ++ Kfold.queries ++ Behavior.queries ++ Fuzzy.queries ++ Intervals.queries ++ Knn.queries ++ Decompose.queries ++ Regress.queries ++ Blocklist.queries ++ Summarize.queries ++ Stickiness.queries ++ QualityLift.queries ++ Scurve.queries ++ Entropy.queries ++ Passage.queries ++ Neyman.queries ++ TextLaws.queries ++ Evals.queries ++ Phash.queries ++ AudioFp.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (used only for non-SQL-expressible ops).
    *
    * Every statement passes through
    * [[graft.core.OracleSql.materializeShared]] (a pure DuckDB
    * execution hint — shared CTEs evaluated once instead of inlined
    * exponentially; rows unchanged): the gate's DuckDB half must fit
    * the driver's capture budget, and one unhinted pipeline chain
    * measured 475 s → 0.2 s at sf0.001.
    */
  def oracleSql: Map[String, String] = rawOracleSql.map {
    case (k, v) => k -> graft.core.OracleSql.materializeShared(v)
  }

  private def rawOracleSql: Map[String, String] =
    Parity.oracleSql ++ Relational.oracleSql ++ Advanced.oracleSql ++ Dedup.oracleSql ++
      Similarity.oracleSql ++ TextOps.oracleSql ++ EventOps.oracleSql ++
      Temporal.oracleSql ++ Sketches.oracleSql ++ Skew.oracleSql ++ Formats.oracleSql ++
      Multimodal.oracleSql ++ Cluster.oracleSql ++ Sharding.oracleSql ++ Corpus.oracleSql ++
      Tokenize.oracleSql ++ Kmeans.oracleSql ++ Embeddings.oracleSql ++
      Pipeline.oracleSql ++ Curation.oracleSql ++ Classifier.oracleSql ++
      Unigram.oracleSql ++ Pq.oracleSql ++ Dsir.oracleSql ++ Tpch.oracleSql ++
      Winnow.oracleSql ++ QualityRules.oracleSql ++ Wordpiece.oracleSql ++ Privacy.oracleSql ++ SpanMask.oracleSql ++ Features.oracleSql ++ DataQuality.oracleSql ++ SqlSurface.oracleSql ++ CorpusCard.oracleSql ++ Recommend.oracleSql ++ Stats.oracleSql ++ Graphs.oracleSql ++ Profiling.oracleSql ++ Markov.oracleSql ++
      Trees.oracleSql ++ Bayes.oracleSql ++ Mf.oracleSql ++ Coreset.oracleSql ++ Readability.oracleSql ++ SeqMine.oracleSql ++ Conformal.oracleSql ++ Holt.oracleSql ++ Preference.oracleSql ++ Mlm.oracleSql ++ JoinEst.oracleSql ++ Kfold.oracleSql ++ Behavior.oracleSql ++ Fuzzy.oracleSql ++ Intervals.oracleSql ++ Knn.oracleSql ++ Decompose.oracleSql ++ Regress.oracleSql ++ Blocklist.oracleSql ++ Summarize.oracleSql ++ Stickiness.oracleSql ++ QualityLift.oracleSql ++ Scurve.oracleSql ++ Entropy.oracleSql ++ Passage.oracleSql ++ Neyman.oracleSql ++ TextLaws.oracleSql ++ Evals.oracleSql ++ Phash.oracleSql ++ AudioFp.oracleSql

  /** Bench times the FULL registry (every entry is regression-gated —
    * an unbenched operator is a perf blind spot), in sorted order for
    * a stable artifact. The warm-up pass runs everything first, so
    * ordering cannot bias steady-state numbers.
    */
  def benchQueries: Seq[String] = queries.keys.toSeq.sorted

  /** The 21 queries BENCH_r02 timed — BASELINE.md's "r2-comparable
    * subtotal" is defined over exactly these (the first 21 rows of
    * [[headlineQueries]], in the r2 artifact's order). Bench's compact
    * final summary line reports this subset so the driver's bounded
    * tail capture always holds the baseline-gated numbers.
    */
  def r2Comparable: Seq[String] = headlineQueries.take(21)

  /** The historical headline subset (kept for subtotal comparisons
    * against earlier rounds' BASELINE.md pins).
    */
  def headlineQueries: Seq[String] = Seq(
    "q1_pricing", "q3_top_revenue", "q5_region_revenue", "agg_distinct",
    "window_rank", "topk_per_group", "wc", "indexer", "json_extract",
    "union_all_agg", "dedup_exact", "dedup_minhash", "ann_cosine",
    "quality_score", "events_session", "join_asof", "hll_merge", "ann_ivf",
    "tfidf_terms", "events_funnel", "shard_pack",
    "dedup_cluster", "dedup_cluster_minhash", "recursive_cte", "pack_sequences",
    "lm_score", "dedup_spans", "semdedup", "quality_repetition",
    "dedup_keep_minhash", "heavy_hitters", "dedup_incremental",
    "dedup_incremental_minhash", "join_similarity",
    "heavy_hitters_mg", "drift_psi", "bpe_pairs", "kmeans",
    "bm25_terms", "zorder_bucket", "pipeline_curate_minhash",
    "dedup_incremental_embedding_lsh", "lang_id", "audience_overlap_exact",
    "chunk_text", "vocab_coverage", "pipeline_pretrain_minhash",
    "classifier_predict",
    "dedup_incremental_bloom", "cms_freq", "mmr_rerank", "corpus_stats",
    "text_normalize", "hilbert_bucket", "kcore",
    "lm_score_bigram", "ann_lsh_multiprobe", "join_asof_exec",
    "join_asof_fwd", "unigram_encode",
    "join_asof_tol", "dedup_spans_apply", "ann_quantized", "ann_pq",
    "search_bm25", "label_prop_minhash", "dedup_paragraph", "ann_ivfpq",
    "q7_nation_volume", "lm_score_kn", "cluster_topics",
    "search_hybrid", "dedup_eval", "join_asof_nearest",
    "q9_profit", "scd2_history", "keywords_textrank",
    "skew_diagnose", "join_pit", "dedup_containment",
    "dedup_containment_sketch", "join_pit_lookup",
    "boilerplate_detect", "boilerplate_strip", "drift_embedding",
    "dsir_weights", "dsir_sample", "cdc_merge", "graph_bfs_minhash",
    "attribution_linear", "feature_rolling", "er_block",
    "impute_locf", "anomaly_mad", "cdc_merge_stream",
    "search_phrase", "pipeline_curate_dsir_minhash",
    "events_ohlc", "column_stats", "search_trigram",
    "schema_evolution", "lm_generate", "corpus_digest", "privacy_erase",
    "quality_compress", "anomaly_seasonal", "impute_locf_stream",
    "quality_ensemble", "user_rfm", "q17_small_qty",
    "journey_transitions", "forecast_baseline", "basket_pairs",
    "er_resolve", "graph_stats",
    "journey_paths", "trend_wow", "dedup_savings",
    "feature_scale", "decontaminate_report",
    "pipeline_pretrain_dsir_minhash", "pipeline_pretrain_model_minhash",
    "q4_order_priority", "q6_forecast", "q10_returned", "q13_custdist",
    "q14_promo", "q19_discount_parts", "q8_market_share", "q11_part_value",
    "q15_top_supplier", "q16_parts_suppliers", "q18_big_orders",
    "q22_global_balance", "fingerprint_winnow", "dedup_winnow",
    "quality_gopher", "quality_gopher_report", "wordpiece_encode", "graph_adamic_adar", "privacy_kanon", "privacy_kanon_generalize",
    "skyline_2d", "attribution_position", "mask_spans", "ab_test_readout", "events_join_outer_stream", "feature_target_encode", "sample_negatives", "drift_ks", "classifier_calibration", "dpp_join", "mv_merge", "pattern_match", "concurrency_profile", "funnel_latency", "cohort_ltv", "fingerprint_winnow_native", "dq_checks", "source_freshness", "classifier_bias_report", "journey_entropy", "sql_surface", "q2_min_cost", "q12_late_priority", "q20_excess_suppliers", "q21_waiting_suppliers", "corpus_card",
    "item_cf", "item_recommend", "survival_km", "ab_test_chi2", "corr_matrix",
    "graph_hits", "graph_sssp", "fk_discovery", "mutual_info", "ts_acf",
    "attribution_markov", "attribution_shapley", "tree_train", "tree_predict",
    "nb_train", "nb_predict", "fd_discovery", "changepoint_cusum",
    "mf_train", "mf_predict", "sample_kcenter", "readability_score", "graph_modularity",
    "weighted_median", "benford_screen", "did_readout", "frequent_seq",
    "conformal_interval", "forecast_holt", "preference_pairs", "mlm_mask", "dedup_bucket_stats", "privacy_ldiversity", "tokenizer_fertility", "join_size_est", "stratified_kfold", "graph_assortativity", "join_band_exec", "ngram_novelty", "journey_stationary", "dedup_cross_source", "anomaly_burst",
    "langid_confusion", "event_type_lift", "privacy_dp_counts", "mixture_allocate",
    "fuzzy_join_lev", "interval_merge", "interval_coverage", "knn_classify",
    "mnn_pairs", "ts_decompose", "regress_multi", "blocklist_report",
    "join_interval_overlap", "dedup_phash", "quantiles_exact", "forecast_hw",
    "graph_lcc", "bootstrap_ci", "blocklist_native", "summarize_extract",
    "dau_mau", "dedup_audio_fp", "attribution_decay", "zorder_eval", "privacy_dp_mean", "hll_window", "dedup_quality_lift", "markov_eval", "retention_dn", "lsh_scurve", "user_growth", "token_entropy", "search_chunks", "sample_neyman", "dedup_incremental_phash", "forecast_hw_anomaly")
}

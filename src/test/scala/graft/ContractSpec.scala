package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-operator spec for every SURVEY.md §2 contract query: golden row
  * counts at sf0.001 captured once from the DuckDB 1.0.0 oracle
  * (SURVEY.md §5.2), plus contract-shape invariants (oracle SQL present,
  * deterministic output ordering checked separately in DeterminismSpec).
  */
class ContractSpec extends AnyFunSuite {
  import SparkTestBase._

  val goldenCounts: Map[String, Long] = Map(
    "q_agg_scalar" -> 1L,
    "q_count_distinct" -> 5L,
    "q_dedup_exact" -> 500L,
    "q_dedup_near" -> 10L,
    "q_distinct" -> 15L,
    "q_filter_pred" -> 1064L,
    "q_filter_regex" -> 401L,
    "q_grep_count" -> 20L,
    "q_groupby_agg" -> 6L,
    "q_having" -> 5L,
    "q_join_anti" -> 123L,
    "q_join_inner" -> 1500L,
    "q_join_left" -> 150L,
    "q_join_multi" -> 5L,
    "q_join_semi" -> 145L,
    "q_json_extract" -> 5L,
    "q_partition_range" -> 10L,
    "q_scalar_date" -> 80L,
    "q_scalar_math" -> 417L,
    "q_scalar_string" -> 150L,
    "q_scan_project" -> 6000L,
    "q_sim_cosine" -> 10L,
    "q_sort_global" -> 1500L,
    "q_text_stats" -> 5L,
    "q_topk" -> 10L,
    "q_topk_pergroup" -> 449L,
    "q_union" -> 98L,
    "q_window_analytic" -> 1000L,
    "q_window_rank" -> 15L,
    "q_window_tumbling" -> 868L,
    "q_wordcount" -> 31L,
    "q_dedup_minhash" -> 30L,
    "q_dedup_simhash" -> 26L,
    "q_dedup_jaccard" -> 10L,
    "q_sim_lsh" -> 20L,
    "q_text_langid" -> 25L,
    "q_text_quality" -> 100L,
    "q_text_tokens" -> 20L,
    "q_text_fingerprint" -> 24L,
    "q_multimodal_meta" -> 100L,
    "q_sim_cosine_native" -> 10L,
    "q_dedup_embed" -> 5L,
    "q_multimodal_frames" -> 162L,
    "q_agg_centroid" -> 640L,
    "q_dedup_minhash_keep" -> 481L,
    "q_window_session" -> 946L,
    "q_window_sliding" -> 1504L,
    "q_rollup" -> 10L,
    "q_intersect" -> 14L,
    "q_except" -> 116L,
    "q_pivot" -> 15L,
    "q_percentile" -> 3L,
    "q_stream_replay" -> 1799L,
    "q_stringagg" -> 5L,
    "q_subquery_corr" -> 144L,
    "q_text_ngrams" -> 20L,
    "q_pipeline_chain" -> 5L,
    "q_cube" -> 12L,
    "q_source_text_wordcount" -> 31L,
    "q_source_csv_stats" -> 5L,
    "q_source_jsonl_stats" -> 20L,
    "q_multimodal_resize" -> 100L,
    "q_multimodal_features" -> 3L,
    "q_source_kv_roundtrip" -> 31L,
    "q_join_asof" -> 188L,
    "q_join_range" -> 98L,
    "q_grouping_sets" -> 9L,
    "q_window_range_frame" -> 1500L,
    "q_sim_ann_batch" -> 40L,
    "q_dedup_embed_banded" -> 24L,
    "q_stats_corr" -> 3L,
    "q_timeseries_fill" -> 12025L,
    "q_sample_split" -> 15L,
    "q_text_vocab" -> 30L,
    "q_text_repetition" -> 5L,
    "q_sample_stratified" -> 5L,
    "q_dedup_contain" -> 5L,
    "q_dedup_cluster" -> 23L,
    "q_sim_ann_ivf" -> 40L,
    "q_join_full" -> 264L,
    "q_sample_mixture" -> 20L,
    "q_sample_pack" -> 61L,
    "q_scalar_array" -> 100L,
    "q_text_tfidf" -> 25L,
    "q_agg_winsorize" -> 3L,
    "q_window_ntile" -> 30L,
    "q_text_chunk" -> 2559L,
    "q_quality_filter" -> 500L,
    "q_stats_profile" -> 4L,
    "q_join_salted" -> 10L,
    "q_events_funnel" -> 3L,
    "q_stats_histogram" -> 10L,
    "q_agg_mode" -> 3L,
    "q_stats_minmax" -> 1500L,
    "q_dedup_norm" -> 25L,
    "q_source_parquet_partition" -> 5L,
    "q_events_retention" -> 98L,
    "q_window_cume" -> 1500L,
    "q_join_bloom" -> 1L,
    "q_source_bucketed_join" -> 5L,
    "q_agg_argmax" -> 15L,
    "q_events_transitions" -> 25L,
    "q_events_anomaly" -> 2L,
    "q_text_cooccur" -> 465L,
    "q_stats_regression" -> 3L,
    "q_events_wau" -> 30L,
    "q_agg_mom" -> 237L,
    "q_join_dim_part" -> 25L,
    "q_agg_stickiness" -> 80L,
    "q_stats_entropy" -> 5L,
    "q_stats_outlier" -> 5L,
    "q_agg_moments" -> 3L,
    "q_graph_pagerank" -> 5L,
    "q_text_zipf" -> 5L,
    "q_join_star" -> 1L,
    "q_window_session_stats" -> 1L,
    "q_text_keywords" -> 1500L,
    "q_agg_gini" -> 3L,
    "q_agg_theil" -> 3L,
    "q_graph_degree" -> 40L,
    "q_text_diversity" -> 5L,
    "q_stats_ttest" -> 1L,
    "q_agg_new_customers" -> 26L,
    "q_stats_chisq" -> 1L,
    "q_stats_benford" -> 9L,
    "q_text_boilerplate" -> 5L,
    "q_agg_pareto" -> 1L,
    "q_events_interarrival" -> 5L,
    "q_multimodal_decode" -> 500L,
    "q_multimodal_dedup" -> 3L,
    "q_dq_constraints" -> 5L,
    "q_agg_decay" -> 5L,
    "q_dedup_editdist" -> 7L,
    "q_agg_mad" -> 5L,
    "q_events_heatmap" -> 167L,
    "q_agg_hhi" -> 6L,
    "q_window_streak" -> 11L,
    "q_agg_skyline" -> 5L,
    "q_agg_wmedian" -> 3L,
    "q_stats_ks" -> 1L,
    "q_text_heavyhitters" -> 30L,
    "q_stats_mwu" -> 1L,
    "q_graph_triangles" -> 1L,
    "q_window_rankchange" -> 791L,
    "q_assoc_rules" -> 4648L,
    "q_ml_confusion" -> 98L,
    "q_scd2_intervals" -> 802L,
    "q_agg_rfm" -> 59L,
    "q_join_pit" -> 202L,
    "q_agg_bitmask" -> 127L,
    "q_events_pattern" -> 3L,
    "q_events_abandon" -> 30L,
    "q_text_readability" -> 5L,
    "q_ml_feature_hash" -> 80L,
    "q_stats_cov" -> 6L,
    "q_source_orc_roundtrip" -> 10L,
    "q_events_attribution" -> 5L,
    "q_ml_kfold" -> 25L,
    "q_stats_autocorr" -> 1L,
    "q_agg_growth" -> 80L,
    "q_stats_seasonality" -> 7L,
    "q_sample_bootstrap" -> 16L,
    "q_stats_entropy_rate" -> 1L,
    "q_text_rake" -> 20L,
    "q_join_priority" -> 10L,
    "q_ml_ndcg" -> 5L,
    "q_window_firstlast" -> 15L,
    "q_agg_bool" -> 5L,
    "q_json_nested" -> 5L,
    "q_ml_mrr" -> 5L,
    "q_dedup_paragraph" -> 500L,
    "q_quality_lm" -> 500L,
    "q_sketch_bounds" -> 3L,
    "q_embed_quantize" -> 500L,
    "q_ml_calibration" -> 5L,
    "q_pipeline_curate" -> 5L,
    "q_span_coverage" -> 500L,
    "q_pack_stream" -> 445L,
    "q_cdc_apply" -> 140L,
    "q_search_bm25" -> 20L,
    "q_hybrid_rrf" -> 10L,
    "q_span_removal" -> 500L,
    "q_stream_sink" -> 868L
  )

  test("every contract query has oracle SQL and vice versa") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  // SURVEY.md §2 is the contract of record; round 9's table and its
  // prose total drifted 35 queries apart. Parse the t2 rows out of the
  // table and pin them to the code so neither the table nor the
  // "Contract total: N" line can go stale again.
  test("SURVEY.md §2 t2 rows equal SparkEntry.queries exactly") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val t2 = "(?m)^\\| `(q_[a-z0-9_]+)` \\|.*\\*\\*t2\\*\\* \\|$".r
      .findAllMatchIn(survey).map(_.group(1)).toSet
    val code = SparkEntry.queries.keySet
    assert(t2 === code,
      s"SURVEY-only: ${(t2 -- code).toSeq.sorted.mkString(",")}; " +
        s"code-only: ${(code -- t2).toSeq.sorted.mkString(",")}")
    val total = "\\*\\*Contract total: (\\d+) t2 queries\\*\\*".r
      .findFirstMatchIn(survey).map(_.group(1).toInt)
    assert(total.contains(code.size),
      s"SURVEY prose says ${total.orNull}, code has ${code.size}")
  }

  test("every contract query carries a golden row count") {
    assert(goldenCounts.keySet === SparkEntry.queries.keySet)
  }

  test("entry (t1 smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  goldenCounts.foreach { case (name, expected) =>
    test(s"$name row count matches DuckDB golden at sf0.001") {
      try assert(SparkEntry.queries(name)(spark, sf0001).count() === expected)
      finally Materialize.releaseAll() // shared session — no block leaks
    }
  }
}

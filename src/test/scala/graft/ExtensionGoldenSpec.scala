package graft

import org.scalatest.funsuite.AnyFunSuite

/** Value-level golden checks for the extension queries at sf0.001
  * (constants captured once from the DuckDB oracle) — the extension
  * counterpart of GoldenValueSpec.
  */
class ExtensionGoldenSpec extends AnyFunSuite {
  import SparkTestBase._

  private def head2(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, sf0001)
      .limit(2).collect().toSeq.map(_.toSeq)

  test("q_multimodal_decode head rows") {
    assert(head2("q_multimodal_decode") ===
      Seq(Seq(0L, "image", 70L, 1L, 1L, null, null, null),
        Seq(1L, "audio", 60L, null, null, 8000L, 1L, 0L)))
  }

  test("q_stream_replay head rows") {
    assert(head2("q_stream_replay") ===
      Seq(Seq("session", "00000000", "0001", 1L, null),
        Seq("session", "00000000", "0002", 1L, null)))
  }

  test("q_dedup_minhash top pairs") {
    assert(head2("q_dedup_minhash") ===
      Seq(Seq(0L, 50L, 1.0), Seq(0L, 82L, 0.875)))
  }

  test("q_sim_lsh top pairs") {
    assert(head2("q_sim_lsh") ===
      Seq(Seq(390L, 483L, 0.4543), Seq(154L, 342L, 0.4457)))
  }

  test("q_rollup head rows") {
    assert(head2("q_rollup") ===
      Seq(Seq("(all)", "(all)", 6000L, 15225700L),
        Seq("A", "(all)", 1962L, 4934100L)))
  }

  test("q_percentile values") {
    assert(head2("q_percentile") ===
      Seq(Seq("F", 24270775L, 45369149L), Seq("O", 25606074L, 45117268L)))
  }

  test("q_pivot head rows") {
    assert(head2("q_pivot") ===
      Seq(Seq(0L, 14L, 15L, 9L, 13L, 9L), Seq(1L, 14L, 9L, 7L, 15L, 6L)))
  }

  test("q_stringagg regions") {
    assert(head2("q_stringagg") === Seq(
      Seq("AFRICA", "NATION_0,NATION_10,NATION_15,NATION_20,NATION_5"),
      Seq("AMERICA", "NATION_1,NATION_11,NATION_16,NATION_21,NATION_6")))
  }

  test("q_window_session head sessions") {
    assert(head2("q_window_session") ===
      Seq(Seq(0L, 1L, 1L, 4L), Seq(0L, 2L, 1L, 9L)))
  }

  test("q_pipeline_chain head rows") {
    assert(head2("q_pipeline_chain") ===
      Seq(Seq("de", 58L, 3783L), Seq("en", 149L, 9509L)))
  }

  test("q_grouping_sets head rows") {
    assert(head2("q_grouping_sets") ===
      Seq(Seq("A", "F", 0L, 2485100L, 977L), Seq("A", "O", 0L, 2449000L, 985L)))
  }

  test("q_window_range_frame head rows") {
    assert(head2("q_window_range_frame") ===
      Seq(Seq(0L, 85L, 14444904L), Seq(1L, 134L, 47969194L)))
  }

  test("q_dedup_embed_banded top pairs") {
    assert(head2("q_dedup_embed_banded") ===
      Seq(Seq(16L, 337L, 0.4316), Seq(23L, 392L, 0.4355)))
  }

  test("q_stats_corr values (exact sufficient-statistics finish)") {
    assert(head2("q_stats_corr") ===
      Seq(Seq("A", 1962L, -0.020151), Seq("N", 2070L, -0.010389)))
  }

  test("q_events_funnel stage counts (24h windows discriminate)") {
    assert(
      SparkEntry.queries("q_events_funnel")(spark, sf0001)
        .collect().toSeq.map(_.toSeq) ===
        Seq(Seq(1, "view", 15L), Seq(2, "click", 6L), Seq(3, "purchase", 3L)))
  }

  test("q_agg_mode head rows (smallest-string tie-break)") {
    assert(head2("q_agg_mode") ===
      Seq(Seq("F", "3-MEDIUM", 116L), Seq("O", "2-HIGH", 112L)))
  }

  test("q_stats_histogram head buckets (integer bin arithmetic)") {
    assert(head2("q_stats_histogram") ===
      Seq(Seq(0L, 164L, 132051L, 5087598L), Seq(1L, 148L, 5116048L, 10093514L)))
  }

  test("q_join_bloom full result (Bloom pre-filter is result-invariant)") {
    assert(
      SparkEntry.queries("q_join_bloom")(spark, sf0001)
        .collect().toSeq.map(_.toSeq) ===
        Seq(Seq(3L, "Supplier#000000003", 617L, 3292999653L)))
  }

  test("q_source_bucketed_join head rows (bucketed layout is lossless)") {
    assert(head2("q_source_bucketed_join") ===
      Seq(Seq("1-URGENT", 1147L, 6113094924L),
        Seq("2-HIGH", 1260L, 6643199056L)))
  }

  test("q_agg_argmax head rows (ts then smallest-event_id tie order)") {
    assert(head2("q_agg_argmax") ===
      Seq(Seq(0L, "signup", "2024-01-30 18:46:21"),
        Seq(1L, "signup", "2024-01-30 14:03:35")))
  }

  test("q_events_transitions head rows") {
    assert(head2("q_events_transitions") ===
      Seq(Seq("click", "click", 45L), Seq("click", "error", 43L)))
  }

  test("q_events_anomaly full result (integer z-squared test)") {
    assert(
      SparkEntry.queries("q_events_anomaly")(spark, sf0001)
        .collect().toSeq.map(_.toSeq) ===
        Seq(Seq("purchase", "2024-01-07", 15L),
          Seq("purchase", "2024-01-17", 15L)))
  }

  test("q_text_cooccur head rows (lift from exact integer counts)") {
    try assert(head2("q_text_cooccur") ===
      Seq(Seq("a", "agg", 322L, 1.0424), Seq("a", "batch", 323L, 1.0592)))
    finally Materialize.releaseAll() // checkpoints its token relation
  }

  test("q_stats_regression head rows (exact sufficient-statistics OLS)") {
    assert(head2("q_stats_regression") ===
      Seq(Seq("A", 1962L, -42.561751, 5290676.046),
        Seq("N", 2070L, -21.120325, 5389011.5298)))
  }

  test("q_events_wau head rows (7-day rolling distinct users)") {
    assert(head2("q_events_wau") ===
      Seq(Seq("2024-01-01", 15L), Seq("2024-01-02", 15L)))
  }

  test("q_agg_mom head rows (first month NULL, ratio at 4 dp)") {
    assert(head2("q_agg_mom") ===
      Seq(Seq("F", "1995-01", 333999563L, null),
        Seq("F", "1995-02", 262760700L, 0.7867)))
  }

  test("q_join_dim_part head rows (promo share from integer cents)") {
    assert(head2("q_join_dim_part") ===
      Seq(Seq("Brand#1", 237L, 1284393576L, 0.2969),
        Seq("Brand#10", 253L, 1340590648L, 0.0)))
  }

  test("q_agg_stickiness head rows (DAU/MAU from exact integer counts)") {
    try assert(head2("q_agg_stickiness") ===
      Seq(Seq("1995-01", 16L, 1.1429, 0.0714),
        Seq("1995-02", 21L, 1.6923, 0.0806)))
    finally Materialize.releaseAll() // checkpoints its (cust, day) relation
  }

  test("q_stats_entropy head rows (token Shannon entropy at 4 dp)") {
    assert(head2("q_stats_entropy") ===
      Seq(Seq("de", 4070L, 31L, 3.3997), Seq("en", 10343L, 31L, 3.4052)))
  }

  test("q_stats_outlier head rows (all-integer Tukey fences)") {
    assert(head2("q_stats_outlier") ===
      Seq(Seq("click", 1395L, 6902L, 210L, 9L, 0.0429),
        Seq("error", 1434L, 6408L, 201L, 9L, 0.0448)))
  }

  test("q_agg_moments full result (exact power sums, no pow())") {
    assert(SparkEntry.queries("q_agg_moments")(spark, sf0001)
      .collect().toSeq.map(_.toSeq) ===
      Seq(Seq("A", 1962L, 51836.404, 0.034, -1.2239),
        Seq("N", 2070L, 53347.6188, -0.03, -1.1862),
        Seq("R", 1968L, 53471.6268, -0.0194, -1.2252)))
  }

  test("q_graph_pagerank full result (3 iterations, damping 0.85)") {
    try assert(SparkEntry.queries("q_graph_pagerank")(spark, sf0001)
      .collect().toSeq.map(_.toSeq) ===
      Seq(Seq("click", 0.209488), Seq("error", 0.197483),
        Seq("purchase", 0.20271), Seq("signup", 0.198227),
        Seq("view", 0.192092)))
    finally Materialize.releaseAll() // checkpoints its edge relation
  }

  test("q_text_zipf head rows (OLS over ln-rank/ln-count)") {
    assert(head2("q_text_zipf") ===
      Seq(Seq("de", 31L, -0.2693, 5.4481), Seq("en", 31L, -0.1945, 6.2245)))
  }

  test("q_join_star full result (local-supplier revenue, cent-percent)") {
    assert(SparkEntry.queries("q_join_star")(spark, sf0001)
      .collect().toSeq.map(_.toSeq) ===
      Seq(Seq("NATION_12", 25L, 11559149514L)))
  }

  test("q_window_session_stats full result (engaged-session percentiles)") {
    try assert(SparkEntry.queries("q_window_session_stats")(spark, sf0001)
      .collect().toSeq.map(_.toSeq) ===
      Seq(Seq(52L, 650221913L, 1773099393L, 861321617.4038)))
    finally Materialize.releaseAll() // checkpoints its session relation
  }

  test("q_text_keywords head rows (per-doc top-3 TF-IDF)") {
    assert(head2("q_text_keywords") ===
      Seq(Seq(0L, "dup", 20.0), Seq(0L, "batch", 3.886)))
  }

  test("q_stats_mwu full result (doubled midranks equal brute pairwise U)") {
    // 251400 = 2·U1 verified against the O(n²) pairwise
    // #{F>O}·2 + #{F=O} count in the oracle prototype
    try assert(SparkEntry.queries("q_stats_mwu")(spark, sf0001)
      .collect().toSeq.map(_.toSeq) ===
      Seq(Seq(493L, 514L, 251400L, 0.496)))
    finally Materialize.releaseAll() // checkpoints its value collapse
  }

  test("q_assoc_rules head rules (supports, confidence, lift from DuckDB)") {
    try assert(head2("q_assoc_rules") ===
      Seq(Seq(0L, 12L, 3L, 0.0833, 4.0917), Seq(0L, 37L, 2L, 0.0556, 2.7278)))
    finally Materialize.releaseAll() // checkpoints the basket collapse
  }

  test("q_agg_rfm head segments") {
    try assert(head2("q_agg_rfm") ===
      Seq(Seq("111", 12L), Seq("112", 4L)))
    finally Materialize.releaseAll() // checkpoints the customer collapse
  }

  test("q_graph_triangles full result (orientation count = a<b<c count)") {
    try assert(SparkEntry.queries("q_graph_triangles")(spark, sf0001)
      .collect().toSeq.map(_.toSeq) ===
      Seq(Seq(200L, 2324L, 58796L, 3258L, 0.1662)))
    finally Materialize.releaseAll() // checkpoints edges + orientation
  }
}

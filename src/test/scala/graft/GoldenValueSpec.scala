package graft

import org.scalatest.funsuite.AnyFunSuite

/** Value-level golden checks at sf0.001 against constants captured once
  * from the DuckDB oracle (SURVEY.md §5.2) — catches silent semantic
  * drift that row counts alone would miss.
  */
class GoldenValueSpec extends AnyFunSuite {
  import SparkTestBase._

  test("q_wordcount top tokens") {
    val rows = SparkEntry.queries("q_wordcount")(spark, sf0001)
      .limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("scan", 984L), ("column", 978L), ("window", 976L)))
  }

  test("q_agg_scalar exact cents") {
    val r = SparkEntry.queries("q_agg_scalar")(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((1500L, 132051L, 49970505L)))
  }

  test("q_text_stats per-lang stats") {
    val rows = SparkEntry.queries("q_text_stats")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("de", 71L, 22200L, 312.68), ("en", 193L, 56684L, 293.7),
      ("es", 80L, 24806L, 310.08), ("fr", 82L, 27063L, 330.04),
      ("zh", 74L, 22403L, 302.74)))
  }

  test("q_topk head rows") {
    val rows = SparkEntry.queries("q_topk")(spark, sf0001)
      .limit(2).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((988L, 49970505L), (605L, 49969563L)))
  }

  test("q_text_vocab top tokens by document frequency") {
    val rows = SparkEntry.queries("q_text_vocab")(spark, sf0001)
      .limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      ("query", 415L, 934L), ("window", 407L, 976L), ("scan", 405L, 984L)))
  }

  test("q_text_repetition exact gram sums and flags") {
    val rows = SparkEntry.queries("q_text_repetition")(spark, sf0001)
      .limit(2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.toSeq === Seq(
      ("de", 71L, 3928L, 3920L, 0.002, 7L),
      ("en", 193L, 9957L, 9946L, 0.0011, 11L)))
  }

  test("q_sample_stratified per-lang quotas") {
    val rows = SparkEntry.queries("q_sample_stratified")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      ("de", 8L, 2315L, 36L), ("en", 20L, 6315L, 27L),
      ("es", 8L, 2401L, 126L), ("fr", 9L, 3055L, 35L),
      ("zh", 8L, 2487L, 63L)))
  }

  test("q_dedup_contain finds the planted en contamination") {
    val rows = try SparkEntry.queries("q_dedup_contain")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    finally Materialize.releaseAll() // shared session — no block leaks
    assert(rows.find(_._1 == "en").get === (("en", 157L, 3L, 154L)))
    assert(rows.map(_._3).sum === 3L)
  }

  test("q_dedup_cluster head components") {
    val rows = try SparkEntry.queries("q_dedup_cluster")(spark, sf0001)
      .limit(3).collect().map(r => (r.getLong(0), r.getLong(1)))
    finally Materialize.releaseAll()
    assert(rows.toSeq === Seq((0L, 3L), (5L, 2L), (8L, 4L)))
  }

  test("q_sim_ann_ivf head neighbors") {
    val rows = SparkEntry.queries("q_sim_ann_ivf")(spark, sf0001)
      .limit(2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((8L, 20L, 0.3301), (8L, 385L, 0.3266)))
  }

  test("q_sample_mixture per-source rates materialize") {
    val rows = SparkEntry.queries("q_sample_mixture")(spark, sf0001)
      .limit(4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      ("src0", 5L, 5L, 2011L), ("src1", 16L, 16L, 4868L),
      ("src10", 25L, 34L, 10420L), ("src11", 25L, 58L, 17707L)))
  }

  test("q_join_full zero-fills both outer sides") {
    val rows = SparkEntry.queries("q_join_full")(spark, sf0001)
      .limit(2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq((0L, "2024-01-01", 0L, 2L), (0L, "2024-01-03", 1L, 2L)))
  }

  test("q_agg_gini exact coefficients per status") {
    val rows = SparkEntry.queries("q_agg_gini")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq(
      ("F", 493L, 0.3331), ("O", 514L, 0.3345), ("P", 493L, 0.3371)))
  }

  test("q_stats_ttest exact Welch statistic") {
    val r = SparkEntry.queries("q_stats_ttest")(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ===
      ((493L, 514L, -2078.722, -0.2277)))
  }

  test("q_ml_mrr exact MRR@10 and capped recall@10 per probe") {
    val rows = SparkEntry.queries("q_ml_mrr")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      (0L, 50L, 0.1429, 0.2), (1L, 41L, 0.0, 0.0), (2L, 62L, 0.0, 0.0),
      (3L, 49L, 0.0, 0.0), (4L, 55L, 0.1667, 0.1)))
  }

  test("q_json_nested exact per-type aggregates after the JSON round-trip") {
    val rows = SparkEntry.queries("q_json_nested")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq === Seq(
      ("click", 210L, 9707L, 2062142L, 14L),
      ("error", 201L, 10442L, 1885818L, 14L),
      ("purchase", 202L, 9664L, 2084938L, 14L),
      ("signup", 199L, 9738L, 2067036L, 14L),
      ("view", 188L, 9325L, 1910104L, 14L)))
  }

  test("q_dedup_paragraph head manifest rows and corpus dup-segment total") {
    val rows = SparkEntry.queries("q_dedup_paragraph")(spark, sf0001)
      .limit(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      (0L, 3L, 2L, 0.6667), (1L, 8L, 0L, 0.0), (2L, 7L, 0L, 0.0)))
    val (dup, tot) = SparkEntry.queries("q_dedup_paragraph")(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("n_dup_segs"),
        org.apache.spark.sql.functions.sum("n_segs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert((dup, tot) === ((298L, 3017L)))
  }

  test("q_quality_lm exact bigram cross-entropy head rows") {
    val rows = SparkEntry.queries("q_quality_lm")(spark, sf0001)
      .limit(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq(
      (0L, 22L, 3.4275), (1L, 77L, 3.396), (2L, 64L, 3.3844)))
  }

  test("q_sketch_bounds flags hold with exact counts") {
    val rows = SparkEntry.queries("q_sketch_bounds")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq === Seq(
      ("F", 493L, 145L, 1L, 1L), ("O", 514L, 148L, 1L, 1L),
      ("P", 493L, 143L, 1L, 1L)))
  }

  test("q_ml_calibration exact per-bin curve") {
    val rows = SparkEntry.queries("q_ml_calibration")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.toSeq === Seq(
      (2L, 1L, -0.4671, 0L, 0.0), (3L, 127L, -0.2475, 9L, 0.0709),
      (4L, 1087L, -0.0812, 127L, 0.1168), (5L, 1128L, 0.0828, 110L, 0.0975),
      (6L, 132L, 0.2525, 11L, 0.0833)))
  }

  test("q_embed_quantize exact int8 code checksums head rows") {
    val rows = SparkEntry.queries("q_embed_quantize")(spark, sf0001)
      .limit(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((0L, -172L, 1L), (1L, -841L, 1L), (2L, 331L, 1L)))
  }

  // q_agg_theil is the contract's one double-accumulation aggregate
  // (Σx·ln x — partition-order-dependent partial sums, ~1e-10 relative
  // spread). Its 4-dp rounding is only engine-stable if every group's
  // unrounded value sits FAR from a .00005 rounding boundary, so the
  // documented risk becomes a tested margin: at every SF the distance
  // from the nearest half-boundary must exceed the spread by ≥3 orders
  // of magnitude (measured minimum today: 0.0015 4-dp-units at
  // sf0.001/P ≈ 1.5e-7 absolute vs ~2e-11 spread). If a fixture
  // regeneration ever fails this, widen q_agg_theil to 3 dp (see the
  // operator's comment) instead of chasing accumulation layouts.
  test("q_agg_theil values keep ≥1e-3 4-dp-units from rounding boundaries at all SFs") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq(sf0001, sf001, "/root/testdata/sf0.1")) {
      val unrounded = graft.sources.Tables.orders(spark, dir)
        .select((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").cast("double").as("x"),
          col("o_orderstatus").as("st"))
        .groupBy("st")
        .agg((sum(col("x") * log(col("x"))) / sum(col("x")) -
          log(sum(col("x")) / count(lit(1)))).as("v"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      unrounded.foreach { case (st, v) =>
        val frac = (v * 10000) - math.floor(v * 10000)
        val dist = math.abs(frac - 0.5)
        assert(dist >= 1e-3,
          s"$dir/$st: theil=$v sits $dist 4-dp-units from a rounding " +
            "boundary — double-accumulation spread can now flip the 4th dp")
      }
    }
  }

  test("q_stats_chisq exact statistic and dof") {
    val r = SparkEntry.queries("q_stats_chisq")(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      ((3L, 5L, 8L, 9.4116)))
  }

  test("q_agg_pareto exact top-20% share") {
    val r = SparkEntry.queries("q_agg_pareto")(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) === ((150L, 30L, 37444679161L, 11549089435L, 0.3084)))
  }

  test("q_agg_decay exact dyadic decay per segment") {
    val rows = SparkEntry.queries("q_agg_decay")(spark, sf0001)
      .limit(2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("AUTOMOBILE", 23L, 1352879.1236, 58820.8315),
      ("BUILDING", 34L, 815932.702, 23998.0206)))
  }

  test("q_stats_autocorr exact lag-1 Pearson r") {
    val r = SparkEntry.queries("q_stats_autocorr")(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getDouble(1)) === ((1093L, -0.0308)))
  }

  test("q_stats_cov natural-unit cells") {
    val rows = SparkEntry.queries("q_stats_cov")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("disc_f", "disc_f", 0.0008), ("price_d", "disc_f", 13.3701),
      ("price_d", "price_d", 908335167.0588),
      ("price_d", "qty", -4289.987),
      ("qty", "disc_f", 0.0056), ("qty", "qty", 210.8293)))
  }

  test("q_events_attribution full channel table") {
    val rows = SparkEntry.queries("q_events_attribution")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      ("0", 44L, 210950L), ("1", 48L, 225109L), ("2", 55L, 323557L),
      ("3", 31L, 177630L), ("direct", 24L, 105223L)))
  }

  test("q_agg_growth ledger head (new/retained/resurrected/churned)") {
    val rows = SparkEntry.queries("q_agg_growth")(spark, sf0001)
      .limit(3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq === Seq(
      ("1995-01", 16L, 0L, 0L, 0L),
      ("1995-02", 20L, 1L, 0L, 15L),
      ("1995-03", 14L, 3L, 4L, 18L)))
  }

  test("q_stats_seasonality exact weekday indices") {
    val rows = SparkEntry.queries("q_stats_seasonality")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(rows.toSeq === Seq((0L, 0.9839), (1L, 1.0056), (2L, 0.9733),
      (3L, 1.0166), (4L, 0.9954), (5L, 0.983), (6L, 1.0438)))
  }

  test("q_stats_entropy_rate exact bits") {
    val r = SparkEntry.queries("q_stats_entropy_rate")(spark, sf0001)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) ===
      ((5L, 985L, 2.3101)))
  }

  test("q_join_priority top revenue order (TPC-H Q3 shape)") {
    val r = SparkEntry.queries("q_join_priority")(spark, sf0001)
      .collect()(0)
    assert((r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)) ===
      ((297L, "1996-10-20", "5-LOW", 4137335805L)))
  }

  test("q_ml_ndcg exact per-probe scores") {
    val rows = SparkEntry.queries("q_ml_ndcg")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((0L, 50L, 0.137), (1L, 41L, 0.0),
      (2L, 62L, 0.0), (3L, 49L, 0.0), (4L, 55L, 0.0784)))
  }

  test("q_agg_bool exact boolean aggregates") {
    val rows = SparkEntry.queries("q_agg_bool")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(rows.toSeq === Seq(
      ("click", 210L, 23L, true, true),
      ("error", 201L, 23L, false, false),
      ("purchase", 202L, 33L, true, false),
      ("signup", 199L, 31L, false, false),
      ("view", 188L, 26L, true, false)))
  }
}

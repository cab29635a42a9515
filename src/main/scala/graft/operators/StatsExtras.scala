package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money._
import graft.sources.{Stats, Tables}

/** Round-9 wave-8 extensions (SURVEY.md §2.12): engagement stickiness,
  * corpus token entropy, IQR outlier fences, higher moments
  * (skewness/kurtosis), fixed-iteration PageRank over the event-type
  * transition graph, and a Zipf-law fit per language.
  *
  * Shared discipline: every corpus-scale relation is touched once (or
  * checkpointed when an iteration genuinely re-reads it), windows run
  * only over bounded aggregates, and all cross-engine comparisons happen
  * on exact integers or on doubles derived from exact integers through
  * an identical expression tree (no pow() — libm pow is not
  * cross-engine reproducible; only * / + - sqrt, which are IEEE
  * correctly-rounded everywhere).
  */
object StatsExtras {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DAU/MAU stickiness on the orders activity stream: per month,
    // average daily active customers over monthly active customers —
    // the engagement ratio every product dashboard leads with. The
    // corpus thins to the DISTINCT (customer, day) relation ONCE
    // (checkpointed — both the daily and the monthly aggregate consume
    // it, and without the materialization each branch would redo the
    // corpus-scale distinct shuffle); everything after is aggregates
    // over the thin relation. avg = sum/n on exact integers, one IEEE
    // division chain → 4 dp.
    "q_agg_stickiness" -> ((s, d) => {
      val ud = graft.Materialize.checkpoint(
        Tables.orders(s, d)
          .select(col("o_custkey").as("cust"),
            to_date(date_trunc("DAY", col("o_orderdate"))).as("day"))
          .distinct())
      val month = date_format(date_trunc("MONTH", col("day")), "yyyy-MM")
      val dm = ud.groupBy("day").agg(count(lit(1)).as("dac"))
        .groupBy(month.as("month"))
        .agg(sum("dac").as("sum_dac"), count(lit(1)).as("n_days"))
      val mau = ud.groupBy(month.as("month"))
        .agg(countDistinct("cust").as("mac"))
      dm.join(mau, "month")
        .select(col("month"), col("mac"),
          round(col("sum_dac").cast("double") / col("n_days"), 4)
            .as("avg_dac"),
          round(col("sum_dac").cast("double") / col("n_days") / col("mac"),
            4).as("stickiness"))
        .orderBy("month")
    }),

    // Shannon token entropy per language — the corpus-diversity metric
    // an LLM-data pipeline tracks per shard (a collapsed/boilerplate
    // corpus shows up as an entropy drop). One corpus-scale shuffle
    // (the (lang, token) count, partial-combined map-side); the entropy
    // finish H = ln(N) − Σ c·ln(c)/N runs over the bounded vocabulary
    // relation. The Σ c·ln(c) accumulation is FP-order-dependent in
    // both engines, but the addends are ≤ |vocab| doubles — 4 dp
    // rounding absorbs the reorder noise.
    "q_stats_entropy" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("t"))
        .groupBy("lang", "t")
        .agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(col("c") * log(col("c").cast("double"))).as("sclc"))
        .select(col("lang"), col("n_tokens"), col("n_types"),
          round(log(col("n_tokens").cast("double")) -
            col("sclc") / col("n_tokens"), 4).as("entropy"))
        .orderBy("lang")),

    // Tukey-fence outlier scan on event values: per type, rank-selected
    // exact p25/p75 (RankSelect — no interpolation, no per-type
    // full-table window), fences at 1.5×IQR, then one conditional
    // aggregate over a second fact scan with the 5-row fence relation
    // BROADCAST. The fence comparison is kept ALL-INTEGER by scaling
    // both sides by 2 (2c < 2·p25 − 3·IQR) so no engine ever rounds a
    // fence; only the final share is an IEEE division → 4 dp.
    "q_stats_outlier" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type").as("et"), cents(col("value")).as("c"),
          col("event_id"))
      val fences = RankSelect.selectRanks(ev, "et", "c", "event_id",
          Seq("p25" -> 0.25, "p75" -> 0.75),
          RankSelect.bucketsFor(graft.sources.Stats.rowCount(s, d, "events")))
        .groupBy("et")
        .agg(max(when(col("__tag") === "p25", col("__v"))).as("p25_c"),
          max(when(col("__tag") === "p75", col("__v"))).as("p75_c"))
      val iqr3 = lit(3L) * (col("p75_c") - col("p25_c"))
      val out = (lit(2L) * col("c") < lit(2L) * col("p25_c") - iqr3) ||
        (lit(2L) * col("c") > lit(2L) * col("p75_c") + iqr3)
      ev.join(broadcast(fences), "et")
        .groupBy(col("et").as("event_type"))
        .agg(min("p25_c").as("p25_c"), min("p75_c").as("p75_c"),
          count(lit(1)).as("n"),
          sum(when(out, 1L).otherwise(0L)).as("n_out"))
        .withColumn("out_share",
          round(col("n_out").cast("double") / col("n"), 4))
        .orderBy("event_type")
    }),

    // Higher-moment profile (skewness, excess kurtosis) per return
    // flag: ONE partial-combined hash aggregate collecting exact power
    // sums Σc..Σc⁴ — cents as DECIMAL so c⁴ ≈ 10²⁸ stays exact where
    // int64 would overflow (DuckDB sums the same integers in HUGEINT) —
    // then a closed-form finish on doubles converted from identical
    // integers. No pow(): σ^1.5 = v·√v and m⁴ = (m·m)·(m·m), so every
    // FP op is IEEE correctly-rounded and the 4 dp output is
    // bit-stable across engines.
    "q_agg_moments" -> ((s, d) => {
      val cd = cents(col("l_extendedprice")).cast("decimal(12,0)")
      def dbl(c: String) = col(c).cast("double")
      val m = dbl("s1") / col("n")
      val v = dbl("s2") / col("n") - m * m
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"), sum(cd).as("s1"),
          sum(cd * cd).as("s2"), sum(cd * cd * cd).as("s3"),
          sum((cd * cd) * (cd * cd)).as("s4"))
        .select(col("flag"), col("n"),
          round(dbl("s1") / col("n") / lit(100), 4).as("mean_d"),
          round((dbl("s3") / col("n") - lit(3) * m * (dbl("s2") / col("n")) +
            lit(2) * (m * m * m)) / (v * sqrt(v)), 4).as("skewness"),
          round((dbl("s4") / col("n") - lit(4) * m * (dbl("s3") / col("n")) +
            lit(6) * (m * m) * (dbl("s2") / col("n")) -
            lit(3) * ((m * m) * (m * m))) / (v * v) - lit(3), 4)
            .as("kurtosis"))
        .orderBy("flag")
    }),

    // PageRank (damping 0.85, 3 fixed iterations) over the event-type
    // transition graph — graph analytics as aggregate-then-iterate: the
    // ONLY corpus-scale work is the per-user lag window + bigram count
    // (the q_events_transitions shape, |users| parallelism); the edge
    // relation that comes out is |types|² rows and is CHECKPOINTED so
    // the three iterations never re-touch the events scan. Each
    // iteration is a tiny broadcast join + |types|-row aggregate — at
    // any corpus size the iteration cost is constant. Rank mass
    // arithmetic is double with constants cast explicitly (DuckDB
    // would otherwise read 0.85 as DECIMAL and diverge); 6 dp output.
    "q_graph_pagerank" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val edges = graft.Materialize.checkpoint(
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("from_t", lag(col("event_type"), 1).over(w))
          .filter(col("from_t").isNotNull)
          .groupBy(col("from_t"), col("event_type").as("to_t"))
          .agg(count(lit(1)).as("cnt")))
      val wts = edges
        .join(edges.groupBy(col("from_t").as("f2"))
          .agg(sum("cnt").as("outn")), col("from_t") === col("f2"))
        .select(col("from_t"), col("to_t"),
          (col("cnt").cast("double") / col("outn")).as("w"))
      val nodes = edges.select(col("from_t").as("node"))
        .union(edges.select(col("to_t"))).distinct()
      val nc = nodes.agg(count(lit(1)).as("nc"))
      var pr = nodes.crossJoin(broadcast(nc))
        .select(col("node"), (lit(1.0) / col("nc")).as("pr"))
      for (_ <- 1 to 3) {
        val acc = wts.join(pr, col("from_t") === col("node"))
          .groupBy(col("to_t").as("nd"))
          .agg(sum(col("pr") * col("w")).as("acc"))
        pr = nodes.crossJoin(broadcast(nc))
          .join(acc, col("node") === col("nd"), "left")
          .select(col("node"),
            (lit(0.15) / col("nc") +
              lit(0.85) * coalesce(col("acc"), lit(0.0))).as("pr"))
      }
      pr.select(col("node"), round(col("pr"), 6).as("pagerank"))
        .orderBy("node")
    }),

    // Triangle census of the co-purchase graph — parts bought together
    // in ≥ 2 distinct orders (the frequent-pairs support filter every
    // production co-purchase graph applies before any graph analytics).
    // Scale discipline in three steps: (1) pair enumeration collapses
    // each order to its sorted distinct part set in ONE partial-combined
    // corpus shuffle, then generates the ≤ C(basket,2) in-basket pairs
    // array-side — never a |parts|² product, and one shuffle cheaper
    // than the distinct + self-join spelling (profiled ~0.8 s faster at
    // sf0.1); the explicit repartition keeps AQE's size-based coalesce
    // from serializing the CPU-heavy low-byte explode stage (the known
    // bite from CLAUDE.md); (2) the support filter thins the edge set
    // BEFORE any graph-shaped join touches it; (3) triangles are
    // counted over DEGREE-ORDERED oriented edges — each edge points
    // from its (degree, node)-smaller endpoint, so every wedge is
    // generated exactly once and per-node fan-out is bounded by
    // √(2·|E|) (arboricity bound) instead of the raw hub degree. Wedge
    // closure is a join back against the oriented edges; orientation
    // respects one total order, so each triangle is produced exactly
    // once and the count equals the oracle's lexicographic a<b<c
    // triple join. Clustering = 3·triangles/wedges with wedges =
    // Σ d(d−1)/2 exact integers; the single IEEE division → 4 dp.
    "q_graph_triangles" -> ((s, d) => {
      // the repartition sits BELOW the groupBy: the aggregate then
      // reuses this REPARTITION_BY_NUM exchange (EnsureRequirements
      // adds nothing), and AQE's size-based coalesce must leave a
      // user-numbered shuffle alone — so the CPU-heavy low-byte
      // explode stage keeps full parallelism. Placed ABOVE the
      // aggregate it is dead: the planner drops it as redundant with
      // the agg's own exchange, which AQE then coalesces (profiled
      // 1.1-3.0 s vs 0.75-0.91 s for this edge build at sf0.1).
      val pairs = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(s.sparkContext.defaultParallelism, col("o"))
        .groupBy("o").agg(sort_array(collect_set("p")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(" +
            "slice(ps, i + 2, size(ps)), y -> named_struct('pa', x, 'pb', y))))"))
          .as("pr"))
      val e = graft.Materialize.checkpoint(
        pairs.groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
          .agg(count(lit(1)).as("sup"))
          .filter(col("sup") >= 2)
          .select("pa", "pb"))
      // bounded (≤ |nodes| rows) and re-derived from the cached edge
      // relation by one cheap aggregate per consumer — a blocking
      // checkpoint here would only add a driver round-trip
      val deg = e.select(col("pa").as("p"))
        .unionAll(e.select(col("pb").as("p")))
        .groupBy("p").agg(count(lit(1)).as("dg"))
      // orient each edge out of its (degree, node)-smaller endpoint;
      // carry the dst endpoint's (degree, node) so wedge generation
      // can order the two out-neighbors by the SAME total order
      val oe = graft.Materialize.checkpoint(
        e.join(deg.select(col("p").as("pa"), col("dg").as("da")), "pa")
          .join(deg.select(col("p").as("pb"), col("dg").as("db")), "pb")
          .select(
            when(col("da") < col("db") ||
              (col("da") === col("db") && col("pa") < col("pb")),
              col("pa")).otherwise(col("pb")).as("src"),
            when(col("da") < col("db") ||
              (col("da") === col("db") && col("pa") < col("pb")),
              col("pb")).otherwise(col("pa")).as("dst"),
            greatest(col("da"), col("db")).as("dd")))
      // ties in (da, db) cannot reach greatest(): when da = db the
      // orientation falls back to node id, and dd is the dst's degree
      // either way because both are equal
      val wedges = oe.as("x").join(oe.as("y"),
          col("x.src") === col("y.src") &&
            (col("x.dd") < col("y.dd") ||
              (col("x.dd") === col("y.dd") && col("x.dst") < col("y.dst"))))
        .select(col("x.dst").as("src"), col("y.dst").as("dst"))
      val tri = wedges.join(oe.select("src", "dst"), Seq("src", "dst"),
          "left_semi")
        .agg(count(lit(1)).as("triangles"))
      // d(d−1) is even, so integer DIV keeps the wedge count exact at
      // any scale (double division would round past 2^53)
      val st = deg.agg(count(lit(1)).as("nodes"),
        expr("SUM(dg * (dg - 1)) DIV 2").as("wedges"))
      val ec = e.agg(count(lit(1)).as("edges"))
      st.crossJoin(broadcast(ec)).crossJoin(broadcast(tri))
        .select(col("nodes"), col("edges"), col("wedges"), col("triangles"),
          round(lit(3.0) * col("triangles") / col("wedges"), 4)
            .as("clustering"))
    }),

    // RFM customer segmentation — quintile scores for Recency (epoch
    // day of last order), Frequency (order count) and Monetary (total
    // cents), concatenated to the classic '543'-style segment label,
    // with customer counts per segment. The composite-scoring family.
    // Scale shape: ONE customer collapse (checkpointed — it feeds the
    // three-metric stack and the final classify), then ONE stacked
    // RankSelect.selectRanks call over (metric, value) finds all 12
    // quintile boundaries — the 3-value metric key is exactly the
    // low-cardinality-group case the two-phase selection exists for
    // (a plain ntile(5) over customers would funnel every customer
    // through 3 window tasks); the 1-row boundary frame broadcasts
    // back over the cached collapse, so no second corpus shuffle.
    // Quintile q = 1 + #{boundaries strictly below} — boundaries are
    // rank-selected exact integers, so both engines classify
    // identically, ties included.
    "q_agg_rfm" -> ((s, d) => {
      val cm = graft.Materialize.checkpointLazy(
        Tables.orders(s, d).groupBy(col("o_custkey").as("cust"))
          .agg(
            // o_orderdate is TIMESTAMP_NTZ; the cast is wall-clock
            // preserving under the UTC session, matching epoch_us
            max(expr("unix_micros(cast(o_orderdate as timestamp))" +
              " div 86400000000")).as("r"),
            count(lit(1)).as("f"),
            sumCents(col("o_totalprice")).as("m")))
      // ONE 1-row bounds aggregate doubles as cm's cache materializer
      // (q_agg_mad's fused-stats shape): min/max of all three metrics +
      // the customer count in a single pass, stacked into the 3-row
      // (metric, __lo, __hi, __n) relation selectRanksGivenStats needs
      // — the stacked metric stream is never re-scanned for bounds.
      val s1 = graft.Materialize.checkpoint(cm.agg(
        min(col("r").cast("double")).as("rlo"),
        max(col("r").cast("double")).as("rhi"),
        min(col("f").cast("double")).as("flo"),
        max(col("f").cast("double")).as("fhi"),
        min(col("m").cast("double")).as("mlo"),
        max(col("m").cast("double")).as("mhi"),
        count(lit(1)).as("n")))
      val statsDf = s1.select(
        expr("stack(3, 'r', rlo, rhi, 'f', flo, fhi, 'm', mlo, mhi)" +
          " as (metric, __lo, __hi)"),
        col("n").as("__n"))
      val st = cm.select(col("cust"), lit("r").as("metric"), col("r").as("v"))
        .unionAll(cm.select(col("cust"), lit("f").as("metric"),
          col("f").as("v")))
        .unionAll(cm.select(col("cust"), lit("m").as("metric"),
          col("m").as("v")))
      val sel = RankSelect.selectRanksGivenStats(st, "metric", "v", "cust",
        Seq("p20" -> 0.2, "p40" -> 0.4, "p60" -> 0.6, "p80" -> 0.8),
        statsDf,
        RankSelect.bucketsFor(Stats.rowCount(s, d, "orders")))
      def bd(metric: String, tag: String) =
        max(when(col("metric") === metric && col("__tag") === tag,
          col("__v"))).as(s"$metric$tag")
      val w = sel.agg(
        bd("r", "p20"), bd("r", "p40"), bd("r", "p60"), bd("r", "p80"),
        bd("f", "p20"), bd("f", "p40"), bd("f", "p60"), bd("f", "p80"),
        bd("m", "p20"), bd("m", "p40"), bd("m", "p60"), bd("m", "p80"))
      def q(v: String) =
        (lit(1) + (col(v) > col(s"${v}p20")).cast("int")
          + (col(v) > col(s"${v}p40")).cast("int")
          + (col(v) > col(s"${v}p60")).cast("int")
          + (col(v) > col(s"${v}p80")).cast("int")).cast("string")
      cm.crossJoin(broadcast(w))
        .select(concat(q("r"), q("f"), q("m")).as("segment"))
        .groupBy("segment").agg(count(lit(1)).as("n_customers"))
        .orderBy("segment")
    }),

    // Market-basket association rules over co-purchased parts: for
    // every pair bought together in ≥ 2 orders, both directed rules
    // a→b with exact support, confidence = sup_ab/sup_a and
    // lift = sup_ab·N/(sup_a·sup_b) — the frequent-itemset mining
    // family (recommendations, cross-sell). Scale shape shared with
    // q_graph_triangles: ONE per-order sorted-set collapse (checkpointed
    // — three consumers: pair counts, item supports, basket total), the
    // ≤ C(basket,2) in-basket pairs explode array-side, and the support
    // filter bounds everything downstream; item supports come from
    // exploding the SAME cached sets (no second corpus distinct), so
    // the corpus is shuffled exactly once. Both ratios are single IEEE
    // divisions of exact integer products (sup_ab·N stays in long
    // range: supports ≤ orders, N ≤ 2^31) → 4 dp.
    "q_assoc_rules" -> ((s, d) => {
      val sets = graft.Materialize.checkpoint(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .repartition(s.sparkContext.defaultParallelism, col("o"))
          .groupBy("o").agg(sort_array(collect_set("p")).as("ps")))
      val isup = sets.select(explode(col("ps")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("sup"))
      val n = sets.agg(count(lit(1)).as("n_orders"))
      val pairs = sets
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(" +
            "slice(ps, i + 2, size(ps)), y -> named_struct('pa', x, 'pb', y))))"))
          .as("pr"))
        .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
        .agg(count(lit(1)).as("sup_ab"))
        .filter(col("sup_ab") >= 2)
      // Both rule directions come from ONE explode over the pair
      // aggregate, not a union of two selects: the union's branches are
      // separate plan subtrees, so the pair explode + partial aggregate
      // ran TWICE (AQE stage reuse dedupes the shuffle read, not the
      // map-side explode work — r18 plan audit: two Generate+
      // HashAggregate chains over the sets cache). One generate halves
      // that map work; spark-shell A/B at sf0.1: cold 5.1 → 2.3 s,
      // warm 1.41 → 1.20 s, rows identical.
      val rules = pairs
        .select(explode(array(
          struct(col("pa").as("ante"), col("pb").as("cons"), col("sup_ab")),
          struct(col("pb").as("ante"), col("pa").as("cons"), col("sup_ab"))))
          .as("r"))
        .select(col("r.ante").as("ante"), col("r.cons").as("cons"),
          col("r.sup_ab").as("sup_ab"))
      rules
        .join(isup.select(col("p").as("ante"), col("sup").as("sa")), "ante")
        .join(isup.select(col("p").as("cons"), col("sup").as("sb")), "cons")
        .crossJoin(broadcast(n))
        .select(col("ante"), col("cons"), col("sup_ab"),
          round(col("sup_ab").cast("double") / col("sa"), 4).as("conf"),
          round((col("sup_ab") * col("n_orders")).cast("double") /
            (col("sa") * col("sb")), 4).as("lift"))
        .orderBy("ante", "cons")
    }),

    // Theil T index of order value per status — the inequality
    // metric that decomposes additively across groups (gini does
    // not), so it is the one a contributor-concentration dashboard
    // aggregates hierarchically. T = Σx·ln(x)/Σx − ln(Σx/n) over
    // integer cents: ONE partial-combined hash aggregate per group
    // collects (n, Σx, Σx·ln x) in a single fact pass — no rank, no
    // join, no window. ln(integer cents) is the only libm call and
    // both engines' ~1-ulp log error vanishes at 4 dp (same argument
    // as q_stats_entropy's log2). Residual risk, accepted: Σx·ln(x)
    // accumulates DOUBLES, so unlike the repo's usual
    // exact-integer-sums idiom the partial sums depend on partition
    // layout / engine accumulation order (~1e-10 relative spread at
    // these SFs). A value sitting exactly on a 4-dp rounding boundary
    // could in principle flake across AQE layouts; if it ever does,
    // widen the comparison to 3 dp rather than chasing the layout.
    "q_agg_theil" -> ((s, d) => {
      val c = cents(col("o_totalprice")).cast("double")
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("n"),
          sum(c).as("sx"), sum(c * log(c)).as("sxl"))
        .select(col("st"), col("n"),
          round(col("sxl") / col("sx") - log(col("sx") / col("n")), 4)
            .as("theil"))
        .orderBy("st")
    }),

    // Degree distribution of the co-purchase graph (same ≥2-support
    // edge set as q_graph_triangles) — the first thing a graph
    // workload reports, and the skew evidence behind salting
    // decisions: a power-law tail here is exactly the hot-key
    // distribution joins must survive. Shares the triangle census's
    // scale shape: one numbered-repartition basket collapse, pair
    // explode bounded by C(basket, 2), and everything after the
    // support filter operates on the bounded edge relation (degree =
    // one hash agg over 2|E| node slots, histogram = one agg over
    // ≤ |V| rows). The corpus is shuffled exactly once.
    "q_graph_degree" -> ((s, d) => {
      val pairs = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(s.sparkContext.defaultParallelism, col("o"))
        .groupBy("o").agg(sort_array(collect_set("p")).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(" +
            "slice(ps, i + 2, size(ps)), y -> named_struct('pa', x, 'pb', y))))"))
          .as("pr"))
      val e = pairs.groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
        .agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 2)
        .select("pa", "pb")
      e.select(col("pa").as("node")).unionAll(e.select(col("pb").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_parts"))
        .orderBy("degree")
    }),

    // Gini coefficient of order value per status — the inequality/
    // concentration metric (revenue concentration, data-contributor
    // skew). Needs every row's exact global rank within its group:
    // RankSelect.withGlobalRank supplies it with (group × bucket)
    // parallelism (never a |status|-task window), and the Gini closed
    // form G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) is computed ENTIRELY in
    // exact integers (rank·cents products in DECIMAL — Σi·x ≈ 1.5·10¹⁸
    // already grazes int64 at sf0.1; DuckDB sums in HUGEINT) with one
    // final IEEE division → 4 dp.
    "q_agg_gini" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .select(col("o_orderstatus").as("st"),
          cents(col("o_totalprice")).as("c"), col("o_orderkey"))
      val rd = col("__rank").cast("decimal(19,0)")
      val vd = col("__v").cast("decimal(19,0)")
      RankSelect.withGlobalRank(ord, "st", "c", "o_orderkey",
          RankSelect.bucketsFor(graft.sources.Stats.rowCount(s, d, "orders")))
        .groupBy("st")
        .agg(count(lit(1)).as("n"), sum(vd).as("sx"), sum(rd * vd).as("six"))
        .select(col("st"), col("n"),
          round((lit(2) * col("six") - (col("n") + lit(1)) * col("sx"))
            .cast("double") /
            (col("n") * col("sx")).cast("double"), 4).as("gini"))
        .orderBy("st")
    }),

    // Welch's two-sample t statistic (order value, status F vs O) —
    // the A/B-test primitive. ONE partial-combined conditional
    // aggregate collects both groups' exact sufficient statistics in a
    // single fact pass (no per-group scan, no join); the t closed form
    // runs on doubles converted from identical integers through an
    // identical expression tree. Squares in DECIMAL (int64 overflow);
    // sample variance spelled pop_var·n/(n−1) so sqrt is the only
    // non-arithmetic FP op (IEEE correctly-rounded everywhere).
    "q_stats_ttest" -> ((s, d) => {
      val cd = cents(col("o_totalprice")).cast("decimal(19,0)")
      def dbl(c: String) = col(c).cast("double")
      val isF = col("o_orderstatus") === "F"
      val isO = col("o_orderstatus") === "O"
      val m1 = dbl("s1") / col("n1")
      val m2 = dbl("s2") / col("n2")
      val se1 = (dbl("q1") / col("n1") - m1 * m1) * col("n1") /
        (col("n1") - lit(1)) / col("n1")
      val se2 = (dbl("q2") / col("n2") - m2 * m2) * col("n2") /
        (col("n2") - lit(1)) / col("n2")
      Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("F", "O"))
        .agg(
          sum(when(isF, 1L).otherwise(0L)).as("n1"),
          sum(when(isO, 1L).otherwise(0L)).as("n2"),
          sum(when(isF, cd)).as("s1"), sum(when(isO, cd)).as("s2"),
          sum(when(isF, cd * cd)).as("q1"), sum(when(isO, cd * cd)).as("q2"))
        .select(col("n1"), col("n2"),
          round((m1 - m2) / lit(100), 4).as("mean_diff_d"),
          round((m1 - m2) / sqrt(se1 + se2), 4).as("t_stat"))
    }),

    // Two-sample Kolmogorov–Smirnov: max ECDF gap between finished and
    // open orders' price distributions — the drift detector that needs
    // the WHOLE distribution, not moments. sup|F1−F2| compares exact
    // integer cross-products (|cw1·n2 − cw2·n1|, one row per distinct
    // price) so the max is engine-portable; the global cumulative
    // counts come from PrefixSum's two-phase shape — never a
    // single-task `sum over (order by v)` window. The (value, c1, c2)
    // collapse is checkpointed: it is corpus-scale and feeds both the
    // totals and the cumsum machinery. One IEEE division at the end
    // → 4 dp.
    "q_stats_ks" -> ((s, d) => {
      val c = graft.Materialize.checkpoint(
        Tables.orders(s, d)
          .filter(col("o_orderstatus").isin("F", "O"))
          .groupBy(cents(col("o_totalprice")).as("v"))
          .agg(
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
              .as("c1"),
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L))
              .as("c2")))
      val tot = c.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      PrefixSum.globalCumsum(c, "v", Seq("c1", "c2"),
          RankSelect.bucketsFor(Stats.rowCount(s, d, "orders")))
        .crossJoin(broadcast(tot))
        .groupBy("n1", "n2")
        .agg(max(abs(col("__cw_c1") * col("n2") -
          col("__cw_c2") * col("n1"))).as("d_num"))
        .select(col("n1"), col("n2"), col("d_num"),
          round(col("d_num").cast("double") / (col("n1") * col("n2")), 4)
            .as("d"))
    }),

    // Mann–Whitney U (rank-sum) between finished and open orders'
    // prices — the nonparametric two-sample test that, unlike Welch's
    // t (q_stats_ttest), needs every value's GLOBAL rank, not moments.
    // Ranks with ties are midranks; on the (value, c1, c2) collapse
    // the doubled midrank of a tied block is the integer
    // 2·cumBefore + cnt + 1 = 2·cwAll − cntAll + 1, so the doubled
    // rank sum 2·R1 = Σ c1·(2·cwAll − (c1+c2) + 1) and the doubled
    // statistic u2 = 2·R1 − 2·n1(n1+1)/2 stay EXACT integers — the
    // only IEEE op is the final AUC division → 4 dp (AUC = U1/(n1·n2),
    // the probability a random F-price exceeds a random O-price).
    // Global cumulative counts come from PrefixSum's two-phase shape,
    // never a single-task `sum over (order by v)`; the identity
    // 2·U1 = #{F>O pairs}·2 + #{F=O ties} is pinned against the brute
    // pairwise count in StatsValueSpec's golden.
    "q_stats_mwu" -> ((s, d) => {
      val c = graft.Materialize.checkpoint(
        Tables.orders(s, d)
          .filter(col("o_orderstatus").isin("F", "O"))
          .groupBy(cents(col("o_totalprice")).as("v"))
          .agg(
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
              .as("c1"),
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L))
              .as("c2")))
      val tot = c.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      PrefixSum.globalCumsum(c, "v", Seq("c1", "c2"),
          RankSelect.bucketsFor(Stats.rowCount(s, d, "orders")))
        .select(col("c1"), col("c2"),
          (col("__cw_c1") + col("__cw_c2")).as("cwa"))
        .agg(sum(col("c1") * (lit(2L) * col("cwa")
          - (col("c1") + col("c2")) + lit(1L))).as("r2"))
        .crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
          (col("r2") - col("n1") * (col("n1") + lit(1L)))
            .cast("long").as("u2"),
          round((col("r2") - col("n1") * (col("n1") + lit(1L)))
              .cast("double") / (lit(2.0) * col("n1") * col("n2")), 4)
            .as("auc"))
    }),

    // Customer-acquisition curve: new customers per month (month of
    // FIRST order) plus the cumulative total — the growth-accounting
    // view. Two user-keyed aggregates thin the corpus (facts shuffle
    // once, on o_custkey); the running sum is a window over the
    // ≤|months| aggregate, never the fact table. All-integer output.
    "q_agg_new_customers" -> ((s, d) => {
      val w = Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(min(to_date(date_trunc("DAY", col("o_orderdate"))))
          .as("first_day"))
        .groupBy(date_format(date_trunc("MONTH", col("first_day")),
          "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("new_custs"))
        .withColumn("cum_custs", sum("new_custs").over(w))
        .orderBy("month")
    }),

    // Zipf-law fit per language: OLS of ln(count) on ln(rank) over the
    // top-100 tokens — the corpus-health diagnostic (natural text sits
    // near slope −1; generated/templated text flattens). The rank
    // window runs over the VOCABULARY aggregate (bounded per language),
    // never the token stream, and the rank<=100 filter compiles to a
    // WindowGroupLimit so only 100 survivors per language leave the
    // window. OLS finish = the q_stats_regression closed form on ln
    // sufficient statistics, 4 dp.
    "q_text_zipf" -> ((s, d) => {
      val rw = Window.partitionBy("lang").orderBy(col("c").desc, col("t"))
      def dbl(c: String) = col(c).cast("double")
      val den = dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")
      Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("t"))
        .groupBy("lang", "t")
        .agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(rw))
        .filter(col("rk") <= 100)
        .select(col("lang"), log(col("rk").cast("double")).as("x"),
          log(col("c").cast("double")).as("y"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("lang"), col("n"),
          round((dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")) / den, 4)
            .as("slope"),
          round((dbl("sy") * dbl("sxx") - dbl("sx") * dbl("sxy")) / den, 4)
            .as("intercept"))
        .orderBy("lang")
    }),

    // Chi-square independence test, order status × priority — the
    // categorical A/B-test primitive (is the treatment split
    // independent of the outcome?). The corpus collapses to the
    // |status|×|priority| contingency aggregate in ONE partial-combined
    // shuffle; the checkpointed cell relation feeds all four consumers
    // (row totals, column totals, grand total, the term join) without
    // re-scanning facts; χ² = Σ(O−E)²/E runs over ≤15 rows with E
    // derived from exact integer marginals through an identical
    // double-expression tree in both engines → 4 dp.
    "q_stats_chisq" -> ((s, d) => {
      val cells = graft.Materialize.checkpoint(
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus").as("st"),
            col("o_orderpriority").as("pr"))
          .agg(count(lit(1)).as("o")))
      val rt = cells.groupBy("st").agg(sum("o").as("r"))
      val ct = cells.groupBy("pr").agg(sum("o").as("c"))
      val tot = cells.agg(sum("o").as("n"),
        countDistinct("st").as("n_rows"), countDistinct("pr").as("n_cols"))
      val e = col("r").cast("double") * col("c") / col("n")
      val diff = col("o").cast("double") - e
      cells.join(broadcast(rt), "st").join(broadcast(ct), "pr")
        .crossJoin(broadcast(tot))
        .select(col("n_rows"), col("n_cols"),
          ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"),
          (diff * diff / e).as("term"))
        .groupBy("n_rows", "n_cols", "dof")
        .agg(round(sum("term"), 4).as("chi2"))
    }),

    // Benford first-digit profile of order values — the fraud /
    // data-quality scan (fabricated or truncated money columns bend
    // away from the log law). One partial-combined hash aggregate over
    // the leading digit of exact integer cents (≤ 9 groups), the
    // 1-row total broadcasts back, and the reference curve
    // ln(1+1/d)/ln 10 uses only ln — correctly rounded in both
    // engines' libm (pow never appears) → 4 dp.
    "q_stats_benford" -> ((s, d) => {
      val agg = graft.Materialize.checkpoint(
        Tables.orders(s, d)
          .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1)
            .cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n")))
      val one = lit(1).cast("double")
      agg.crossJoin(broadcast(agg.agg(sum("n").as("tot"))))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("tot"), 4).as("share"),
          round(log(one + one / col("digit")) / log(lit(10).cast("double")),
            4).as("benford"))
        .orderBy("digit")
    }),

    // Pareto concentration: what share of revenue do the top 20% of
    // customers hold — the 80/20 check on any contributor
    // distribution (and the data-curation question "how skewed is the
    // source mix"). Facts collapse to the per-customer revenue
    // aggregate (one corpus shuffle on o_custkey); ranking that
    // aggregate still scales with |customers|, so it goes through
    // RankSelect.withGlobalRank at bucket-grain parallelism rather
    // than a one-task global window; k = ceil(0.2·n) in IEEE doubles
    // matches the oracle's CEIL bit-for-bit, the top-k test is integer
    // rank arithmetic, and only the final share divides → 4 dp.
    "q_agg_pareto" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("cust"))
        .agg(sumCents(col("o_totalprice")).as("rc"))
        .withColumn("g", lit("all"))
      RankSelect.withGlobalRank(rev, "g", "rc", "cust",
          RankSelect.bucketsFor(
            graft.sources.Stats.rowCount(s, d, "customer")))
        .select(col("__n").as("n_custs"),
          ceil(col("__n").cast("double") * lit(0.2)).cast("long")
            .as("top_custs"),
          col("__rank"), col("__v"))
        .groupBy("n_custs", "top_custs")
        .agg(sum("__v").as("total_c"),
          sum(when(col("__rank") > col("n_custs") - col("top_custs"),
            col("__v")).otherwise(0L)).as("top_c"),
          round(sum(when(col("__rank") > col("n_custs") - col("top_custs"),
            col("__v")).otherwise(0L)).cast("double") / sum("__v"), 4)
            .as("top_share"))
    }),

    // Recency-weighted customer value per market segment: each order
    // contributes value·2^-age_months (age clamped at 40) — the decay
    // scoring every retention/churn model starts from. The weighting
    // stays EXACT integer arithmetic: terms are scaled by
    // 2^(40−age) (a variable bit-shift, never pow()) and summed in
    // DECIMAL(38,0) (max term ≈ 2^74; DuckDB mirrors in HUGEINT), and
    // the single 2^40·100 divisor at the end is a power of two times
    // the cent scale — one deterministic division chain → 4 dp. One
    // o_custkey shuffle; the 1-row anchor broadcasts; the customer
    // dim join carries no hint (AQE's call, q_join_dim_part
    // discipline).
    "q_agg_decay" -> ((s, d) => {
      val om = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("om")
      val anchor = Tables.orders(s, d).agg(max(om).as("am"))
      val sc = Tables.orders(s, d)
        .crossJoin(broadcast(anchor))
        .withColumn("w", expr(
          "shiftleft(CAST(1 AS BIGINT), " +
            "40 - least(am - (year(o_orderdate)*12 + month(o_orderdate)), 40))"))
        .select(col("o_custkey").as("cust"),
          (cents(col("o_totalprice")).cast("decimal(38,0)") * col("w"))
            .as("term"))
        .groupBy("cust").agg(sum("term").as("s"))
      val div = expr("shiftleft(CAST(1 AS BIGINT), 40)")
      sc.join(Tables.customer(s, d),
          sc("cust") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_custs"),
          round(sum("s").cast("double") / div / lit(100), 4)
            .as("decayed_value_d"),
          round(sum("s").cast("double") / div / lit(100) / count(lit(1)), 4)
            .as("avg_decayed_d"))
        .orderBy("segment")
    }),

    // Herfindahl–Hirschman concentration of brand revenue within each
    // part type — the market-concentration / source-mix-diversity
    // index. HHI = Σ share² collapses to Σrev² / (Σrev)², which keeps
    // the whole computation in EXACT integers (squares in
    // DECIMAL(38,0)/HUGEINT — rev² ≈ 10²⁴ overflows int64) with a
    // single IEEE division at the end → 4 dp, no per-brand share
    // division and no FP sum of squares. Facts join the part catalog
    // hint-free (q_join_dim_part discipline), then two stacked
    // partial-combined aggregates.
    "q_agg_hhi" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type").as("ptype"), col("p_brand").as("brand"))
        .agg(sumCents(col("l_extendedprice")).as("rc"))
        .groupBy("ptype")
        .agg(count(lit(1)).as("n_brands"),
          sum("rc").as("total_c"),
          round(sum(col("rc").cast("decimal(38,0)") * col("rc"))
            .cast("double") /
            (sum("rc").cast("double") * sum("rc")), 4).as("hhi"))
        .orderBy("ptype")),

    // Covariance matrix over the lineitem measures (round 9 wave 22) —
    // the multi-column dependence profile feeding feature selection /
    // whitening, generalizing q_stats_corr's fixed pair: ONE
    // partial-combining aggregate collects ALL sufficient statistics
    // (n, 3 sums, 6 exact product sums as DECIMAL(38) — price-cents
    // squared times 600k rows overflows int64, and DuckDB's HUGEINT
    // sums the same integers exactly), then `stack` unpivots the
    // 1-row aggregate into the 6 unique (x, y) cells with the
    // closed-form cov finish — the fact table is scanned ONCE for the
    // whole matrix and nothing after the aggregate exceeds 6 rows.
    // Every double op is the same IEEE sequence in both engines → 4 dp.
    // Cells are reported in NATURAL units (dollars / qty / discount
    // fraction), derived from the exact integer sums by one extra
    // division through the per-cell scale product: in raw cents² the
    // price-price cell is ~9e12, where a double's ulp (~2e-3) exceeds
    // the 4 dp rounding step and round() is undefined across engines
    // (caught by the sf0.1 matrix cell); at dollar² magnitude (~9e8)
    // the step is 400× the ulp again.
    "q_stats_cov" -> ((s, d) => {
      val x = cents(col("l_extendedprice")).cast("decimal(20,0)")
      val y = col("l_quantity").cast("long").cast("decimal(20,0)")
      val z = (col("l_discount").cast("decimal(18,4)") * 10000)
        .cast("long").cast("decimal(20,0)")
      Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"), sum(z).as("sz"),
          sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(x * z).as("sxz"),
          sum(y * y).as("syy"), sum(y * z).as("syz"), sum(z * z).as("szz"))
        .select(col("n"), expr(
          "stack(6, " +
            "'disc_f', 'disc_f', szz, sz, sz, cast(1e8 as double), " +
            "'price_d', 'disc_f', sxz, sx, sz, cast(1e6 as double), " +
            "'price_d', 'price_d', sxx, sx, sx, cast(1e4 as double), " +
            "'price_d', 'qty', sxy, sx, sy, cast(1e2 as double), " +
            "'qty', 'disc_f', syz, sy, sz, cast(1e4 as double), " +
            "'qty', 'qty', syy, sy, sy, cast(1e0 as double)) " +
            "AS (x_col, y_col, sab, sa, sb, scl)"))
        .select(col("x_col"), col("y_col"), col("n"),
          round((col("sab").cast("double") -
            col("sa").cast("double") * col("sb").cast("double") /
              col("n").cast("double")) / col("n").cast("double") /
            col("scl"), 4)
            .as("cov"))
        .orderBy("x_col", "y_col")
    }),

    // Lag-1 autocorrelation of daily revenue (round 9 wave 23) — the
    // time-series diagnostic (is demand momentum real?) completing
    // the stats family: facts collapse to the |days|-row daily series
    // in ONE partial-combining aggregate, the lag pairs come from a
    // single-partition window over that BOUNDED relation (|days| does
    // not scale with the corpus — same discipline as the RankSelect
    // histogram prefix sum), and Pearson r over (rev, prev) uses
    // exact DECIMAL(38) sufficient sums with the identical IEEE
    // finish in both engines (sqrt is correctly rounded) → 4 dp.
    "q_stats_autocorr" -> ((s, d) => {
      val drev = Tables.orders(s, d)
        .groupBy(expr(
          "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"))
        .agg(sumCents(col("o_totalprice")).as("rev"))
      val l = drev
        .withColumn("prev", lag(col("rev"), 1).over(Window.orderBy("day")))
        .filter(col("prev").isNotNull)
      val x = col("rev").cast("decimal(20,0)")
      val y = col("prev").cast("decimal(20,0)")
      def d2(c: String) = col(c).cast("double")
      l.agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"))
        .select(col("n"),
          round((d2("sxy") - d2("sx") * d2("sy") / col("n").cast("double"))
            / (sqrt(d2("sxx") - d2("sx") * d2("sx") /
                col("n").cast("double")) *
              sqrt(d2("syy") - d2("sy") * d2("sy") /
                col("n").cast("double"))), 4).as("r1"))
    }),

    // Day-of-week seasonality index (round 9 wave 24): revenue share
    // per weekday normalized by order share — idx > 1 = that weekday
    // over-indexes on basket size. One fact projection feeds the
    // 7-group aggregate and the 1-row total (re-derived, both
    // partial-combine); the 1-row total BROADCASTS back over the
    // ≤ 7-row distribution. Exact integer cents/counts; idx is the
    // identical IEEE sequence in both engines → 4 dp.
    "q_stats_seasonality" -> ((s, d) => {
      val dd = Tables.orders(s, d).select(
        expr("(unix_micros(cast(o_orderdate as timestamp))" +
          " div 86400000000 + 4) % 7").as("dow"),
        cents(col("o_totalprice")).as("c"))
      val t = dd.agg(sum("c").as("tot"), count(lit(1)).as("nt"))
      dd.groupBy("dow")
        .agg(count(lit(1)).as("n_orders"), sum("c").as("rev_c"))
        .crossJoin(broadcast(t))
        .select(col("dow"), col("n_orders"), col("rev_c"),
          round(col("rev_c").cast("double") * col("nt").cast("double") /
            (col("n_orders").cast("double") * col("tot").cast("double")), 4)
            .as("idx"))
        .orderBy("dow")
    }),

    // Deterministic subsampling bootstrap (round 9 wave 24) — the
    // uncertainty-quantification operator: 16 half-rate (p = 1/2)
    // m-out-of-n resamples of order value, each resample's membership
    // decided by md5(rep:key) (RNG-free, engine-portable, replay- and
    // partition-independent — the q_sample_split idiom), reported as
    // one row per resample so no cross-resample float accumulation
    // ever happens (the CI band is read off the 16 exact per-rep
    // means). The 16× fan-out is explode-side (no shuffle until the
    // 16-group aggregate) and IS the honest bootstrap cost at scale.
    "q_sample_bootstrap" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("c"))
        .select(col("c"), col("o_orderkey"),
          explode(sequence(lit(0), lit(15))).as("rep"))
        .filter(substring(md5(concat(col("rep").cast("string"), lit(":"),
          col("o_orderkey").cast("string")).cast("binary")), 1, 2) < "80")
        .groupBy(col("rep").cast("long").as("rep"))
        .agg(count(lit(1)).as("n"),
          round(sum("c").cast("double") / count(lit(1)).cast("double") /
            lit(100.0), 4).as("mean_d"))
        .orderBy("rep")),

    // Entropy rate of the behavioral Markov chain (round 9 wave 25) —
    // conditional entropy H(next | current) in bits over the event-type
    // transition matrix: how predictable is the next user action?
    // Builds on the q_events_transitions shape (user-keyed lag window,
    // |types|² count agg); the transition matrix is CHECKPOINTED (3
    // consumers — row sums, grand total, term join) and everything
    // after it is ≤ |types|² rows, so the entropy finish costs the
    // same at any corpus size. Log parity follows the q_stats_entropy
    // precedent (both engines' ln on identical integer ratios → 4 dp).
    "q_stats_entropy_rate" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      // NOT checkpointed: the |types|²-row matrix ends in an aggregate
      // exchange, and AQE's query-stage reuse serves all three
      // consumers (row sums, total, term join) from that ONE shuffle —
      // a blocking checkpoint job here only added a driver round-trip
      // (measured ~0.4 s of the query's ~0.9 s).
      val cc = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("c_ij"))
      val r = cc.groupBy("cur").agg(sum("c_ij").as("c_i"))
      val t = cc.agg(sum("c_ij").as("n"))
      val states = r.agg(count(lit(1)).as("n_states"))
      cc.join(broadcast(r), "cur")
        .crossJoin(broadcast(t))
        .select(col("n"),
          (negate(col("c_ij").cast("double") / col("n").cast("double")) *
            (log(col("c_ij").cast("double") / col("c_i").cast("double")) /
              log(lit(2.0).cast("double")))).as("term"))
        .groupBy("n")
        .agg(round(sum("term"), 4).as("h_bits"))
        .crossJoin(broadcast(states))
        .select(col("n_states"), col("n").as("n_transitions"),
          col("h_bits"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_stickiness" ->
      """WITH ud AS (SELECT DISTINCT o_custkey AS cust,
        |    CAST(date_trunc('day', o_orderdate) AS DATE) AS day FROM orders),
        |dm AS (SELECT strftime(date_trunc('month', day), '%Y-%m') AS month,
        |    CAST(SUM(dac) AS BIGINT) AS sum_dac,
        |    CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM (SELECT day, CAST(COUNT(*) AS BIGINT) AS dac FROM ud
        |        GROUP BY day) GROUP BY 1),
        |mau AS (SELECT strftime(date_trunc('month', day), '%Y-%m') AS month,
        |    CAST(COUNT(DISTINCT cust) AS BIGINT) AS mac FROM ud GROUP BY 1)
        |SELECT dm.month, mac,
        |  ROUND(CAST(sum_dac AS DOUBLE) / n_days, 4) AS avg_dac,
        |  ROUND(CAST(sum_dac AS DOUBLE) / n_days / mac, 4) AS stickiness
        |FROM dm JOIN mau USING (month) ORDER BY month""".stripMargin,
    "q_stats_entropy" ->
      """WITH tc AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS t
        |        FROM documents) GROUP BY 1, 2)
        |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  ROUND(LN(CAST(SUM(c) AS DOUBLE)) -
        |    SUM(c * LN(CAST(c AS DOUBLE))) / SUM(c), 4) AS entropy
        |FROM tc GROUP BY lang ORDER BY lang""".stripMargin,
    "q_stats_outlier" ->
      s"""WITH o AS (SELECT event_type AS et, ${sqlCents("value")} AS c,
         |    event_id AS k FROM events),
         |r AS (SELECT et, c, ROW_NUMBER() OVER (PARTITION BY et
         |      ORDER BY c, k) AS rn,
         |    COUNT(*) OVER (PARTITION BY et) AS n FROM o),
         |p AS (SELECT et,
         |    MAX(CASE WHEN rn = CAST(CEIL(n * 0.25) AS BIGINT) THEN c END)
         |      AS p25,
         |    MAX(CASE WHEN rn = CAST(CEIL(n * 0.75) AS BIGINT) THEN c END)
         |      AS p75
         |  FROM r GROUP BY et)
         |SELECT o.et AS event_type, p25 AS p25_c, p75 AS p75_c,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN 2*o.c < 2*p25 - 3*(p75-p25)
         |    OR 2*o.c > 2*p75 + 3*(p75-p25) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_out,
         |  ROUND(CAST(SUM(CASE WHEN 2*o.c < 2*p25 - 3*(p75-p25)
         |    OR 2*o.c > 2*p75 + 3*(p75-p25) THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*), 4) AS out_share
         |FROM o JOIN p ON o.et = p.et
         |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "q_agg_moments" ->
      s"""WITH st AS (SELECT l_returnflag AS flag,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    SUM(CAST(${sqlCents("l_extendedprice")} AS HUGEINT)) AS s1,
         |    SUM(CAST(${sqlCents("l_extendedprice")} AS HUGEINT)
         |      * ${sqlCents("l_extendedprice")}) AS s2,
         |    SUM(CAST(${sqlCents("l_extendedprice")} AS HUGEINT)
         |      * ${sqlCents("l_extendedprice")}
         |      * ${sqlCents("l_extendedprice")}) AS s3,
         |    SUM((CAST(${sqlCents("l_extendedprice")} AS HUGEINT)
         |      * ${sqlCents("l_extendedprice")})
         |      * (CAST(${sqlCents("l_extendedprice")} AS HUGEINT)
         |      * ${sqlCents("l_extendedprice")})) AS s4
         |  FROM lineitem GROUP BY 1)
         |SELECT flag, n,
         |  ROUND(CAST(s1 AS DOUBLE) / n / 100, 4) AS mean_d,
         |  ROUND((CAST(s3 AS DOUBLE) / n
         |    - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
         |    + 2 * ((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
         |      * (CAST(s1 AS DOUBLE) / n)))
         |    / ((CAST(s2 AS DOUBLE) / n
         |        - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
         |      * SQRT(CAST(s2 AS DOUBLE) / n
         |        - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))),
         |    4) AS skewness,
         |  ROUND((CAST(s4 AS DOUBLE) / n
         |    - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
         |    + 6 * ((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
         |      * (CAST(s2 AS DOUBLE) / n)
         |    - 3 * (((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
         |      * ((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))))
         |    / ((CAST(s2 AS DOUBLE) / n
         |        - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
         |      * (CAST(s2 AS DOUBLE) / n
         |        - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
         |    - 3, 4) AS kurtosis
         |FROM st ORDER BY flag""".stripMargin,
    "q_graph_pagerank" ->
      """WITH s AS (SELECT event_type AS to_t,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_t FROM events),
        |e AS (SELECT from_t, to_t, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM s WHERE from_t IS NOT NULL GROUP BY 1, 2),
        |outd AS (SELECT from_t AS f2, CAST(SUM(cnt) AS BIGINT) AS outn
        |  FROM e GROUP BY 1),
        |w AS (SELECT from_t, to_t, CAST(cnt AS DOUBLE) / outn AS w
        |  FROM e JOIN outd ON e.from_t = outd.f2),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT from_t AS node FROM e UNION SELECT to_t FROM e)),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM nodes),
        |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nc AS pr
        |  FROM nodes, nn),
        |p1 AS (SELECT n.node, CAST(0.15 AS DOUBLE) / nn.nc +
        |    CAST(0.85 AS DOUBLE) * COALESCE(a.acc, 0.0) AS pr
        |  FROM nodes n CROSS JOIN nn LEFT JOIN
        |    (SELECT w.to_t AS node, SUM(p0.pr * w.w) AS acc
        |     FROM w JOIN p0 ON p0.node = w.from_t GROUP BY 1) a
        |    ON a.node = n.node),
        |p2 AS (SELECT n.node, CAST(0.15 AS DOUBLE) / nn.nc +
        |    CAST(0.85 AS DOUBLE) * COALESCE(a.acc, 0.0) AS pr
        |  FROM nodes n CROSS JOIN nn LEFT JOIN
        |    (SELECT w.to_t AS node, SUM(p1.pr * w.w) AS acc
        |     FROM w JOIN p1 ON p1.node = w.from_t GROUP BY 1) a
        |    ON a.node = n.node),
        |p3 AS (SELECT n.node, CAST(0.15 AS DOUBLE) / nn.nc +
        |    CAST(0.85 AS DOUBLE) * COALESCE(a.acc, 0.0) AS pr
        |  FROM nodes n CROSS JOIN nn LEFT JOIN
        |    (SELECT w.to_t AS node, SUM(p2.pr * w.w) AS acc
        |     FROM w JOIN p2 ON p2.node = w.from_t GROUP BY 1) a
        |    ON a.node = n.node)
        |SELECT node, ROUND(pr, 6) AS pagerank FROM p3 ORDER BY node""".stripMargin,
    // Lexicographic a<b<c triple join — counts each triangle once,
    // exactly as the Spark side's degree-ordered orientation does
    // (both respect ONE total order per triangle). Integer DIV keeps
    // the wedge count exact; the clustering ratio is the single IEEE
    // division.
    "q_graph_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e AS (SELECT a.p AS pa, b.p AS pb FROM op a
        |  JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM
        |  (SELECT pa AS p FROM e UNION ALL SELECT pb FROM e) GROUP BY 1),
        |tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
        |  FROM e e1 JOIN e e2 ON e1.pa = e2.pa AND e1.pb < e2.pb
        |            JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nodes,
        |  CAST(SUM(d*(d-1)//2) AS BIGINT) AS wedges FROM deg),
        |ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS edges FROM e)
        |SELECT nodes, edges, wedges, triangles,
        |  ROUND(3.0*triangles/wedges, 4) AS clustering
        |FROM st, ec, tr""".stripMargin,
    // Same rank-selected boundaries (ROW_NUMBER ordered by (v, cust)
    // at rank CEIL(n·p) = selectRanks' pick) and the same strict
    // greater-than quintile arithmetic — integers end to end.
    "q_agg_rfm" ->
      s"""WITH cm AS (SELECT o_custkey AS cust,
         |    CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT)
         |      AS r,
         |    CAST(COUNT(*) AS BIGINT) AS f,
         |    ${sqlSumCents("o_totalprice")} AS m
         |  FROM orders GROUP BY 1),
         |st AS (
         |  SELECT cust, 'r' AS metric, r AS v FROM cm
         |  UNION ALL SELECT cust, 'f', f FROM cm
         |  UNION ALL SELECT cust, 'm', m FROM cm),
         |rk AS (SELECT metric, v,
         |    ROW_NUMBER() OVER (PARTITION BY metric ORDER BY v, cust)
         |      AS rn,
         |    COUNT(*) OVER (PARTITION BY metric) AS n
         |  FROM st),
         |b AS (SELECT metric, p,
         |    MAX(v) FILTER (rn = CAST(CEIL(n * p) AS BIGINT)) AS bv
         |  FROM rk, (SELECT UNNEST([0.2, 0.4, 0.6, 0.8]) AS p)
         |  GROUP BY 1, 2),
         |w AS (SELECT
         |    MAX(bv) FILTER (metric='r' AND p=0.2) AS r20,
         |    MAX(bv) FILTER (metric='r' AND p=0.4) AS r40,
         |    MAX(bv) FILTER (metric='r' AND p=0.6) AS r60,
         |    MAX(bv) FILTER (metric='r' AND p=0.8) AS r80,
         |    MAX(bv) FILTER (metric='f' AND p=0.2) AS f20,
         |    MAX(bv) FILTER (metric='f' AND p=0.4) AS f40,
         |    MAX(bv) FILTER (metric='f' AND p=0.6) AS f60,
         |    MAX(bv) FILTER (metric='f' AND p=0.8) AS f80,
         |    MAX(bv) FILTER (metric='m' AND p=0.2) AS m20,
         |    MAX(bv) FILTER (metric='m' AND p=0.4) AS m40,
         |    MAX(bv) FILTER (metric='m' AND p=0.6) AS m60,
         |    MAX(bv) FILTER (metric='m' AND p=0.8) AS m80
         |  FROM b)
         |SELECT CONCAT(
         |    1 + (r > r20)::INT + (r > r40)::INT
         |      + (r > r60)::INT + (r > r80)::INT,
         |    1 + (f > f20)::INT + (f > f40)::INT
         |      + (f > f60)::INT + (f > f80)::INT,
         |    1 + (m > m20)::INT + (m > m40)::INT
         |      + (m > m60)::INT + (m > m80)::INT) AS segment,
         |  CAST(COUNT(*) AS BIGINT) AS n_customers
         |FROM cm, w GROUP BY 1 ORDER BY 1""".stripMargin,
    // Confidence and lift are single divisions of exact integer
    // products, identical to the Spark side; the pair CTE is the same
    // a<b self-join the triangle oracle uses, with both rule
    // directions unioned afterwards.
    "q_assoc_rules" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders
        |  FROM op),
        |isup AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS sup FROM op
        |  GROUP BY 1),
        |pairs AS (SELECT a.p AS pa, b.p AS pb,
        |    CAST(COUNT(*) AS BIGINT) AS sup_ab
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |rules AS (
        |  SELECT pa AS ante, pb AS cons, sup_ab FROM pairs
        |  UNION ALL
        |  SELECT pb, pa, sup_ab FROM pairs)
        |SELECT r.ante, r.cons, r.sup_ab,
        |  ROUND(CAST(r.sup_ab AS DOUBLE) / sa.sup, 4) AS conf,
        |  ROUND(CAST(r.sup_ab * n.n_orders AS DOUBLE) /
        |    (sa.sup * sb.sup), 4) AS lift
        |FROM rules r
        |JOIN isup sa ON sa.p = r.ante
        |JOIN isup sb ON sb.p = r.cons, n
        |ORDER BY ante, cons""".stripMargin,
    "q_agg_theil" ->
      s"""WITH c AS (SELECT o_orderstatus AS st,
         |    CAST(${sqlCents("o_totalprice")} AS DOUBLE) AS c FROM orders)
         |SELECT st, CAST(COUNT(*) AS BIGINT) AS n,
         |  ROUND(SUM(c*LN(c))/SUM(c) - LN(SUM(c)/COUNT(*)), 4) AS theil
         |FROM c GROUP BY st ORDER BY st""".stripMargin,

    "q_graph_degree" ->
      """WITH sets AS (
        |  SELECT l_orderkey AS o,
        |    list_sort(list_distinct(list(l_partkey))) AS ps
        |  FROM lineitem GROUP BY l_orderkey),
        |pairs AS (
        |  SELECT pr.pa AS pa, pr.pb AS pb, COUNT(*) AS sup
        |  FROM sets, LATERAL (SELECT UNNEST(flatten(list_transform(ps,
        |    (x, i) -> list_transform(ps[i+1:],
        |      y -> {'pa': x, 'pb': y})))) AS pr) t
        |  GROUP BY pr.pa, pr.pb HAVING COUNT(*) >= 2),
        |deg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        |    SELECT pa AS node FROM pairs
        |    UNION ALL SELECT pb FROM pairs) GROUP BY node)
        |SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_parts
        |FROM deg GROUP BY degree ORDER BY degree""".stripMargin,

    "q_agg_gini" ->
      s"""WITH o AS (SELECT o_orderstatus AS st,
         |    ${sqlCents("o_totalprice")} AS c, o_orderkey AS k FROM orders),
         |r AS (SELECT st, c, ROW_NUMBER() OVER (PARTITION BY st
         |    ORDER BY c, k) AS rn FROM o),
         |a AS (SELECT st, CAST(COUNT(*) AS BIGINT) AS n,
         |    SUM(CAST(c AS HUGEINT)) AS sx,
         |    SUM(CAST(rn AS HUGEINT) * c) AS six
         |  FROM r GROUP BY st)
         |SELECT st, n,
         |  ROUND(CAST(2*six - (n+1)*sx AS DOUBLE) /
         |    CAST(n*sx AS DOUBLE), 4) AS gini
         |FROM a ORDER BY st""".stripMargin,
    "q_stats_ttest" ->
      s"""WITH s AS (SELECT
         |    CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n2,
         |    SUM(CASE WHEN o_orderstatus='F'
         |      THEN CAST(${sqlCents("o_totalprice")} AS HUGEINT)
         |      ELSE 0 END) AS s1,
         |    SUM(CASE WHEN o_orderstatus='O'
         |      THEN CAST(${sqlCents("o_totalprice")} AS HUGEINT)
         |      ELSE 0 END) AS s2,
         |    SUM(CASE WHEN o_orderstatus='F'
         |      THEN CAST(${sqlCents("o_totalprice")} AS HUGEINT)
         |        * ${sqlCents("o_totalprice")} ELSE 0 END) AS q1,
         |    SUM(CASE WHEN o_orderstatus='O'
         |      THEN CAST(${sqlCents("o_totalprice")} AS HUGEINT)
         |        * ${sqlCents("o_totalprice")} ELSE 0 END) AS q2
         |  FROM orders WHERE o_orderstatus IN ('F','O'))
         |SELECT n1, n2,
         |  ROUND((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2) / 100, 4)
         |    AS mean_diff_d,
         |  ROUND((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2) /
         |    SQRT((CAST(q1 AS DOUBLE)/n1
         |        - (CAST(s1 AS DOUBLE)/n1)*(CAST(s1 AS DOUBLE)/n1))
         |        * n1 / (n1-1) / n1
         |      + (CAST(q2 AS DOUBLE)/n2
         |        - (CAST(s2 AS DOUBLE)/n2)*(CAST(s2 AS DOUBLE)/n2))
         |        * n2 / (n2-1) / n2), 4) AS t_stat
         |FROM s""".stripMargin,
    // KS distance compared on exact integer cross-products; the single
    // final ROUND is the only IEEE op, identical in both engines.
    "q_stats_ks" ->
      s"""WITH c AS (
         |  SELECT ${sqlCents("o_totalprice")} AS v,
         |    CAST(COUNT(*) FILTER (o_orderstatus='F') AS BIGINT) AS c1,
         |    CAST(COUNT(*) FILTER (o_orderstatus='O') AS BIGINT) AS c2
         |  FROM orders WHERE o_orderstatus IN ('F','O') GROUP BY 1),
         |o AS (SELECT SUM(c1) OVER (ORDER BY v) AS cw1,
         |             SUM(c2) OVER (ORDER BY v) AS cw2 FROM c),
         |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |             CAST(SUM(c2) AS BIGINT) AS n2 FROM c)
         |SELECT n1, n2,
         |  CAST(MAX(ABS(cw1*n2 - cw2*n1)) AS BIGINT) AS d_num,
         |  ROUND(CAST(MAX(ABS(cw1*n2 - cw2*n1)) AS DOUBLE)/(n1*n2), 4)
         |    AS d
         |FROM o, t GROUP BY 1, 2""".stripMargin,
    // Doubled midranks keep the rank sum integer under ties; the AUC
    // division is the only IEEE op. Identical collapse + cumsum
    // derivation as the Spark side, spelled with the window DuckDB
    // runs over the bounded distinct-value relation.
    "q_stats_mwu" ->
      s"""WITH c AS (
         |  SELECT ${sqlCents("o_totalprice")} AS v,
         |    CAST(COUNT(*) FILTER (o_orderstatus='F') AS BIGINT) AS c1,
         |    CAST(COUNT(*) FILTER (o_orderstatus='O') AS BIGINT) AS c2
         |  FROM orders WHERE o_orderstatus IN ('F','O') GROUP BY 1),
         |o AS (SELECT c1, c2, SUM(c1+c2) OVER (ORDER BY v) AS cwa
         |  FROM c),
         |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |             CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
         |r AS (SELECT CAST(SUM(c1*(2*cwa - (c1+c2) + 1)) AS BIGINT)
         |    AS r2 FROM o)
         |SELECT n1, n2, CAST(r2 - n1*(n1+1) AS BIGINT) AS u2,
         |  ROUND(CAST(r2 - n1*(n1+1) AS DOUBLE)/(2.0*n1*n2), 4) AS auc
         |FROM r, t""".stripMargin,
    "q_agg_new_customers" ->
      """WITH f AS (SELECT o_custkey,
        |    MIN(CAST(date_trunc('day', o_orderdate) AS DATE)) AS first_day
        |  FROM orders GROUP BY 1),
        |d AS (SELECT strftime(date_trunc('month', first_day), '%Y-%m')
        |      AS month,
        |    CAST(COUNT(*) AS BIGINT) AS new_custs FROM f GROUP BY 1)
        |SELECT month, new_custs,
        |  CAST(SUM(new_custs) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_custs
        |FROM d ORDER BY month""".stripMargin,
    "q_text_zipf" ->
      """WITH tc AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS t
        |        FROM documents) GROUP BY 1, 2),
        |r AS (SELECT lang, t, c, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY c DESC, t) AS rk FROM tc),
        |top AS (SELECT lang, LN(CAST(rk AS DOUBLE)) AS x,
        |    LN(CAST(c AS DOUBLE)) AS y FROM r WHERE rk <= 100),
        |st AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
        |    SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy
        |  FROM top GROUP BY lang)
        |SELECT lang, n,
        |  ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS slope,
        |  ROUND((sy*sxx - sx*sxy) / (n*sxx - sx*sx), 4) AS intercept
        |FROM st ORDER BY lang""".stripMargin,
    "q_stats_chisq" ->
      """WITH cells AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
        |    CAST(COUNT(*) AS BIGINT) AS o FROM orders GROUP BY 1, 2),
        |rt AS (SELECT st, CAST(SUM(o) AS BIGINT) AS r FROM cells
        |       GROUP BY st),
        |ct AS (SELECT pr, CAST(SUM(o) AS BIGINT) AS c FROM cells
        |       GROUP BY pr),
        |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT st) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT pr) AS BIGINT) AS n_cols FROM cells)
        |SELECT n_rows, n_cols,
        |  CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
        |  ROUND(SUM((CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
        |    * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
        |    / (CAST(r AS DOUBLE) * c / n)), 4) AS chi2
        |FROM cells JOIN rt USING (st) JOIN ct USING (pr) CROSS JOIN t
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_stats_benford" ->
      s"""WITH dig AS (SELECT CAST(substr(
         |      CAST(${sqlCents("o_totalprice")} AS VARCHAR), 1, 1)
         |      AS BIGINT) AS digit FROM orders),
         |agg AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM dig
         |        GROUP BY digit),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM agg)
         |SELECT digit, n,
         |  ROUND(CAST(n AS DOUBLE) / tot, 4) AS share,
         |  ROUND(LN(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit)
         |    / LN(CAST(10 AS DOUBLE)), 4) AS benford
         |FROM agg CROSS JOIN t ORDER BY digit""".stripMargin,
    "q_agg_pareto" ->
      s"""WITH rev AS (SELECT o_custkey AS cust,
         |    ${sqlSumCents("o_totalprice")} AS rc FROM orders GROUP BY 1),
         |r AS (SELECT cust, rc, ROW_NUMBER() OVER (ORDER BY rc, cust)
         |      AS rn, COUNT(*) OVER () AS nn FROM rev),
         |k AS (SELECT CAST(MAX(nn) AS BIGINT) AS n,
         |    CAST(CEIL(CAST(MAX(nn) AS DOUBLE) * CAST(0.2 AS DOUBLE))
         |      AS BIGINT) AS k FROM r)
         |SELECT k.n AS n_custs, k.k AS top_custs,
         |  CAST(SUM(rc) AS BIGINT) AS total_c,
         |  CAST(SUM(CASE WHEN rn > k.n - k.k THEN rc ELSE 0 END)
         |    AS BIGINT) AS top_c,
         |  ROUND(CAST(SUM(CASE WHEN rn > k.n - k.k THEN rc ELSE 0 END)
         |    AS DOUBLE) / SUM(rc), 4) AS top_share
         |FROM r CROSS JOIN k GROUP BY 1, 2""".stripMargin,
    "q_agg_decay" ->
      s"""WITH anchor AS (SELECT MAX(year(o_orderdate)*12
         |      + month(o_orderdate)) AS am FROM orders),
         |sc AS (SELECT o_custkey AS cust,
         |    SUM(CAST(${sqlCents("o_totalprice")} AS HUGEINT)
         |      * (CAST(1 AS BIGINT) << (40 - LEAST(am
         |        - (year(o_orderdate)*12 + month(o_orderdate)), 40))))
         |      AS s
         |  FROM orders CROSS JOIN anchor GROUP BY 1),
         |j AS (SELECT c.c_mktsegment AS segment, s FROM sc
         |  JOIN customer c ON c.c_custkey = sc.cust)
         |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_custs,
         |  ROUND(CAST(SUM(s) AS DOUBLE) / (CAST(1 AS BIGINT) << 40)
         |    / 100, 4) AS decayed_value_d,
         |  ROUND(CAST(SUM(s) AS DOUBLE) / (CAST(1 AS BIGINT) << 40)
         |    / 100 / COUNT(*), 4) AS avg_decayed_d
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg_hhi" ->
      s"""WITH rev AS (SELECT p.p_type AS ptype, p.p_brand AS brand,
         |    ${sqlSumCents("l_extendedprice")} AS rc
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |  GROUP BY 1, 2)
         |SELECT ptype, CAST(COUNT(*) AS BIGINT) AS n_brands,
         |  CAST(SUM(rc) AS BIGINT) AS total_c,
         |  ROUND(CAST(SUM(CAST(rc AS HUGEINT) * rc) AS DOUBLE)
         |    / (CAST(SUM(rc) AS DOUBLE) * SUM(rc)), 4) AS hhi
         |FROM rev GROUP BY 1 ORDER BY 1""".stripMargin,
    // HUGEINT keeps every product sum exact (the Spark side uses
    // DECIMAL(38)); the cov finish is the IDENTICAL double op sequence
    "q_stats_cov" ->
      s"""WITH m AS (SELECT
         |    ${sqlCents("l_extendedprice")} AS x,
         |    CAST(l_quantity AS BIGINT) AS y,
         |    CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) AS z
         |  FROM lineitem),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         |    CAST(SUM(z) AS HUGEINT) AS sz,
         |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
         |    SUM(CAST(x AS HUGEINT) * z) AS sxz,
         |    SUM(CAST(y AS HUGEINT) * y) AS syy,
         |    SUM(CAST(y AS HUGEINT) * z) AS syz,
         |    SUM(CAST(z AS HUGEINT) * z) AS szz
         |  FROM m),
         |u AS (
         |  SELECT 'disc_f' AS x_col, 'disc_f' AS y_col, szz AS sab,
         |    sz AS sa, sz AS sb, CAST(1e8 AS DOUBLE) AS scl, n FROM s
         |  UNION ALL SELECT 'price_d', 'disc_f', sxz, sx, sz,
         |    CAST(1e6 AS DOUBLE), n FROM s
         |  UNION ALL SELECT 'price_d', 'price_d', sxx, sx, sx,
         |    CAST(1e4 AS DOUBLE), n FROM s
         |  UNION ALL SELECT 'price_d', 'qty', sxy, sx, sy,
         |    CAST(1e2 AS DOUBLE), n FROM s
         |  UNION ALL SELECT 'qty', 'disc_f', syz, sy, sz,
         |    CAST(1e4 AS DOUBLE), n FROM s
         |  UNION ALL SELECT 'qty', 'qty', syy, sy, sy,
         |    CAST(1e0 AS DOUBLE), n FROM s)
         |SELECT x_col, y_col, n,
         |  ROUND((CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) *
         |    CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
         |    / CAST(n AS DOUBLE) / scl, 4) AS cov
         |FROM u ORDER BY 1, 2""".stripMargin,
    "q_stats_autocorr" ->
      s"""WITH drev AS (SELECT
         |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
         |    ${sqlSumCents("o_totalprice")} AS rev
         |  FROM orders GROUP BY 1),
         |l AS (SELECT day, rev, LAG(rev) OVER (ORDER BY day) AS prev
         |  FROM drev),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(rev) AS HUGEINT) AS sx,
         |    CAST(SUM(prev) AS HUGEINT) AS sy,
         |    SUM(CAST(rev AS HUGEINT) * prev) AS sxy,
         |    SUM(CAST(rev AS HUGEINT) * rev) AS sxx,
         |    SUM(CAST(prev AS HUGEINT) * prev) AS syy
         |  FROM l WHERE prev IS NOT NULL)
         |SELECT n,
         |  ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
         |      CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
         |    (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
         |        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
         |     sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) *
         |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 4) AS r1
         |FROM s""".stripMargin,
    "q_stats_seasonality" ->
      s"""WITH d AS (SELECT
         |    (epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 + 4)
         |      % 7 AS dow,
         |    ${sqlCents("o_totalprice")} AS c FROM orders),
         |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tot,
         |    CAST(COUNT(*) AS BIGINT) AS nt FROM d)
         |SELECT CAST(dow AS BIGINT) AS dow,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  CAST(SUM(c) AS BIGINT) AS rev_c,
         |  ROUND(CAST(SUM(c) AS DOUBLE) * CAST(t.nt AS DOUBLE) /
         |    (CAST(COUNT(*) AS DOUBLE) * CAST(t.tot AS DOUBLE)), 4) AS idx
         |FROM d, t GROUP BY 1, t.nt, t.tot ORDER BY 1""".stripMargin,
    "q_sample_bootstrap" ->
      s"""WITH reps AS (SELECT unnest(range(16)) AS rep),
         |s AS (SELECT r.rep, ${sqlCents("o.o_totalprice")} AS c
         |  FROM orders o CROSS JOIN reps r
         |  WHERE substr(md5(CAST(r.rep AS VARCHAR) || ':' ||
         |    CAST(o.o_orderkey AS VARCHAR)), 1, 2) < '80')
         |SELECT CAST(rep AS BIGINT) AS rep, CAST(COUNT(*) AS BIGINT) AS n,
         |  ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    / CAST(100 AS DOUBLE), 4) AS mean_d
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stats_entropy_rate" ->
      """WITH e AS (SELECT user_id, event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |c AS (SELECT event_type AS cur, nxt, CAST(COUNT(*) AS BIGINT) AS c_ij
        |  FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT cur, CAST(SUM(c_ij) AS BIGINT) AS c_i
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(SUM(c_ij) AS BIGINT) AS n FROM c)
        |SELECT CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_states,
        |  CAST(t.n AS BIGINT) AS n_transitions,
        |  ROUND(SUM(-(CAST(c.c_ij AS DOUBLE) / CAST(t.n AS DOUBLE)) *
        |    (LN(CAST(c.c_ij AS DOUBLE) / CAST(r.c_i AS DOUBLE)) /
        |      LN(CAST(2 AS DOUBLE)))), 4) AS h_bits
        |FROM c JOIN r USING (cur) CROSS JOIN t
        |GROUP BY t.n""".stripMargin
  )
}

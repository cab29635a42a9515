package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Money._
import graft.sources.Tables

/** Round-9 analytics extensions (SURVEY.md §2.12): behavioral funnel,
  * equi-width histogram, per-group mode, and min-max feature scaling.
  *
  * All four follow the repo's exact-arithmetic discipline: money as
  * integer cents, ratios as one IEEE division of exact integers rounded
  * to 4 dp, counts as longs — so both engines hash bit-for-bit.
  */
object AnalyticsExtras {

  /** 24 h in epoch-µs — the funnel's per-stage conversion window. */
  private val DayUs = 86400000000L

  /** The SCD2 interval collapse shared by q_scd2_intervals and
    * q_join_pit: (user_id, state, t, event_id) → one row per
    * consecutive same-state run with [from_us, to_us) validity
    * (to_us NULL while open) and the run's event count. Both windows
    * partition by user_id only (data-proportional); the closing
    * lead() runs over collapsed RUNS, never events.
    */
  private def scd2Runs(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("t", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("rn")
    ev
      .withColumn("chg",
        when(lag(col("state"), 1).over(byUser).isNull ||
          col("state") =!= lag(col("state"), 1).over(byUser), 1)
          .otherwise(0))
      .withColumn("rn", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "rn")
      .agg(min(col("state")).as("state"), min(col("t")).as("from_us"),
        count(lit(1)).as("n_ev"))
      .withColumn("to_us", lead(col("from_us"), 1).over(wRun))
      .select(col("user_id"), col("rn"), col("state"), col("from_us"),
        col("to_us"), col("n_ev"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Conversion funnel view → click → purchase with a 24 h window per
    // stage: stage n counts users whose FIRST qualifying stage-n event
    // falls within 24 h of their first qualifying stage-(n-1) event.
    // Each stage is one hash aggregate keyed by user joined to the
    // previous stage's (user, first_ts) relation — all three joins
    // shuffle on the same user_id key, so at scale the exchanges line
    // up and each stage is a co-partitioned equi-join + partial-agg,
    // never a window over the event stream. The driver sees only the
    // three scalar counts.
    "q_events_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("t").as("vt"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("t") >= col("vt") && col("t") - col("vt") <= DayUs)
        .groupBy("user_id").agg(min("t").as("ct"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("t") >= col("ct") && col("t") - col("ct") <= DayUs)
        .groupBy("user_id").agg(min("t").as("pt"))
      def stage(df: DataFrame, n: Int, step: String) =
        df.agg(count(lit(1)).as("users"))
          .select(lit(n).as("stage"), lit(step).as("step"), col("users"))
      stage(v, 1, "view")
        .unionAll(stage(c, 2, "click"))
        .unionAll(stage(p, 3, "purchase"))
        .orderBy("stage")
    }),

    // Equi-width 10-bin histogram of order value: global [min, max]
    // from one bounds aggregate (partial-combines map-side, one row
    // out) BROADCAST over the fact scan, bucket index by exact integer
    // arithmetic — (c-mn)*10 div (mx-mn+1) never sees a double, so both
    // engines bin identically. Second pass is one ≤10-group hash agg.
    "q_stats_histogram" -> ((s, d) => {
      val c = Tables.orders(s, d).select(cents(col("o_totalprice")).as("c"))
      val b = c.agg(min("c").as("mn"), max("c").as("mx"))
      c.crossJoin(broadcast(b))
        .select(
          least(lit(9L), expr("(c - mn) * 10 div (mx - mn + 1)"))
            .as("bucket"),
          col("c"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("c").as("lo_c"), max("c").as("hi_c"))
        .orderBy("bucket")
    }),

    // Per-group mode (most frequent order priority per status) with a
    // deterministic tie-break: smallest priority string among the
    // max-count ties. Two hash aggregates — (status, priority) counts,
    // then per-status max — joined on the TINY aggregated relation
    // (|status|×|priority| rows), so no window ever touches the fact
    // table and the fact scan shuffles once, partial-combined.
    "q_agg_mode" -> ((s, d) => {
      val cdf = Tables.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val m = cdf.groupBy("o_orderstatus").agg(max("n").as("mx"))
      cdf.join(broadcast(m), "o_orderstatus")
        .filter(col("n") === col("mx"))
        .groupBy("o_orderstatus")
        .agg(min("o_orderpriority").as("mode_priority"), max("n").as("n"))
        .orderBy("o_orderstatus")
    }),

    // Cohort retention matrix — users cohorted by FIRST-purchase day,
    // counted per (cohort, day-offset) of later purchase activity: the
    // product-analytics operator behind every retention curve. Three
    // hash aggregates and one join, ALL keyed by user_id (cohort agg,
    // distinct user-day agg, user-keyed join), so the exchanges line
    // up on one key and the final (cohort, offset) agg is over the
    // already-thin distinct relation. Dates compare as DATE (exact),
    // offsets as integer day differences — no timestamp arithmetic
    // survives to the output.
    "q_events_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          to_date(date_trunc("day", col("ts"))).as("day"))
      val cohorts = ev.groupBy("user_id").agg(min("day").as("cohort"))
      ev.distinct()
        .join(cohorts, "user_id")
        .groupBy(
          date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
        .agg(count(lit(1)).as("active_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Min-max feature scaling per status group — the normalization step
    // before ML statistics. Per-group [min, max] is a 3-row aggregate
    // that BROADCASTS back over the fact scan (the q_agg_winsorize
    // shape), so the scaling pass never shuffles facts. scaled =
    // (c-mn)/(mx-mn) is one IEEE division of exact integers → 4 dp,
    // bit-identical across engines.
    "q_stats_minmax" -> ((s, d) => {
      val c = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderstatus"), cents(col("o_totalprice")).as("c"))
      val b = c.groupBy(col("o_orderstatus").as("st"))
        .agg(min("c").as("mn"), max("c").as("mx"))
      c.join(broadcast(b), col("o_orderstatus") === col("st"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          round((col("c") - col("mn")).cast("double") /
            (col("mx") - col("mn")).cast("double"), 4).as("scaled"))
        .orderBy("o_orderkey")
    }),

    // Event-type transition matrix (first-order Markov counts): each
    // user's event stream ordered by (ts, event_id) yields consecutive
    // (from, to) bigrams, counted across users — the sequence-mining
    // primitive behind session-flow and next-action models. The lag
    // window partitions by user_id: parallelism is |users| (data-
    // proportional, never a handful of tasks), each partition is one
    // user's bounded history, and the unique event_id suffix makes the
    // order — and so every bigram — deterministic. The |types|² count
    // agg afterwards partial-combines map-side.
    "q_events_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),

    // Volume-anomaly scan: per (event_type, day) counts flagged where
    // the day sits more than 2σ from its type's mean — entirely in
    // INTEGER arithmetic. z² > 4 rearranges to (n·m − s)² > 4(m·q − s²)
    // over the per-type sufficient statistics (m days, s = Σn,
    // q = Σn²), so no sqrt, no float, and both engines compare the
    // identical integers. Daily counts partial-combine map-side; the
    // per-type stats relation is |types| rows and BROADCASTS back over
    // the ≤ |types|·|days| daily relation — facts are scanned once.
    "q_events_anomaly" -> ((s, d) => {
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"),
          to_date(date_trunc("DAY", col("ts"))).as("day"))
        .agg(count(lit(1)).as("n"))
      val st = dc.groupBy("event_type")
        .agg(count(lit(1)).as("m"), sum("n").as("s"),
          sum(col("n") * col("n")).as("q"))
      dc.join(broadcast(st), "event_type")
        .filter((col("n") * col("m") - col("s")) *
          (col("n") * col("m") - col("s")) >
          lit(4L) * (col("m") * col("q") - col("s") * col("s")))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"))
        .orderBy("event_type", "day")
    }),

    // Rolling 7-day active users (the WAU curve): the corpus first
    // thins to the DISTINCT (user, day) relation — the only corpus-
    // scale shuffle — then each activity day fans out to the ≤ 7
    // window days it contributes to via a BROADCAST range join against
    // the tiny day spine, and a count-distinct finishes per day.
    // Distinct-over-sliding-windows can't partial-combine as a window
    // function; bounded fan-out over the pre-thinned relation is the
    // shape that scales (7× a thin relation, never 7× the events).
    "q_events_wau" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          to_date(date_trunc("DAY", col("ts"))).as("day"))
        .distinct()
      val days = ud.select(col("day").as("d")).distinct()
      ud.join(broadcast(days),
          col("day") >= date_sub(col("d"), 6) && col("day") <= col("d"))
        .groupBy("d")
        .agg(countDistinct(col("user_id")).as("wau"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("wau"))
        .orderBy("day")
    }),

    // Month-over-month revenue ratio per order status — the period-
    // over-period reporting primitive. The fact table collapses to a
    // |status|×|months| aggregate in one partial-combined shuffle;
    // the lag window then runs over THAT bounded relation (hundreds of
    // rows at any corpus size), so the window is free — the general
    // rule: windows over aggregates, never over facts. Ratio is one
    // IEEE division of exact integer cents → 4 dp; the first month of
    // each status has no predecessor and stays NULL in both engines.
    "q_agg_mom" -> ((s, d) => {
      val w = Window.partitionBy("st").orderBy("month")
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("st"),
          date_format(date_trunc("MONTH", col("o_orderdate")), "yyyy-MM")
            .as("month"))
        .agg(sumCents(col("o_totalprice")).as("rev_c"))
        .withColumn("mom_ratio",
          round(col("rev_c").cast("double") /
            lag(col("rev_c"), 1).over(w).cast("double"), 4))
        .orderBy("st", "month")
    }),

    // Inter-arrival gap profile per event type — the telemetry-health
    // primitive (delivery stalls and clock skew show up as gap-tail
    // blowouts). The lag window partitions by user_id (parallelism
    // scales with users — data-proportional, never a global sort);
    // gaps are exact epoch-µs integer differences attributed to the
    // LATER event's type, and the per-type profile is one
    // partial-combined hash aggregate; only the average divides → 4 dp.
    "q_events_interarrival" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)))
        .filter(col("gap_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum("gap_us").as("sum_gap_us"),
          max("gap_us").as("max_gap_us"),
          round(sum("gap_us").cast("double") / count(lit(1)) /
            lit(1000000).cast("double"), 4).as("avg_gap_s"))
        .orderBy("event_type")
    }),

    // Day-of-week × hour activity heatmap — the ops-dashboard load
    // matrix (when do users show up; when can maintenance run). Both
    // axes derive from raw epoch-µs INTEGER arithmetic — (days+4)%7
    // with the 1970-01-01-was-Thursday anchor, hours from the µs
    // remainder — never from engine calendar functions, whose
    // weekday-numbering conventions differ (DuckDB Sunday=0, Spark
    // Sunday=1). One partial-combined aggregate into ≤168 cells; the
    // per-cell count_distinct expands to the standard two-phase
    // distinct aggregate.
    "q_events_heatmap" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"),
          expr("(unix_micros(ts) % 86400000000) div 3600000000").as("hour"),
          col("user_id"))
        .groupBy("dow", "hour")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"))
        .orderBy("dow", "hour")),

    // Longest consecutive-day activity streak distribution — the
    // engagement-streak metric, via the gaps-and-islands technique:
    // day − row_number is constant exactly within a consecutive run.
    // The corpus thins to DISTINCT (user, day) first (the only
    // corpus-scale shuffle; q_events_wau discipline), the island
    // window partitions by user_id (data-proportional), and days are
    // raw epoch-µs integer division (UTC) — no calendar functions.
    // Everything after the window is stacked aggregates; output is
    // the bounded streak histogram.
    "q_window_streak" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("day")
      Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
        .withColumn("island", col("day") - row_number().over(w))
        .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
        .groupBy("user_id").agg(max("len").as("streak"))
        .groupBy("streak").agg(count(lit(1)).as("n_users"))
        .orderBy("streak")
    }),

    // 2-D skyline (dominance frontier) over the part catalog: parts
    // where no other part has size ≥ AND price ≤ (strict in one) —
    // the Pareto-optimal operator the NOT-EXISTS oracle spells as an
    // O(n²) anti self-join. The distributed shape exploits the 2-D
    // closed form instead: per-size min price is ONE partial-combined
    // aggregate into ≤ |sizes| rows; the "best price at any strictly
    // larger size" is a prefix-min over that bounded relation (the
    // single-partition window is ≤ 50 rows BY CONSTRUCTION — the
    // bounded-aggregate exemption, never a window over facts); then
    // the frontier test broadcasts the bounds back over the fact scan.
    // A row survives iff it attains its size's min price and strictly
    // beats every larger size's best. O(n) + two tiny passes vs the
    // oracle's quadratic — at 100 TB the only corpus-scale ops are
    // the aggregate and the broadcast-join filter.
    "q_agg_skyline" -> ((s, d) => {
      val facts = Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("long").as("size"),
          cents(col("p_retailprice")).as("price_c"))
      val perSize = facts.groupBy("size").agg(min("price_c").as("m"))
      val wDesc = Window.orderBy(col("size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val bounds = perSize.withColumn("better", min(col("m")).over(wDesc))
      facts.join(broadcast(bounds), "size")
        .filter(col("price_c") === col("m") &&
          (col("better").isNull || col("price_c") < col("better")))
        .select(col("p_partkey"), col("size"), col("price_c"))
        .orderBy("size", "p_partkey")
    }),

    // SCD2 dimension-history build: collapse each user's event stream
    // into state-validity intervals [from_us, to_us) — one row per
    // consecutive same-state run, to_us = next run's start, NULL while
    // the run is still open. This is the warehouse temporal-modeling
    // primitive (point-in-time joinable history; q_join_asof consumes
    // exactly this shape). Plan: the change-flag and run-id windows
    // partition by user_id (parallelism scales with users — the
    // sanctioned data-proportional window, never a global or
    // low-cardinality sort), the run collapse is a partial-combined
    // hash aggregate, and the closing lead() runs over RUNS (already
    // collapsed), not events. Times are exact epoch-µs integers; the
    // run index rn makes the ORDER BY unique even when two runs share
    // a start microsecond.
    "q_scd2_intervals" -> ((s, d) =>
      scd2Runs(Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("state"),
          unix_micros(col("ts")).as("t"), col("event_id")))
        .orderBy("user_id", "rn")),

    // Point-in-time join — the SCD2 consumer: each purchase event
    // joins the browsing-state interval (built from the user's
    // NON-purchase events) valid at purchase time, answering "what
    // state was the user in when they bought". Plan: intervals and
    // purchases are both keyed by user_id, so the join is ONE
    // user-key equi-join with the interval-membership residual
    // (from_us ≤ t < to_us, open tail = NULL to_us) evaluated on the
    // joined rows — per-user interval counts bound the fan-out, and
    // intervals are DISJOINT per user so each purchase matches at
    // most once (left join keeps pre-history purchases with a NULL
    // state). No window touches the purchase stream.
    "q_join_pit" -> ((s, d) => {
      val iv = scd2Runs(Tables.events(s, d)
        .filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("state"),
          unix_micros(col("ts")).as("t"), col("event_id")))
        .select(col("user_id").as("iu"), col("rn"), col("state"),
          col("from_us"), col("to_us"))
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("t_us"))
        .join(iv,
          col("user_id") === col("iu")
            && col("t_us") >= col("from_us")
            && (col("to_us").isNull || col("t_us") < col("to_us")),
          "left_outer")
        .select(col("event_id"), col("user_id"), col("t_us"), col("state"),
          col("rn"))
        .orderBy("event_id")
    }),

    // Leaderboard dynamics: top-10 customers per month by spend, each
    // with their rank in the PREVIOUS month's top-10 (NULL if they
    // weren't on it) — the rank-churn reporting primitive. Scale
    // shape: the (month, customer) spend collapse is one
    // partial-combined corpus shuffle; the rank filter sits DIRECTLY
    // on the raw row_number (cast only after) so the optimizer plans
    // WindowGroupLimit — map tasks forward only their local top-10
    // per month and the window ranks ≤ 10·parts survivors, never
    // every customer (q_topk_pergroup discipline). Everything after
    // is bounded: the leaderboard is ≤ 10·|months| rows, checkpointed
    // once (two consumers: current and month-shifted sides), and the
    // previous-month lookup is a broadcast self-join on the shifted
    // month key.
    "q_window_rankchange" -> ((s, d) => {
      val w = Window.partitionBy("mon")
        .orderBy(col("spend_c").desc, col("cust"))
      val t = graft.Materialize.checkpoint(
        Tables.orders(s, d)
          .groupBy(
            date_format(date_trunc("MONTH", col("o_orderdate")), "yyyy-MM")
              .as("mon"),
            col("o_custkey").as("cust"))
          .agg(sumCents(col("o_totalprice")).as("spend_c"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .withColumn("rnk", col("rn").cast("long"))
          .select("mon", "cust", "rnk", "spend_c"))
      val p = t.select(
        date_format(add_months(to_date(concat(col("mon"), lit("-01"))), 1),
          "yyyy-MM").as("mon"),
        col("cust"), col("rnk").as("prev_rnk"))
      t.join(broadcast(p), Seq("mon", "cust"), "left")
        .select(col("mon"), col("cust"), col("rnk"), col("prev_rnk"),
          col("spend_c"))
        .orderBy("mon", "rnk")
    }),

    // Sequential-pattern census (MATCH_RECOGNIZE-lite, round 9 wave
    // 22): per user, count CONSECUTIVE view → click → purchase triples
    // in the ts-ordered event sequence, then aggregate users by their
    // triple count. One window pass computes both lookaheads (lead 1
    // and lead 2 share the user-keyed sort — Spark plans a single
    // Window operator), then two user-keyed hash aggregates; nothing
    // after the window exceeds |users| rows. The (ts, event_id) order
    // key makes the sequence — and so the pattern census — replay-
    // deterministic under any partitioning.
    "q_events_pattern" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .groupBy("user_id")
        .agg(count(when(col("event_type") === "view" &&
          col("e2") === "click" && col("e3") === "purchase", 1))
          .as("n_pat"))
        .groupBy("n_pat")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("n_pat")
    }),

    // Click-abandonment by day (round 9 wave 22) — the anti side of
    // q_events_funnel: for each (user, day) FIRST click, did ANY
    // purchase by that user land within 24 h? Clicks collapse to one
    // row per (user, day) BEFORE the purchase join, and the join keys
    // on user_id alone with per-user multiplicity bounded by that
    // user's purchase count — at scale this is a co-partitioned
    // equi-join between two user-keyed aggregates, never a window
    // over the raw stream. The day-level finish is a ≤|days|-group agg.
    "q_events_abandon" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), expr("t div 86400000000").as("day"))
        .agg(min("t").as("ct"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t").as("pt"))
      clicks.join(purch, Seq("user_id"), "left")
        .groupBy("user_id", "day")
        .agg(max(when(col("pt") >= col("ct") &&
          col("pt") - col("ct") <= DayUs, 1).otherwise(0)).as("conv"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_clickers"),
          sum(col("conv")).as("n_converted"))
        .select(col("day"), col("n_clickers"), col("n_converted"),
          round((col("n_clickers") - col("n_converted"))
            .cast("double") / col("n_clickers").cast("double"), 4)
            .as("abandon_rate"))
        .orderBy("day")
    }),

    // Last-touch marketing attribution (round 9 wave 23): each
    // purchase credits its revenue to the channel (props.k mod 4) of
    // the LATEST same-user click at-or-before purchase time;
    // click-less purchases fall in the 'direct' bucket. The as-of
    // lookup is ONE user-keyed left join (per-purchase fan-in bounded
    // by that user's click count) finished by a per-purchase
    // struct-max — (ct, −event_id) encodes "newest click, smallest id
    // on a shared microsecond" — so no window ever touches the raw
    // stream and the null-guard keeps unmatched purchases out of the
    // argmax. Revenue is exact integer cents.
    "q_events_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("ct"),
          (get_json_object(col("props"), "$.k").cast("long") % 4)
            .as("channel"),
          col("event_id"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pt"),
          col("event_id").as("pid"), cents(col("value")).as("val_c"))
      p.join(c, p("user_id") === c("user_id") && col("ct") <= col("pt"),
          "left")
        .groupBy("pid", "val_c")
        .agg(max(when(col("ct").isNotNull,
          struct(col("ct"), (-col("event_id")).as("nid"),
            col("channel")))).as("m"))
        .select(coalesce(col("m.channel").cast("string"), lit("direct"))
          .as("channel"), col("val_c"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"), sum("val_c").as("revenue_c"))
        .orderBy("channel")
    }),

    // Growth accounting (round 9 wave 24) — the month-over-month
    // new / retained / resurrected / churned customer decomposition
    // (the product-analytics ledger whose identity MAU(m) =
    // new + retained + resurrected must balance): ONE checkpointed
    // distinct (customer, month) collapse feeds three consumers —
    // the lag/first-month window pass (partitioned by customer,
    // data-proportional, never global), the churn lead pass, and the
    // max-month bound. Everything after the collapse is ≤ |customers|
    // × |their months| rows; the month-level finish is bounded by the
    // calendar. Churn for month m+1 = customers active in m whose
    // next active month is not m+1 (or never).
    "q_agg_growth" -> ((s, d) => {
      // NOT checkpointed: `distinct` ends in an aggregate exchange and
      // AQE query-stage reuse serves all three consumers (window pass,
      // churn pass, max-month) from that one shuffle
      val cm = Tables.orders(s, d)
        .select(col("o_custkey").as("cust"),
          date_format(date_trunc("MONTH", col("o_orderdate")), "yyyy-MM")
            .as("mon"))
        .distinct()
      val w = Window.partitionBy("cust").orderBy("mon")
      def nextMon(c: Column) =
        date_format(add_months(to_date(concat(c, lit("-01"))), 1), "yyyy-MM")
      val x = cm
        .withColumn("prev", lag(col("mon"), 1).over(w))
        .withColumn("first_mon",
          min(col("mon")).over(Window.partitionBy("cust")))
      val cur = x.groupBy("mon").agg(
        count(when(col("mon") === col("first_mon"), 1)).as("new_c"),
        count(when(col("mon") =!= col("first_mon") &&
          nextMon(col("prev")) === col("mon"), 1)).as("retained"),
        count(when(col("mon") =!= col("first_mon") &&
          nextMon(col("prev")) =!= col("mon"), 1)).as("resurrected"))
      val chn = cm
        .withColumn("nxt", lead(col("mon"), 1).over(w))
        .filter(col("nxt").isNull || col("nxt") =!= nextMon(col("mon")))
        .groupBy(nextMon(col("mon")).as("mon"))
        .agg(count(lit(1)).as("churned"))
      val mx = cm.agg(max("mon").as("mx"))
      cur.join(chn, Seq("mon"), "left")
        .crossJoin(broadcast(mx))
        .filter(col("mon") <= col("mx"))
        .select(col("mon"), col("new_c"), col("retained"),
          col("resurrected"), coalesce(col("churned"), lit(0L)).as("churned"))
        .orderBy("mon")
    }),

    // CDC changelog apply under the gate (round 13): the MERGE INTO
    // surface — fold a keyed changelog (here derived deterministically
    // from orders: seq = order key, every 19th a delete, value = the
    // order's priority) into the customer snapshot, newest seq wins,
    // D removes the key. Delegates to ChangeDataCapture.applyChangelog:
    // union + ONE hash shuffle into a rank-1 window that plans as
    // WindowGroupLimitExec (each map task forwards ≤1 candidate per
    // key), deletes a post-window filter — never an anti-join pair of
    // shuffles. CdcSpec pins the single-exchange plan; this row pins
    // the semantics against an independent engine.
    "q_cdc_apply" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("key"),
          col("c_mktsegment").as("value"))
      val ch = Tables.orders(s, d)
        .select(col("o_custkey").cast("long").as("key"),
          col("o_orderpriority").as("value"),
          when(col("o_orderkey") % 19 === 0, "D").otherwise("U").as("op"),
          col("o_orderkey").cast("long").as("seq"))
      ChangeDataCapture.applyChangelog(base, ch, Seq("key"))
        .orderBy("key")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_cdc_apply" ->
      """WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS key, c_mktsegment AS value FROM customer),
        |ch AS (SELECT CAST(o_custkey AS BIGINT) AS key, o_orderpriority AS value,
        |  CASE WHEN o_orderkey % 19 = 0 THEN 'D' ELSE 'U' END AS op,
        |  CAST(o_orderkey AS BIGINT) AS seq FROM orders),
        |tagged AS (
        |  SELECT key, value, NULL AS op, NULL::BIGINT AS seq FROM base
        |  UNION ALL SELECT key, value, op, seq FROM ch),
        |r AS (SELECT *, row_number() OVER (PARTITION BY key
        |    ORDER BY seq DESC NULLS LAST) AS rn FROM tagged)
        |SELECT key, value FROM r WHERE rn = 1 AND (op IS NULL OR op <> 'D')
        |ORDER BY key""".stripMargin,

    "q_events_interarrival" ->
      """WITH g AS (SELECT event_type,
        |    epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) AS gap_us
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
        |  CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
        |  ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*)
        |    / CAST(1000000 AS DOUBLE), 4) AS avg_gap_s
        |FROM g WHERE gap_us IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_events_heatmap" ->
      """WITH e AS (SELECT
        |    (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
        |    (epoch_us(ts) % 86400000000) // 3600000000 AS hour, user_id
        |  FROM events)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_window_streak" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |d AS (SELECT user_id, day,
        |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island
        |  FROM ud),
        |s AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
        |      FROM d GROUP BY 1, 2),
        |m AS (SELECT user_id, MAX(len) AS streak FROM s GROUP BY 1)
        |SELECT CAST(streak AS BIGINT) AS streak,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    // Deliberately the quadratic NOT-EXISTS spelling: a fully
    // independent derivation of the frontier, so the hash compare
    // checks the closed form's SEMANTICS, not a re-implementation.
    "q_agg_skyline" ->
      s"""SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
         |  ${sqlCents("q.p_retailprice")} AS price_c
         |FROM part q
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM part p
         |  WHERE p.p_size >= q.p_size
         |    AND p.p_retailprice <= q.p_retailprice
         |    AND (p.p_size > q.p_size OR p.p_retailprice < q.p_retailprice))
         |ORDER BY size, p_partkey""".stripMargin,
    "q_events_funnel" ->
      s"""WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS vt
         |  FROM events WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS ct
         |  FROM events e JOIN v ON e.user_id = v.user_id
         |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.vt
         |    AND epoch_us(e.ts) - v.vt <= $DayUs GROUP BY 1),
         |p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS pt
         |  FROM events e JOIN c ON e.user_id = c.user_id
         |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.ct
         |    AND epoch_us(e.ts) - c.ct <= $DayUs GROUP BY 1)
         |SELECT stage, step, users FROM (
         |  SELECT 1 AS stage, 'view' AS step,
         |    CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS users
         |  UNION ALL SELECT 2, 'click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
         |  UNION ALL SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT))
         |ORDER BY stage""".stripMargin,
    "q_stats_histogram" ->
      s"""WITH c AS (SELECT ${sqlCents("o_totalprice")} AS c FROM orders),
         |b AS (SELECT MIN(c) AS mn, MAX(c) AS mx FROM c)
         |SELECT CAST(LEAST(9, ((c - mn) * 10) // (mx - mn + 1)) AS BIGINT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n, MIN(c) AS lo_c, MAX(c) AS hi_c
         |FROM c, b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT o_orderstatus, MAX(n) AS mx FROM c GROUP BY 1)
        |SELECT c.o_orderstatus, MIN(o_orderpriority) AS mode_priority,
        |  MAX(n) AS n
        |FROM c JOIN m ON c.o_orderstatus = m.o_orderstatus AND c.n = m.mx
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_events_retention" ->
      """WITH f AS (SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase')
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        |  CAST(day - cohort AS BIGINT) AS day_offset,
        |  CAST(COUNT(*) AS BIGINT) AS active_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stats_minmax" ->
      s"""WITH c AS (SELECT o_orderkey, o_orderstatus,
         |    ${sqlCents("o_totalprice")} AS c FROM orders),
         |b AS (SELECT o_orderstatus AS st, MIN(c) AS mn, MAX(c) AS mx
         |  FROM c GROUP BY 1)
         |SELECT o_orderkey, o_orderstatus,
         |  ROUND(CAST(c - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE), 4) AS scaled
         |FROM c JOIN b ON c.o_orderstatus = b.st
         |ORDER BY o_orderkey""".stripMargin,
    "q_events_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events)
        |SELECT from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM s WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_anomaly" ->
      """WITH dc AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n*n) AS BIGINT) AS q
        |  FROM dc GROUP BY 1)
        |SELECT dc.event_type, strftime(day, '%Y-%m-%d') AS day, n
        |FROM dc JOIN st ON dc.event_type = st.event_type
        |WHERE (n*m - s)*(n*m - s) > 4*(m*q - s*s)
        |ORDER BY 1, 2""".stripMargin,
    "q_events_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day AS d FROM ud)
        |SELECT strftime(d, '%Y-%m-%d') AS day,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        |FROM days JOIN ud ON ud.day BETWEEN d - 6 AND d
        |GROUP BY d ORDER BY 1""".stripMargin,
    "q_agg_mom" ->
      s"""WITH m AS (SELECT o_orderstatus AS st,
         |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         |    ${sqlSumCents("o_totalprice")} AS rev_c
         |  FROM orders GROUP BY 1, 2)
         |SELECT st, month, rev_c,
         |  ROUND(CAST(rev_c AS DOUBLE) /
         |    CAST(LAG(rev_c) OVER (PARTITION BY st ORDER BY month) AS DOUBLE),
         |    4) AS mom_ratio
         |FROM m ORDER BY st, month""".stripMargin,
    // Identical window/collapse construction; state is constant within
    // a run so MIN(state) is the run's state in both engines.
    "q_scd2_intervals" ->
      """WITH e AS (SELECT user_id, event_type AS state, epoch_us(ts) AS t,
        |    event_id FROM events),
        |f AS (SELECT *, CASE WHEN LAG(state) OVER w IS NULL
        |      OR state <> LAG(state) OVER w THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |r AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS rn
        |  FROM f),
        |runs AS (SELECT user_id, rn, MIN(state) AS state,
        |    MIN(t) AS from_us, CAST(COUNT(*) AS BIGINT) AS n_ev
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, rn, state, from_us,
        |  LEAD(from_us) OVER (PARTITION BY user_id ORDER BY rn) AS to_us,
        |  n_ev
        |FROM runs ORDER BY user_id, rn""".stripMargin,
    // Same interval construction filtered to non-purchase events;
    // intervals are disjoint per user so the membership join matches
    // at most once per purchase.
    "q_join_pit" ->
      """WITH e AS (SELECT user_id, event_type AS state, epoch_us(ts) AS t,
        |    event_id FROM events WHERE event_type <> 'purchase'),
        |f AS (SELECT *, CASE WHEN LAG(state) OVER w IS NULL
        |      OR state <> LAG(state) OVER w THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |r AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS rn FROM f),
        |runs AS (SELECT user_id, rn, MIN(state) AS state,
        |    MIN(t) AS from_us FROM r GROUP BY 1, 2),
        |iv AS (SELECT user_id AS iu, rn, state, from_us,
        |    LEAD(from_us) OVER (PARTITION BY user_id ORDER BY rn)
        |      AS to_us FROM runs),
        |p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.t_us, iv.state, iv.rn
        |FROM p LEFT JOIN iv ON p.user_id = iv.iu
        |  AND p.t_us >= iv.from_us
        |  AND (iv.to_us IS NULL OR p.t_us < iv.to_us)
        |ORDER BY p.event_id""".stripMargin,
    // The self-join looks back one month by shifting the PREVIOUS
    // month's rows forward — identical month arithmetic to the Spark
    // side's add_months. Ranks are BIGINT in both engines; the
    // (mon, rnk) tail of the ORDER BY is unique.
    "q_window_rankchange" ->
      s"""WITH m AS (SELECT
         |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
         |    o_custkey AS cust,
         |    ${sqlSumCents("o_totalprice")} AS spend_c
         |  FROM orders GROUP BY 1, 2),
         |r AS (SELECT mon, cust, spend_c,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY mon
         |      ORDER BY spend_c DESC, cust) AS BIGINT) AS rnk
         |  FROM m),
         |t AS (SELECT * FROM r WHERE rnk <= 10)
         |SELECT t.mon, t.cust, t.rnk, p.rnk AS prev_rnk, t.spend_c
         |FROM t LEFT JOIN t AS p ON p.cust = t.cust
         |  AND strftime(CAST(p.mon || '-01' AS DATE) + INTERVAL 1 MONTH,
         |    '%Y-%m') = t.mon
         |ORDER BY t.mon, t.rnk""".stripMargin,
    // Same two-lookahead window + two-phase user aggregate as the
    // Spark side; (ts, event_id) keys the sequence deterministically.
    "q_events_pattern" ->
      """WITH e AS (SELECT user_id, event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e2,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e3
        |  FROM events),
        |u AS (SELECT user_id,
        |    CAST(COUNT(*) FILTER (WHERE event_type = 'view'
        |      AND e2 = 'click' AND e3 = 'purchase') AS BIGINT) AS n_pat
        |  FROM e GROUP BY 1)
        |SELECT n_pat, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    // abandon_rate is ONE IEEE division of two exact integers → 4 dp,
    // so both engines agree bit-for-bit; day is unique in the output.
    "q_events_abandon" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    MIN(epoch_us(ts)) AS ct
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, epoch_us(ts) AS pt
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT c.user_id, c.day,
        |    MAX(CASE WHEN p.pt >= c.ct AND p.pt - c.ct <= 86400000000
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM c LEFT JOIN p ON c.user_id = p.user_id GROUP BY 1, 2)
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n_clickers,
        |  CAST(SUM(conv) AS BIGINT) AS n_converted,
        |  ROUND(CAST(COUNT(*) - SUM(conv) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS abandon_rate
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // MAX_BY's HUGEINT key ct·10⁶ − event_id is the oracle-side
    // encoding of the Spark struct order (newest ct, smallest id);
    // event_id < 10⁶ at every oracle SF, and MAX_BY skips the NULL
    // keys of unmatched purchases exactly like the Spark null-guard.
    "q_events_attribution" ->
      s"""WITH c AS (SELECT user_id, epoch_us(ts) AS ct,
         |    CAST(props->>'k' AS BIGINT) % 4 AS channel, event_id
         |  FROM events WHERE event_type = 'click'),
         |p AS (SELECT user_id, epoch_us(ts) AS pt, event_id AS pid,
         |    ${sqlCents("value")} AS val_c
         |  FROM events WHERE event_type = 'purchase'),
         |m AS (SELECT p.pid, p.val_c,
         |    MAX_BY(c.channel, CAST(c.ct AS HUGEINT) * 1000000 - c.event_id)
         |      AS channel
         |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ct <= p.pt
         |  GROUP BY 1, 2)
         |SELECT COALESCE(CAST(channel AS VARCHAR), 'direct') AS channel,
         |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
         |  CAST(SUM(val_c) AS BIGINT) AS revenue_c
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg_growth" ->
      """WITH cm AS (SELECT DISTINCT o_custkey AS cust,
        |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon
        |  FROM orders),
        |x AS (SELECT cust, mon,
        |    LAG(mon) OVER (PARTITION BY cust ORDER BY mon) AS prev,
        |    MIN(mon) OVER (PARTITION BY cust) AS first_mon
        |  FROM cm),
        |cur AS (SELECT mon,
        |    CAST(COUNT(*) FILTER (WHERE mon = first_mon) AS BIGINT)
        |      AS new_c,
        |    CAST(COUNT(*) FILTER (WHERE mon <> first_mon AND
        |      strftime(CAST(prev || '-01' AS DATE) + INTERVAL 1 MONTH,
        |        '%Y-%m') = mon) AS BIGINT) AS retained,
        |    CAST(COUNT(*) FILTER (WHERE mon <> first_mon AND
        |      strftime(CAST(prev || '-01' AS DATE) + INTERVAL 1 MONTH,
        |        '%Y-%m') <> mon) AS BIGINT) AS resurrected
        |  FROM x GROUP BY 1),
        |chn AS (SELECT strftime(CAST(mon || '-01' AS DATE) +
        |      INTERVAL 1 MONTH, '%Y-%m') AS mon,
        |    CAST(COUNT(*) AS BIGINT) AS churned
        |  FROM (SELECT cust, mon,
        |      LEAD(mon) OVER (PARTITION BY cust ORDER BY mon) AS nxt
        |    FROM cm)
        |  WHERE nxt IS NULL OR nxt <> strftime(
        |    CAST(mon || '-01' AS DATE) + INTERVAL 1 MONTH, '%Y-%m')
        |  GROUP BY 1)
        |SELECT c.mon, c.new_c, c.retained, c.resurrected,
        |  COALESCE(ch.churned, 0) AS churned
        |FROM cur c LEFT JOIN chn ch ON c.mon = ch.mon
        |WHERE c.mon <= (SELECT MAX(mon) FROM cm)
        |ORDER BY c.mon""".stripMargin
  )
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed rank selection (SURVEY.md §2.12 percentile /
  * ntile family).
  *
  * `row_number()/ntile() over (partition by g order by v)` funnels every
  * row of the table through |distinct g| window tasks — with a 3-value
  * group key (order status) that is 3 tasks no matter how many executors
  * exist, the classic straggler/OOM at 100×. This helper replaces the
  * full-table window with the textbook two-phase shape:
  *
  *  1. HISTOGRAM: range-bucket each row by its value (bucket bounds from
  *     a broadcast per-group min/max aggregate) and count rows per
  *     (group, bucket) — one map-side-combining hash aggregate whose
  *     shuffle parallelism is groups × buckets, not groups.
  *  2. PREFIX SUM over the bucket histogram — a relation of at most
  *     groups × buckets rows (bounded, independent of table size), so
  *     the per-group running sum is a window over a few thousand rows.
  *  3. IN-BUCKET RANK: global rank = bucket's cumulative-before count +
  *     row_number within (group, bucket). For selection only the buckets
  *     containing a target rank are ranked (≈ targets × n/buckets rows);
  *     for full ranking every bucket ranks independently in parallel.
  *
  * Bucketing by value keeps ranks exact: the bucket id is a monotone
  * function of the value (IEEE subtraction/division preserve order, ties
  * share a bucket), so in-bucket (value, tiebreak) order concatenated
  * across buckets IS the global order. Results are bucket-count
  * invariant — buckets only set the parallelism/task-size trade, sized
  * by [[bucketsFor]] from the (memoized) table row count so in-bucket
  * slices stay bounded as the corpus grows.
  */
object RankSelect {

  /** Bucket-count ladder: double the buckets with the corpus so expected
    * in-bucket size stays ≤ 64k rows, clamped to [1024, 2^20]. Results
    * do not depend on the choice — only task sizing does.
    */
  private[graft] def bucketsFor(n: Long): Int = {
    var b = 1024
    while (b.toLong * 65536L < n && b < (1 << 20)) b *= 2
    b
  }

  private case class Hist(bucketed: DataFrame, cum: DataFrame,
      stats: DataFrame)

  /** Phase 1 + 2: bucket assignment and per-(group, bucket) cumulative
    * counts. `bucketed` carries (grp, __v, __k, __b) plus any `carry`
    * payload columns (threaded through untouched — Catalyst prunes them
    * off the histogram branch); `cum` is the tiny histogram with
    * `__cumBefore`; `stats` has per-group `__n`.
    */
  private def build(df: DataFrame, grp: String, v: String, tie: String,
      buckets: Int, carry: Seq[String]): Hist = {
    // NULL group / NULL value rows are EXCLUDED — from __n as well as
    // from ranking, so ceil(n·p) always lands on a ranked row. (A NULL
    // value would bucket to NULL and silently vanish in the (grp, __b)
    // equi-joins while still counting in __n; callers needing SQL
    // nulls-first window order must coalesce to a sentinel first.)
    val base = df.select(col(grp) +: col(v).as("__v") +: col(tie).as("__k")
        +: carry.map(col): _*)
      .filter(col(grp).isNotNull && col("__v").isNotNull)
    // one row per group, ending in an aggregate EXCHANGE — NOT
    // checkpointed: AQE query-stage reuse serves every consumer
    // (bucket bounds ×2, target ranks) from that one shuffle, so the
    // fact table is still scanned once; the former blocking
    // checkpoint-count here was one driver round-trip per RankSelect
    // call across the ~10 rank-family contract queries
    val stats = base.groupBy(grp).agg(
      min(col("__v").cast("double")).as("__lo"),
      max(col("__v").cast("double")).as("__hi"),
      count(lit(1)).as("__n"))
    buildFrom(base, grp, stats, buckets, carry)
  }

  /** Phases 1 + 2 against a caller-supplied (or just-derived) stats
    * relation — shared by [[build]] and [[selectRanksGivenStats]].
    */
  private def buildFrom(base: DataFrame, grp: String, stats: DataFrame,
      buckets: Int, carry: Seq[String]): Hist = {
    // floor((v-lo)/width) is monotone in v (IEEE - and / preserve order
    // for fixed lo/width > 0), so bucket boundaries respect the sort
    // order and equal values always share a bucket; the `least` cap
    // absorbs v == hi rounding up to exactly `buckets`, and the
    // `greatest` floor clamps values under a too-wide cover's __lo.
    val bucketed = base.join(broadcast(stats), Seq(grp))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(greatest(least(
            floor((col("__v").cast("double") - col("__lo")) /
              ((col("__hi") - col("__lo")) / buckets)),
            lit(buckets - 1L)), lit(0L)))
          .cast("int"))
      .select(col(grp) +: col("__v") +: col("__k") +: col("__b")
        +: carry.map(col): _*)
    val hist = bucketed.groupBy(col(grp), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
    // prefix sum over ≤ groups × buckets rows — per-group partitioning
    // is fine HERE because the input is the bounded histogram, never
    // the fact table
    val cum = hist.withColumn("__cumBefore",
      coalesce(sum(col("__cnt")).over(
        Window.partitionBy(grp).orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    Hist(bucketed, cum, stats)
  }

  /** [[selectRanks]] with caller-supplied per-group stats — for the
    * second of two chained selections, whose bounds are derivable from
    * the first's (q_agg_mad: deviations lie in [0, max(hi−med,
    * med−lo)]), so the facts are never re-scanned for min/max/count.
    * `statsDf` must carry (grp, __lo double, __hi double, __n long)
    * for every group, where [__lo, __hi] COVERS the values (a wider
    * cover only wastes empty buckets — results are bucket-invariant;
    * values outside are clamped to the edge buckets) and __n is the
    * EXACT count of non-null values (rank targets are ceil(__n·p)).
    */
  /** `carry` columns ride the fact rows through bucketing and the
    * in-bucket rank and come out on the selected rows — for callers
    * whose selection input already joined a per-group value they need
    * again downstream (q_agg_mad's med), so the re-attach join (one
    * more broadcast build + probe) disappears.
    */
  def selectRanksGivenStats(df: DataFrame, grp: String, v: String,
      tie: String, targets: Seq[(String, Double)], statsDf: DataFrame,
      buckets: Int = 1024, carry: Seq[String] = Nil): DataFrame = {
    val base = df.select(col(grp) +: col(v).as("__v") +: col(tie).as("__k")
        +: carry.map(col): _*)
      .filter(col(grp).isNotNull && col("__v").isNotNull)
    val h = buildFrom(base, grp, statsDf, buckets, carry)
    finishSelect(h, grp, targets, carry)
  }

  /** The exact value at rank ceil(n·p) per group under (v, tie) order,
    * for each (tag, p) target. Returns (grp, __tag, __v) — one row per
    * group × target. Only the buckets containing a target rank are
    * ranked: the in-bucket window touches ≈ targets × n/buckets rows.
    */
  def selectRanks(df: DataFrame, grp: String, v: String, tie: String,
      targets: Seq[(String, Double)], buckets: Int = 1024): DataFrame =
    finishSelect(build(df, grp, v, tie, buckets, Nil), grp, targets)

  /** Phase 3 of rank selection (target ranks → pick → in-bucket rank)
    * — shared by [[selectRanks]] and [[selectRanksGivenStats]].
    */
  private def finishSelect(h: Hist, grp: String,
      targets: Seq[(String, Double)], carry: Seq[String] = Nil): DataFrame = {
    val pairs = targets.flatMap { case (t, p) => Seq(lit(t), lit(p)) }
    // ceil(n·p) in IEEE doubles — bit-identical to the oracle's
    // CEIL(n * p), so the selected rank agrees across engines
    val tgt = h.stats
      .select(col(grp), col("__n"),
        explode(map(pairs: _*)).as(Seq("__tag", "__p")))
      .select(col(grp), col("__tag"),
        ceil(col("__n") * col("__p")).cast("long").as("__r"))
    // one row per group × target. NOT checkpointed: it has exactly one
    // consumer (the broadcast below), so the broadcast build IS its
    // single histogram pass — a driver-blocking count job here would
    // only add a round-trip (this was 2 of the 4 blocking jobs behind
    // the r08 q_percentile bench regression).
    val pick = h.cum.join(tgt, Seq(grp))
      .filter(col("__r") > col("__cumBefore") &&
        col("__r") <= col("__cumBefore") + col("__cnt"))
      .select(col(grp), col("__b"), col("__tag"),
        (col("__r") - col("__cumBefore")).as("__rIn"))
    // The pick join does double duty as the bucket pruner (inner join
    // drops every bucket holding no target). Partitioning the rank
    // window by __tag as well keeps row_number correct when one bucket
    // holds several targets: each target's copy of the bucket ranks
    // independently over ALL the bucket's rows.
    val w = Window.partitionBy(col(grp), col("__b"), col("__tag"))
      .orderBy(col("__v"), col("__k"))
    h.bucketed.join(broadcast(pick), Seq(grp, "__b"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === col("__rIn"))
      .select(col(grp) +: col("__tag") +: col("__v") +: carry.map(col): _*)
  }

  /** Weighted-rank selection: the exact smallest value per group whose
    * cumulative weight (under ascending value order) reaches
    * ceil(totalWeight·p), for each (tag, p) target — the weighted
    * quantile / weighted median. Same two-phase shape as
    * [[selectRanks]] with count(*) generalized to sum(weight):
    * the histogram counts weight per (group, bucket), the prefix sum
    * runs over the bounded histogram, and only target buckets pay an
    * in-bucket pass. Weights must be non-negative integers (exact
    * integer cumulative sums are what make the pick engine-portable —
    * no IEEE accumulation order to disagree on).
    *
    * Input rows are first collapsed to one row per (group, value) with
    * summed weight — a partial-combining corpus-scale aggregate that
    * both bounds the in-bucket relation and removes ties, so the
    * ROWS-frame running sum agrees with the oracle's RANGE-frame
    * cumsum. Returns (grp, __tag, __v).
    */
  def selectWeightedRanks(df: DataFrame, grp: String, v: String,
      weight: String, targets: Seq[(String, Double)],
      buckets: Int = 1024): DataFrame = {
    // The collapse is itself a corpus-scale aggregate with THREE
    // consumers (stats, bucket histogram, in-bucket join) — unlike
    // selectRanks' projection-only base, re-deriving it per branch
    // re-runs a full shuffle each time, so it is materialized once
    // (measured: 2.3 s → ~1 s at sf0.1 for q_agg_wmedian). The stats
    // aggregate IS the materializing action (q_agg_mad's fused shape):
    // one job populates the collapse cache and pins the ≤|groups|-row
    // bounds, so neither downstream consumer re-derives them.
    val base = graft.Materialize.checkpointLazy(df
      .select(col(grp), col(v).as("__v"), col(weight).cast("long").as("__w"))
      .filter(col(grp).isNotNull && col("__v").isNotNull)
      .groupBy(col(grp), col("__v")).agg(sum(col("__w")).as("__w")))
    val stats = graft.Materialize.checkpoint(base.groupBy(grp).agg(
      min(col("__v").cast("double")).as("__lo"),
      max(col("__v").cast("double")).as("__hi"),
      sum(col("__w")).as("__n")))
    val bucketed = base.join(broadcast(stats), Seq(grp))
      .withColumn("__b",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((col("__v").cast("double") - col("__lo")) /
              ((col("__hi") - col("__lo")) / buckets)),
            lit(buckets - 1L)))
          .cast("int"))
      .select(col(grp), col("__v"), col("__w"), col("__b"))
    val cum = bucketed.groupBy(col(grp), col("__b"))
      .agg(sum(col("__w")).as("__cnt"))
      .withColumn("__cumBefore",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(grp).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val pairs = targets.flatMap { case (t, p) => Seq(lit(t), lit(p)) }
    val tgt = stats
      .select(col(grp), col("__n"),
        explode(map(pairs: _*)).as(Seq("__tag", "__p")))
      .select(col(grp), col("__tag"),
        ceil(col("__n") * col("__p")).cast("long").as("__r"))
    val pick = cum.join(tgt, Seq(grp))
      .filter(col("__r") > col("__cumBefore") &&
        col("__r") <= col("__cumBefore") + col("__cnt"))
      .select(col(grp), col("__b"), col("__tag"),
        (col("__r") - col("__cumBefore")).as("__rIn"))
    // smallest in-bucket value whose running weight reaches the
    // remaining target — cumulative sum is monotone in __v (one row per
    // value after the collapse), so min-over-qualifying IS the answer
    val w = Window.partitionBy(col(grp), col("__b"), col("__tag"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(pick), Seq(grp, "__b"))
      .withColumn("__cw", sum(col("__w")).over(w))
      .filter(col("__cw") >= col("__rIn"))
      .groupBy(col(grp), col("__tag")).agg(min(col("__v")).as("__v"))
  }

  /** Every row with its exact global rank within its group under
    * (v, tie) order, plus the group size. Returns
    * (grp, __v, __k, __rank, __n) plus any `carry` payload columns
    * threaded through unchanged. The ranking window partitions by
    * (group, bucket) — groups × buckets parallel tasks of bounded size,
    * never |groups| full-table tasks.
    */
  def withGlobalRank(df: DataFrame, grp: String, v: String, tie: String,
      buckets: Int = 1024, carry: Seq[String] = Nil): DataFrame = {
    val h = build(df, grp, v, tie, buckets, carry)
    val w = Window.partitionBy(col(grp), col("__b"))
      .orderBy(col("__v"), col("__k"))
    // ≤ groups × buckets rows with a single consumer — the broadcast
    // build below runs the histogram pass exactly once, so a blocking
    // checkpoint would only add a driver round-trip
    val cum = h.cum.select(col(grp), col("__b"), col("__cumBefore"))
    h.bucketed
      .join(broadcast(cum), Seq(grp, "__b"))
      .join(broadcast(h.stats.select(col(grp), col("__n"))), Seq(grp))
      .withColumn("__rank", col("__cumBefore") + row_number().over(w))
      .select(col(grp) +: col("__v") +: col("__k") +: col("__rank")
        +: col("__n") +: carry.map(col): _*)
  }
}

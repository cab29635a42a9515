package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.UpsertFileSink

/** ONE maintenance entry point per store. The continuous-ingest
  * capstone runs seven stores (doc + vector landing zones, curation
  * state, inverted index, IVF, text-LSH, embed-LSH), and each store's
  * steady-state hygiene is 2–4 calls that must run in a specific safe
  * order — compaction before cleanup, checkpoint before vacuum,
  * generation GC last and only below the active alias. An operator
  * hand-sequencing those per store per cadence WILL eventually invert
  * one; this module owns the order so a scheduler calls exactly one
  * function per store — and [[maintainPipeline]] owns the CROSS-STORE
  * retention coupling in one call.
  *
  * Shared posture:
  *  - maintenance NEVER fails on in-flight work: an out-of-band fold
  *    targets [[SegmentLog.safeCompactionTarget]] — the newest
  *    committed batch strictly below any torn redelivery — instead of
  *    tripping the wedge guard, and a store with nothing to do
  *    reports "noop";
  *  - aliased parents resolve to the ACTIVE generation; generation GC
  *    (reclaim below-active) runs ONLY when `gcGenerations` is passed
  *    explicitly (default false on every entry point — the Shell's
  *    posture): callers must own the reader quiesce window, exactly
  *    like vacuum retention;
  *  - every function returns a small (store, action, detail) report
  *    frame (driver-literal rows — bounded by the store's sub count)
  *    so the Shell / a cron log can show what happened.
  */
object Maintenance {

  private def report(spark: SparkSession,
      rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("store", "action", "detail")
  }

  /** Resolve a path that may be an aliased parent (`_active` marker)
    * to its live generation root — the ONE shared resolver (the Shell
    * delegates here; [[SegmentLog]] is package-private by design).
    */
  def activeOrSelf(spark: SparkSession, path: String): String = {
    val f = SegmentLog.hfs(spark, path)
    if (f.exists(SegmentLog.Alias.marker(path)))
      SegmentLog.Alias.resolve(spark, path)
    else path
  }

  /** The shared segment-log recipe: fold to the safe target (if the
    * cadence says so), finish any crashed cleanup, then reclaim
    * below-active generations when the path is an aliased parent.
    */
  private def maintainSegmented(spark: SparkSession, path: String,
      name: String, dataSubs: Seq[String], commitSub: String,
      minFresh: Int, gcGenerations: Boolean,
      compactFn: (SparkSession, String, Long) => Unit,
      cleanupFn: (SparkSession, String) => Unit,
      retainNewest: Int = 0): DataFrame = {
    val root = activeOrSelf(spark, path)
    val aliased = root != path
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String)]
    SegmentLog.safeCompactionTarget(spark, root, dataSubs, commitSub,
      minFresh, retainNewest) match {
      case Some(upTo) =>
        compactFn(spark, root, upTo)
        out += ((name, "compact", s"folded to horizon $upTo"))
      case None =>
        // converge a crashed post-publish cleanup even on a no-op pass
        cleanupFn(spark, root)
        out += ((name, "noop",
          s"horizon ${SegmentLog.compactedUpTo(spark, root)
            .getOrElse(-1L)}, nothing safely foldable"))
    }
    if (aliased && gcGenerations) {
      SegmentLog.Alias.cleanup(spark, path)
      out += ((name, "gc-generations", "reclaimed below-active"))
    }
    report(spark, out.toSeq)
  }

  /** Maintain an [[IncrementalIndex]] root or aliased parent: fold
    * the postings/docs/df/stats log when more than `minFresh`
    * committed fresh segments have accumulated, finish cleanups,
    * reclaim old generations. `retainNewest` keeps that many newest
    * committed batches below the fold — the as-of replay window; pass
    * ≥ 1 when a composed consumer probes this store as-of its
    * previous batch ([[SegmentLog.safeCompactionTarget]]).
    */
  def maintainIndex(spark: SparkSession, path: String, minFresh: Int = 0,
      gcGenerations: Boolean = false, retainNewest: Int = 0): DataFrame =
    maintainSegmented(spark, path, "index",
      Seq("postings", "df", "stats"), "docs", minFresh, gcGenerations,
      (s, r, u) => IncrementalIndex.compact(s, r, u),
      (s, r) => IncrementalIndex.cleanupCompacted(s, r), retainNewest)

  /** Maintain an [[IncrementalIvf]] root or aliased parent (plain or
    * coded — the fold is payload-agnostic and the fit log rides the
    * same horizon).
    */
  def maintainIvf(spark: SparkSession, path: String, minFresh: Int = 0,
      gcGenerations: Boolean = false, retainNewest: Int = 0): DataFrame =
    maintainSegmented(spark, path, "ivf",
      Seq("members", "fit"), "vecs", minFresh, gcGenerations,
      (s, r, u) => IncrementalIvf.compact(s, r, u),
      (s, r) => IncrementalIvf.cleanupCompacted(s, r), retainNewest)

  /** Maintain an [[IncrementalLsh]] root or aliased parent. A store
    * the composed refresh probes as-of ([[CorpusRefresh.BandedVerify]])
    * should run with `retainNewest` ≥ 1 so a replayed refresh's
    * as-of probe never lands below the fold horizon.
    */
  def maintainLsh(spark: SparkSession, path: String, minFresh: Int = 0,
      gcGenerations: Boolean = false, retainNewest: Int = 0): DataFrame =
    maintainSegmented(spark, path, "lsh",
      Seq("members"), "docs", minFresh, gcGenerations,
      (s, r, u) => IncrementalLsh.compact(s, r, u),
      (s, r) => SegmentLog.cleanup(s, r, Seq("members", "docs")),
      retainNewest)

  /** Maintain an [[IncrementalEmbedLsh]] root or aliased parent —
    * same `retainNewest` guidance as [[maintainLsh]]
    * ([[CorpusRefresh.EmbedVerify]] probes this store as-of).
    */
  def maintainEmbedLsh(spark: SparkSession, path: String,
      minFresh: Int = 0, gcGenerations: Boolean = false,
      retainNewest: Int = 0): DataFrame =
    maintainSegmented(spark, path, "embedlsh",
      Seq("members"), "vecs", minFresh, gcGenerations,
      (s, r, u) => IncrementalEmbedLsh.compact(s, r, u),
      (s, r) => SegmentLog.cleanup(s, r, Seq("members", "vecs")),
      retainNewest)

  /** Maintain a BUCKETED landing zone ([[UpsertFileSink]]): roll the
    * manifest checkpoint, then vacuum with replay retention — in that
    * order (vacuum's marker reclamation leans on the checkpoint
    * covering old ids). The checkpoint rolls on a COUNTED cadence
    * (≥ `checkpointMinFresh` committed markers above the current
    * head — the sink's own discipline), so a frequent cron doesn't
    * write a manifest roll-up per tick against an idle zone.
    */
  def maintainLanding(spark: SparkSession, root: String,
      minRetainBatches: Int = 1, checkpointMinFresh: Int = 1,
      name: String = "landing"): DataFrame = {
    val fresh = UpsertFileSink.uncheckpointedBatches(spark, root)
    val rolled = fresh >= math.max(checkpointMinFresh, 1)
    if (rolled) UpsertFileSink.writeBucketedCheckpoint(spark, root)
    UpsertFileSink.vacuumBucketed(spark, root, minRetainBatches)
    val head = UpsertFileSink.lastCommittedBucketed(spark, root)
    report(spark, Seq((name,
      if (rolled) "checkpoint+vacuum" else "vacuum",
      s"head ${head.getOrElse(-1L)}, $fresh fresh marker(s), " +
        s"retained $minRetainBatches predecessor batch(es)")))
  }

  /** The store set of a COMPOSED ingest pipeline (the capstone's
    * shape): bucketed doc/vector landing zones, the curation state
    * root, and the incremental index/IVF/LSH/embed-LSH stores. Any
    * member may be absent.
    *
    * Retention coupling: [[CorpusRefresh]] probes the LSH stores and
    * zones AS OF its previous batch, so [[maintainPipeline]] always
    * folds/vacuums those with the replay window (`asOfRetain` /
    * `minRetainBatches`). The index and IVF are NOT probed by the
    * refresh — they fold to the safe head by default — but an operator
    * composing their OWN as-of reads over them
    * (`postingsForTerms(asOf)`, `searchAdcAsOf`,
    * [[HybridSearch.searchMaintainedAsOf]], the SegmentAsOfSpec
    * shapes) must keep that window open too: pass
    * `indexAsOfRetain` ≥ the deepest as-of lag those consumers need,
    * or the fold's horizon overtakes the view and the read fails
    * loudly ("folded away").
    */
  final case class PipelineStores(
      landing: Option[String] = None,
      vectors: Option[String] = None,
      refreshState: Option[String] = None,
      index: Option[String] = None,
      ivf: Option[String] = None,
      lsh: Option[String] = None,
      embedLsh: Option[String] = None)

  /** Maintain EVERY store of a composed pipeline in one call, with
    * the retention coupling the composition requires baked in — the
    * knowledge an operator hand-sequencing seven maintain calls WILL
    * eventually drop:
    *
    *  - the LSH and embed-LSH stores fold with `retainNewest =
    *    asOfRetain` (≥ 1): a replayed refresh probes them AS OF its
    *    batch − 1 ([[CorpusRefresh.BandedVerify]]/[[CorpusRefresh
    *    .EmbedVerify]]), and a head fold would wedge that probe;
    *  - the doc/vector zones and the refresh state vacuum with
    *    `minRetainBatches` (≥ 1): the same replay fetches candidate
    *    payloads and old flags rows as-of batch − 1;
    *  - the inverted index and IVF (never probed as-of by the
    *    refresh) fold to their safe head by DEFAULT — replayed applies
    *    are below-horizon no-ops by protocol; operators whose OWN
    *    consumers read them as-of (hybrid as-of serving, index
    *    regression repro) pass `indexAsOfRetain` ≥ that lag (default
    *    0 keeps today's fold-to-head; see [[PipelineStores]]);
    *  - generation GC stays the caller's EXPLICIT decision
    *    (`gcGenerations` — own the reader quiesce window first).
    *
    * Returns the union of the per-store reports.
    */
  def maintainPipeline(spark: SparkSession, stores: PipelineStores,
      minRetainBatches: Int = 1, asOfRetain: Int = 1,
      gcGenerations: Boolean = false, minFresh: Int = 0,
      indexAsOfRetain: Int = 0): DataFrame = {
    require(minRetainBatches >= 1 && asOfRetain >= 1,
      "a composed pipeline replays: retention floors are 1 " +
        "(see CorpusRefresh's as-of discipline)")
    require(indexAsOfRetain >= 0, s"indexAsOfRetain=$indexAsOfRetain")
    // `minFresh` is the fold CADENCE: a per-batch cron should pass a
    // value > 0 or every tick pays a live-set fold of the index/IVF
    // for a single fresh segment (the landing zones' counted
    // checkpoint cadence is built in)
    val reports =
      stores.landing.map(r =>
        maintainLanding(spark, r, minRetainBatches)).toSeq ++
      stores.vectors.map(r =>
        maintainLanding(spark, r, minRetainBatches,
          name = "vectors")).toSeq ++
      stores.refreshState.map(r =>
        maintainRefreshState(spark, r, minRetainBatches)).toSeq ++
      stores.index.map(r => maintainIndex(spark, r, minFresh,
        gcGenerations = gcGenerations,
        retainNewest = indexAsOfRetain)).toSeq ++
      stores.ivf.map(r => maintainIvf(spark, r, minFresh,
        gcGenerations = gcGenerations,
        retainNewest = indexAsOfRetain)).toSeq ++
      stores.lsh.map(r => maintainLsh(spark, r, minFresh,
        gcGenerations = gcGenerations, retainNewest = asOfRetain)).toSeq ++
      stores.embedLsh.map(r => maintainEmbedLsh(spark, r, minFresh,
        gcGenerations = gcGenerations, retainNewest = asOfRetain)).toSeq
    require(reports.nonEmpty, "maintainPipeline: no store configured")
    reports.reduce(_ unionAll _)
  }

  /** Maintain a [[CorpusRefresh]] state root: checkpoint + vacuum all
    * four projections with the same replay retention (don't vacuum a
    * batch's predecessors before its delta is consumed).
    */
  def maintainRefreshState(spark: SparkSession, stateRoot: String,
      minRetainBatches: Int = 1): DataFrame = {
    CorpusRefresh.maintainState(spark, stateRoot, minRetainBatches)
    report(spark, Seq(("refresh-state", "checkpoint+vacuum",
      s"4 projections, retained $minRetainBatches predecessor " +
        "batch(es)")))
  }
}

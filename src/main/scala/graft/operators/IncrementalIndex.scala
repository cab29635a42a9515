package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance of the [[InvertedIndex]] postings against a
  * CDC document feed — the retrieval-side twin of the landing zone's
  * snapshot story. [[InvertedIndex.build]] rebuilds the index with one
  * full corpus pass; at a production refresh cadence the corpus is
  * 100 TB and the daily delta is a few GB, so the index must absorb
  * doc upserts/deletes WITHOUT the corpus pass. The classic recipe
  * (Lucene segments, reduced to its parquet core):
  *
  *  - each batch appends a SEGMENT
  *    `postings/seq=<batch>/db=<bucket>/tb=<bucket>/` holding the
  *    postings of the docs that batch (re)wrote — never a rewrite of
  *    existing segments;
  *  - a thin doc changelog `docs/seq=<batch>/` records (doc_id, op);
  *    a doc's LIVE postings are the segment matching its newest seq —
  *    an update's older segments and a delete's every segment become
  *    TOMBSTONED, folded out at read time by one rank-1 window over
  *    the changelog joined back on (doc_id, seq);
  *  - document frequency cannot be read off live postings without a
  *    token-wide pass, so each batch also appends ADDITIVE df deltas
  *    `df/seq=<batch>/tb=<bucket>/`: +1 per distinct (token) in a
  *    doc's new version, −1 per distinct token in the version it
  *    replaced; the current df of a token is the sum of its deltas;
  *  - the BM25 corpus stats (live doc count N, total live token mass
  *    Σdl) likewise cannot be read without a doc-wide pass, so each
  *    batch appends ONE additive `stats/seq=<batch>/` row
  *    (n_delta, dl_delta): ±(1, dl) per new/replaced live doc version
  *    — [[stats]] is then an O(batches) thin fold, never a postings
  *    scan.
  *
  * TWO partition dimensions, one per access path:
  *
  *  - `db = pmod(hash(doc_id), nBuckets)` serves the WRITE path: an
  *    update's fold of its old postings reads only the touched doc
  *    buckets (the landing zone's touched-bucket manifest discipline);
  *  - `tb = pmod(hash(token), nTokenBuckets)` serves the READ path: a
  *    term lookup ([[postingsForTerms]], the BM25 query shape) lists
  *    only the probed terms' `tb=` dirs of every segment and the
  *    folded tree — per-query I/O proportional to the touched posting
  *    lists, independent of corpus size. The df log carries the same
  *    `tb` dimension so the per-term df fold prunes identically.
  *
  * Scale shape: a batch's work is bounded by the batch, never the
  * corpus (except batches on the `compactEvery` cadence, which pay
  * the live-set fold). Read-time folding costs one thin changelog
  * window plus one df aggregation, both over logs whose growth
  * [[compact]] bounds (fold every segment at or below a horizon into
  * one, published by the [[SegmentLog]] marker; `applyBatch
  * (compactEvery = K)` runs it inline at a fixed cadence).
  *
  * IncrementalIndexSpec pins the contract that matters: after any
  * batch sequence, [[currentPostings]] row-for-row equals
  * [[InvertedIndex.build]] over the corpus state those batches
  * produce — so every query in [[InvertedIndex]] (and the BM25/RRF
  * stack above it) runs unchanged on the incrementally-maintained
  * index. TokenPrunedIndexSpec pins the read-path plan shape: a term
  * lookup's postings/df scans carry `tb` partition filters, and
  * [[statsFrame]] never scans postings at all.
  */
object IncrementalIndex {

  /** Default token-bucket count for the term-addressable dimension —
    * frozen per root at creation like `nBuckets` (`_ntbuckets` pin).
    */
  val DefaultTokenBuckets = 16

  /** Bucket count for the postings partition dirs. Fixed at index
    * creation (like the landing zone's nBuckets): changing it would
    * send a doc's next version to a different bucket dir, which is
    * harmless for correctness (pruning keys on doc_id hash are
    * computed the same way on write and read) but defeats pruning of
    * the OLD version, so keep it stable per index root.
    */
  private def bucketCol(nBuckets: Int) =
    pmod(hash(col("doc_id")), lit(nBuckets))

  /** Token-hash bucket — the TERM-addressable partition dimension a
    * posting lookup prunes on. Same frozen-layout discipline as `db`.
    */
  private def tokenBucketCol(nT: Int) =
    pmod(hash(col("token")), lit(nT))

  /** The `tb` buckets a term set hashes into — evaluated over a local
    * relation (ConvertToLocalRelation folds the projection at
    * optimization time; no corpus work), ≤ min(|terms|, nT) ints.
    */
  private def tokenBucketsOf(spark: SparkSession, terms: Seq[String],
      nT: Int): Seq[Int] = {
    import spark.implicits._
    terms.distinct.toDF("token")
      .select(tokenBucketCol(nT).as("tb")).distinct()
      .collect().map(_.getInt(0)).toSeq
  }

  // ---- compaction-aware log readers ---------------------------------
  //
  // [[compact]] folds every segment with seq ≤ c into one tree under
  // `_compact/<c>/{postings,docs,df,stats}` and publishes it with a
  // marker file `_compacted` (temp + rename — never torn). Readers take
  // the marker's view: folded tree ∪ only the segments NEWER than c;
  // any surviving seq ≤ c directory is invisible (partition-pruned), so
  // the post-publish cleanup can crash anywhere and merely leave
  // garbage to delete next time. No marker → plain log view.
  // The mechanics live in [[SegmentLog]], shared with the IVF index's
  // member-side compaction.

  private def compactedUpTo(spark: SparkSession, root: String): Option[Long] =
    SegmentLog.compactedUpTo(spark, root)

  private def readLog(spark: SparkSession, root: String,
      sub: String): DataFrame = SegmentLog.readLog(spark, root, sub)

  /** Tokenize + count — [[InvertedIndex.build]]'s postings shape minus
    * the df window: (token, doc_id, tf, dl).
    */
  private def postingsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        InvertedIndex.tokensCol(textCol).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"),
        size(col("toks")).cast("long").as("dl"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

  private def emptyDfLog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Int, Long)].toDF("token", "delta", "tb", "seq")
  }

  private def emptyStatsLog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("n_delta", "dl_delta", "seq")
  }

  /** An ADDITIVE delta log (`df` or `stats`) gated on COMMITTED batches
    * only: the docs changelog is the batch commit point (written last),
    * so a FRESH delta segment whose batch has no docs segment is a torn
    * write — summing it would corrupt the partial sums (a torn −1 can
    * drive a live token's df to 0 and drop its postings from every
    * query; a torn stats row skews every BM25 score). Rows at or below
    * the compaction horizon pass ungated: the `_compacted` marker IS
    * their commit evidence, and the folded docs tree can be
    * legitimately empty (every doc superseded after the horizon) while
    * the folded partial sums must still count — gating those on the
    * changelog's seqs would zero live tokens' df and a later compact
    * would bake the corruption in. A missing log dir (every batch
    * netted zero deltas — the zero-row segment is SKIPPED, never a
    * partitionBy husk) reads as the typed empty frame.
    */
  private def committedAdditive(spark: SparkSession, root: String,
      sub: String, empty: => DataFrame): DataFrame = {
    val f = SegmentLog.hfs(spark, root)
    val hasDir = f.exists(new org.apache.hadoop.fs.Path(s"$root/$sub"))
    val horizonOpt = compactedUpTo(spark, root)
    if (!hasDir && horizonOpt.isEmpty) return empty
    // a root compacted by code PREDATING this log carries a marker but
    // no folded subtree — readLog's folded read would throw a raw
    // path-not-found (and summing only the post-marker deltas would be
    // silently missing the base). Fail with the migration remedy: a
    // fold PAST the horizon derives the folded base from the live set
    // itself (self-healing), exactly like [[stats]]'s legacy path.
    horizonOpt.foreach { c =>
      require(f.exists(new org.apache.hadoop.fs.Path(
          s"$root/_compact/$c/$sub")),
        s"$root's compact tree at horizon $c predates its '$sub' log " +
          "(legacy root): compact past the horizon once — the fold " +
          s"rebuilds the folded '$sub' base from the live set")
    }
    val log = readLog(spark, root, sub)
    val horizon = compactedUpTo(spark, root).getOrElse(-1L)
    // a USING join lists the key column first — re-select into the
    // log's own order before the positional union
    val cols = log.columns.toSeq.map(col)
    // the commit gate only ever has to judge FRESH seqs (≤ horizon
    // passes ungated), so the evidence read lists fresh docs segments
    // only — never the folded corpus changelog
    val committedSeqs = SegmentLog.readFreshSegs(spark, root, "docs")
      .map(_.select("seq").distinct())
      .getOrElse {
        import spark.implicits._
        Seq.empty[Long].toDF("seq")
      }
    log.filter(col("seq") <= horizon).unionAll(
      log.filter(col("seq") > horizon)
        .join(committedSeqs, Seq("seq"), "left_semi")
        .select(cols: _*))
  }

  private def committedDf(spark: SparkSession, root: String): DataFrame =
    committedAdditive(spark, root, "df", emptyDfLog(spark))

  private def committedStats(spark: SparkSession, root: String): DataFrame =
    committedAdditive(spark, root, "stats", emptyStatsLog(spark))

  /** The doc changelog resolved to each doc's newest (seq, op);
    * `beforeSeq` bounds the view to versions strictly below it (the
    * pre-batch view a replay needs). The rank-1 window runs over the
    * FRESH segments only — folded rows (live at the horizon by
    * construction) enter via a broadcast anti-join
    * ([[SegmentLog.latestVersionsSplit]]), so changelog resolution
    * never shuffles the folded corpus.
    */
  private def latestDocVersions(spark: SparkSession, root: String,
      beforeSeq: Option[Long] = None): DataFrame =
    SegmentLog.latestVersionsSplit(spark, root, "docs", "doc_id",
      beforeSeq)

  /** Apply one CDC batch of documents to the index at `root`.
    * `batch` carries (doc_id, text, op): op `I`/`U` upserts the doc's
    * text, `D` deletes it (text ignored). `batchId` must be strictly
    * greater than every previously applied batch's (the CDC feed's
    * own ordering); delivery idempotence is BUILT IN — a redelivered
    * batch whose docs changelog already committed is a full no-op
    * (the same marker discipline as
    * [[graft.streaming.UpsertFileSink.upsertBatch]], with the
    * changelog's _SUCCESS as the marker), and a torn first attempt
    * (changelog missing) is rewritten convergently.
    *
    * `compactEvery` > 0 bounds the log inline: whenever more than that
    * many FRESH segments have accumulated above the horizon (counted,
    * not inferred from id arithmetic — the feed's ids need not be
    * dense), the log folds up to `batchId − 1`. Folding never reaches
    * the in-flight batch itself, so an at-least-once redelivery of
    * this same batch still passes the horizon guard and converges via
    * the overwrite-mode segment writes; [[compact]] is idempotent and
    * marker-published, so a crash mid-fold leaves the plain log view.
    * The same bounded-maintenance knob as the landing zone's
    * `checkpointEvery`: an unbounded CDC stream never needs an
    * out-of-band compaction job, at the price of the fold's
    * live-set-sized work landing inside every cadence batch.
    */
  def applyBatch(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long, nBuckets: Int = 16, compactEvery: Int = 0,
      nTokenBuckets: Int = DefaultTokenBuckets): Unit = {
    require(nBuckets > 0, s"nBuckets=$nBuckets")
    require(nTokenBuckets > 0, s"nTokenBuckets=$nTokenBuckets")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // REDELIVERY is a full-batch no-op: the docs changelog (written
    // last, _SUCCESS-marked) is the batch's commit point, so its
    // presence proves every segment of this batch is already complete.
    // Rewriting would be actively wrong, not just wasteful — if the
    // first delivery's inline fold already ran, the replaced versions'
    // changelog rows are gone from the pre-batch view, the recomputed
    // df delta would lose its −1 side, and overwriting df/seq=batchId
    // would leave the folded +1s uncancelled forever.
    if (fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/docs/seq=$batchId/_SUCCESS"))) return
    // a batch at or below the horizon is a PROVABLY committed replay
    // whose segment dirs (and _SUCCESS evidence) compaction cleaned
    // up: the fold refuses torn batches
    // ([[SegmentLog.requireNoTornAtOrBelow]]) and feed ids are
    // contractually monotone, so the only path here is a lost ack —
    // no-op, exactly like the landing zone's checkpoint-head rule
    // ([[graft.streaming.UpsertFileSink.upsertBatchBucketed]]).
    if (compactedUpTo(spark, root).exists(batchId <= _)) return
    // LEGACY-LAYOUT guard, BEFORE the token-bucket pin can land: a
    // root whose postings predate the tb dimension holds segments
    // without the tb partition; writing a tb-partitioned segment
    // beside them would wedge every later read AND the migration fold
    // itself (partition discovery refuses mixed trees). Migrate by
    // compacting the root to its head under the current code first —
    // the fold rewrites the folded tree with tb, recomputes the stats
    // base from the live set, and only then records the pin.
    if (SegmentLog.layoutOf(spark, root, "_ntbuckets").isEmpty) {
      // evidence must cover df TOO: a delete-only legacy history can
      // hold flat df segments with no postings dir at all (old code
      // wrote df unconditionally), and writing tb-partitioned df
      // beside them wedges partition discovery just the same
      val legacyEvidence = Seq("postings", "df").exists { sub =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$root/$sub")) ||
          compactedUpTo(spark, root).exists(c => fs.exists(
            new org.apache.hadoop.fs.Path(s"$root/_compact/$c/$sub")))
      }
      require(!legacyEvidence,
        s"$root holds postings/df segments written before the " +
          "token-bucket dimension: compact the root to its head once " +
          "(the fold migrates the layout), then feed new batches")
    }
    // the bucket counts are physical layout: freeze at creation, fail
    // loudly on a mismatch — a silently different value would compute
    // touched-bucket manifests that miss the updated docs' OLD
    // postings (their −1 df side vanishes, frequencies corrupt), or
    // hash term lookups into `tb=` dirs the postings were never
    // written with (silent false negatives)
    SegmentLog.pinLayout(spark, root, "_nbuckets", nBuckets.toLong)
    SegmentLog.pinLayout(spark, root, "_ntbuckets", nTokenBuckets.toLong)
    val hasState = fs.exists(new org.apache.hadoop.fs.Path(s"$root/docs"))

    val staged = batch.select(col("doc_id"), col("text"), col("op"))
      .persist()
    try {
      // previous live postings of ONLY the docs this batch touches:
      // prune the postings scan to the touched bucket dirs (driver-side
      // manifest, ≤ nBuckets ints — the landing zone's discipline),
      // then keep each doc's newest PRE-batch version. Everything is
      // bounded strictly below batchId — the seq filter also partition-
      // prunes a TORN first attempt's own postings dir out of the scan,
      // so the rewrite below can clobber it while this plan is pending.
      // Persisted: it feeds the df delta's −1 side AND the stats
      // delta's replaced-version side.
      val oldPost: DataFrame = (if (!hasState) {
        import spark.implicits._
        Seq.empty[(String, Long, Long)].toDF("token", "doc_id", "dl")
      } else {
        val touched = staged.select(bucketCol(nBuckets).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val prev = readLog(spark, root, "postings")
          .filter(col("db").isin(touched: _*) && col("seq") < batchId)
        val live = latestDocVersions(spark, root, Some(batchId))
          .filter(col("op") =!= "D")
          .join(staged.select("doc_id"), Seq("doc_id"), "left_semi")
        prev.join(live.select("doc_id", "seq"), Seq("doc_id", "seq"))
          .select("token", "doc_id", "dl")
      }).persist()

      // persisted: the tokenize+count aggregate feeds the emptiness
      // probe, the df deltas, the stats delta AND the postings write —
      // unpersisted it would re-shuffle four times per batch
      val newPostings = postingsOf(
        staged.filter(col("op") =!= "D"), "doc_id", "text").persist()

      // additive df deltas: +1 per distinct token of the new version,
      // −1 per distinct token of the replaced one (an unchanged token
      // nets 0; a delete contributes only the −1 side)
      val dfDelta = newPostings.select(col("token"), lit(1L).as("delta"))
        .unionAll(oldPost.select(col("token"), lit(-1L).as("delta")))
        .groupBy("token").agg(sum("delta").as("delta"))
        .filter(col("delta") =!= 0L)

      // ONE additive corpus-stats row per batch: ±(1, dl) per
      // new/replaced live doc version. A doc counts iff it has ≥ 1
      // token — exactly the population the postings-derived BM25
      // stats always measured (an empty-text doc has no posting row).
      val statsDelta = newPostings.groupBy("doc_id")
          .agg(first("dl").as("dl")).select(lit(1L).as("s"), col("dl"))
        .unionAll(oldPost.groupBy("doc_id")
          .agg(first("dl").as("dl")).select(lit(-1L).as("s"), col("dl")))
        .agg(coalesce(sum("s"), lit(0L)).as("n_delta"),
          coalesce(sum(col("s") * col("dl")), lit(0L)).as("dl_delta"))

      // a delete-only batch has no postings, and a zero-net batch has
      // no df deltas: skip those segments entirely (and drop a
      // previous attempt's husk) — a zero-row partitionBy writes
      // nothing readable, and a later compaction's targeted read of
      // that dir would fail schema inference
      val postingsDir = new org.apache.hadoop.fs.Path(
        s"$root/postings/seq=$batchId")
      val dfDir = new org.apache.hadoop.fs.Path(s"$root/df/seq=$batchId")
      try {
        if (newPostings.isEmpty) {
          if (fs.exists(postingsDir)) fs.delete(postingsDir, true)
        } else newPostings.withColumn("db", bucketCol(nBuckets))
          .withColumn("tb", tokenBucketCol(nTokenBuckets))
          .write.mode("overwrite").partitionBy("db", "tb")
          .parquet(s"$root/postings/seq=$batchId")
        if (dfDelta.isEmpty) {
          if (fs.exists(dfDir)) fs.delete(dfDir, true)
        } else dfDelta.withColumn("tb", tokenBucketCol(nTokenBuckets))
          .write.mode("overwrite").partitionBy("tb")
          .parquet(s"$root/df/seq=$batchId")
        statsDelta.write.mode("overwrite")
          .parquet(s"$root/stats/seq=$batchId")
        // the docs changelog commits LAST: readers resolve liveness
        // (and gate the additive sums — [[committedAdditive]]) from
        // it, so a crash before this write leaves the new postings,
        // df and stats segments invisible (the torn-write discipline)
        staged.select("doc_id", "op").write.mode("overwrite")
          .parquet(s"$root/docs/seq=$batchId")
      } finally {
        newPostings.unpersist(blocking = false)
        oldPost.unpersist(blocking = false)
      }
    } finally staged.unpersist(blocking = false)
    // a REPLAYED batch overwrites its own segment in place; a
    // long-lived session's shared file-status cache would otherwise
    // keep serving the first attempt's (deleted) part files
    Seq("postings", "df", "stats", "docs")
      .foreach(sub => spark.catalog.refreshByPath(s"$root/$sub"))
    if (compactEvery > 0) {
      val h = compactedUpTo(spark, root).getOrElse(-1L)
      if (SegmentLog.freshSegDirs(spark, root, "docs", h)
          .size > compactEvery)
        compact(spark, root, batchId - 1, nBuckets)
    }
  }

  private def emptyPostings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long, Long, Int, Int)]
      .toDF("token", "doc_id", "tf", "dl", "db", "tb")
  }

  /** The LIVE postings rows (token, doc_id, tf, dl) — the liveness
    * fold pruned like the other indexes' lookups
    * ([[SegmentLog.liveMembersPruned]]): folded postings are live at
    * the horizon by construction, so they pay a broadcast anti-join
    * against the fresh-key set instead of a corpus-wide changelog
    * window + shuffle join. `prune` pre-filters the postings scan
    * (e.g. to touched `db=` buckets, or a term lookup's `tb=`
    * buckets).
    */
  private def livePostings(spark: SparkSession, root: String,
      prune: DataFrame => DataFrame = identity,
      asOf: Option[Long] = None): DataFrame =
    SegmentLog.liveMembersPruned(spark, root, "postings", "docs",
      "doc_id", prune, emptyPostings(spark), asOf)
      .select("token", "doc_id", "tf", "dl")

  /** The index's current postings — (token, doc_id, tf, dl, df), the
    * exact shape [[InvertedIndex.build]] returns, so
    * `andQuery`/`rankedQuery`/`bm25Query` run on it unchanged.
    */
  def currentPostings(spark: SparkSession, root: String): DataFrame =
    postingsView(spark, root, None)

  /** TIME TRAVEL: the postings exactly as they stood after batch
    * `asOf` committed — each doc at its newest version ≤ asOf, df from
    * the delta partial sums ≤ asOf. Bounded by compaction exactly like
    * the landing zone's as-of read is bounded by vacuum retention: a
    * view at/below the `_compacted` horizon is folded history and
    * fails loudly. The repro/debug read an index regression needs
    * ("what did yesterday's ranking see?"), and the read a replayed
    * downstream consumer uses to resolve pre-batch state.
    */
  def currentPostingsAsOf(spark: SparkSession, root: String,
      asOf: Long): DataFrame =
    postingsView(spark, root, Some(asOf))

  private def postingsView(spark: SparkSession, root: String,
      asOf: Option[Long]): DataFrame = {
    val dfLog = committedDf(spark, root)
    val dfNow = asOf.fold(dfLog)(a => dfLog.filter(col("seq") <= a))
      .groupBy("token").agg(sum("delta").as("df"))
      .filter(col("df") > 0L)
    livePostings(spark, root, asOf = asOf).join(dfNow, Seq("token"))
      .select("token", "doc_id", "tf", "dl", "df")
  }

  /** TERM-ADDRESSABLE postings read — the lookup [[InvertedIndex]]'s
    * query shapes actually need: the live (token, doc_id, tf, dl, df)
    * rows of ONLY the given terms, with every postings and df scan
    * pruned to the `tb=` buckets the terms hash into. Per-query I/O is
    * proportional to the touched posting lists (bucket granularity),
    * independent of corpus size — the read-side twin of the liveness
    * split, and the fix for the round-16 "term lookups read the whole
    * postings store" scale finding. On a root without the token
    * dimension (virgin/legacy) it degrades to the unpruned view
    * filtered. `asOf` time-travels like [[currentPostingsAsOf]].
    */
  def postingsForTerms(spark: SparkSession, root: String,
      terms: Seq[String], asOf: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "postingsForTerms needs at least one term")
    val tset = terms.distinct
    SegmentLog.layoutOf(spark, root, "_ntbuckets").map(_.toInt) match {
      case None =>
        postingsView(spark, root, asOf)
          .filter(col("token").isin(tset: _*))
      case Some(nt) =>
        val buckets = tokenBucketsOf(spark, tset, nt)
        val dfLog = committedDf(spark, root)
          .filter(col("tb").isin(buckets: _*) &&
            col("token").isin(tset: _*))
        val dfNow = asOf.fold(dfLog)(a => dfLog.filter(col("seq") <= a))
          .groupBy("token").agg(sum("delta").as("df"))
          .filter(col("df") > 0L)
        livePostings(spark, root,
          prune = raw => raw.filter(col("tb").isin(buckets: _*) &&
            col("token").isin(tset: _*)),
          asOf = asOf)
          .join(dfNow, Seq("token"))
          .select("token", "doc_id", "tf", "dl", "df")
    }
  }

  /** BM25 top-k straight off the maintained index at term-lookup cost:
    * `tb`-pruned postings ([[postingsForTerms]]) + the O(batches)
    * stats fold ([[stats]]) feeding [[InvertedIndex.bm25Query]]
    * unchanged. This is the production query path —
    * [[graft.operators.HybridSearch.searchMaintained]]'s lexical leg.
    */
  def bm25Search(spark: SparkSession, root: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      asOf: Option[Long] = None): DataFrame = {
    val (n, avgDl) = stats(spark, root, asOf)
    InvertedIndex.bm25Query(postingsForTerms(spark, root, terms, asOf),
      n, avgDl, terms, k, k1, b)
  }

  /** BATCHED [[bm25Search]]: every probe's top-k in ONE plan over ONE
    * `tb`-pruned postings read — `probeTerms` is (probe_id, token),
    * exploded per probe. A retrieval consumer issuing thousands of
    * probes per tick pays per-query driver/job overhead × |probes| on
    * the per-probe path; here the job count is O(1) in |probes| (one
    * term-set collect — bounded by the probe set, the driver-manifest
    * discipline — one stats fold, one pruned postings pass). Per-probe
    * scoring is [[InvertedIndex.bm25QueryBatch]], byte-identical to
    * the single-probe formula.
    */
  def bm25SearchBatch(spark: SparkSession, root: String,
      probeTerms: DataFrame, k: Int, k1: Double = 1.2,
      b: Double = 0.75, asOf: Option[Long] = None): DataFrame = {
    val tset = probeTerms.select("token").distinct()
      .collect().map(_.getString(0)).toSeq
    require(tset.nonEmpty, "bm25SearchBatch needs at least one term")
    val (n, avgDl) = stats(spark, root, asOf)
    InvertedIndex.bm25QueryBatch(
      postingsForTerms(spark, root, tset, asOf), n, avgDl, probeTerms,
      k, k1, b)
  }

  /** Conjunctive query ([[InvertedIndex.andQuery]]) at term-lookup
    * cost — the `tb`-pruned postings feed the intersect-by-count.
    */
  def andSearch(spark: SparkSession, root: String,
      terms: Seq[String]): DataFrame =
    InvertedIndex.andQuery(postingsForTerms(spark, root, terms), terms)

  /** tf-idf top-k ([[InvertedIndex.rankedQuery]]) at term-lookup
    * cost; N comes off the thin stats fold, never a corpus count.
    */
  def rankedSearch(spark: SparkSession, root: String,
      terms: Seq[String], k: Int): DataFrame = {
    val (n, _) = stats(spark, root)
    InvertedIndex.rankedQuery(postingsForTerms(spark, root, terms), n,
      terms, k)
  }

  /** COMPACTION — fold every segment with seq ≤ `upTo` into one
    * equivalent tree, so read-time folding cost stops growing with
    * batch count (the landing zone's checkpoint recipe, applied to the
    * index log):
    *
    *  - folded postings = the live postings of docs whose newest
    *    version ≤ upTo (a doc superseded or deleted later keeps
    *    nothing here — its old segments were dead weight), re-written
    *    under BOTH partition dimensions so doc-bucket and term-bucket
    *    pruning cost the same after compaction as before;
    *  - folded docs = one live (doc_id, op) row each; tombstones and
    *    superseded entries vanish;
    *  - folded df = the partial sums of all deltas with seq ≤ upTo
    *    (token-level and additive, so liveness never enters), still
    *    `tb`-partitioned;
    *  - folded stats = ONE partial-sum row of the ≤ upTo stats deltas.
    *
    * Crash safety mirrors the marker discipline everywhere else in
    * this repo: the folded tree lands OUT OF PLACE under
    * `_compact/<upTo>/`, the `_compacted` marker (temp + rename,
    * never torn) is the single publish point, and only then does
    * [[cleanupCompacted]] delete the superseded segment dirs and any
    * older compact tree — readers pre-marker see the intact old view,
    * readers post-marker never list seq ≤ upTo dirs as data, so a
    * crash anywhere leaves garbage, not corruption, and a re-run
    * converges.
    */
  def compact(spark: SparkSession, root: String, upTo: Long,
      nBuckets: Int = 0): Unit = {
    require(compactedUpTo(spark, root).forall(_ <= upTo),
      s"cannot compact $root backwards past its marker")
    // a re-run AT the published horizon is the crashed-EPILOGUE retry:
    // the fold already committed (the marker is the proof), and
    // re-folding would overwrite the very _compact tree the read plan
    // now resolves from — converge the post-publish steps instead:
    // the deferred `_ntbuckets` pin (a legacy-migration fold that
    // died between the marker and the pin would otherwise leave
    // applyBatch's legacy guard refusing forever while its remedy —
    // "compact to the head" — lands right here as this very retry)
    // and the cleanup
    if (compactedUpTo(spark, root).contains(upTo)) {
      if (SegmentLog.layoutOf(spark, root, "_ntbuckets").isEmpty)
        SegmentLog.pinLayout(spark, root, "_ntbuckets",
          DefaultTokenBuckets.toLong)
      cleanupCompacted(spark, root); return
    }
    // refuse to fold past a torn first delivery — its redelivery would
    // wedge behind the horizon guard ([[SegmentLog.requireNoTornAtOrBelow]])
    SegmentLog.requireNoTornAtOrBelow(spark, root,
      Seq("postings", "df", "stats"), "docs", upTo)
    // the fold re-buckets the live postings: USE the root's pinned
    // constant (every root [[applyBatch]] ever touched has one). On a
    // legacy pre-pin root the caller MUST name the count explicitly —
    // guessing a default and then freezing it would land the folded
    // rows in buckets that targeted reads under the feed's true count
    // never list: silent false negatives, the exact failure class the
    // pin exists to prevent, surfacing only at the next applyBatch's
    // pin mismatch.
    val nb = SegmentLog.layoutOf(spark, root, "_nbuckets")
      .map(_.toInt).getOrElse {
        require(nBuckets > 0,
          s"$root has no _nbuckets layout pin (pre-pin root): pass the " +
            "bucket count it was actually fed with explicitly — " +
            "compacting under a guessed default would silently strand " +
            "re-bucketed postings outside every pruned read")
        nBuckets
      }
    SegmentLog.pinLayout(spark, root, "_nbuckets", nb.toLong)
    // the token dimension shipped WITH its pin, so every root holding
    // tb-partitioned segments has one; a LEGACY root (no pin) folds
    // safely under the default — its flat segments read uniformly,
    // the folded tree gains the dimension recomputed from the tokens
    // themselves, and the pin lands only AFTER the marker publish (a
    // crashed migration fold must not leave a pin that unlocks
    // mixed-layout applyBatch writes against surviving flat segments)
    val nt = SegmentLog.layoutOf(spark, root, "_ntbuckets")
      .map(_.toInt).getOrElse(DefaultTokenBuckets)
    // state AS OF the horizon (newest version ≤ upTo per key, later
    // supersessions notwithstanding): the live read's anti-join
    // suppresses a folded copy a fresh batch superseded, the next fold
    // retires it, and as-of reads above the horizon stay EXACT — see
    // [[IncrementalIvf.compact]] for the failure the global-newest
    // filter ordering caused
    val liveOld = latestDocVersions(spark, root, Some(upTo + 1))
      .filter(col("op") =!= "D")

    val foldPost = readLog(spark, root, "postings")
      .join(liveOld.select("doc_id", "seq"), Seq("doc_id", "seq"))
      .select("token", "doc_id", "tf", "dl")
      .persist()
    val foldDf = committedDf(spark, root).filter(col("seq") <= upTo)
      .groupBy("token").agg(sum("delta").as("delta"))
      .filter(col("delta") =!= 0L)
      .persist()
    try {
      val tmp = s"$root/_compact/$upTo"
      // an emptied index folds to a plain (schema-carrying) empty file
      // — partitionBy of zero rows would write nothing readable
      if (foldPost.isEmpty)
        foldPost.withColumn("db", bucketCol(nb))
          .withColumn("tb", tokenBucketCol(nt))
          .write.mode("overwrite").parquet(s"$tmp/postings")
      else
        foldPost.withColumn("db", bucketCol(nb))
          .withColumn("tb", tokenBucketCol(nt))
          .write.mode("overwrite").partitionBy("db", "tb")
          .parquet(s"$tmp/postings")
      liveOld.select("doc_id", "op")
        .write.mode("overwrite").parquet(s"$tmp/docs")
      if (foldDf.isEmpty)
        foldDf.withColumn("tb", tokenBucketCol(nt))
          .write.mode("overwrite").parquet(s"$tmp/df")
      else
        foldDf.withColumn("tb", tokenBucketCol(nt))
          .write.mode("overwrite").partitionBy("tb")
          .parquet(s"$tmp/df")
      // folded stats derive from the LIVE SET AT THE HORIZON itself
      // (each live doc contributes (1, dl)) — algebraically equal to
      // the ≤ upTo delta partial sums when every batch logged one,
      // and SELF-HEALING on a legacy root whose early batches predate
      // the stats log (summing the incomplete log would bake the
      // missing base into the folded row forever)
      foldPost.groupBy("doc_id").agg(first("dl").as("dl"))
        .agg(count(lit(1)).as("n_delta"),
          coalesce(sum("dl"), lit(0L)).as("dl_delta"))
        .write.mode("overwrite").parquet(s"$tmp/stats")

      // publish: the marker flip is the commit point
      SegmentLog.publishMarker(spark, root, upTo)
    } finally {
      foldPost.unpersist(blocking = false)
      foldDf.unpersist(blocking = false)
    }
    // the token-dimension pin lands only after the publish (see above)
    SegmentLog.pinLayout(spark, root, "_ntbuckets", nt.toLong)
    cleanupCompacted(spark, root)
  }

  /** Delete segment dirs and compact trees the `_compacted` marker has
    * superseded. Safe to call any time (including after a crashed
    * [[compact]]'s publish); a no-op without a marker.
    */
  def cleanupCompacted(spark: SparkSession, root: String): Unit =
    SegmentLog.cleanup(spark, root, Seq("postings", "docs", "df", "stats"))

  // ---- aliased generations: the blue/green REINDEX --------------------
  //
  // The postings are a pure function of the corpus AND the analyzer
  // (tokenization, normalization). An analyzer change therefore
  // invalidates every segment — the production answer is a blue/green
  // reindex: rebuild into a fresh generation from the authoritative
  // document store while readers keep serving the old one, then flip
  // atomically. Mechanics shared with the IVF retrain cutover
  // ([[SegmentLog.Alias]]); this index owns only the rebuild semantics
  // (one bulk applyBatch of the supplied corpus).

  /** The live generation root under `parent`. */
  def activeRoot(spark: SparkSession, parent: String): String =
    SegmentLog.Alias.resolve(spark, parent)

  /** Alias `parent` at an (initially empty) generation `g0` —
    * [[applyBatch]] bootstraps it like any root.
    */
  def initializeAliased(spark: SparkSession, parent: String): Unit =
    SegmentLog.Alias.publishInitial(spark, parent, "g0")

  /** [[applyBatch]] against the live generation. */
  def applyBatchActive(spark: SparkSession, parent: String,
      batch: DataFrame, batchId: Long, nBuckets: Int = 16,
      compactEvery: Int = 0,
      nTokenBuckets: Int = DefaultTokenBuckets): Unit =
    applyBatch(spark, activeRoot(spark, parent), batch, batchId,
      nBuckets, compactEvery, nTokenBuckets)

  /** [[currentPostings]] of the live generation. */
  def currentPostingsActive(spark: SparkSession,
      parent: String): DataFrame =
    currentPostings(spark, activeRoot(spark, parent))

  /** REINDEX with atomic cutover: bulk-apply the authoritative corpus
    * `docs` (doc_id, text — the live document set; a doc absent here
    * is gone, exactly like the coded IVF rebuild pulling from the
    * external store) into a FRESH generation, then flip the alias —
    * returns the new root. Run it when the analyzer changed (the
    * rebuilt index tokenizes with the CURRENT code) or to shed a
    * bloated log wholesale. Searches during the rebuild serve the old
    * generation unchanged; a crash before the flip leaves it active;
    * the bulk load lands at the old log's newest batch id so the CDC
    * feed's strictly-monotone ids keep working across the flip (safe
    * precisely because that id's old content is contained in the
    * rebuild — which is why a NEVER-FED generation refuses: reusing an
    * id the feed hasn't issued yet would make the feed's real first
    * batch a silent idempotence no-op; an empty index has nothing
    * stale, feed it directly); the old generation stays for in-flight
    * readers until [[cleanupGenerations]]. `nBuckets` /
    * `nTokenBuckets` 0 (the defaults) inherit the old generation's
    * pinned counts.
    */
  def rebuildCutover(spark: SparkSession, parent: String,
      docs: DataFrame, nBuckets: Int = 0,
      nTokenBuckets: Int = 0): String = {
    val oldRoot = activeRoot(spark, parent)
    require(SegmentLog.hasBatches(spark, oldRoot, "docs"),
      s"nothing to rebuild: $oldRoot never received a batch — an empty " +
        "generation has no stale postings; feed it directly " +
        "(applyBatchActive)")
    val gen = SegmentLog.Alias.nextGen(spark, parent)
    val newRoot = s"$parent/$gen"
    val nb =
      if (nBuckets > 0) nBuckets
      else SegmentLog.layoutOf(spark, oldRoot, "_nbuckets")
        .map(_.toInt).getOrElse(16)
    val nt =
      if (nTokenBuckets > 0) nTokenBuckets
      else SegmentLog.layoutOf(spark, oldRoot, "_ntbuckets")
        .map(_.toInt).getOrElse(DefaultTokenBuckets)
    val lastBatch = SegmentLog.lastSeq(spark, oldRoot, "docs")
    applyBatch(spark, newRoot,
      docs.select(col("doc_id"), col("text")).withColumn("op", lit("I")),
      lastBatch, nb, compactEvery = 0, nTokenBuckets = nt)
    // write fence before the flip: the cutover assumes a single writer
    // (reindex in the feed's quiesce window) — if a concurrent feed
    // landed batches on the old generation during the rebuild,
    // flipping would silently lose them; abort loudly instead (the old
    // generation stays active, a re-run picks up the newer corpus)
    val nowLast = SegmentLog.lastSeq(spark, oldRoot, "docs")
    require(nowLast == lastBatch,
      s"batch(es) landed on $oldRoot during the rebuild (last id " +
        s"$lastBatch -> $nowLast) — flip aborted; re-run the cutover")
    SegmentLog.Alias.publish(spark, parent, gen)
    newRoot
  }

  /** Delete every non-active generation under `parent` (after the
    * reader quiesce window).
    */
  def cleanupGenerations(spark: SparkSession, parent: String): Unit =
    SegmentLog.Alias.cleanup(spark, parent)

  /** The live doc_ids of the index — what a reindex joins against the
    * authoritative text store to reconstruct its corpus. Split-resolved
    * like every other changelog read.
    */
  def liveDocIds(spark: SparkSession, root: String): DataFrame =
    latestDocVersions(spark, root)
      .filter(col("op") =!= "D").select("doc_id")

  /** Corpus stats for [[InvertedIndex.bm25Query]] as a ONE-ROW frame
    * (n_docs, sum_dl) folded from the additive stats log — O(batches)
    * thin one-row segments (folded to a single partial-sum row by
    * [[compact]]), NEVER a postings scan. `asOf` bounds the fold for
    * replayed consumers and is BOUNDED BY COMPACTION like every as-of
    * read here: a view strictly below the horizon fails loudly (the
    * folded partial-sum row carries the horizon's seq — silently
    * filtering it out would score every BM25 query with N = 0).
    */
  def statsFrame(spark: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    asOf.foreach(a => require(compactedUpTo(spark, root).forall(a >= _),
      s"asOf $a is below $root's compaction horizon: that view is " +
        "folded away"))
    val log = committedStats(spark, root)
    asOf.fold(log)(a => log.filter(col("seq") <= a))
      .agg(coalesce(sum("n_delta"), lit(0L)).as("n_docs"),
        coalesce(sum("dl_delta"), lit(0L)).as("sum_dl"))
  }

  /** (live doc count, mean live doc length) for
    * [[InvertedIndex.bm25Query]] — one [[statsFrame]] fold. A LEGACY
    * root whose batches predate the stats log (no `stats/` dir and no
    * folded stats tree) answers from the live postings — the
    * pre-stats-log derivation, correct but corpus-sized; one
    * [[compact]] migrates it (the fold derives the folded stats row
    * from the live set itself, healing the missing history).
    */
  def stats(spark: SparkSession, root: String,
      asOf: Option[Long] = None): (Long, Double) = {
    val f = SegmentLog.hfs(spark, root)
    val hasEvidence = f.exists(
      new org.apache.hadoop.fs.Path(s"$root/stats")) ||
      compactedUpTo(spark, root).exists(c => f.exists(
        new org.apache.hadoop.fs.Path(s"$root/_compact/$c/stats")))
    if (!hasEvidence && SegmentLog.hasBatches(spark, root, "docs")) {
      // legacy derivation honors asOf too (the postings view guards
      // the below-horizon case loudly, like everywhere else)
      val dls = livePostings(spark, root, asOf = asOf)
        .groupBy("doc_id").agg(first("dl").as("dl"))
      val r = dls.agg(count(lit(1)), avg("dl")).head
      return (r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
    }
    val r = statsFrame(spark, root, asOf).head
    val n = r.getLong(0)
    // an emptied index (all docs deleted) has no mean length
    (n, if (n == 0L) 0.0 else r.getLong(1).toDouble / n)
  }
}

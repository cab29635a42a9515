package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental banded-LSH candidate index — dedup-at-ingest against
  * the FULL historical corpus. The batch operators (q_dedup_minhash
  * and friends) band the whole corpus per run; at a production ingest
  * cadence the question is "which of 100 TB of already-seen documents
  * near-duplicates THIS arriving batch", and the answer must cost
  * O(|batch|), not a corpus scan. Same segment-log recipe as the
  * other two incremental indexes ([[SegmentLog]]):
  *
  *   root/members/seq=<b>/bb=<bucket>/  band rows (doc_id, band_id,
  *                                      bk, sg) of batch b's docs
  *   root/docs/seq=<b>/                 changelog (doc_id, op),
  *                                      written LAST (commit point)
  *
  * The BANDING SCHEME is a creation-time parameter: `bands` × `rows`
  * over a k = bands·rows-component md5 MinHash (token 3-shingles, md5
  * band keys — formulas shared with [[DedupExtras]]; at the default
  * 4 × 2 the candidate set is exactly the contract operator's
  * restricted to pairs touching the probe set, and the spec pins that
  * equality). [[LshPlanner.choose]] turns a target Jaccard threshold
  * into the cost-optimal (b, r); feed its output straight into
  * [[applyBatch]] — the scheme is then FROZEN at the root via the
  * [[SegmentLog.pinLayout]] discipline (a silently different banding
  * would hash probes into band keys the members were never written
  * with: false negatives with no error). Changing the scheme is a
  * blue/green [[rebuildCutover]] on [[SegmentLog.Alias]], exactly like
  * the inverted index's analyzer change. The signature array rides in
  * the band rows (the batch operator's own carry-the-array
  * discipline), so similarity needs no second lookup.
  *
  * Partition pruning is the point: rows partition by
  * `bb = pmod(hash(band_id, bk), nBuckets)`, and a candidate lookup
  * reads ONLY the bucket dirs the probes' band keys hash into — a
  * driver-side ≤ nBuckets manifest, the landing zone's own
  * touched-bucket discipline. Updates/deletes fold through the thin
  * changelog exactly like [[IncrementalIvf]]'s members; [[compact]]
  * bounds log growth with the shared marker discipline, and a lookup
  * on a compacted root resolves liveness WITHOUT a corpus-wide window
  * ([[SegmentLog.liveMembersPruned]]: folded rows are live at the
  * horizon by construction — broadcast anti-join against the small
  * fresh-key set only).
  */
object IncrementalLsh {

  /** The contract scheme (4 bands × 2 rows over a k = 8 signature) —
    * the default a caller gets without a planner; kept as named
    * constants so the pin values and [[DedupExtras]]' formulas can
    * never drift apart silently.
    */
  val DefaultBands = 4
  val DefaultRows = 2

  private def bucketCol(nBuckets: Int) =
    pmod(hash(col("band_id"), col("bk")), lit(nBuckets))

  /** The pinned (nBuckets, bands, rows) layout of a root, None for a
    * VIRGIN root (no batch ever pinned it — an empty index, which a
    * bootstrap loop legitimately probes before the first feed batch).
    * Missing band pins on a pinned root describe a
    * pre-parameterization root (always the contract scheme — pins for
    * it shipped with the scheme knob).
    */
  private def schemeOf(spark: SparkSession,
      root: String): Option[(Int, Int, Int)] =
    SegmentLog.layoutOf(spark, root, "_nbuckets").map { nb =>
      (nb.toInt,
        SegmentLog.layoutOf(spark, root, "_bands")
          .map(_.toInt).getOrElse(DefaultBands),
        SegmentLog.layoutOf(spark, root, "_rows")
          .map(_.toInt).getOrElse(DefaultRows))
    }

  /** The root's pinned (nBuckets, bands, rows), None for a virgin
    * root — what a FEEDER that didn't create the root must pass to
    * [[applyBatch]] (a planner-rebuilt generation is no longer the
    * contract default, and guessing trips the pins by design).
    */
  def pinnedScheme(spark: SparkSession,
      root: String): Option[(Int, Int, Int)] = schemeOf(spark, root)

  /** md5 band key of band `band_id` under a b × r scheme: the r
    * signature components of the band joined with '|' separators —
    * the exact generalization of the contract formula (concat, not
    * concat_ws: an all-null signature must yield a null key, never a
    * shared md5("") bucket).
    */
  private def bandKeyCol(r: Int): Column = {
    val parts: Seq[Column] = (1 to r).flatMap { j =>
      element_at(col("sg"), col("band_id") * r + j) ::
        (if (j < r) List(lit("|")) else Nil)
    }
    md5(concat(parts: _*).cast("binary"))
  }

  /** (doc_id, band_id, bk, sg) band rows of a (doc_id, text) frame —
    * byte-identical signature/band formulas to the batch operators at
    * the default scheme, index-stable hash family at any other.
    */
  private def bandRows(spark: SparkSession, docs: DataFrame,
      bands: Int, rows: Int): DataFrame = {
    graft.plans.MinHashSignature.register(spark)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), expr(DedupExtras.shinglesSql).as("sh"))
      .select(col("doc_id"),
        expr(s"minhash_sig(sh, ${bands * rows})").as("sg"))
      .select(col("doc_id"), col("sg"),
        explode(sequence(lit(0), lit(bands - 1))).as("band_id"))
      .select(col("doc_id"), col("band_id"), bandKeyCol(rows).as("bk"),
        col("sg"))
  }

  private def emptyMembers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Int, String, Seq[String], Int)]
      .toDF("doc_id", "band_id", "bk", "sg", "bb")
  }

  /** Apply one CDC batch of documents (doc_id, text, op — I/U upserts
    * the doc's bands, D removes it) as batch `batchId` (strictly
    * greater than every prior). Same built-in delivery idempotence,
    * torn-write commit order, horizon-replay no-op and
    * inline-compaction cadence as the other incremental indexes.
    * `bands`/`rows` select the banding scheme on the FIRST batch and
    * must match the root's pins ever after.
    */
  def applyBatch(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long, nBuckets: Int = 16, compactEvery: Int = 0,
      bands: Int = DefaultBands, rows: Int = DefaultRows): Unit = {
    require(nBuckets > 0, s"nBuckets=$nBuckets")
    require(bands >= 1 && rows >= 1, s"bands=$bands rows=$rows")
    val f = SegmentLog.hfs(spark, root)
    if (f.exists(new org.apache.hadoop.fs.Path(
        s"$root/docs/seq=$batchId/_SUCCESS"))) return
    // committed-then-compacted redelivery no-ops at/below the horizon
    // (the landing zone's checkpoint-head rule — see
    // [[IncrementalIvf.applyBatch]] for the soundness argument)
    if (SegmentLog.compactedUpTo(spark, root).exists(batchId <= _)) return
    // bucket count AND banding scheme are physical layout: freeze at
    // creation and fail loudly on a mismatch — a silently different
    // value would send this batch's band rows to band keys/buckets the
    // pruned candidate lookup never computes (false negatives with no
    // error)
    SegmentLog.pinLayout(spark, root, "_nbuckets", nBuckets.toLong)
    SegmentLog.pinLayout(spark, root, "_bands", bands.toLong)
    SegmentLog.pinLayout(spark, root, "_rows", rows.toLong)
    val staged = batch.select(col("doc_id"), col("text"), col("op"))
      .persist()
    try {
      val rws = bandRows(spark, staged.filter(col("op") =!= "D")
        .select("doc_id", "text"), bands, rows).persist()
      try {
        val memberDir = new org.apache.hadoop.fs.Path(
          s"$root/members/seq=$batchId")
        if (rws.isEmpty) {
          // delete-only batch: no member segment (zero-row partitionBy
          // husk lesson), the changelog alone tombstones
          if (f.exists(memberDir)) f.delete(memberDir, true)
        } else rws.withColumn("bb", bucketCol(nBuckets))
          .write.mode("overwrite").partitionBy("bb")
          .parquet(s"$root/members/seq=$batchId")
        staged.select("doc_id", "op").write.mode("overwrite")
          .parquet(s"$root/docs/seq=$batchId")
      } finally rws.unpersist(blocking = false)
    } finally staged.unpersist(blocking = false)
    Seq("members", "docs")
      .foreach(sub => spark.catalog.refreshByPath(s"$root/$sub"))
    if (compactEvery > 0) {
      val h = SegmentLog.compactedUpTo(spark, root).getOrElse(-1L)
      if (SegmentLog.freshSegDirs(spark, root, "docs", h)
          .size > compactEvery)
        compact(spark, root, batchId - 1)
    }
  }

  /** Near-dup CANDIDATES of `probes` (doc_id, text) against the live
    * index: (probe_id, doc_id, minhash_sim) for every indexed doc
    * sharing at least one band with a probe (self-matches excluded).
    * `minhash_sim` is the signature-agreement fraction — the same
    * verify statistic as `q_dedup_minhash` — computed from the carried
    * arrays with no second lookup. Cost: the probes' own signature
    * pass + a member read PRUNED to the ≤ b·|probes| band buckets the
    * probes hash into, never a corpus scan — and on a compacted root
    * the liveness fold is pruned too (broadcast anti-join against the
    * fresh-key set; no corpus-wide window). The bucket count AND the
    * banding scheme come from the root's own layout pins, so a lookup
    * can never hash probes with different constants than the members
    * were written with.
    */
  def candidates(spark: SparkSession, root: String,
      probes: DataFrame): DataFrame =
    candidatesView(spark, root, probes, None)

  /** TIME TRAVEL: [[candidates]] against the index exactly as it stood
    * after batch `asOf` committed — bounded by compaction like every
    * as-of read in this repo. "Which near-dups would yesterday's
    * corpus have surfaced for this batch?" without restoring state.
    */
  def candidatesAsOf(spark: SparkSession, root: String,
      probes: DataFrame, asOf: Long): DataFrame =
    candidatesView(spark, root, probes, Some(asOf))

  private def candidatesView(spark: SparkSession, root: String,
      probes: DataFrame, asOf: Option[Long]): DataFrame = {
    def emptyAnswer: DataFrame = {
      import spark.implicits._
      Seq.empty[(Long, Long, Double)]
        .toDF("probe_id", "doc_id", "minhash_sim")
    }
    // a VIRGIN root (no batch ever pinned a layout) and an index fed
    // only empty/delete-only batches (no members segment — the
    // zero-row-partitionBy discipline skips it) are both legitimate
    // empty indexes, not read errors: a bootstrap loop probes before
    // its first feed batch lands
    val scheme = schemeOf(spark, root)
    if (scheme.isEmpty) return emptyAnswer
    val (nBuckets, bands, rows) = scheme.get
    val k = bands * rows
    if (!SegmentLog.hasBatches(spark, root, "members"))
      return emptyAnswer
    val probeRows = bandRows(spark, probes, bands, rows)
      .withColumn("bb", bucketCol(nBuckets))
      .persist()
    try {
      val touched = probeRows.select("bb").distinct()
        .collect().map(_.getInt(0)).toSeq
      val members = SegmentLog.liveMembersPruned(spark, root,
        "members", "docs", "doc_id",
        raw => raw.filter(col("bb").isin(touched: _*)),
        emptyMembers(spark), asOf)
      members.as("m")
        .join(probeRows.as("p"),
          col("m.band_id") === col("p.band_id") &&
            col("m.bk") === col("p.bk") &&
            col("m.doc_id") =!= col("p.doc_id"))
        .select(col("p.doc_id").as("probe_id"),
          col("m.doc_id").as("doc_id"),
          round(expr(s"size(filter(sequence(1, $k), " +
            "i -> element_at(m.sg, i) = element_at(p.sg, i))) " +
            s"/ cast($k as double)"), 4).as("minhash_sim"))
        .distinct()
    } finally probeRows.unpersist(blocking = false)
  }

  /** The live doc_ids of the index — what a scheme rebuild joins
    * against the authoritative text store to reconstruct its corpus
    * (the index stores band rows, never text). Split-resolved like
    * every other changelog read.
    */
  def liveDocIds(spark: SparkSession, root: String): DataFrame =
    SegmentLog.latestVersionsSplit(spark, root, "docs", "doc_id")
      .filter(col("op") =!= "D").select("doc_id")

  /** COMPACTION — fold every member/changelog segment ≤ `upTo` into
    * one tree (live band rows only, still `bb`-partitioned so probe
    * pruning survives), with the shared marker/cleanup discipline and
    * the torn-batch wedge guard.
    */
  def compact(spark: SparkSession, root: String, upTo: Long): Unit = {
    require(SegmentLog.compactedUpTo(spark, root).forall(_ <= upTo),
      s"cannot compact $root backwards past its marker")
    // re-run at the published horizon = crashed-cleanup retry: finish
    // the cleanup, never re-fold over the tree readers resolve from
    if (SegmentLog.compactedUpTo(spark, root).contains(upTo)) {
      SegmentLog.cleanup(spark, root, Seq("members", "docs")); return
    }
    SegmentLog.requireNoTornAtOrBelow(spark, root,
      Seq("members"), "docs", upTo)
    // state AS OF the horizon (newest version ≤ upTo per key, later
    // supersessions notwithstanding) — see [[IncrementalIvf.compact]]
    val liveOld = SegmentLog.latestVersionsSplit(spark, root, "docs",
        "doc_id", beforeSeq = Some(upTo + 1))
      .filter(col("op") =!= "D")
    // an index fed only empty/delete-only batches never created the
    // members dir (candidates() treats that as a legitimate empty
    // index — so must the fold, which still bounds the CHANGELOG)
    val memberLog =
      if (SegmentLog.hasBatches(spark, root, "members"))
        SegmentLog.readLog(spark, root, "members")
      else emptyMembers(spark).withColumn("seq", lit(0L))
    val foldMembers = memberLog
      .join(liveOld.select("doc_id", "seq"), Seq("doc_id", "seq"))
      .drop("seq")
      .persist()
    try {
      val tmp = s"$root/_compact/$upTo"
      if (foldMembers.isEmpty)
        foldMembers.write.mode("overwrite").parquet(s"$tmp/members")
      else
        foldMembers.write.mode("overwrite").partitionBy("bb")
          .parquet(s"$tmp/members")
      liveOld.select("doc_id", "op")
        .write.mode("overwrite").parquet(s"$tmp/docs")
      SegmentLog.publishMarker(spark, root, upTo)
    } finally foldMembers.unpersist(blocking = false)
    SegmentLog.cleanup(spark, root, Seq("members", "docs"))
  }

  // ---- aliased generations: the SCHEME rebuild cutover ---------------
  //
  // The band rows are a pure function of the corpus AND the banding
  // scheme; a planner-driven (b, r) change therefore invalidates every
  // member segment — the production answer is the same blue/green
  // protocol as the inverted index's analyzer change and the IVF's
  // quantizer retrain ([[SegmentLog.Alias]]): rebuild into a fresh
  // generation from the authoritative document store while lookups
  // keep serving the old scheme, then flip atomically.

  /** The live generation root under `parent`. */
  def activeRoot(spark: SparkSession, parent: String): String =
    SegmentLog.Alias.resolve(spark, parent)

  /** Alias `parent` at an (initially empty) generation `g0` —
    * [[applyBatch]] bootstraps it like any root, pinning whatever
    * scheme the first batch carries.
    */
  def initializeAliased(spark: SparkSession, parent: String): Unit =
    SegmentLog.Alias.publishInitial(spark, parent, "g0")

  /** [[applyBatch]] against the live generation. */
  def applyBatchActive(spark: SparkSession, parent: String,
      batch: DataFrame, batchId: Long, nBuckets: Int = 16,
      compactEvery: Int = 0, bands: Int = DefaultBands,
      rows: Int = DefaultRows): Unit =
    applyBatch(spark, activeRoot(spark, parent), batch, batchId,
      nBuckets, compactEvery, bands, rows)

  /** [[candidates]] against the live generation. */
  def candidatesActive(spark: SparkSession, parent: String,
      probes: DataFrame): DataFrame =
    candidates(spark, activeRoot(spark, parent), probes)

  /** REBUILD the index under a NEW banding scheme with atomic cutover:
    * bulk-band the authoritative live corpus `docs` (doc_id, text — a
    * doc absent here is gone) into a fresh generation at
    * (`bands`, `rows`) — typically [[LshPlanner.choose]]'s output for
    * the new dedup threshold — then flip the alias; returns the new
    * root. Lookups during the rebuild serve the old scheme unchanged;
    * a crash before the flip leaves it active; the bulk load lands at
    * the old log's newest batch id so the CDC feed's strictly-monotone
    * ids keep working across the flip; a NEVER-FED generation refuses
    * (id-0 reuse would swallow the feed's first batch); the WRITE
    * FENCE re-checks the old root's last batch id just before the flip
    * so a concurrent feed batch cannot vanish silently. `nBuckets` 0
    * (the default) inherits the old generation's pinned bucket count.
    */
  def rebuildCutover(spark: SparkSession, parent: String,
      docs: DataFrame, bands: Int, rows: Int,
      nBuckets: Int = 0): String = {
    val oldRoot = activeRoot(spark, parent)
    require(SegmentLog.hasBatches(spark, oldRoot, "docs"),
      s"nothing to rebuild: $oldRoot never received a batch — an empty " +
        "generation has no stale bands; feed it directly " +
        "(applyBatchActive at the new scheme)")
    val gen = SegmentLog.Alias.nextGen(spark, parent)
    val newRoot = s"$parent/$gen"
    val nb =
      if (nBuckets > 0) nBuckets
      else SegmentLog.layoutOf(spark, oldRoot, "_nbuckets")
        .map(_.toInt).getOrElse(16)
    val lastBatch = SegmentLog.lastSeq(spark, oldRoot, "docs")
    applyBatch(spark, newRoot,
      docs.select(col("doc_id"), col("text")).withColumn("op", lit("I")),
      lastBatch, nb, compactEvery = 0, bands = bands, rows = rows)
    // write fence before the flip — see [[IncrementalIndex.rebuildCutover]]
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
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental banded HYPERPLANE-LSH candidate index — dedup-at-ingest
  * for the EMBEDDING modality, completing the story [[IncrementalLsh]]
  * tells for text: the batch operator (q_dedup_embed_banded) re-bands
  * the whole corpus per run; at ingest cadence the question is "which
  * already-embedded items near-duplicate THIS arriving batch" at
  * O(|batch|) cost. Same segment-log recipe as the other incremental
  * indexes ([[SegmentLog]]):
  *
  *   root/members/seq=<b>/bb=<bucket>/  band rows (vec_id, band_id,
  *                                      bk) of batch b's vectors
  *   root/vecs/seq=<b>/                 changelog (vec_id, op),
  *                                      written LAST (commit point)
  *
  * Scheme: `bands` × `bandBits`-bit substrings of a
  * `hyperplane_sig(e, bands·bandBits)` sign signature — byte-identical
  * formulas to the batch operator, with the band width a CREATION
  * parameter (the batch op derives it from corpus size; an index
  * freezes it like every other layout constant — pick it for the
  * corpus size the index will grow into). Pins follow the shared
  * discipline: a silently different scheme would hash probes into
  * band keys the members were never written with.
  *
  * The index stores NO vectors (the coded-IVF posture: at 100 TB the
  * float vectors are the storage bill and live in the external vector
  * store) — band rows carry only (vec_id, band_id, bk), so
  * [[candidates]] returns unverified band-collision pairs and
  * [[candidatesVerified]] closes the loop with an exact cosine against
  * the external store pruned to the candidate ids, exactly how
  * [[CorpusRefresh.BandedVerify]] verifies text candidates against the
  * authoritative doc store. Lookups prune to the ≤ bands·|probes|
  * touched `bb=` buckets and resolve liveness with the split read
  * (folded side broadcast-anti-joined — never a corpus window);
  * updates/deletes fold through the thin changelog; [[compact]] is
  * as-of-exact like every fold in this repo; below-horizon
  * redeliveries no-op.
  */
object IncrementalEmbedLsh {

  /** The batch operator's banding breadth (4 bands — OR-of-ANDs). */
  val DefaultBands = 4

  private def bucketCol(nBuckets: Int) =
    pmod(hash(col("band_id"), col("bk")), lit(nBuckets))

  private def schemeOf(spark: SparkSession,
      root: String): Option[(Int, Int, Int)] =
    SegmentLog.layoutOf(spark, root, "_nbuckets").map { nb =>
      (nb.toInt,
        SegmentLog.layoutOf(spark, root, "_bands")
          .map(_.toInt).getOrElse(DefaultBands),
        SegmentLog.layoutOf(spark, root, "_bandbits")
          .map(_.toInt).getOrElse(8))
    }

  /** The root's pinned (nBuckets, bands, bandBits), None for a virgin
    * root — what a feeder that didn't create the root passes through.
    */
  def pinnedScheme(spark: SparkSession,
      root: String): Option[(Int, Int, Int)] = schemeOf(spark, root)

  /** (vec_id, band_id, bk) band rows of a (vec_id, e) frame —
    * byte-identical signature/band formulas to q_dedup_embed_banded.
    */
  private def bandRows(spark: SparkSession, vecs: DataFrame,
      bands: Int, bandBits: Int): DataFrame = {
    graft.plans.HyperplaneSignature.register(spark)
    vecs
      .select(col("vec_id"), col("e"))
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .withColumn("sig",
        expr(s"hyperplane_sig(e, ${bands * bandBits})"))
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(bands - 1))).as("band_id"),
        col("sig"))
      .select(col("vec_id"), col("band_id"),
        expr(s"substring(sig, band_id * $bandBits + 1, $bandBits)")
          .as("bk"))
  }

  private def emptyMembers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Int, String, Int)]
      .toDF("vec_id", "band_id", "bk", "bb")
  }

  /** Apply one CDC batch of (vec_id, e, op — I/U re-bands the vector,
    * D removes it) as batch `batchId`. Shared protocol: delivery
    * idempotence via the changelog's _SUCCESS, below-horizon
    * redelivery no-op, torn-write commit order, layout pins, inline
    * compaction cadence.
    */
  def applyBatch(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long, nBuckets: Int = 16, compactEvery: Int = 0,
      bands: Int = DefaultBands, bandBits: Int = 8): Unit = {
    require(nBuckets > 0 && bands >= 1 && bandBits >= 1,
      s"nBuckets=$nBuckets bands=$bands bandBits=$bandBits")
    val f = SegmentLog.hfs(spark, root)
    if (f.exists(new org.apache.hadoop.fs.Path(
        s"$root/vecs/seq=$batchId/_SUCCESS"))) return
    if (SegmentLog.compactedUpTo(spark, root).exists(batchId <= _)) return
    SegmentLog.pinLayout(spark, root, "_nbuckets", nBuckets.toLong)
    SegmentLog.pinLayout(spark, root, "_bands", bands.toLong)
    SegmentLog.pinLayout(spark, root, "_bandbits", bandBits.toLong)
    val staged = batch.select(col("vec_id"), col("e"), col("op"))
      .persist()
    try {
      val rws = bandRows(spark, staged.filter(col("op") =!= "D")
        .select("vec_id", "e"), bands, bandBits).persist()
      try {
        val memberDir = new org.apache.hadoop.fs.Path(
          s"$root/members/seq=$batchId")
        if (rws.isEmpty) {
          if (f.exists(memberDir)) f.delete(memberDir, true)
        } else rws.withColumn("bb", bucketCol(nBuckets))
          .write.mode("overwrite").partitionBy("bb")
          .parquet(s"$root/members/seq=$batchId")
        staged.select("vec_id", "op").write.mode("overwrite")
          .parquet(s"$root/vecs/seq=$batchId")
      } finally rws.unpersist(blocking = false)
    } finally staged.unpersist(blocking = false)
    Seq("members", "vecs")
      .foreach(sub => spark.catalog.refreshByPath(s"$root/$sub"))
    if (compactEvery > 0) {
      val h = SegmentLog.compactedUpTo(spark, root).getOrElse(-1L)
      if (SegmentLog.freshSegDirs(spark, root, "vecs", h)
          .size > compactEvery)
        compact(spark, root, batchId - 1)
    }
  }

  /** Band-collision CANDIDATES of `probes` (vec_id, e) against the
    * live index: (probe_id, vec_id) pairs agreeing on every bit of at
    * least one band (self-matches excluded) — UNVERIFIED by design
    * (the index stores no vectors; see [[candidatesVerified]]). Cost:
    * the probes' own signature pass + a member read pruned to the ≤
    * bands·|probes| touched buckets + the split liveness resolution.
    */
  def candidates(spark: SparkSession, root: String,
      probes: DataFrame): DataFrame =
    candidatesView(spark, root, probes, None)

  /** TIME TRAVEL: [[candidates]] against the index exactly as it stood
    * after batch `asOf` committed — bounded by compaction like every
    * as-of read in this repo. The read a REPLAY-DETERMINISTIC composed
    * consumer uses ([[CorpusRefresh.EmbedVerify]] probes as of the
    * previous state batch, so a redelivered refresh can never see band
    * rows its first attempt's own downstream feed wrote).
    */
  def candidatesAsOf(spark: SparkSession, root: String,
      probes: DataFrame, asOf: Long): DataFrame =
    candidatesView(spark, root, probes, Some(asOf))

  private def candidatesView(spark: SparkSession, root: String,
      probes: DataFrame, asOf: Option[Long]): DataFrame = {
    def emptyAnswer: DataFrame = {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("probe_id", "vec_id")
    }
    val scheme = schemeOf(spark, root)
    if (scheme.isEmpty) return emptyAnswer
    val (nBuckets, bands, bandBits) = scheme.get
    if (!SegmentLog.hasBatches(spark, root, "members"))
      return emptyAnswer
    val probeRows = bandRows(spark, probes, bands, bandBits)
      .withColumn("bb", bucketCol(nBuckets))
      .persist()
    try {
      val touched = probeRows.select("bb").distinct()
        .collect().map(_.getInt(0)).toSeq
      val members = SegmentLog.liveMembersPruned(spark, root,
        "members", "vecs", "vec_id",
        raw => raw.filter(col("bb").isin(touched: _*)),
        emptyMembers(spark), asOf)
      members.as("m")
        .join(probeRows.as("p"),
          col("m.band_id") === col("p.band_id") &&
            col("m.bk") === col("p.bk") &&
            col("m.vec_id") =!= col("p.vec_id"))
        .select(col("p.vec_id").as("probe_id"),
          col("m.vec_id").as("vec_id"))
        .distinct()
    } finally probeRows.unpersist(blocking = false)
  }

  /** [[candidates]] + the exact cosine VERIFY against the external
    * vector store `vectors` (vec_id, e — the same store the coded IVF
    * reranks from), thresholded at `minSim`: (probe_id, vec_id, sim).
    * FIXTURE-SCALE FALLBACK: the semi-join keeps only the candidate
    * ids' ROWS but still scans every file of `vectors` map-side — at
    * store scale use [[candidatesVerifiedStore]], whose bucketed
    * handle prunes the fetch I/O to the candidates' buckets.
    */
  def candidatesVerified(spark: SparkSession, root: String,
      probes: DataFrame, vectors: DataFrame,
      minSim: Double): DataFrame = {
    val cand = candidates(spark, root, probes)
    val candVecs = vectors.select(col("vec_id"), col("e").as("ce"))
      .join(cand.select("vec_id").distinct(), Seq("vec_id"), "left_semi")
    verifyPairs(cand, probes, candVecs, minSim)
  }

  /** [[candidatesVerified]] with the vector store passed as a BUCKETED
    * HANDLE instead of a bare frame: the candidate-vector fetch reads
    * ONLY the bucket dirs the candidate ids hash into
    * ([[graft.streaming.UpsertFileSink.fetchByKeys]]) — fetch I/O
    * proportional to the ≤ bands·|probes| candidate set, never a
    * map-side pass over the whole store (the round-16 "row-pruned but
    * not I/O-pruned" scale finding). `asOf` bounds BOTH reads (index
    * view and store version) for replayed consumers. The store rows
    * must carry (vec_id, e).
    */
  def candidatesVerifiedStore(spark: SparkSession, root: String,
      probes: DataFrame,
      store: graft.streaming.UpsertFileSink.BucketedStore,
      minSim: Double, asOf: Option[Long] = None): DataFrame = {
    val cand = asOf.fold(candidates(spark, root, probes))(a =>
      candidatesAsOf(spark, root, probes, a))
    val candVecs = graft.streaming.UpsertFileSink
      .fetchByKeys(spark, store,
        cand.select(col("vec_id")).distinct(), asOf)
      .select(col("vec_id"), col("e").as("ce"))
    verifyPairs(cand, probes, candVecs, minSim)
  }

  /** The exact-cosine verify shared by both store shapes. */
  private def verifyPairs(cand: DataFrame, probes: DataFrame,
      candVecs: DataFrame, minSim: Double): DataFrame =
    cand
      .join(probes.select(col("vec_id").as("probe_id"),
        col("e").as("pe")), Seq("probe_id"))
      .join(candVecs, Seq("vec_id"))
      .withColumn("sim_raw", expr(SimilarityExtras.cosPair("pe", "ce")))
      .filter(col("sim_raw") >= minSim)
      .select(col("probe_id"), col("vec_id"),
        round(col("sim_raw"), 4).as("sim"))

  /** The live vec_ids of the index — what a scheme rebuild joins
    * against the external vector store to reconstruct its corpus (the
    * index stores band rows, never vectors). Split-resolved like every
    * other changelog read.
    */
  def liveVecIds(spark: SparkSession, root: String): DataFrame =
    SegmentLog.latestVersionsSplit(spark, root, "vecs", "vec_id")
      .filter(col("op") =!= "D").select("vec_id")

  /** COMPACTION — the shared as-of-exact fold (live band rows at the
    * horizon, still `bb`-partitioned), marker/cleanup discipline,
    * torn-batch wedge guard.
    */
  def compact(spark: SparkSession, root: String, upTo: Long): Unit = {
    require(SegmentLog.compactedUpTo(spark, root).forall(_ <= upTo),
      s"cannot compact $root backwards past its marker")
    if (SegmentLog.compactedUpTo(spark, root).contains(upTo)) {
      SegmentLog.cleanup(spark, root, Seq("members", "vecs")); return
    }
    SegmentLog.requireNoTornAtOrBelow(spark, root,
      Seq("members"), "vecs", upTo)
    val liveOld = SegmentLog.latestVersionsSplit(spark, root, "vecs",
        "vec_id", beforeSeq = Some(upTo + 1))
      .filter(col("op") =!= "D")
    val memberLog =
      if (SegmentLog.hasBatches(spark, root, "members"))
        SegmentLog.readLog(spark, root, "members")
      else emptyMembers(spark).withColumn("seq", lit(0L))
    val foldMembers = memberLog
      .join(liveOld.select("vec_id", "seq"), Seq("vec_id", "seq"))
      .drop("seq")
      .persist()
    try {
      val tmp = s"$root/_compact/$upTo"
      if (foldMembers.isEmpty)
        foldMembers.write.mode("overwrite").parquet(s"$tmp/members")
      else
        foldMembers.write.mode("overwrite").partitionBy("bb")
          .parquet(s"$tmp/members")
      liveOld.select("vec_id", "op")
        .write.mode("overwrite").parquet(s"$tmp/vecs")
      SegmentLog.publishMarker(spark, root, upTo)
    } finally foldMembers.unpersist(blocking = false)
    SegmentLog.cleanup(spark, root, Seq("members", "vecs"))
  }

  // ---- aliased generations: the SCHEME rebuild cutover ---------------
  //
  // Band rows are a pure function of the vectors AND the (bands,
  // bandBits) scheme; an operator who sized bandBits for 4k vectors
  // needs the wider scheme once the corpus grows (the batch operator
  // scales its width by corpus size for exactly this reason — the
  // q_sim_lsh ladder). Same blue/green protocol as the text-LSH
  // scheme rebuild and the IVF retrain ([[SegmentLog.Alias]]): bulk
  // re-band the live corpus FROM THE EXTERNAL VECTOR STORE (the index
  // never stored a vector) into a fresh generation while lookups keep
  // serving the old scheme, then flip atomically.

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
      bandBits: Int = 8): Unit =
    applyBatch(spark, activeRoot(spark, parent), batch, batchId,
      nBuckets, compactEvery, bands, bandBits)

  /** [[candidates]] against the live generation. */
  def candidatesActive(spark: SparkSession, parent: String,
      probes: DataFrame): DataFrame =
    candidates(spark, activeRoot(spark, parent), probes)

  /** REBUILD the index under a NEW (bands, bandBits) scheme with
    * atomic cutover: bulk-band the authoritative live vectors
    * `vectors` (vec_id, e — the external store's view of the corpus; a
    * vector absent here is gone) into a fresh generation, then flip
    * the alias; returns the new root. Lookups during the rebuild serve
    * the old scheme unchanged; a crash before the flip leaves it
    * active; the bulk load lands at the old log's newest batch id so
    * the CDC feed's strictly-monotone ids keep working across the
    * flip; a NEVER-FED generation refuses (id-0 reuse would swallow
    * the feed's first batch); the WRITE FENCE re-checks the old root's
    * last batch id just before the flip so a concurrent feed batch
    * cannot vanish silently. `nBuckets` 0 (the default) inherits the
    * old generation's pinned bucket count. The
    * [[IncrementalLsh.rebuildCutover]] recipe, vector-side.
    */
  def rebuildCutover(spark: SparkSession, parent: String,
      vectors: DataFrame, bands: Int, bandBits: Int,
      nBuckets: Int = 0): String = {
    val oldRoot = activeRoot(spark, parent)
    require(SegmentLog.hasBatches(spark, oldRoot, "vecs"),
      s"nothing to rebuild: $oldRoot never received a batch — an empty " +
        "generation has no stale bands; feed it directly " +
        "(applyBatchActive at the new scheme)")
    val gen = SegmentLog.Alias.nextGen(spark, parent)
    val newRoot = s"$parent/$gen"
    val nb =
      if (nBuckets > 0) nBuckets
      else SegmentLog.layoutOf(spark, oldRoot, "_nbuckets")
        .map(_.toInt).getOrElse(16)
    val lastBatch = SegmentLog.lastSeq(spark, oldRoot, "vecs")
    applyBatch(spark, newRoot,
      vectors.select(col("vec_id"), col("e")).withColumn("op", lit("I")),
      lastBatch, nb, compactEvery = 0, bands = bands,
      bandBits = bandBits)
    // write fence before the flip — see [[IncrementalLsh.rebuildCutover]]
    val nowLast = SegmentLog.lastSeq(spark, oldRoot, "vecs")
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

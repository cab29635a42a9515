package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.CosineSimilarity

/** Incremental IVF maintenance — the VECTOR-retrieval freshness twin
  * of [[IncrementalIndex]]: new embeddings arrive daily and the ANN
  * index must absorb them without re-clustering the corpus. Standard
  * FAISS practice applies: the coarse quantizer (the k centroids) is
  * trained ONCE and held fixed between explicit retrains; adds are a
  * pure map-side nearest-centroid assignment into the fixed cells.
  * Under a fixed quantizer, incremental maintenance is EXACT — not an
  * approximation on top of an approximation — which is what the spec
  * pins: search over the maintained index equals the same search over
  * a from-scratch assignment of the live vectors to the same
  * centroids.
  *
  * Layout (the [[IncrementalIndex]] segment recipe, member-side):
  *
  *   root/centroids/              the fixed quantizer (cell, c)
  *   root/members/seq=<b>/cell=<c>/   batch b's assignments
  *   root/vecs/seq=<b>/           changelog (vec_id, op), written LAST
  *
  * A vector's live row is the member row matching its newest changelog
  * seq — updates that MOVE a vector between cells need no in-place
  * edit (the old cell's row is tombstoned by the fold), deletes fold
  * out the same way, and a crashed batch leaves its member segment
  * invisible. Search prunes to the probed cells at the PARTITION level
  * (`cell=` dirs), folds liveness over the thin changelog, and never
  * scores the corpus outside the probed cells.
  *
  * Log growth bounds via [[compact]] — the member-side instance of
  * the [[SegmentLog]] recipe [[IncrementalIndex.compact]] uses: fold
  * every segment at or below a horizon into one out-of-place
  * `_compact/<horizon>/` tree (live assignments only, still
  * cell-partitioned so probe pruning survives compaction; one live
  * changelog row per vector; dead versions and tombstones vanish),
  * publish with the `_compacted` marker, then vacuum — readers
  * pre-marker see the intact log, post-marker never list folded
  * segments as data. RETRAIN stays a bulk decision — rebuild to a
  * fresh root when [[quantizationReport]] says the fixed centroids no
  * longer fit the live distribution (mean assignment similarity is
  * the standard quantization-error monitor, inverted for cosine).
  */
object IncrementalIvf {

  /** Each vector's newest (vec_id, seq, op) — the rank-1 window runs
    * over the FRESH segments only; folded rows (live at the horizon by
    * construction) enter via a broadcast anti-join
    * ([[SegmentLog.latestVersionsSplit]]), so the changelog resolution
    * never shuffles the folded corpus.
    */
  private def latestVecVersions(spark: SparkSession,
      root: String): DataFrame =
    SegmentLog.latestVersionsSplit(spark, root, "vecs", "vec_id")

  private def emptyPlainMembers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Seq[Double], Int)].toDF("vec_id", "e", "cell")
  }

  private def emptyCodedMembers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Seq[Int], Int)].toDF("vec_id", "codes", "cell")
  }

  /** Train the fixed quantizer only — the bootstrap for a CONTINUOUS
    * ingest where every vector (including the first batch) lands via
    * [[applyBatch]]: FAISS practice trains the coarse quantizer on a
    * representative sample, then streams adds against it. `trainVecs`
    * carries (vec_id, e: array<double>).
    */
  def initializeQuantizer(spark: SparkSession, trainVecs: DataFrame,
      root: String, k: Int, iters: Int): Unit = {
    val model = IvfIndex.buildFrom(spark, trainVecs, k, iters)
    model.centroids.write.mode("overwrite").parquet(s"$root/centroids")
    // record the TRAINING-time fit as the retrain baseline: the mean
    // assignment cosine of the very sample the quantizer was built on
    // (one aggregate; [[retrainSignal]] compares the live set to it)
    CosineSimilarity.register(spark)
    val fit = IvfIndex.assignTo(trainVecs, model.centroids)
      .join(broadcast(model.centroids), Seq("cell"))
      .agg(avg(expr("cosine_sim(e, c)"))).head.getDouble(0)
    graft.ControlFiles.atomicWrite(SegmentLog.hfs(spark, root),
      new org.apache.hadoop.fs.Path(root, "_train_fit"), fit.toString)
  }

  /** Train the fixed quantizer from the initial corpus and land batch
    * 0. `vectors` carries (vec_id, e: array<double>).
    */
  def initialize(spark: SparkSession, vectors: DataFrame, root: String,
      k: Int, iters: Int): Unit = {
    initializeQuantizer(spark, vectors, root, k, iters)
    applyBatch(spark, root,
      vectors.withColumn("op", lit("I")), 0L)
  }

  /** Apply one CDC batch of (vec_id, e, op): I/U assigns the vector's
    * new embedding into its nearest fixed cell, D removes it (e
    * ignored). `batchId` strictly greater than every prior batch's.
    * `compactEvery` > 0 folds the log up to `batchId − 1` whenever
    * more than that many fresh segments have accumulated (counted,
    * not id arithmetic; never the in-flight batch itself, so a
    * redelivery still converges) — [[IncrementalIndex.applyBatch]]'s
    * knob, member-side.
    */
  def applyBatch(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long, compactEvery: Int = 0): Unit = {
    // redelivery of a committed batch is a full no-op (the changelog's
    // _SUCCESS is the commit marker — [[IncrementalIndex.applyBatch]]'s
    // discipline; here a rewrite would merely be wasteful, the member
    // segment being a pure function of the batch, but the no-op keeps
    // the two indexes' replay contracts identical)
    if (SegmentLog.hfs(spark, root).exists(new org.apache.hadoop.fs.Path(
        s"$root/vecs/seq=$batchId/_SUCCESS"))) return
    // a batch at or below the horizon is a PROVABLY committed replay:
    // compaction refuses to fold a torn (present-but-uncommitted)
    // batch and the feed's ids are contractually monotone, so the only
    // way an id reaches ≤ horizon is a committed-then-compacted first
    // delivery whose ack was lost — an at-least-once redelivery this
    // no-op absorbs, exactly like the landing zone's checkpoint-head
    // rule ([[graft.streaming.UpsertFileSink.upsertBatchBucketed]]).
    // Its own _SUCCESS marker is gone (cleanup deleted the segment),
    // which is why the horizon itself must carry the idempotence.
    if (SegmentLog.compactedUpTo(spark, root).exists(batchId <= _)) return
    val centroids = spark.read.parquet(s"$root/centroids")
    val staged = batch.select(col("vec_id"), col("e"), col("op")).persist()
    try {
      // persisted: the assignment join feeds both the emptiness probe
      // and the segment write
      val assigned = IvfIndex.assignTo(
        staged.filter(col("op") =!= "D").select("vec_id", "e"), centroids)
        .persist()
      try {
        // a delete-only batch has no assignments: skip the segment
        // (and drop a previous attempt's husk) — a zero-row
        // partitionBy writes nothing readable for a later targeted read
        val memberDir = new org.apache.hadoop.fs.Path(
          s"$root/members/seq=$batchId")
        val f = SegmentLog.hfs(spark, root)
        if (assigned.isEmpty) {
          if (f.exists(memberDir)) f.delete(memberDir, true)
        } else assigned.write.mode("overwrite").partitionBy("cell")
          .parquet(s"$root/members/seq=$batchId")
        // changelog commits LAST (torn-write discipline)
        staged.select("vec_id", "op").write.mode("overwrite")
          .parquet(s"$root/vecs/seq=$batchId")
      } finally assigned.unpersist(blocking = false)
    } finally staged.unpersist(blocking = false)
    // replay hygiene: drop any cached listing of the overwritten
    // segment (see [[IncrementalIndex.applyBatch]])
    Seq("members", "vecs")
      .foreach(sub => spark.catalog.refreshByPath(s"$root/$sub"))
    if (compactEvery > 0) {
      val h = SegmentLog.compactedUpTo(spark, root).getOrElse(-1L)
      if (SegmentLog.freshSegDirs(spark, root, "vecs", h)
          .size > compactEvery)
        compact(spark, root, batchId - 1)
    }
  }

  /** The live member set — (vec_id, e, cell), each vector exactly once
    * at its newest assignment. `cellFilter` prunes the member scan to
    * the named cells BEFORE the liveness fold (partition dirs), and on
    * a compacted root the liveness side is pruned too
    * ([[SegmentLog.liveMembersPruned]]): folded member rows are live at
    * the horizon by construction, so they pay only a broadcast
    * anti-join against the ≤ compactEvery-batches fresh-key set —
    * lookup shuffle volume is independent of the folded-corpus size.
    * A root fed only delete-only batches (no member segment at all) is
    * a legitimate empty index, not a read error.
    */
  def liveMembers(spark: SparkSession, root: String,
      cellFilter: Option[Seq[Int]] = None,
      asOf: Option[Long] = None): DataFrame =
    SegmentLog.liveMembersPruned(spark, root, "members", "vecs", "vec_id",
      raw => cellFilter.fold(raw)(cs => raw.filter(col("cell").isin(cs: _*))),
      emptyPlainMembers(spark), asOf)
      .select("vec_id", "e", "cell")

  /** Top-k by cosine against a literal probe vector: rank the k fixed
    * centroids (k rows — the cheap step IVF exists for), prune the
    * member scan to the `nprobe` best cells, fold liveness, score only
    * inside. The ≤ nprobe cell-id manifest is driver-side by design
    * (the touched-bucket discipline).
    */
  def search(spark: SparkSession, root: String, probe: Seq[Double],
      topK: Int, nprobe: Int): DataFrame =
    searchView(spark, root, probe, topK, nprobe, None)

  /** TIME TRAVEL: [[search]] against the member set exactly as it
    * stood after batch `asOf` committed (each vector at its newest
    * assignment ≤ asOf) — bounded by compaction like every as-of read
    * in this repo. Reproduces yesterday's retrieval for a ranking
    * regression without restoring anything.
    */
  def searchAsOf(spark: SparkSession, root: String, probe: Seq[Double],
      topK: Int, nprobe: Int, asOf: Long): DataFrame =
    searchView(spark, root, probe, topK, nprobe, Some(asOf))

  private def searchView(spark: SparkSession, root: String,
      probe: Seq[Double], topK: Int, nprobe: Int,
      asOf: Option[Long]): DataFrame = {
    CosineSimilarity.register(spark)
    val p = array(probe.map(lit): _*)
    val ranked = spark.read.parquet(s"$root/centroids")
      .withColumn("__p", p)
      .withColumn("cell_sim", expr("cosine_sim(c, __p)"))
      .orderBy(col("cell_sim").desc, col("cell"))
      .limit(nprobe)
      .select("cell").collect().map(_.getInt(0)).toSeq
    liveMembers(spark, root, Some(ranked), asOf)
      .withColumn("__p", p)
      .withColumn("sim", round(expr("cosine_sim(e, __p)"), 4))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
      .select("vec_id", "sim")
  }

  /** COMPACTION — fold every member/changelog segment with
    * seq ≤ `upTo` into one equivalent tree, so the read-time liveness
    * fold stops growing with batch count ([[IncrementalIndex.compact]]
    * member-side; the [[SegmentLog]] marker discipline):
    *
    *  - folded members = the live assignment of each vector whose
    *    newest GLOBAL version is ≤ upTo (a vector superseded or
    *    deleted later keeps nothing here — its old rows were dead
    *    weight), still partitioned by `cell` so probe pruning costs
    *    the same after compaction as before;
    *  - folded changelog = one live (vec_id, op) row each.
    *
    * The folded tree lands out of place under `_compact/<upTo>/`, the
    * `_compacted` marker is the single publish point, and only then
    * does [[cleanupCompacted]] delete superseded segment dirs — a
    * crash anywhere leaves garbage, not corruption, and a re-run
    * converges. Batches at or below the horizon are rejected by
    * [[applyBatch]].
    */
  def compact(spark: SparkSession, root: String, upTo: Long): Unit = {
    require(SegmentLog.compactedUpTo(spark, root).forall(_ <= upTo),
      s"cannot compact $root backwards past its marker")
    // re-run at the published horizon = crashed-cleanup retry: finish
    // the cleanup, never re-fold over the tree readers resolve from
    if (SegmentLog.compactedUpTo(spark, root).contains(upTo)) {
      cleanupCompacted(spark, root); return
    }
    // refuse to fold past a torn first delivery — its redelivery would
    // wedge behind the horizon guard ([[SegmentLog.requireNoTornAtOrBelow]])
    SegmentLog.requireNoTornAtOrBelow(spark, root,
      Seq("members"), "vecs", upTo)
    // the fold is the STATE AS OF the horizon — each key's newest
    // version with seq ≤ upTo, even when a fresh (> upTo) batch later
    // superseded it: the live read's anti-join suppresses the folded
    // copy and the next fold retires it, while as-of reads between the
    // horizon and the supersession stay EXACT. (Ranking the global
    // newest first and then filtering ≤ upTo would silently drop such
    // keys from the fold and destroy the history their as-of view
    // needs — the round-16 review catch.)
    val liveOld = SegmentLog
      .latestVersionsSplit(spark, root, "vecs", "vec_id",
        beforeSeq = Some(upTo + 1))
      .filter(col("op") =!= "D")
    // payload-agnostic fold (drop the seq only): the member schema is
    // (vec_id, e, cell) on plain roots and (vec_id, codes, cell) on
    // coded roots — the liveness fold is identical. A root fed only
    // delete-only/empty batches never created the members dir
    // ([[liveMembers]] treats that as a legitimate empty index — so
    // must the fold, which still bounds the CHANGELOG); the
    // substituted schema follows the root's flavor.
    val memberLog =
      if (SegmentLog.hasBatches(spark, root, "members"))
        SegmentLog.readLog(spark, root, "members")
      else {
        val coded = SegmentLog.hfs(spark, root).exists(
          new org.apache.hadoop.fs.Path(s"$root/pq_codebook"))
        (if (coded) emptyCodedMembers(spark) else emptyPlainMembers(spark))
          .withColumn("seq", lit(0L))
      }
    val foldMembers = memberLog
      .join(liveOld.select("vec_id", "seq"), Seq("vec_id", "seq"))
      .drop("seq")
      .persist()
    try {
      val tmp = s"$root/_compact/$upTo"
      // an emptied index folds to a plain (schema-carrying) empty file
      // — partitionBy of zero rows would write nothing readable
      if (foldMembers.isEmpty)
        foldMembers.write.mode("overwrite").parquet(s"$tmp/members")
      else
        foldMembers.write.mode("overwrite").partitionBy("cell")
          .parquet(s"$tmp/members")
      liveOld.select("vec_id", "op")
        .write.mode("overwrite").parquet(s"$tmp/vecs")
      SegmentLog.publishMarker(spark, root, upTo)
    } finally foldMembers.unpersist(blocking = false)
    cleanupCompacted(spark, root)
  }

  /** Delete segment dirs and compact trees the `_compacted` marker has
    * superseded. Safe any time; a no-op without a marker. The coded
    * fit log folds with the rest: fit rows at/below the horizon are
    * committed history the [[retrainSignalCoded]] window no longer
    * needs (with an inline `compactEvery` cadence the monitor
    * effectively sees the post-horizon batches — a drift decision is
    * about RECENT arrivals by definition).
    */
  def cleanupCompacted(spark: SparkSession, root: String): Unit =
    SegmentLog.cleanup(spark, root, Seq("members", "vecs", "fit"))

  /** The RETRAIN monitor: per-cell live population and mean assignment
    * similarity, plus the overall row (cell = -1). Under a fixed
    * quantizer the incremental index is exact, but the quantizer
    * itself goes stale as the live distribution drifts away from the
    * clusters it was trained on — mean cosine between each live vector
    * and its assigned centroid is the standard quantization-error
    * monitor (inverted: lower = worse fit = wider true-neighbor
    * scatter across unprobed cells). Compare against the value
    * recorded at [[initialize]] time and rebuild to a fresh root when
    * it degrades past tolerance; the decision threshold is the
    * caller's, the measurement is one scan + one hash aggregate here.
    */
  def quantizationReport(spark: SparkSession, root: String): DataFrame = {
    CosineSimilarity.register(spark)
    val scored = liveMembers(spark, root)
      .join(broadcast(spark.read.parquet(s"$root/centroids")), Seq("cell"))
      .withColumn("__sim", expr("cosine_sim(e, c)"))
    // ONE pass over the member set: per-cell (count, sum) partials,
    // with the overall row DERIVED from the k-row per-cell frame
    // instead of a second global aggregate — the two union branches
    // share the same aggregate exchange, which exchange reuse serves
    // from one shuffle, so the liveness fold + broadcast join + cosine
    // scan runs once per monitor call, not twice (the "expensive
    // expressions recompute per consumer branch" class). avg ≡
    // sum/count, so the derived means match the direct aggregate.
    val perCell = scored.groupBy("cell")
      .agg(count(lit(1)).as("n_live"), sum(col("__sim")).as("__s"))
    perCell
      .select(col("cell"), col("n_live"),
        round(col("__s") / col("n_live"), 4).as("mean_sim"))
      .unionAll(perCell
        .agg(sum(col("n_live")).as("n_live"), sum(col("__s")).as("__s"))
        .select(lit(-1).as("cell"),
          coalesce(col("n_live"), lit(0L)).as("n_live"),
          round(col("__s") / greatest(col("n_live"), lit(1L)), 4)
            .as("mean_sim")))
      .orderBy("cell")
  }

  // ---- PQ-CODED members: the incremental IVFADC -----------------------
  //
  // At 100 TB the member segments' full float vectors ARE the storage
  // bill; FAISS's production layout stores ~32×-smaller PQ codes in
  // the inverted lists and keeps full vectors in a separate store
  // fetched only for the final rerank. Coded mode mirrors that: a
  // FROZEN per-subspace codebook ([[ProductQuantizer.trainFrom]],
  // trained once at init like the coarse quantizer, persisted at
  // `root/pq_codebook`) encodes every arrival map-side, member
  // segments hold (vec_id, codes, cell) — never the vector — and the
  // same vecs changelog folds liveness, so updates/deletes/compaction
  // work unchanged. Search is ADC: the probe's m × ksub lookup table
  // broadcasts, candidates cost m element_at's + a sum, the cells
  // outside nprobe are never read ([[searchAdc]]); the production
  // rerank joins the shortlist against an EXTERNAL full-vector store
  // ([[searchAdcRerank]]). A coded root has no full vectors, so the
  // [[quantizationReport]] monitor doesn't apply — drift is judged on
  // the plain twin or the training sample.

  private def pqM(codebook: DataFrame): Int =
    codebook.agg(max(col("sub"))).head.getInt(0) + 1

  /** Bootstrap a CODED index: coarse quantizer + frozen PQ codebook
    * trained on `vectors`, then the corpus lands as coded batch 0.
    */
  def initializeCoded(spark: SparkSession, vectors: DataFrame,
      root: String, k: Int, iters: Int, m: Int = 8, ksub: Int = 16,
      pqIters: Int = 4): Unit = {
    initializeQuantizer(spark, vectors, root, k, iters)
    val codebook = ProductQuantizer.trainFrom(spark, vectors, m, ksub,
      pqIters)
    codebook.write.mode("overwrite").parquet(s"$root/pq_codebook")
    recordAdcBaseline(spark, root, vectors, codebook, m)
    graft.Materialize.release(codebook)
    recordBootstrapSeq(spark, root, 0L)
    applyBatchCoded(spark, root, vectors.withColumn("op", lit("I")), 0L)
  }

  /** Record the corpus-sized BULK-LOAD batch id so
    * [[retrainSignalCoded]] can exclude it: its fit is the baseline by
    * construction, and n-weighting it into the recent-arrivals window
    * would mask drift for the first window−1 batches after every init
    * or retrain (100k baseline rows drown 1k drifted ones).
    */
  private def recordBootstrapSeq(spark: SparkSession, root: String,
      seq: Long): Unit =
    graft.ControlFiles.atomicWrite(SegmentLog.hfs(spark, root),
      new org.apache.hadoop.fs.Path(root, "_bootstrap_seq"), seq.toString)

  /** Record the training sample's mean PQ reconstruction cosine as the
    * CODED root's drift baseline (`_adc_fit`) — the coded twin of
    * `_train_fit`: a coded root stores no vectors, so its drift
    * monitor compares WRITE-time fit partials
    * ([[applyBatchCoded]]'s per-batch fit log) against this value.
    */
  private def recordAdcBaseline(spark: SparkSession, root: String,
      sample: DataFrame, codebook: DataFrame, m: Int): Unit = {
    val r = ProductQuantizer.reconFitStats(sample, codebook, m).head
    val fit0 =
      if (r.getLong(0) == 0L) 1.0
      else r.getDouble(1) / r.getLong(0)
    graft.ControlFiles.atomicWrite(SegmentLog.hfs(spark, root),
      new org.apache.hadoop.fs.Path(root, "_adc_fit"), fit0.toString)
  }

  /** [[applyBatch]] for a CODED root: I/U assigns the vector's nearest
    * fixed cell AND its PQ codes (both map-side against broadcast
    * tables); the member segment stores (vec_id, codes, cell) only.
    * Same changelog commit point, idempotence, horizon guard and
    * inline-compaction cadence as the plain path.
    */
  def applyBatchCoded(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long, compactEvery: Int = 0): Unit = {
    if (SegmentLog.hfs(spark, root).exists(new org.apache.hadoop.fs.Path(
        s"$root/vecs/seq=$batchId/_SUCCESS"))) return
    // committed-then-compacted redelivery no-ops at/below the horizon
    // (see [[applyBatch]] — the checkpoint-head rule)
    if (SegmentLog.compactedUpTo(spark, root).exists(batchId <= _)) return
    val centroids = spark.read.parquet(s"$root/centroids")
    val codebook = spark.read.parquet(s"$root/pq_codebook")
    val m = pqM(codebook)
    val staged = batch.select(col("vec_id"), col("e"), col("op")).persist()
    try {
      val upserts = staged.filter(col("op") =!= "D").select("vec_id", "e")
      val coded = IvfIndex.assignTo(upserts, centroids)
        .select("vec_id", "cell")
        .join(ProductQuantizer.encode(upserts, codebook, m), Seq("vec_id"))
        .select("vec_id", "codes", "cell")
        .persist()
      try {
        val memberDir = new org.apache.hadoop.fs.Path(
          s"$root/members/seq=$batchId")
        val fitDir = new org.apache.hadoop.fs.Path(
          s"$root/fit/seq=$batchId")
        val f = SegmentLog.hfs(spark, root)
        if (coded.isEmpty) {
          if (f.exists(memberDir)) f.delete(memberDir, true)
          if (f.exists(fitDir)) f.delete(fitDir, true)
        } else {
          coded.write.mode("overwrite").partitionBy("cell")
            .parquet(s"$root/members/seq=$batchId")
          // per-batch ADC-fit partials (one tiny (n, fit_sum) row):
          // the coded root stores no vectors, so drift is measured NOW
          // while the batch still carries its embeddings — the data
          // the [[retrainSignalCoded]] monitor folds. Written before
          // the changelog like every data segment (the torn-write
          // discipline: an uncommitted fit row is never read).
          ProductQuantizer.reconFitStats(upserts, codebook, m)
            .write.mode("overwrite").parquet(s"$root/fit/seq=$batchId")
        }
        staged.select("vec_id", "op").write.mode("overwrite")
          .parquet(s"$root/vecs/seq=$batchId")
      } finally coded.unpersist(blocking = false)
    } finally staged.unpersist(blocking = false)
    Seq("members", "vecs", "fit")
      .foreach(sub => spark.catalog.refreshByPath(s"$root/$sub"))
    if (compactEvery > 0) {
      val h = SegmentLog.compactedUpTo(spark, root).getOrElse(-1L)
      if (SegmentLog.freshSegDirs(spark, root, "vecs", h)
          .size > compactEvery)
        compact(spark, root, batchId - 1)
    }
  }

  /** The live CODED member set — (vec_id, codes, cell), each vector
    * exactly once at its newest assignment; `cellFilter` prunes at the
    * partition level like [[liveMembers]].
    */
  def liveCodedMembers(spark: SparkSession, root: String,
      cellFilter: Option[Seq[Int]] = None,
      asOf: Option[Long] = None): DataFrame =
    SegmentLog.liveMembersPruned(spark, root, "members", "vecs", "vec_id",
      raw => cellFilter.fold(raw)(cs =>
        raw.filter(col("cell").isin(cs: _*))),
      emptyCodedMembers(spark), asOf)
      .select("vec_id", "codes", "cell")

  /** ADC top-k over a coded root: rank the k fixed centroids against
    * the probe (k rows), prune the member scan to the `nprobe` best
    * cells, fold liveness, then score ONLY codes — m table lookups +
    * a sum per candidate, never a full vector read.
    */
  def searchAdc(spark: SparkSession, root: String, probe: Seq[Double],
      topK: Int, nprobe: Int): DataFrame =
    searchAdcView(spark, root, probe, topK, nprobe, None)

  /** TIME TRAVEL for the coded root — [[searchAdc]] against the code
    * set exactly as it stood after batch `asOf` committed, bounded by
    * compaction like [[searchAsOf]] (the plain root's twin).
    */
  def searchAdcAsOf(spark: SparkSession, root: String,
      probe: Seq[Double], topK: Int, nprobe: Int,
      asOf: Long): DataFrame =
    searchAdcView(spark, root, probe, topK, nprobe, Some(asOf))

  private def searchAdcView(spark: SparkSession, root: String,
      probe: Seq[Double], topK: Int, nprobe: Int,
      asOf: Option[Long]): DataFrame = {
    CosineSimilarity.register(spark)
    val p = array(probe.map(lit): _*)
    val ranked = spark.read.parquet(s"$root/centroids")
      .withColumn("__p", p)
      .withColumn("cell_sim", expr("cosine_sim(c, __p)"))
      .orderBy(col("cell_sim").desc, col("cell"))
      .limit(nprobe)
      .select("cell").collect().map(_.getInt(0)).toSeq
    val codebook = spark.read.parquet(s"$root/pq_codebook")
    val lut = ProductQuantizer.adcLut(codebook, probe, pqM(codebook))
    ProductQuantizer.adcScoreCodes(
        liveCodedMembers(spark, root, Some(ranked), asOf)
          .select("vec_id", "codes"), lut)
      .select(col("vec_id"), round(col("approx_sim"), 4).as("approx_sim"))
      .orderBy(col("approx_sim").desc, col("vec_id"))
      .limit(topK)
  }

  /** The coded search with a BARE-FRAME vector store — a
    * FIXTURE-SCALE FALLBACK: the broadcast semi-join keeps only the
    * shortlist's `pool` rows but still SCANS every file of `vectors`
    * map-side, per query. Production deployments must pass the store
    * as a bucketed handle ([[searchAdcRerankStore]]) so the fetch I/O
    * is proportional to the shortlist, not the store. `asOf` bounds
    * the CODE view only (the frame is whatever version the caller
    * resolved).
    */
  def searchAdcRerank(spark: SparkSession, root: String,
      probe: Seq[Double], vectors: DataFrame, topK: Int, nprobe: Int,
      pool: Int = 50, asOf: Option[Long] = None): DataFrame = {
    val shortlist = searchAdcView(spark, root, probe, pool, nprobe, asOf)
      .select("vec_id")
    rerankExact(spark, probe,
      vectors.join(broadcast(shortlist), Seq("vec_id")), topK)
  }

  /** The PRODUCTION coded search: ADC shortlists `pool` candidates
    * from the codes alone (cell-pruned, liveness-split), then ONLY the
    * shortlist's full vectors are fetched from the external store via
    * [[graft.streaming.UpsertFileSink.fetchByKeys]] — the read lists
    * just the bucket dirs the ≤ `pool` shortlist ids hash into, so
    * per-query store I/O is proportional to the shortlist, never the
    * corpus (the index itself stores no float vector). The store rows
    * must carry (vec_id, e). `asOf` bounds BOTH the code view and the
    * store version — the replay/debug read.
    */
  def searchAdcRerankStore(spark: SparkSession, root: String,
      probe: Seq[Double],
      store: graft.streaming.UpsertFileSink.BucketedStore,
      topK: Int, nprobe: Int, pool: Int = 50,
      asOf: Option[Long] = None): DataFrame = {
    val shortlist = searchAdcView(spark, root, probe, pool, nprobe, asOf)
      .select("vec_id")
    rerankExact(spark, probe,
      graft.streaming.UpsertFileSink
        .fetchByKeys(spark, store, shortlist, asOf), topK)
  }

  /** The exact-cosine rerank shared by both store shapes: score the
    * already-pruned candidate vectors against the probe, top-k.
    */
  private def rerankExact(spark: SparkSession, probe: Seq[Double],
      candVecs: DataFrame, topK: Int): DataFrame = {
    CosineSimilarity.register(spark)
    val p = array(probe.map(lit): _*)
    candVecs
      .withColumn("__p", p)
      .select(col("vec_id"),
        round(expr("cosine_sim(e, __p)"), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }

  // ---- BATCHED probes: one plan for a whole probe set ----------------
  //
  // The per-probe search functions pay driver/job overhead per call —
  // a retrieval consumer issuing thousands of probes per tick
  // multiplies it by |probes|. The batch twins below take a
  // (probe_id, e) frame and answer every probe in ONE plan whose job
  // count is O(1) in |probes|: the per-probe driver-side cell manifest
  // becomes a per-probe rank WINDOW over the (small, broadcast)
  // centroid table plus one UNION manifest for the partition pruning,
  // and per-probe ordering/limits become rank windows partitioned by
  // probe_id. Per-probe results are pinned row-equal to the
  // single-probe functions (IncrementalIvfSpec).

  /** Each probe's `nprobe` best cells: (probe_id, cell). The centroid
    * table is k rows — broadcast, ranked per probe by the same
    * (cell_sim desc, cell) order as the single-probe manifest.
    */
  private def probeCellsOf(spark: SparkSession, root: String,
      probes: DataFrame, nprobe: Int): DataFrame = {
    CosineSimilarity.register(spark)
    val cent = spark.read.parquet(s"$root/centroids")
    probes.select(col("probe_id"), col("e").as("pe"))
      .crossJoin(broadcast(cent))
      .withColumn("cell_sim", expr("cosine_sim(c, pe)"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("probe_id")
          .orderBy(col("cell_sim").desc, col("cell"))))
      .filter(col("__rn") <= nprobe)
      .select("probe_id", "cell")
  }

  /** BATCHED [[search]]: every probe's exact top-k over its own
    * nprobe-pruned cells, one member read pruned to the UNION of all
    * probes' cells (a ≤ k-cell driver manifest — bounded by the
    * centroid count, not the probe count): (probe_id, vec_id, sim).
    */
  def searchBatch(spark: SparkSession, root: String, probes: DataFrame,
      topK: Int, nprobe: Int, asOf: Option[Long] = None): DataFrame = {
    val pc = probeCellsOf(spark, root, probes, nprobe)
    val cells = pc.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    liveMembers(spark, root, Some(cells), asOf)
      .join(broadcast(pc), Seq("cell"))
      .join(broadcast(probes.select(col("probe_id"), col("e").as("pe"))),
        Seq("probe_id"))
      .withColumn("sim", round(expr("cosine_sim(e, pe)"), 4))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("probe_id")
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("__rn") <= topK)
      .select("probe_id", "vec_id", "sim")
  }

  /** BATCHED [[searchAdc]]: per-probe ADC lookup tables come from
    * [[ProductQuantizer.adcLutBatch]] (|probes| × m × ksub doubles,
    * broadcast), candidates are scored only against the probes that
    * shortlisted their cell: (probe_id, vec_id, approx_sim).
    */
  def searchAdcBatch(spark: SparkSession, root: String,
      probes: DataFrame, topK: Int, nprobe: Int,
      asOf: Option[Long] = None): DataFrame = {
    val pc = probeCellsOf(spark, root, probes, nprobe)
    val cells = pc.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val codebook = spark.read.parquet(s"$root/pq_codebook")
    val lut = ProductQuantizer.adcLutBatch(codebook, probes,
      pqM(codebook))
    ProductQuantizer.adcScoreCodesBatch(
        liveCodedMembers(spark, root, Some(cells), asOf)
          .join(broadcast(pc), Seq("cell"))
          .select("probe_id", "vec_id", "codes"), lut)
      .select(col("probe_id"), col("vec_id"),
        round(col("approx_sim"), 4).as("approx_sim"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("probe_id")
          .orderBy(col("approx_sim").desc, col("vec_id"))))
      .filter(col("__rn") <= topK)
      .select("probe_id", "vec_id", "approx_sim")
  }

  /** BATCHED [[searchAdcRerankStore]]: ADC-shortlist `pool`
    * candidates per probe, fetch the UNION of all shortlists' vectors
    * from the bucketed store ONCE (I/O pruned to the union's buckets),
    * rerank each probe exactly: (probe_id, vec_id, sim). The
    * shortlist frame is persisted for the fetch manifest + the rerank
    * join (released by the session's `Materialize.releaseAll`).
    */
  def searchAdcRerankStoreBatch(spark: SparkSession, root: String,
      probes: DataFrame,
      store: graft.streaming.UpsertFileSink.BucketedStore,
      topK: Int, nprobe: Int, pool: Int = 50,
      asOf: Option[Long] = None): DataFrame = {
    val shortlist = graft.Materialize.checkpointLazy(
      searchAdcBatch(spark, root, probes, pool, nprobe, asOf)
        .select("probe_id", "vec_id"))
    val fetched = graft.streaming.UpsertFileSink.fetchByKeys(spark,
      store, shortlist.select("vec_id"), asOf)
      .select(col("vec_id"), col("e"))
    shortlist
      .join(fetched, Seq("vec_id"))
      .join(broadcast(probes.select(col("probe_id"), col("e").as("pe"))),
        Seq("probe_id"))
      .withColumn("sim", round(expr("cosine_sim(e, pe)"), 4))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("probe_id")
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("__rn") <= topK)
      .select("probe_id", "vec_id", "sim")
  }

  // ---- aliased generations: the retrain CUTOVER protocol -------------
  //
  // A retrain is a bulk rebuild to a FRESH generation root while
  // readers keep serving the old one; the mechanics (alias marker,
  // fresh-name allocation, atomic flip, orphan GC) live in
  // [[SegmentLog.Alias]], shared with [[IncrementalIndex]]'s
  // blue/green reindex — this index owns only the rebuild semantics
  // (retrain quantizers on the live distribution, re-add live
  // vectors).

  /** The live generation root under `parent` (fails fast on an
    * un-aliased parent). One control-file read per resolution.
    */
  def activeRoot(spark: SparkSession, parent: String): String =
    SegmentLog.Alias.resolve(spark, parent)

  /** [[initialize]] into generation `g0` under `parent` and publish
    * the alias — the bootstrap of an aliased (retrainable) index.
    */
  def initializeAliased(spark: SparkSession, vectors: DataFrame,
      parent: String, k: Int, iters: Int): Unit = {
    SegmentLog.Alias.requireUnaliased(spark, parent)
    initialize(spark, vectors, s"$parent/g0", k, iters)
    SegmentLog.Alias.publish(spark, parent, "g0")
  }

  /** [[initializeCoded]] into generation `g0` under `parent` and
    * publish the alias — the coded twin of [[initializeAliased]].
    */
  def initializeCodedAliased(spark: SparkSession, vectors: DataFrame,
      parent: String, k: Int, iters: Int, m: Int = 8, ksub: Int = 16,
      pqIters: Int = 4): Unit = {
    SegmentLog.Alias.requireUnaliased(spark, parent)
    initializeCoded(spark, vectors, s"$parent/g0", k, iters, m, ksub,
      pqIters)
    SegmentLog.Alias.publish(spark, parent, "g0")
  }

  /** [[applyBatch]] against the live generation. */
  def applyBatchActive(spark: SparkSession, parent: String,
      batch: DataFrame, batchId: Long, compactEvery: Int = 0): Unit =
    applyBatch(spark, activeRoot(spark, parent), batch, batchId,
      compactEvery)

  /** [[search]] against the live generation. */
  def searchActive(spark: SparkSession, parent: String,
      probe: Seq[Double], topK: Int, nprobe: Int): DataFrame =
    search(spark, activeRoot(spark, parent), probe, topK, nprobe)

  /** RETRAIN with atomic cutover: train a fresh quantizer on the live
    * distribution (what [[retrainSignal]] said the old one no longer
    * fits), bulk re-add the live vectors into a NEW generation root,
    * then flip the `_active` alias — returns the new root. Searches
    * during the rebuild serve the old generation unchanged; a crash
    * before the flip leaves it active (re-run converges into yet
    * another fresh generation). The re-add lands as the old log's
    * newest batch id, so the external CDC feed's strictly-monotone
    * ids keep working across the flip; the old generation stays on
    * disk for in-flight readers until [[cleanupGenerations]].
    */
  def retrainCutover(spark: SparkSession, parent: String, k: Int,
      iters: Int): String = {
    val oldRoot = activeRoot(spark, parent)
    // a never-fed generation has nothing stale and no issued batch id
    // to reuse — rebuilding would claim id 0 and silently swallow the
    // feed's real first batch as an idempotence no-op
    require(SegmentLog.hasBatches(spark, oldRoot, "vecs"),
      s"nothing to rebuild: $oldRoot never received a batch — feed it " +
        "directly (applyBatchActive)")
    val gen = SegmentLog.Alias.nextGen(spark, parent)
    val newRoot = s"$parent/$gen"
    // materialize the live set ONCE: it feeds the k-means passes, the
    // re-add, and the new training-fit baseline
    val live = liveMembers(spark, oldRoot).select("vec_id", "e").persist()
    try {
      val lastBatch = SegmentLog.lastSeq(spark, oldRoot, "vecs")
      initializeQuantizer(spark, live, newRoot, k, iters)
      applyBatch(spark, newRoot,
        live.withColumn("op", lit("I")), lastBatch)
      // WRITE FENCE before the flip: the cutover assumes a single
      // writer (retrain in the feed's quiesce window). If a concurrent
      // feed landed batches on the old generation after the live-set
      // snapshot, flipping would silently lose them — abort loudly
      // instead; the old generation stays active and a re-run picks up
      // the newer state.
      val nowLast = SegmentLog.lastSeq(spark, oldRoot, "vecs")
      require(nowLast == lastBatch,
        s"batch(es) landed on $oldRoot during the rebuild (last id " +
          s"$lastBatch -> $nowLast) — flip aborted; re-run the cutover")
      // the commit point: readers cut over here, atomically
      SegmentLog.Alias.publish(spark, parent, gen)
    } finally live.unpersist(blocking = false)
    newRoot
  }

  /** [[retrainCutover]] for a CODED generation: the index stores no
    * vectors, so the rebuild joins the old root's live vec_ids against
    * the EXTERNAL full-vector store `vectors` (vec_id, e) — the same
    * store [[searchAdcRerank]] reranks from — then trains the fresh
    * coarse quantizer AND a fresh PQ codebook on that live set,
    * re-encodes it into the new generation, and flips the alias.
    * Identical crash contract to the plain cutover.
    */
  def retrainCutoverCoded(spark: SparkSession, parent: String,
      vectors: DataFrame, k: Int, iters: Int, m: Int = 8, ksub: Int = 16,
      pqIters: Int = 4): String = {
    val oldRoot = activeRoot(spark, parent)
    require(SegmentLog.hasBatches(spark, oldRoot, "vecs"),
      s"nothing to rebuild: $oldRoot never received a batch — feed it " +
        "directly (applyBatchCoded on the active root)")
    val gen = SegmentLog.Alias.nextGen(spark, parent)
    val newRoot = s"$parent/$gen"
    val liveIds = latestVecVersions(spark, oldRoot)
      .filter(col("op") =!= "D").select("vec_id")
    val live = vectors.join(liveIds, Seq("vec_id"))
      .select("vec_id", "e").persist()
    try {
      val lastBatch = SegmentLog.lastSeq(spark, oldRoot, "vecs")
      initializeQuantizer(spark, live, newRoot, k, iters)
      val codebook = ProductQuantizer.trainFrom(spark, live, m, ksub,
        pqIters)
      codebook.write.mode("overwrite").parquet(s"$newRoot/pq_codebook")
      // the rebuilt generation gets a FRESH drift baseline: the live
      // set's fit under the codebook just trained on it — the next
      // [[retrainSignalCoded]] judges arrivals against this
      recordAdcBaseline(spark, newRoot, live, codebook, m)
      graft.Materialize.release(codebook)
      recordBootstrapSeq(spark, newRoot, lastBatch)
      applyBatchCoded(spark, newRoot,
        live.withColumn("op", lit("I")), lastBatch)
      // write fence before the flip — see [[retrainCutover]]
      val nowLast = SegmentLog.lastSeq(spark, oldRoot, "vecs")
      require(nowLast == lastBatch,
        s"batch(es) landed on $oldRoot during the rebuild (last id " +
          s"$lastBatch -> $nowLast) — flip aborted; re-run the cutover")
      SegmentLog.Alias.publish(spark, parent, gen)
    } finally live.unpersist(blocking = false)
    newRoot
  }

  /** Delete every non-active generation under `parent` — run once no
    * in-flight reader can still hold the old alias (the caller's
    * quiesce window, like vacuum retention).
    */
  def cleanupGenerations(spark: SparkSession, parent: String): Unit =
    SegmentLog.Alias.cleanup(spark, parent)

  /** The self-contained RETRAIN decision: (fire?, baseline, current) —
    * current live mean assignment cosine vs the training-time fit
    * [[initializeQuantizer]] recorded at `root/_train_fit`, fired when
    * the degradation exceeds `tolerance`. A retrain is then
    * `IvfIndex.buildFrom` into a fresh root + a bulk re-add (the bulk
    * decision the scaladoc above describes); nothing here mutates.
    */
  def retrainSignal(spark: SparkSession, root: String,
      tolerance: Double = 0.05): (Boolean, Double, Double) = {
    val p = new org.apache.hadoop.fs.Path(root, "_train_fit")
    val f = SegmentLog.hfs(spark, root)
    require(f.exists(p), s"$root has no recorded training fit")
    val baseline = graft.ControlFiles.readFully(f, p).trim.toDouble
    // a bootstrapped-but-empty index (quantizer trained, no batch yet)
    // or one whose live set emptied has nothing to judge: stay quiet
    // and report the baseline as current rather than crashing a
    // scheduled monitor job on a missing dir / null mean
    val hasMembers =
      f.exists(new org.apache.hadoop.fs.Path(s"$root/members")) ||
        f.exists(new org.apache.hadoop.fs.Path(s"$root/_compact"))
    if (!hasMembers) return (false, baseline, baseline)
    val rows = quantizationReport(spark, root)
      .filter(col("cell") === -1).select("mean_sim").collect()
    if (rows.isEmpty || rows.head.isNullAt(0))
      return (false, baseline, baseline)
    val current = rows.head.getDouble(0)
    (baseline - current > tolerance, baseline, current)
  }

  /** The CODED root's retrain decision: (fire?, baseline, current) —
    * the weighted mean PQ reconstruction cosine of the newest `window`
    * committed upsert batches (the per-batch fit partials
    * [[applyBatchCoded]] logged at write time) against the
    * training-time `_adc_fit` baseline [[initializeCoded]] /
    * [[retrainCutoverCoded]] recorded. The coded members hold codes,
    * never vectors, so this is the drift monitor such a root CAN run:
    * O(window) one-row reads, no corpus pass, no external store.
    * Fired, the loop closes with [[retrainCutoverCoded]]. Quiet (and
    * baseline-reported) when no committed upsert batch is visible —
    * a scheduled monitor must not crash on a virgin or delete-only
    * root.
    */
  def retrainSignalCoded(spark: SparkSession, root: String,
      tolerance: Double = 0.05, window: Int = 3)
      : (Boolean, Double, Double) = {
    val f = SegmentLog.hfs(spark, root)
    val bp = new org.apache.hadoop.fs.Path(root, "_adc_fit")
    require(f.exists(bp),
      s"$root has no recorded ADC fit baseline (not a coded root?)")
    val baseline = graft.ControlFiles.readFully(f, bp).trim.toDouble
    val fitDir = new org.apache.hadoop.fs.Path(s"$root/fit")
    if (!f.exists(fitDir)) return (false, baseline, baseline)
    val horizon = SegmentLog.compactedUpTo(spark, root).getOrElse(-1L)
    // the corpus-sized bootstrap batch (init / cutover bulk load) is
    // the baseline by construction — n-weighting it into the window
    // would let 100k baseline rows drown 1k drifted arrivals and mask
    // drift for the first window−1 batches after every retrain
    val bootSeq = {
      val p = new org.apache.hadoop.fs.Path(root, "_bootstrap_seq")
      if (f.exists(p))
        Some(graft.ControlFiles.readFully(f, p).trim.toLong)
      else None
    }
    // commit gating: a fit segment counts iff its batch's changelog
    // committed (vecs _SUCCESS) or the horizon proves it — a torn
    // first delivery's fit partial must never skew the monitor
    val ids = f.listStatus(fitDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("seq=") &&
        n.stripPrefix("seq=").forall(_.isDigit))
      .map(_.stripPrefix("seq=").toLong)
      .filter(id => !bootSeq.contains(id))
      .filter(id => id <= horizon || f.exists(
        new org.apache.hadoop.fs.Path(s"$root/vecs/seq=$id/_SUCCESS")))
      .sorted.takeRight(window)
    if (ids.isEmpty) return (false, baseline, baseline)
    val r = spark.read
      .parquet(ids.map(id => s"$root/fit/seq=$id"): _*)
      .agg(sum("n"), sum("fit_sum")).head
    if (r.isNullAt(0) || r.getLong(0) == 0L)
      return (false, baseline, baseline)
    val current = r.getDouble(1) / r.getLong(0)
    (baseline - current > tolerance, baseline, current)
  }
}

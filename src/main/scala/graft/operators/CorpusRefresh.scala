package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.UpsertFileSink

/** INCREMENTAL corpus refresh — the operation a production corpus
  * actually runs daily: new documents arrive (a crawl delta, a CDC
  * batch from the landing zone) and the curation verdicts must update
  * WITHOUT re-scanning the 100 TB corpus. [[CorpusPipeline.curate]]'s
  * verdicts are pure functions of the corpus, so the refresh problem
  * is precisely "which verdicts can an arrival change, and where do
  * their inputs live":
  *
  *  - the three dedup keeper verdicts are rank-1 windows over the
  *    doc's digest / norm_sig / minhash-signature group — an arrival
  *    can only perturb the GROUPS it joins, plus the one-directional
  *    cascade those perturbations feed (exact → norm → near: a doc
  *    demoted at the exact stage re-orders its norm group, which can
  *    re-order sg groups — never backwards);
  *  - the quality verdict is per-row arithmetic.
  *
  * So the refresh state is the thin per-doc flags row (keys +
  * verdicts, ~100 bytes — never text), persisted THREE ways in
  * [[graft.streaming.UpsertFileSink]] bucketed landing zones — one
  * projection bucketed by each group key — so each cascade expansion
  * is a PRUNED read of only the buckets the delta's keys hash into
  * (`readBucketsBucketed`; with the compacted manifest the lookup
  * cost is independent of corpus size). The space-for-locality
  * trade (3× thin rows) is the standard secondary-index recipe.
  *
  * Refresh then recomputes verdicts over the bounded AFFECTED frame
  * only, with a group-level "recompute?" mark per stage: a group is
  * recomputed iff it contains a delta doc or a doc whose prior-stage
  * verdict may have changed — and because each expansion pulled WHOLE
  * groups for exactly those keys, a group marked for recompute is
  * always complete in the frame, while an incomplete group is
  * provably unmarked (its members' stored verdicts are reused).
  * CorpusRefreshSpec pins refresh ≡ full-curate equivalence per doc
  * after every arrival batch, including keeper-steal demotions,
  * and that unaffected docs' rows are untouched.
  *
  * Arrival forms: [[refresh]] takes ADDS with fresh doc_ids (the
  * common corpus-refresh case — a re-crawled page is a new doc the
  * dedup stages themselves reconcile); [[refreshCdc]] takes a full
  * I/U/D changelog (takedowns, opt-outs, in-place re-crawls). The
  * mutation recipe is the [[IncrementalIndex]] changelog's, applied
  * to the flags state: a FOURTH projection `by_id` (bucketed by
  * doc_id — the primary index) resolves each arrival's OLD flags row;
  * the old row tombstones out of every projection (op D at a lower
  * within-batch seq than the replacement row, so an update whose
  * group keys moved cleans its old buckets and one whose keys stayed
  * collapses to the U row), and the groups that LOST a member re-rank
  * exactly like the groups that gained one — a deleted keeper's
  * runner-up promotes through the same keeper-steal machinery.
  *
  * Scale audit: per refresh, driver-side work is four ≤ nBuckets
  * bucket-id manifests (the landing zone's own discipline); every
  * shuffle (windows over the affected frame, semi-joins, staged
  * bucket merges) is bounded by |delta| + |touched groups| + |touched
  * buckets|, never |corpus|. [[initialize]] is the one-time bulk
  * load and IS corpus-sized by definition.
  */
object CorpusRefresh {

  /** The persisted flags row. `sg_key` is the minhash signature
    * joined to one string (bijective — 8 fixed-width hex components)
    * so it can key a bucket hash and a semi-join directly.
    */
  val stateSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_toks", LongType),
    StructField("alpha_ratio", DoubleType),
    StructField("digest", StringType),
    StructField("norm_sig", StringType),
    StructField("sg_key", StringType),
    StructField("k_exact", BooleanType),
    StructField("k_norm", BooleanType),
    StructField("k_near", BooleanType),
    StructField("quality_ok", BooleanType),
    // the learned pipeline's per-doc score, stored so a refresh never
    // rescores unaffected docs; null under the heuristic quality stage
    StructField("quality_score", DoubleType),
    // eval-set contaminated-token fraction ([[Decontaminate.report]]),
    // stored so a refresh never re-scrubs unaffected docs; null when
    // the pipeline runs without an eval scrub
    StructField("contamination", DoubleType),
    // [[BandedVerify]]'s verdict, stored as FIRST-CLASS state: the
    // demotion must survive later rank-1 recomputes of the doc's
    // cascade groups (a new group member or a lost member re-ranks the
    // group, and without this flag the banded near-dup would silently
    // re-promote — the drop-only invariant enforced, not advised).
    // False on cascade-only pipelines; a doc it marks also keeps its
    // group-mates demoted (they near-duplicate a demoted doc).
    StructField("banded_dup", BooleanType)))

  /** A per-row quality scorer: (docs with doc_id, text) →
    * (doc_id, quality_score). MUST be deterministic and map-side
    * (e.g. a FROZEN [[QualityClassifier.Model]] — retraining between
    * refreshes would silently re-judge old docs; a retrain is a full
    * re-curate by definition).
    */
  type Scorer = DataFrame => DataFrame

  /** A FROZEN eval-set scrub for the refresh path: arrivals are
    * checked against `evalSet` ([[Decontaminate.report]]'s broadcast
    * span-hash semi-join — delta-bounded, the corpus never rescans)
    * and a doc whose contaminated-token fraction exceeds
    * `maxFraction` is excluded from the kept set exactly like
    * [[CorpusPipeline.curateLearned]]'s decontamination stage. The
    * eval suite MUST be held fixed across initialize/refresh — the
    * per-doc fraction is row-local state, so growing the suite
    * between refreshes would silently leave old docs judged against
    * the smaller suite; an eval-suite change is a full re-curate by
    * definition (the retrain rule's twin).
    */
  final case class EvalScrub(evalSet: DataFrame, w: Int = 13,
      maxFraction: Double = 0.0)

  /** BANDED near-dup verification for the refresh path — the
    * composition of the [[IncrementalLsh]] dedup-at-ingest index into
    * curation verdicts. The cascade's own near stage keys on exact
    * full-signature equality (`sg_key`), which misses pairs whose
    * signatures agree in only SOME bands — precisely the recall the
    * banded index exists to provide. With a `BandedVerify` configured,
    * each arrival additionally probes `lshRoot` (fed by the same
    * production loop that feeds the other stores), its band-bucket
    * candidates are verified by EXACT token-3-shingle Jaccard (the
    * `q_dedup_jaccard` set algebra — candidate texts come from
    * `textSource`, the authoritative doc store, pruned to the ≤
    * b·|batch| candidate ids), and an arrival with a verified
    * candidate ≥ `threshold` that is KEPT in the state as of the
    * previous batch is demoted (k_near and quality_ok forced false).
    *
    * Semantics and bounds: the stage fires only on pairs the cascade
    * CANNOT see (all three cascade keys differ — pairs sharing a
    * digest/norm_sig/sg_key stay the cascade's jurisdiction, where the
    * smaller-id keeper rule may legitimately favor the arrival; the
    * banded stage ADDS recall, it never overrides a keeper decision),
    * CROSS-BATCH only (within-batch near-dups are the sg_key cascade's
    * job; a candidate first seen in this same batch has no prior-state
    * row and is ignored), judged
    * against the PREVIOUS committed state (a keeper deleted in the
    * same batch still demotes this once — one-batch lag), and
    * DROP-ONLY monotone: a banded demotion is never re-promoted when
    * its keeper later leaves the corpus, and an op=U re-arrival of the
    * demoted doc inherits the stored flag rather than re-judging (a
    * byte-identical redelivered U must not re-admit; the sanctioned
    * re-admission path is an explicit D followed by a fresh I — the
    * standard production near-dup posture: re-admitting text that once
    * duplicated the corpus needs a human decision, not a cascade).
    *
    * REPLAY DETERMINISM: the index probe and every state/text pull run
    * AS OF the previous batch — a redelivered refresh that re-runs
    * after the LSH store absorbed the same batch id (lost ack after
    * the capstone body's lsh step) sees the identical band rows and
    * returns the identical delta. This assumes the composed stores
    * share the feed's batch ids (the capstone's own contract) and is
    * bounded by the LSH store's compaction horizon exactly like every
    * as-of read.
    *
    * Candidate texts come from `textStore` when given — a BUCKETED
    * handle to the authoritative doc store, read as-of via the
    * ≤ nBuckets manifest so the fetch I/O is proportional to the
    * candidate set, never the store ([[graft.streaming.UpsertFileSink
    * .fetchByKeys]]) — or from the bare `textSource` frame otherwise
    * (semi-join row-pruned but scanned map-side, and a LIVE view: a
    * replay may see updated texts; prefer the handle).
    *
    * Cost per refresh: one O(|batch|) index probe + one pruned by_id
    * read + one bucket-pruned text fetch + Jaccard over candidate
    * pairs — never a corpus scan.
    */
  final case class BandedVerify(lshRoot: String,
      textSource: DataFrame = null,
      threshold: Double = 0.5,
      textStore: Option[graft.streaming.UpsertFileSink.BucketedStore] =
        None) {
    require(textStore.isDefined || textSource != null,
      "BandedVerify needs a candidate text source: a bucketed " +
        "textStore handle (preferred) or a bare textSource frame")
  }

  /** EMBEDDING near-dup verification for the refresh path — the
    * [[BandedVerify]] recipe on the vector modality, composing the
    * [[IncrementalEmbedLsh]] dedup-at-ingest index into curation
    * verdicts: the multimodal corpus this engine targets dedups on
    * embeddings precisely where text differs (re-encodes,
    * translations, crops). `probeVectors` carries THIS batch's
    * arrival embeddings as (doc_id, e) — the ingest loop lands
    * vectors under the document's id (the capstone contract); an
    * arrival with no vector row simply never probes. Band-bucket
    * candidates are verified by EXACT cosine against the external
    * vector store — `vectorStore` (a bucketed handle, fetch pruned to
    * the candidate ids' buckets, read as-of) or the bare
    * `vectorSource` frame — and an arrival with a verified candidate
    * ≥ `minSim` that is KEPT as of the previous batch is demoted.
    *
    * Jurisdiction, cross-batch-only, one-batch lag, drop-only
    * monotonicity (persisted through the SAME `banded_dup` state flag
    * — "demoted by an out-of-band near-dup verify", whichever
    * modality produced it) and as-of replay determinism are all
    * byte-identical to [[BandedVerify]]'s.
    */
  final case class EmbedVerify(elshRoot: String,
      probeVectors: DataFrame,
      vectorSource: DataFrame = null,
      minSim: Double = 0.9,
      vectorStore: Option[graft.streaming.UpsertFileSink.BucketedStore] =
        None) {
    require(vectorStore.isDefined || vectorSource != null,
      "EmbedVerify needs a candidate vector source: a bucketed " +
        "vectorStore handle (preferred) or a bare vectorSource frame")
  }

  private val stateCols = stateSchema.fieldNames.toSeq

  private def byId(root: String) = s"$root/by_id"
  private def byDigest(root: String) = s"$root/by_digest"
  private def byNorm(root: String) = s"$root/by_norm"
  private def bySg(root: String) = s"$root/by_sg"

  private def rank1(part: String, prior: Column) =
    row_number().over(Window.partitionBy(col(part))
      .orderBy(when(prior, 0).otherwise(1), col("doc_id"))) === 1 && prior

  /** Thin flag inputs (no toks) for any docs frame — byte-identical
    * key derivation to [[CorpusPipeline.flagInputs]], plus the
    * per-doc quality score when a frozen scorer is given (map-side;
    * joined back on doc_id).
    */
  private def thinInputs(s: SparkSession, docs: DataFrame,
      scorer: Option[Scorer],
      scrub: Option[EvalScrub] = None): DataFrame = {
    val base = CorpusPipeline.flagInputs(s, docs)
      .select(col("doc_id"), col("lang"), col("n_toks"),
        col("alpha_ratio"), col("digest"), col("norm_sig"),
        array_join(col("sg"), ",").as("sg_key"))
    val scored = scorer match {
      case None =>
        base.withColumn("quality_score", lit(null).cast("double"))
      case Some(f) =>
        base.join(f(docs).select("doc_id", "quality_score"), Seq("doc_id"))
    }
    scrub match {
      case None =>
        scored.withColumn("contamination", lit(null).cast("double"))
      case Some(es) =>
        // one broadcast semi-join over THESE docs' span stream only —
        // on the refresh path that is the arrival delta, never the
        // corpus (report emits one row per doc, clean docs report 0.0).
        // The stored fraction is EXACT (not the report's 4-dp display
        // value): the any-hit rule at tolerance 0.0 must reject a long
        // doc whose rounded fraction truncates to zero
        scored.join(
          Decontaminate.report(docs, es.evalSet, "doc_id", "text", es.w)
            .select(col("doc_id"),
              (col("contaminated_tokens").cast("double") /
                greatest(col("n_toks"), lit(1L))).as("contamination")),
          Seq("doc_id"))
    }
  }

  /** The row-local contamination verdict from STORED state: pass when
    * no scrub is configured; under one, the stored fraction against
    * its tolerance (a null fraction — a row written before the scrub
    * existed — counts clean; introducing a scrub over an existing
    * corpus is a full re-curate, per [[EvalScrub]]'s freeze rule).
    */
  private def contamVerdict(scrub: Option[EvalScrub]) = scrub match {
    case None => lit(true)
    case Some(es) =>
      coalesce(col("contamination"), lit(0.0)) <= lit(es.maxFraction)
  }

  /** The per-row quality verdict: the heuristic bands, or — under the
    * learned pipeline — the frozen score against `tau` (both pure
    * row-local functions of stored state, which is what makes the
    * refresh recompute exact without touching text).
    */
  private def qualityVerdict(tau: Option[Double]) = tau match {
    case None => CorpusPipeline.qualityBand
    case Some(t) => col("quality_score") >= lit(t)
  }

  /** Full-corpus flags in the state schema — [[CorpusPipeline]]'s
    * dedup cascade over an arbitrary docs frame, with either quality
    * stage. Used by [[initialize]] and by the spec as the
    * from-scratch oracle.
    */
  def fullFlags(s: SparkSession, docs: DataFrame,
      scorer: Option[Scorer] = None,
      tau: Option[Double] = None,
      scrub: Option[EvalScrub] = None): DataFrame =
    thinInputs(s, docs, scorer, scrub)
      .withColumn("k_exact", rank1("digest", lit(true)))
      .withColumn("k_norm", rank1("norm_sig", col("k_exact")))
      .withColumn("k_near", rank1("sg_key", col("k_norm")))
      .withColumn("quality_ok",
        col("k_near") && qualityVerdict(tau) && contamVerdict(scrub))
      .withColumn("banded_dup", lit(false))
      .select(stateCols.map(col): _*)

  /** Upsert one changelog batch (stateCols + op + seq) into all four
    * projections. `seq` orders ONLY within the batch (each merge folds
    * against the materialized prior snapshot, never across batches):
    * tombstones ride at seq 0, replacement rows at seq 1, so a
    * same-bucket D/U pair for one doc collapses to the U row while a
    * cross-bucket pair cleans the old bucket and fills the new one.
    */
  private def upsertAll(batch: DataFrame, batchId: Long, root: String,
      nBuckets: Int, checkpointEvery: Int = 0): Unit = {
    UpsertFileSink.upsertBatchBucketed(batch, batchId, byId(root),
      Seq("doc_id"), nBuckets,
      checkpointEvery = checkpointEvery)
    UpsertFileSink.upsertBatchBucketed(batch, batchId, byDigest(root),
      Seq("doc_id"), nBuckets, bucketCols = Seq("digest"),
      checkpointEvery = checkpointEvery)
    UpsertFileSink.upsertBatchBucketed(batch, batchId, byNorm(root),
      Seq("doc_id"), nBuckets, bucketCols = Seq("norm_sig"),
      checkpointEvery = checkpointEvery)
    UpsertFileSink.upsertBatchBucketed(batch, batchId, bySg(root),
      Seq("doc_id"), nBuckets, bucketCols = Seq("sg_key"),
      checkpointEvery = checkpointEvery)
  }

  /** One-time bulk load: full-curate `docs` and land the flags as
    * state batch 0 of all three projections — each ONE partitioned
    * write + B directory renames ([[UpsertFileSink.bulkLoadBucketed]]),
    * never the refresh path's driver-sequenced per-bucket merge loop;
    * corpus-sized work only in the executor-parallel write, exactly
    * once, with the flags frame materialized once for its three
    * consumers.
    */
  def initialize(s: SparkSession, docs: DataFrame, stateRoot: String,
      nBuckets: Int = 64, scorer: Option[Scorer] = None,
      tau: Option[Double] = None,
      scrub: Option[EvalScrub] = None): Unit = {
    val flags = graft.Materialize.checkpoint(
      fullFlags(s, docs, scorer, tau, scrub))
    UpsertFileSink.bulkLoadBucketed(flags, byId(stateRoot), nBuckets,
      bucketCols = Seq("doc_id"))
    UpsertFileSink.bulkLoadBucketed(flags, byDigest(stateRoot), nBuckets,
      bucketCols = Seq("digest"))
    UpsertFileSink.bulkLoadBucketed(flags, byNorm(stateRoot), nBuckets,
      bucketCols = Seq("norm_sig"))
    UpsertFileSink.bulkLoadBucketed(flags, bySg(stateRoot), nBuckets,
      bucketCols = Seq("sg_key"))
    // stamp the root: the bulk load IS state batch 0, so refreshes on
    // initialized state must start at ≥ 1 — [[refresh]] fails fast on
    // an id-0 refresh here, which would read asOf=-1 (an empty corpus)
    // and mis-judge every arrival as duplicate-free
    graft.ControlFiles.atomicWrite(SegmentLog.hfs(s, stateRoot),
      new org.apache.hadoop.fs.Path(stateRoot, "_initialized"), "0")
  }

  /** The whole current verdict state (one projection suffices — all
    * three hold identical rows).
    */
  def currentFlags(s: SparkSession, stateRoot: String): DataFrame =
    UpsertFileSink.readSnapshotBucketed(s, byDigest(stateRoot), stateSchema)

  /** Apply one arrival batch (documents-table schema, fresh doc_ids)
    * as state batch `batchId` (strictly greater than every prior).
    * Returns the curated DELTA: every doc whose verdict this refresh
    * touched — arrivals (was_kept null) and pre-existing docs whose
    * keeper verdict a new duplicate stole (was_kept true, now_kept
    * false) or restored — with the full new flags row attached.
    * Unaffected docs are neither read (beyond their bucket files) nor
    * rewritten. The adds-only form of [[refreshCdc]] (op = I): a
    * genuinely fresh doc_id resolves no old row, so every mutation
    * path degenerates away.
    */
  def refresh(s: SparkSession, stateRoot: String, arrivals: DataFrame,
      batchId: Long, nBuckets: Int = 64,
      checkpointEvery: Int = 0, scorer: Option[Scorer] = None,
      tau: Option[Double] = None,
      scrub: Option[EvalScrub] = None,
      banded: Option[BandedVerify] = None,
      embed: Option[EmbedVerify] = None): DataFrame =
    refreshCdc(s, stateRoot,
      arrivals.select(col("doc_id"), col("lang"), col("text"))
        .withColumn("op", lit("I")),
      batchId, nBuckets, checkpointEvery, scorer, tau, scrub, banded,
      embed)

  /** Arrival doc_ids a [[BandedVerify]] demotes this batch: probe the
    * banded index with the batch's upserts, keep candidates that are
    * KEPT in the state as of the previous batch AND invisible to the
    * cascade (all three cascade keys differ — a pair sharing a digest
    * / norm_sig / sg_key is the cascade's jurisdiction, where keeper
    * choice is smaller-id and may legitimately go to the ARRIVAL; the
    * banded stage only ever ADDS recall, never overrides a cascade
    * keeper decision), verify by exact shingle Jaccard against the
    * authoritative texts, threshold.
    */
  /** Candidate keptness + cascade keys as of the PREVIOUS batch
    * (pruned by_id read — the ≤ nBuckets manifest discipline); a
    * candidate with no prior-state row (same-batch arrival) drops out
    * here. Shared by both verify modalities.
    */
  private def keptAsOf(s: SparkSession, stateRoot: String,
      candIds: DataFrame, asOf: Long): DataFrame =
    UpsertFileSink.fetchByKeys(s,
      UpsertFileSink.BucketedStore(byId(stateRoot), stateSchema),
      candIds, Some(asOf))
      .filter(col("quality_ok"))
      .select(col("doc_id").as("cand_id"), col("digest").as("c_digest"),
        col("norm_sig").as("c_norm"), col("sg_key").as("c_sg"))

  /** The cascade-jurisdiction exclusion: only pairs the
    * exact-signature stages CANNOT see reach an out-of-band verify
    * verdict.
    */
  private def outsideCascade = col("c_digest") =!= col("p_digest") &&
    col("c_norm") =!= col("p_norm") && col("c_sg") =!= col("p_sg")

  private def probeKeysOf(delta: DataFrame) =
    delta.select(col("doc_id").as("probe_id"),
      col("digest").as("p_digest"), col("norm_sig").as("p_norm"),
      col("sg_key").as("p_sg"))

  private def bandedDemotions(s: SparkSession, stateRoot: String,
      bv: BandedVerify, arr: DataFrame, delta: DataFrame,
      asOf: Long, cached: scala.collection.mutable.ArrayBuffer[DataFrame])
      : DataFrame = {
    val probes = arr.filter(col("op") =!= "D").select("doc_id", "text")
    // persisted: the probe pass feeds the bucket manifest AND the
    // verify joins below; released by the caller's finally once the
    // returned delta has materialized. The probe is AS OF the previous
    // batch (replay determinism — see [[BandedVerify]]).
    val cands = IncrementalLsh.candidatesAsOf(s, bv.lshRoot, probes, asOf)
      .select(col("probe_id"), col("doc_id").as("cand_id"))
      .persist()
    cached.append(cands)
    val candIds = cands.select(col("cand_id").as("doc_id")).distinct()
    val kept = keptAsOf(s, stateRoot, candIds, asOf)
    // exact-Jaccard verify on token 3-shingle sets — byte-identical
    // algebra to q_dedup_jaccard's verify stage; shingle frames are
    // bounded by the batch and by the candidate id set respectively
    def shinglesOf(docs: DataFrame, idAs: String) = docs
      .select(col("doc_id").as(idAs), split(col("text"), " ").as("toks"))
      .repartition(s.sparkContext.defaultParallelism, col(idAs))
      .select(col(idAs), expr(DedupExtras.shinglesSql).as("sh"))
    val pSh = shinglesOf(probes, "probe_id")
      .select(col("probe_id"), col("sh").as("p_sh"))
    // candidate texts: bucket-pruned as-of fetch from the handle, or
    // the bare-frame semi-join fallback (row-pruned, live view)
    val candTexts = bv.textStore match {
      case Some(st) => UpsertFileSink
        .fetchByKeys(s, st, candIds, Some(asOf))
        .select("doc_id", "text")
      case None => bv.textSource.select("doc_id", "text")
        .join(candIds, Seq("doc_id"), "left_semi")
    }
    val cSh = shinglesOf(candTexts, "cand_id")
      .select(col("cand_id"), col("sh").as("c_sh"))
    cands
      .join(kept, Seq("cand_id"))
      .join(probeKeysOf(delta), Seq("probe_id"))
      .filter(outsideCascade)
      .join(pSh, Seq("probe_id"))
      .join(cSh, Seq("cand_id"))
      .filter(
        expr("size(filter(p_sh, x -> array_contains(c_sh, x)))") * lit(1.0) /
          expr("size(array_distinct(concat(p_sh, c_sh)))") >=
          lit(bv.threshold))
      .select(col("probe_id").as("doc_id")).distinct()
  }

  /** Arrival doc_ids an [[EmbedVerify]] demotes this batch — the
    * banded recipe on the vector modality: probe the embed-LSH index
    * as of the previous batch with the arrivals' vectors, keep
    * candidates KEPT as of the previous batch and outside the
    * cascade's jurisdiction, verify by exact cosine against the
    * external vector store (bucket-pruned as-of fetch under a handle),
    * threshold.
    */
  private def embedDemotions(s: SparkSession, stateRoot: String,
      ev: EmbedVerify, arr: DataFrame, delta: DataFrame,
      asOf: Long, cached: scala.collection.mutable.ArrayBuffer[DataFrame])
      : DataFrame = {
    val probes = ev.probeVectors
      .select(col("doc_id").as("vec_id"), col("e"))
      .join(arr.filter(col("op") =!= "D")
        .select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val cands = IncrementalEmbedLsh
      .candidatesAsOf(s, ev.elshRoot, probes, asOf)
      .select(col("probe_id"), col("vec_id").as("cand_id"))
      .persist()
    cached.append(cands)
    val candIds = cands.select(col("cand_id").as("doc_id")).distinct()
    val kept = keptAsOf(s, stateRoot, candIds, asOf)
    val candVecs = ev.vectorStore match {
      case Some(st) => UpsertFileSink
        .fetchByKeys(s, st, candIds.select(col("doc_id").as("vec_id")),
          Some(asOf))
        .select(col("vec_id").as("cand_id"), col("e").as("ce"))
      case None => ev.vectorSource
        .select(col("vec_id").as("cand_id"), col("e").as("ce"))
        .join(candIds.select(col("doc_id").as("cand_id")),
          Seq("cand_id"), "left_semi")
    }
    cands
      .join(kept, Seq("cand_id"))
      .join(probeKeysOf(delta), Seq("probe_id"))
      .filter(outsideCascade)
      .join(probes.select(col("vec_id").as("probe_id"),
        col("e").as("pe")), Seq("probe_id"))
      .join(candVecs, Seq("cand_id"))
      .filter(expr(SimilarityExtras.cosPair("pe", "ce")) >= ev.minSim)
      .select(col("probe_id").as("doc_id")).distinct()
  }

  /** Apply one CDC batch of documents — (doc_id, lang, text, op) with
    * op I/U/D, at most one row per doc_id (compact the feed first:
    * [[ChangeDataCapture.compactChangelog]]) — as state batch
    * `batchId`. I/U upserts the doc's new version (the old version, if
    * any, leaves the corpus); D removes the doc (text/lang ignored) —
    * the takedown/opt-out path a production corpus needs.
    *
    * Mechanics on top of the adds-only cascade: the `by_id` projection
    * resolves every arrival's OLD flags row as of the previous batch;
    * old rows tombstone out of all four projections (op D at
    * within-batch seq 0, below the replacement rows' seq 1); and the
    * groups that lost a member re-rank alongside the groups that
    * gained one — each stage's recompute mark adds "this group's key
    * is an old row's key", so a deleted keeper's exact group promotes
    * its runner-up and the cascade propagates the change downstream
    * exactly like a keeper steal.
    *
    * Returned delta: as [[refresh]], plus deleted docs as rows with
    * every verdict false, was_kept = the old verdict, now_kept false.
    * The extra `op` column carries the arrival op for is_delta rows
    * (null for re-ranked bystanders) so a downstream consumer can
    * distinguish a takedown from a drop.
    *
    * Doc mutations are tracked from the batch a state root first sees
    * this code path; [[initialize]] has always* (*since by_id shipped)
    * bulk-loaded the by_id projection, and a root built purely by
    * refresh batches grows it from batch 0.
    */
  def refreshCdc(s: SparkSession, stateRoot: String, arrivals: DataFrame,
      batchId: Long, nBuckets: Int = 64,
      checkpointEvery: Int = 0, scorer: Option[Scorer] = None,
      tau: Option[Double] = None,
      scrub: Option[EvalScrub] = None,
      banded: Option[BandedVerify] = None,
      embed: Option[EmbedVerify] = None): DataFrame = {
    require(scorer.isDefined == tau.isDefined,
      "a learned refresh needs BOTH the frozen scorer and tau")
    // fail fast on mis-numbered batches: a STALE id would read state
    // as of an old batch and silently re-judge arrivals against a
    // historical corpus (equality with the newest committed id is a
    // legitimate replay); an id-0 refresh on INITIALIZED state would
    // read asOf=-1 — an empty corpus — and miss every duplicate
    val lastCommitted = Seq(byId(stateRoot), byDigest(stateRoot),
      byNorm(stateRoot), bySg(stateRoot))
      .flatMap(r => UpsertFileSink.lastCommittedBucketed(s, r))
      .maxOption
    require(lastCommitted.forall(_ <= batchId),
      s"refresh batch $batchId is older than committed state batch " +
        s"${lastCommitted.get} at $stateRoot")
    // the pruned state pulls hash group keys with nBuckets — a value
    // different from the one the projections were created with would
    // read the wrong buckets and silently miss state rows; the sink's
    // layout pin makes that loud
    Seq(byId(stateRoot), byDigest(stateRoot), byNorm(stateRoot),
      bySg(stateRoot))
      .flatMap(r => UpsertFileSink.bucketCount(s, r)).foreach(nb =>
        require(nb == nBuckets,
          s"state at $stateRoot was created with nBuckets=$nb, " +
            s"got $nBuckets — the bucket layout is frozen at creation"))
    val initialized = SegmentLog.hfs(s, stateRoot).exists(
      new org.apache.hadoop.fs.Path(stateRoot, "_initialized"))
    if (initialized)
      require(batchId >= 1L,
        s"state at $stateRoot was bulk-initialized as batch 0 — " +
          "refresh ids must start at 1")
    def bk(c: Column) = pmod(hash(c), lit(nBuckets))
    val asOf = batchId - 1

    val arr = arrivals
      .select(col("doc_id"), col("lang"), col("text"), col("op"))
      .persist()
    // mutation batches need the by_id primary index: on a state root
    // initialized BEFORE that projection shipped, an op=D takedown of
    // an existing doc would resolve no old row and silently no-op, and
    // an op=U would strand the old row in any projection whose
    // bucketing key changed — fail loudly instead of degrading (adds
    // are fine: a fresh doc_id legitimately has no old row)
    if (initialized &&
      UpsertFileSink.lastCommittedBucketed(s, byId(stateRoot)).isEmpty)
      require(arr.filter(col("op").isin("U", "D")).isEmpty,
        s"state at $stateRoot has no committed by_id projection " +
          "(initialized before doc mutations shipped) but the batch " +
          "carries U/D ops — re-initialize the state root to enable " +
          "updates/deletes")
    val delta = thinInputs(s,
      arr.filter(col("op") =!= "D").select("doc_id", "lang", "text"),
      scorer, scrub)
      .withColumn("k_exact", lit(null).cast("boolean"))
      .withColumn("k_norm", lit(null).cast("boolean"))
      .withColumn("k_near", lit(null).cast("boolean"))
      .withColumn("quality_ok", lit(null).cast("boolean"))
      // resolved after the cascade (the banded stage); an arrival with
      // no BandedVerify configured lands false
      .withColumn("banded_dup", lit(null).cast("boolean"))
      .select(stateCols.map(col): _*)
      .persist()

    // persisted intermediates released in the finally: an exception
    // anywhere below (state pulls, recompute, any projection upsert)
    // must not leave blocks resident for the session lifetime — the
    // success path still releases each as early as it can (unpersist
    // is idempotent)
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      // ---- old rows: the by_id primary-index pull -------------------
      // every arrival's previous flags row (empty for fresh ids), read
      // AS OF the previous batch like every other state pull below —
      // these rows (a) tombstone out of all projections, (b) seed the
      // "group lost a member" recompute marks, (c) supply was_kept for
      // updated docs
      val idB = arr.select(bk(col("doc_id")).as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val olds = UpsertFileSink
        .readBucketsBucketedAsOf(s, byId(stateRoot), stateSchema, idB,
          asOf)
        .join(arr.select("doc_id"), Seq("doc_id"), "left_semi")
        .select(stateCols.map(col): _*)
        .persist()
      cached += olds

      // ---- cascade expansion: three pruned whole-group pulls --------
      // (bucket-id manifests are ≤ nBuckets ints, driver-side by
      // design — the landing zone's own touched-bucket discipline)
      // every state pull reads AS OF the previous batch: on the happy
      // path that IS the latest state; on a replay after a partial
      // commit it excludes the first attempt's own writes, so the
      // recompute reproduces the identical verdicts AND the identical
      // returned delta (a latest-version read would mix pre- and
      // post-batch quality_ok across projections and silently drop
      // demotions from was_kept). Bounded by vacuum retention
      // (vacuumBucketed's minRetainBatches): don't vacuum a batch's
      // predecessor versions before its delta has been consumed
      // downstream. Group keys seed from the NEW rows AND the old
      // rows — a group that lost a member re-ranks too.
      val touchedDigests = delta.select("digest")
        .unionAll(olds.select("digest")).distinct()
      val dB = touchedDigests.select(bk(col("digest")).as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val e = UpsertFileSink
        .readBucketsBucketedAsOf(s, byDigest(stateRoot), stateSchema, dB,
          asOf)
        .join(touchedDigests, Seq("digest"), "left_semi")
        .select(stateCols.map(col): _*)

      val normKeys = delta.select("norm_sig")
        .unionAll(e.select("norm_sig"))
        .unionAll(olds.select("norm_sig")).distinct().persist()
      cached += normKeys
      val nB = normKeys.select(bk(col("norm_sig")).as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val n = UpsertFileSink
        .readBucketsBucketedAsOf(s, byNorm(stateRoot), stateSchema, nB,
          asOf)
        .join(normKeys, Seq("norm_sig"), "left_semi")
        .select(stateCols.map(col): _*)

      val sgKeys = delta.select("sg_key").unionAll(e.select("sg_key"))
        .unionAll(n.select("sg_key"))
        .unionAll(olds.select("sg_key")).distinct().persist()
      cached += sgKeys
      val sB = sgKeys.select(bk(col("sg_key")).as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val sRows = UpsertFileSink
        .readBucketsBucketedAsOf(s, bySg(stateRoot), stateSchema, sB,
          asOf)
        .join(sgKeys, Seq("sg_key"), "left_semi")
        .select(stateCols.map(col): _*)

      // exclude the arrivals themselves from the state pull: their OLD
      // versions must not rank (an updated doc ranks only as its new
      // version, a deleted doc not at all), and after a PARTIAL
      // failure (some projections upserted, not all) a replay of the
      // same batch re-reads state that already contains the delta docs
      // — without the anti-join they would enter the frame twice and
      // corrupt the rank-1 windows. With it, a replayed recompute
      // reproduces identical verdicts and the remaining projection
      // upserts converge (the committed ones no-op on their markers).
      val affectedState = e.unionAll(n).unionAll(sRows)
        .dropDuplicates(Seq("doc_id"))
        .join(arr.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(stateCols.map(col): _*)

      // ---- bounded recompute with group-level recompute marks -------
      // a group recomputes iff it holds a delta doc, LOST a member (its
      // key is an old row's key), or holds a doc whose prior-stage
      // verdict may have changed; expansion guaranteed those groups are
      // COMPLETE in the frame, and an incomplete group is provably
      // unmarked (all-false mark → stored verdicts)
      val lostE = olds.select("digest").distinct()
        .withColumn("__lost_e", lit(true))
      val lostN = olds.select("norm_sig").distinct()
        .withColumn("__lost_n", lit(true))
      val lostS = olds.select("sg_key").distinct()
        .withColumn("__lost_s", lit(true))
      val aff = affectedState.withColumn("is_delta", lit(false))
        .unionByName(delta.withColumn("is_delta", lit(true)))
        .join(lostE, Seq("digest"), "left")
        .join(lostN, Seq("norm_sig"), "left")
        .join(lostS, Seq("sg_key"), "left")
        // was_kept source for updated docs: the OLD row's verdict (the
        // combined frame's own quality_ok is null on delta rows)
        .join(olds.select(col("doc_id"),
          col("quality_ok").as("__old_ok"),
          col("banded_dup").as("__old_bdup")), Seq("doc_id"), "left")
        // a re-arrival (op=U, incl. a byte-identical redelivered U)
        // INHERITS its stored banded_dup flag BEFORE the rank
        // recompute — re-judging from this batch's probe alone would
        // silently re-promote a demoted doc whose keeper has since
        // left the corpus (drop-only is enforced, not advised; the
        // sanctioned re-admission path is an explicit D + fresh I)
        .withColumn("banded_dup",
          when(col("is_delta"), col("__old_bdup"))
            .otherwise(col("banded_dup")))
      val recomputed = aff
        .withColumn("r_e",
          max(col("is_delta").cast("int"))
            .over(Window.partitionBy("digest")) === 1 ||
            coalesce(col("__lost_e"), lit(false)))
        .withColumn("k_exact2",
          when(col("r_e"), rank1("digest", lit(true)))
            .otherwise(col("k_exact")))
        .withColumn("r_n",
          max(col("r_e").cast("int"))
            .over(Window.partitionBy("norm_sig")) === 1 ||
            coalesce(col("__lost_n"), lit(false)))
        .withColumn("k_norm2",
          when(col("r_n"), rank1("norm_sig", col("k_exact2")))
            .otherwise(col("k_norm")))
        .withColumn("r_s",
          max(col("r_n").cast("int"))
            .over(Window.partitionBy("sg_key")) === 1 ||
            coalesce(col("__lost_s"), lit(false)))
        .withColumn("k_near2",
          // a STORED banded demotion survives the group recompute: the
          // rank window may re-rank the group (and this doc may even
          // win its slot, keeping its group-mates demoted — they
          // near-duplicate a demoted doc), but a banded_dup doc itself
          // can never re-enter the kept set through a cascade re-rank.
          // Without this the drop-only invariant would silently break
          // the first time a later batch touched the demoted doc's
          // group (the round-16 review catch).
          when(col("r_s"), rank1("sg_key", col("k_norm2")) &&
            !coalesce(col("banded_dup"), lit(false)))
            .otherwise(col("k_near")))
        .withColumn("quality_ok2",
          col("k_near2") && qualityVerdict(tau) && contamVerdict(scrub))
        .select(col("doc_id"), col("lang"), col("n_toks"),
          col("alpha_ratio"), col("digest"), col("norm_sig"),
          col("sg_key"),
          col("k_exact2").as("k_exact"), col("k_norm2").as("k_norm"),
          col("k_near2").as("k_near"),
          col("quality_ok2").as("quality_ok"), col("quality_score"),
          col("contamination"), col("banded_dup"),
          coalesce(col("quality_ok"), col("__old_ok")).as("was_kept"),
          col("is_delta"))

      // ---- out-of-band near-dup demotions ([[BandedVerify]] text,
      // [[EmbedVerify]] vectors) -------------------------------------
      // applied AFTER the cascade: an arrival that survived the
      // exact-signature stages but has a verified near-dup in the
      // prior KEPT corpus loses k_near (and with it quality_ok) —
      // bystander rows are untouched (drop-only, cross-batch). The
      // verdict PERSISTS as the banded_dup state flag (whichever
      // modality produced it) so later group recomputes cannot
      // resurrect the doc, and a re-arrival's inherited flag (set
      // above) ORs with this batch's fresh verdict.
      val dems: Seq[DataFrame] =
        banded.map(bv => bandedDemotions(s, stateRoot, bv, arr, delta,
          asOf, cached)).toSeq ++
        embed.map(ev => embedDemotions(s, stateRoot, ev, arr, delta,
          asOf, cached)).toSeq
      val verdicts = (if (dems.isEmpty) recomputed else {
        val dem = dems.reduce(_ unionAll _).distinct()
          .withColumn("__bdup", lit(true))
        recomputed.join(dem, Seq("doc_id"), "left")
          .withColumn("__bhit",
            col("is_delta") && (coalesce(col("__bdup"), lit(false)) ||
              coalesce(col("banded_dup"), lit(false))))
          .withColumn("k_near",
            when(col("__bhit"), lit(false)).otherwise(col("k_near")))
          .withColumn("quality_ok",
            when(col("__bhit"), lit(false)).otherwise(col("quality_ok")))
          .withColumn("banded_dup",
            when(col("is_delta"), col("__bhit"))
              .otherwise(col("banded_dup")))
          .drop("__bdup", "__bhit")
      }).withColumn("banded_dup", coalesce(col("banded_dup"), lit(false)))

      // deleted docs: return-only rows (their state is tombstoned, not
      // rewritten) — every verdict false, was_kept = the old verdict
      val deletedOut = olds
        .join(arr.filter(col("op") === "D").select("doc_id"),
          Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("n_toks"),
          col("alpha_ratio"), col("digest"), col("norm_sig"),
          col("sg_key"),
          lit(false).as("k_exact"), lit(false).as("k_norm"),
          lit(false).as("k_near"), lit(false).as("quality_ok"),
          col("quality_score"), col("contamination"), col("banded_dup"),
          col("quality_ok").as("was_kept"), lit(true).as("is_delta"))

      // checkpoint the FULL returned delta (recomputed rows ∪ deleted
      // rows ∪ the op tags) so it is self-contained: the caller's
      // later actions must never re-derive rows from `olds`/`arr`
      // plans after those caches release — a post-upsert re-read of
      // state, or a vacuum racing the delta's consumption, could
      // otherwise change what the caller applies downstream
      val outCols = stateCols.map(col) :+ col("was_kept") :+
        col("quality_ok").as("now_kept") :+ col("is_delta")
      val opOf = arr.select(col("doc_id"), col("op").as("__arr_op"))
      val returned = graft.Materialize.checkpoint(
        verdicts.select(outCols: _*)
          .unionByName(deletedOut.select(outCols: _*))
          .join(opOf, Seq("doc_id"), "left")
          .withColumn("op",
            when(col("is_delta"), col("__arr_op"))
              .otherwise(lit(null).cast("string")))
          .drop("__arr_op"))

      // the checkpoint above materialized every consumer of the key
      // frames — release them now, not at session end
      normKeys.unpersist(blocking = false)
      sgKeys.unpersist(blocking = false)

      // changelog into the four projections: tombstone every arrival's
      // old row at seq 0, land every non-deleted new row at seq 1
      val tomb = olds.select(stateCols.map(col): _*)
        .withColumn("op", lit("D")).withColumn("seq", lit(0L))
      val ups = returned
        .filter(col("op").isNull || col("op") =!= "D")
        .select(stateCols.map(col): _*)
        .withColumn("op", lit("U")).withColumn("seq", lit(1L))
      upsertAll(ups.unionByName(tomb), batchId, stateRoot, nBuckets,
        checkpointEvery)
      olds.unpersist(blocking = false)

      returned
    } finally {
      cached.foreach(_.unpersist(blocking = false))
      delta.unpersist(blocking = false)
      arr.unpersist(blocking = false)
    }
  }

  /** Vacuum all four state projections with REPLAY RETENTION: nothing
    * newer than head − `minRetainBatches` is deleted, so a refresh
    * batch still in flight (or being replayed) can read its
    * predecessor state — the ":don't vacuum a batch's predecessors
    * before its delta is consumed" rule, enforced instead of advised.
    * The default keeps one predecessor window, the minimum for a
    * single replayed batch; run with a larger value when deltas are
    * consumed asynchronously.
    */
  def vacuumState(s: SparkSession, stateRoot: String,
      minRetainBatches: Int = 1): Unit =
    Seq(byId(stateRoot), byDigest(stateRoot), byNorm(stateRoot),
      bySg(stateRoot))
      .foreach(r => UpsertFileSink.vacuumBucketed(s, r, minRetainBatches))

  /** Steady-state hygiene for all four projections in the safe order
    * (checkpoint the manifest, THEN vacuum with replay retention) —
    * [[graft.operators.Maintenance.maintainRefreshState]]'s body, one
    * call per cadence.
    */
  def maintainState(s: SparkSession, stateRoot: String,
      minRetainBatches: Int = 1): Unit = {
    Seq(byId(stateRoot), byDigest(stateRoot), byNorm(stateRoot),
      bySg(stateRoot))
      .foreach(r => UpsertFileSink.writeBucketedCheckpoint(s, r))
    vacuumState(s, stateRoot, minRetainBatches)
  }

  /** The verdict state as of refresh batch `batchId` — bucketed time
    * travel over the by_digest projection (bounded by vacuum
    * retention, the Delta-identical caveat).
    */
  def stateAsOf(s: SparkSession, stateRoot: String,
      batchId: Long): DataFrame =
    UpsertFileSink.readSnapshotBucketedAsOf(s, byDigest(stateRoot),
      stateSchema, batchId)

  /** Refresh-to-refresh DRIFT gate — the validation step a production
    * corpus runs after each delta lands: PSI of the quality inputs
    * (n_toks, alpha_ratio, quality_score) between the state as of two
    * refresh batches, restricted to the KEPT set (the corpus the
    * trainer actually sees), via [[Drift.numericReport]]'s
    * reference-quantile binning. A refresh that silently shifted what
    * "kept" means shows up here before it reaches a training run.
    */
  def driftReport(s: SparkSession, stateRoot: String, fromBatch: Long,
      toBatch: Long): DataFrame = {
    val ref = stateAsOf(s, stateRoot, fromBatch).filter(col("quality_ok"))
    val cur = stateAsOf(s, stateRoot, toBatch).filter(col("quality_ok"))
    // the heuristic pipeline stores no scores (all-null column) — an
    // all-null reference has no quantile edges, so include the score
    // dimension only when the state actually carries one
    val hasScores = !ref.filter(col("quality_score").isNotNull).isEmpty
    Drift.numericReport(ref, cur,
      Seq("n_toks", "alpha_ratio") ++
        (if (hasScores) Seq("quality_score") else Nil))
  }

  /** Turn a [[refresh]] result into the CORPUS delta in
    * [[CorpusPipeline.curate]]'s own output shape: `adds` = newly-kept
    * docs tagged exactly like curate's corpus rows (broadcast-dict
    * langid argmax + md5 split — text re-joined by id from
    * `textSource`, typically the arrivals frame plus, for promoted
    * pre-existing docs, the corpus store), `removals` = doc_ids a new
    * duplicate demoted out of the kept set. A downstream trainer
    * applies (adds, removals) to its materialized corpus instead of
    * re-reading it — the last mile of the delta-bounded refresh.
    */
  def corpusDelta(s: SparkSession, refreshed: DataFrame,
      textSource: DataFrame): (DataFrame, DataFrame) = {
    val promoted = refreshed
      .filter(col("now_kept") &&
        (col("was_kept").isNull || !col("was_kept")))
      .select("doc_id", "lang", "n_toks")
    val adds = CorpusPipeline.tagSurvivors(s,
      promoted.join(
        textSource.select(col("doc_id"),
          split(col("text"), " ").as("toks")),
        Seq("doc_id")))
    val removals = refreshed
      .filter(col("was_kept") === true && !col("now_kept"))
      .select("doc_id")
    (adds, removals)
  }
}

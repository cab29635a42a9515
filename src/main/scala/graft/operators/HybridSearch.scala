package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.UpsertFileSink

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
  * of heterogeneous top-k rankings — the standard way a modern search
  * stack combines a lexical ranker (BM25 posting-list scan) with a
  * semantic one (embedding ANN), because their raw scores live on
  * incomparable scales while their RANKS always fuse:
  * rrf(d) = Σ_lists 1/(c + rank_list(d)).
  *
  * Scale shape: fusion consumes ONLY top-k frames (the bounded outputs
  * of [[InvertedIndex.bm25Query]] / the ANN searches), never corpora —
  * every window and join below runs on ≤ k·lists rows, enforced by an
  * explicit cap the same way [[IvfIndex]] guards its seed window. The
  * expensive work stays in the per-list retrievers, which keep their
  * own scale discipline (pushdown-pruned posting lists, cell-bounded
  * ANN probes).
  */
object HybridSearch {

  /** Cap on fused list size: rankings are top-k frames by contract,
    * and the single-partition rank windows below are only safe because
    * of it. Never lift the fusion above bounded inputs.
    */
  private val MaxFuse = 4096

  /** Fuse rankings (each a (idCol, score) frame, higher score =
    * better, at most `MaxFuse` rows — i.e. a top-k result, not a
    * corpus) into the RRF top-k. Ties inside a list rank
    * deterministically by id; items missing from a list simply
    * contribute nothing for it. Output: (idCol, rrf, n_lists).
    */
  def rrf(rankings: Seq[DataFrame], idCol: String, k: Int,
      c: Int = 60): DataFrame = {
    require(rankings.nonEmpty && k > 0 && k <= MaxFuse && c > 0)
    val ranked = rankings.map { r =>
      // GUARD: a no-partition window collapses to one partition —
      // acceptable ONLY on a ≤MaxFuse-row top-k frame (see scaladoc).
      // The cap is an ORDERED top-MaxFuse (TakeOrdered — distributed
      // per-partition top-k, never a global sort), so an oversized
      // caller gets the true best MaxFuse by (score, id), not an
      // arbitrary partitioning-dependent truncation.
      r.orderBy(col("score").desc, col(idCol)).limit(MaxFuse)
        .select(col(idCol),
          row_number().over(
            Window.orderBy(col("score").desc, col(idCol))).as("__rank"))
        .select(col(idCol), (lit(1.0) / (lit(c) + col("__rank"))).as("__rr"))
    }
    ranked.reduce(_ unionAll _)
      .groupBy(idCol)
      .agg(sum(col("__rr")).as("rrf"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** End-to-end hybrid search over the documents table: BM25 over the
    * inverted index for `terms` (lexical leg), embedding cosine against
    * `probeDocId`'s vector (semantic leg — the embeddings table is
    * doc-aligned; one broadcast probe row, map-side native `cosine_sim`
    * scoring, partial top-k), fused by RRF. Any other (doc_id, score)
    * ranking drops into [[rrf]] the same way — the fusion is
    * retriever-agnostic.
    */
  def searchDocuments(spark: SparkSession, dir: String, terms: Seq[String],
      probeDocId: Long, k: Int): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val index = InvertedIndex.build(docs, "doc_id", "text")
    // ONE stats job for (N, avgdl) — a single agg over the docs scan,
    // not a count() plus a separate distinct+avg re-derivation of the
    // index (two extra corpus-scale jobs per search call).
    val stats = docs
      .select(size(InvertedIndex.tokensCol("text")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head
    val lexical =
      InvertedIndex.bm25Query(index, stats.getLong(0), stats.getDouble(1),
        terms, k)

    graft.plans.CosineSimilarity.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("e"))
    val probe = emb.filter(col("doc_id") === probeDocId)
      .select(col("e").as("p"))
    val semantic = emb
      .crossJoin(broadcast(probe))
      .select(col("doc_id"), expr("cosine_sim(e, p)").as("score"))
      .filter(col("doc_id") =!= probeDocId)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

    rrf(Seq(lexical, semantic), "doc_id", k)
  }

  /** Hybrid retrieval over the MAINTAINED stores — the production
    * query path of the continuous-ingest loop: BM25 over the
    * incremental inverted index (each leg resolves an aliased parent
    * to its active generation, so searches ride through blue/green
    * cutovers untouched) fused with cosine top-k over the incremental
    * IVF index for a literal probe vector, by the same retriever-
    * agnostic [[rrf]]. Per query: one pruned posting read + one
    * nprobe-pruned member read + a fusion over ≤ 2k rows — the batch
    * [[searchDocuments]]'s cost WITHOUT its corpus-sized index build,
    * which is the whole point of maintaining the stores incrementally.
    * The doc_id/vec_id alignment is the ingest loop's own contract
    * (the capstone lands both under the document's id).
    *
    * A CODED (IVFADC) deployment is detected off the resolved root's
    * `pq_codebook` and served via the ADC shortlist + exact-cosine
    * rerank (the index never stores a float vector), so a coded root
    * REQUIRES the external vector store; a plain root needs neither:
    *
    *  - `vectorStore` (PREFERRED): a bucketed handle — the rerank
    *    fetch reads only the shortlist's bucket dirs
    *    ([[IncrementalIvf.searchAdcRerankStore]]); per-query store I/O
    *    proportional to the shortlist.
    *  - `vectors`: a bare frame — fixture-scale fallback that scans
    *    the store map-side per query
    *    ([[IncrementalIvf.searchAdcRerank]]'s caveat). Ignored when
    *    the handle is given.
    */
  def searchMaintained(spark: SparkSession, indexPath: String,
      ivfPath: String, terms: Seq[String], probe: Seq[Double], k: Int,
      nprobe: Int = 4, vectors: Option[DataFrame] = None,
      rerankPool: Int = 50,
      vectorStore: Option[UpsertFileSink.BucketedStore] = None)
      : DataFrame =
    maintainedView(spark, indexPath, ivfPath, terms, probe, k, nprobe,
      vectors, rerankPool, vectorStore, None)

  /** Per-probe RRF over probe-tagged rankings — each a
    * (probe_id, idCol, score) frame whose per-probe row count is
    * bounded (top-k outputs of the batched retrievers). Ranks,
    * tie-breaks, the MaxFuse cap and the fused ordering are the
    * per-probe [[rrf]] arithmetic, partitioned by probe_id; output is
    * (probe_id, idCol, rrf, n_lists), top-k per probe.
    */
  private def rrfBatch(rankings: Seq[DataFrame], idCol: String, k: Int,
      c: Int = 60): DataFrame = {
    require(rankings.nonEmpty && k > 0 && k <= MaxFuse && c > 0)
    val ranked = rankings.map { r =>
      r.select(col("probe_id"), col(idCol),
          row_number().over(Window.partitionBy("probe_id")
            .orderBy(col("score").desc, col(idCol))).as("__rank"))
        .filter(col("__rank") <= MaxFuse)
        .select(col("probe_id"), col(idCol),
          (lit(1.0) / (lit(c) + col("__rank"))).as("__rr"))
    }
    ranked.reduce(_ unionAll _)
      .groupBy("probe_id", idCol)
      .agg(sum(col("__rr")).as("rrf"), count(lit(1)).as("n_lists"))
      .withColumn("__rn", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("rrf").desc, col(idCol))))
      .filter(col("__rn") <= k)
      .select(col("probe_id"), col(idCol), col("rrf"), col("n_lists"))
  }

  /** BATCHED [[searchMaintained]]: every probe of a (probe_id,
    * terms: array<string>, e: array<double>) frame answered in ONE
    * plan — one `tb`-pruned postings pass scores all probes' BM25
    * ([[IncrementalIndex.bm25SearchBatch]]), one cell-pruned member
    * read serves all semantic legs ([[IncrementalIvf.searchBatch]] /
    * the batched ADC + store rerank on coded roots), and the fusion is
    * the per-probe [[rrf]] arithmetic under a probe_id window. Job
    * count is O(1) in |probes| (the per-probe path pays driver/job
    * overhead × |probes|); per-probe results are row-equal to
    * [[searchMaintained]] (HybridSearchSpec pins both). A coded root
    * requires the BUCKETED store handle — the batch path is the
    * production shape, no bare-frame fallback. Output:
    * (probe_id, doc_id, rrf, n_lists), top-k per probe.
    */
  def searchMaintainedBatch(spark: SparkSession, indexPath: String,
      ivfPath: String, probes: DataFrame, k: Int, nprobe: Int = 4,
      rerankPool: Int = 50,
      vectorStore: Option[UpsertFileSink.BucketedStore] = None,
      asOf: Option[Long] = None): DataFrame = {
    val idxRoot = Maintenance.activeOrSelf(spark, indexPath)
    val probeTerms = probes.select(col("probe_id"),
      explode(col("terms")).as("token"))
    val lexical = IncrementalIndex.bm25SearchBatch(spark, idxRoot,
      probeTerms, k, asOf = asOf)
    val ivfRoot = Maintenance.activeOrSelf(spark, ivfPath)
    val coded = SegmentLog.hfs(spark, ivfRoot).exists(
      new org.apache.hadoop.fs.Path(s"$ivfRoot/pq_codebook"))
    val pvec = probes.select(col("probe_id"), col("e"))
    val semantic = (if (coded) {
      require(vectorStore.isDefined,
        s"$ivfRoot is a coded (IVFADC) root: the batched semantic leg " +
          "serves the exact rerank from a bucketed vector store — " +
          "pass vectorStore = Some(handle)")
      IncrementalIvf.searchAdcRerankStoreBatch(spark, ivfRoot, pvec,
        vectorStore.get, k, nprobe, math.max(rerankPool, k), asOf)
    } else IncrementalIvf.searchBatch(spark, ivfRoot, pvec, k, nprobe,
      asOf))
      .select(col("probe_id"), col("vec_id").as("doc_id"),
        col("sim").as("score"))
    rrfBatch(Seq(lexical, semantic), "doc_id", k)
  }

  /** TIME TRAVEL for the whole hybrid path — "what did serving answer
    * at batch `asOf`?", the one-call debugging read the per-store
    * as-of machinery exists for. Both legs ride their stores' own
    * as-of views (`postingsForTerms`/`statsFrame` bounded at `asOf`,
    * the IVF member/code view at its newest assignment ≤ `asOf`, the
    * rerank's vector fetch at the store version ≤ `asOf`), so the
    * answer equals the live answer the moment batch `asOf` was the
    * head — and fails LOUDLY when any store's compaction horizon or
    * vacuum retention has folded that view away (a silently partial
    * leg would skew the fusion, the worst failure class). Assumes the
    * composed-pipeline contract: one feed drives both stores with the
    * same batch ids (the capstone's shape).
    */
  def searchMaintainedAsOf(spark: SparkSession, indexPath: String,
      ivfPath: String, terms: Seq[String], probe: Seq[Double], k: Int,
      asOf: Long, nprobe: Int = 4, vectors: Option[DataFrame] = None,
      rerankPool: Int = 50,
      vectorStore: Option[UpsertFileSink.BucketedStore] = None)
      : DataFrame =
    maintainedView(spark, indexPath, ivfPath, terms, probe, k, nprobe,
      vectors, rerankPool, vectorStore, Some(asOf))

  private def maintainedView(spark: SparkSession, indexPath: String,
      ivfPath: String, terms: Seq[String], probe: Seq[Double], k: Int,
      nprobe: Int, vectors: Option[DataFrame], rerankPool: Int,
      vectorStore: Option[UpsertFileSink.BucketedStore],
      asOf: Option[Long]): DataFrame = {
    val idxRoot = Maintenance.activeOrSelf(spark, indexPath)
    // the lexical leg at TERM-LOOKUP cost: tb-pruned postings + the
    // O(batches) stats fold — never a corpus-sized postings pass
    // (TokenPrunedIndexSpec pins the plan shape)
    val lexical = IncrementalIndex.bm25Search(spark, idxRoot, terms, k,
      asOf = asOf)
    val ivfRoot = Maintenance.activeOrSelf(spark, ivfPath)
    val coded = SegmentLog.hfs(spark, ivfRoot).exists(
      new org.apache.hadoop.fs.Path(s"$ivfRoot/pq_codebook"))
    val semantic = (if (coded) {
      val pool = math.max(rerankPool, k)
      vectorStore match {
        case Some(vs) =>
          IncrementalIvf.searchAdcRerankStore(spark, ivfRoot, probe,
            vs, k, nprobe, pool, asOf)
        case None =>
          require(vectors.isDefined,
            s"$ivfRoot is a coded (IVFADC) root: the hybrid semantic " +
              "leg needs the external vector store for the exact " +
              "rerank — pass vectorStore = Some(handle) (preferred; " +
              "I/O-pruned fetch) or vectors = Some(frame)")
          IncrementalIvf.searchAdcRerank(spark, ivfRoot, probe,
            vectors.get, k, nprobe, pool, asOf)
      }
    } else asOf match {
      case Some(a) =>
        IncrementalIvf.searchAsOf(spark, ivfRoot, probe, k, nprobe, a)
      case None => IncrementalIvf.search(spark, ivfRoot, probe, k, nprobe)
    })
      .select(col("vec_id").as("doc_id"), col("sim").as("score"))
    rrf(Seq(lexical, semantic), "doc_id", k)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

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
      r.limit(MaxFuse)
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
    * inverted index for `terms`, cosine over a text-overlap "semantic"
    * scorer seeded by `probeDocId`'s token set (the fixture corpus has
    * no doc-aligned embeddings; any (doc_id, score) ranking drops in —
    * the fusion is retriever-agnostic), fused by RRF.
    */
  def searchDocuments(spark: SparkSession, dir: String, terms: Seq[String],
      probeDocId: Long, k: Int): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val index = InvertedIndex.build(docs, "doc_id", "text")
    val nDocs = docs.count()
    val avgDl = index.select(col("doc_id"), col("dl")).distinct()
      .agg(avg(col("dl"))).head.getDouble(0)
    val lexical = InvertedIndex.bm25Query(index, nDocs, avgDl, terms, k)

    // "semantic" stand-in: token-set Jaccard against the probe doc
    // (broadcast one row; map-side scoring; partial top-k)
    val tok = InvertedIndex.tokensCol("text")
    val probe = docs.filter(col("doc_id") === probeDocId)
      .select(array_distinct(tok).as("ptoks"))
    val semantic = docs
      .crossJoin(broadcast(probe))
      .select(col("doc_id"),
        (size(array_intersect(array_distinct(tok), col("ptoks")))
          .cast("double") /
          size(array_union(array_distinct(tok), col("ptoks"))))
          .as("score"))
      .filter(col("doc_id") =!= probeDocId)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

    rrf(Seq(lexical, semantic), "doc_id", k)
  }
}

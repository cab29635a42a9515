package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted text index — token → posting-list search over a document
  * corpus, the shape that answers keyword queries at 100 TB without
  * ever scanning text at query time.
  *
  * [[build]] makes one pass over the corpus: tokenize, count term
  * frequency per (token, doc), and attach each token's document
  * frequency (a window over the token-partitioned frame — same shuffle
  * the posting layout needs anyway). An optional `maxDfRatio` drops
  * tokens appearing in more than that share of documents — stopword
  * posting lists are the index's skew risk (a token in EVERY doc has a
  * |corpus|-long list), and capping df bounds every list the query
  * path can touch.
  *
  * [[write]] lands the postings range-partitioned AND sorted by token,
  * so parquet footer min/max prune per-term probes to the files whose
  * token range covers them — InvertedIndexSpec asserts the scan's
  * `PushedFilters` carries the term predicate into the reader.
  *
  * Query shapes (both O(Σ posting-list length of the query terms),
  * never O(corpus)):
  *  - [[andQuery]]: docs containing ALL terms = filter the postings to
  *    the term set (pushed to the scan), then one groupBy(doc) whose
  *    distinct-token count must equal |terms| — the classic
  *    intersect-by-count, one bounded shuffle.
  *  - [[rankedQuery]]: tf-idf scoring — idf from the df column already
  *    in the index, per-doc score = Σ tf·idf over matched terms, rank-1
  *    window top-k (`WindowGroupLimitExec`, map-side partial top-k).
  */
object InvertedIndex {

  /** Tokenization shared by build and the spec's brute-force oracle:
    * lowercase, split on non-alphanumerics, drop empties.
    */
  def tokensCol(textCol: String) =
    filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")

  /** One corpus pass → (token, doc_id, tf, dl, df) postings; `dl` is
    * the document's token length, carried on the posting so length-
    * normalized scorers (BM25) stay index-only at query time.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      maxDfRatio: Option[Double] = None): DataFrame = {
    val postings = docs
      .select(col(idCol).as("doc_id"), tokensCol(textCol).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"),
        size(col("toks")).cast("long").as("dl"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
    maxDfRatio match {
      case None => postings
      case Some(r) =>
        val n = docs.count().toDouble
        postings.filter(col("df") <= lit(r * n))
    }
  }

  /** Land the index token-sorted so per-term probes prune at the file
    * and row-group level.
    */
  def write(index: DataFrame, path: String, nFiles: Int): Unit =
    index.repartitionByRange(nFiles, col("token"))
      .sortWithinPartitions("token")
      .write.parquet(path)

  /** Docs containing ALL `terms` (conjunctive query). */
  def andQuery(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    index.filter(col("token").isin(terms.distinct: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched")) // (token, doc) is unique
      .filter(col("n_matched") === terms.distinct.size)
      .select("doc_id")
  }

  /** Top-k docs by tf-idf over `terms` (disjunctive, ranked). idf =
    * ln(N / df) from the index's own df column; ties break on doc_id
    * so results are deterministic. The limit plans as
    * `TakeOrderedAndProject` — per-partition partial top-k, never a
    * global sort or a one-partition window.
    */
  def rankedQuery(index: DataFrame, nDocs: Long, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty && k > 0)
    index.filter(col("token").isin(terms.distinct: _*))
      .groupBy("doc_id")
      .agg(sum(col("tf") * log(lit(nDocs.toDouble) / col("df")))
        .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Top-k docs by BM25 (Robertson/Spärck Jones, the standard lexical
    * ranker): idf = ln(1 + (N − df + 0.5)/(df + 0.5)), tf saturation
    * k1, length normalization b against `avgDl` (the corpus mean
    * token length — one number, computed once at index time and passed
    * in, so the query stays a pure posting-list pass). Same
    * `TakeOrderedAndProject` partial top-k as [[rankedQuery]].
    */
  def bm25Query(index: DataFrame, nDocs: Long, avgDl: Double,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k > 0)
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgDl)))
    index.filter(col("token").isin(terms.distinct: _*))
      .groupBy("doc_id")
      .agg(sum(idf * tfNorm).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** [[bm25Query]] for a whole PROBE SET in one plan: `probeTerms`
    * carries (probe_id, token) — each probe's term list, exploded —
    * and the result is each probe's top-k (probe_id, doc_id, score).
    * The per-probe formula, tie-break and k-cap are byte-identical to
    * [[bm25Query]]'s (the per-probe `terms.distinct` dedup becomes the
    * frame-side `distinct()` here); the win is ONE pass over the
    * matched posting lists for ALL probes instead of |probes| separate
    * jobs — the retrieval consumer issuing thousands of probes per
    * tick ([[graft.operators.HybridSearch.searchMaintainedBatch]]).
    * The probe set is broadcast (bounded by contract: probes × terms,
    * never a corpus).
    */
  def bm25QueryBatch(index: DataFrame, nDocs: Long, avgDl: Double,
      probeTerms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0)
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgDl)))
    index
      .join(broadcast(probeTerms.select("probe_id", "token").distinct()),
        Seq("token"))
      .groupBy("probe_id", "doc_id")
      .agg(sum(idf * tfNorm).as("score"))
      .withColumn("__rn", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("__rn") <= k)
      .select("probe_id", "doc_id", "score")
  }
}

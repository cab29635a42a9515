package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.sources.Tables

/** SURVEY.md §2.4 `q_wordcount` (THE canonical MapReduce app) and §2.10
  * north-star LLM-pipeline operators: dedup, similarity search, text
  * analysis over `documents` / `embeddings`.
  *
  * Scale notes (the 100 TB design rule, SURVEY.md §7.5):
  *  - exact dedup is a hash groupBy on md5(text) — pure MapReduce shape,
  *    shuffles 16-byte digests not documents;
  *  - near-dup runs blocking-key grouping (the LSH banding step) and only
  *    joins WITHIN blocks — never the O(n²) all-pairs product;
  *  - similarity search broadcasts the probe side (1 row) so the big
  *    embedding table is scanned exactly once with no shuffle at all.
  * Extended (non-contract) variants — MinHash/SimHash/ANN — live in
  * graft.operators.DedupExtras / SimilarityExtras.
  */
object PipelineQueries {

  /** Dot product of two double arrays as a codegen'd higher-order
    * expression (no UDF): left-to-right sum, matching the oracle's
    * list_sum(list_transform(...)) evaluation order.
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // maple emits (word, 1) per token; juice sums [SPEC][MR]. Here:
    // explode → partial hash agg (combiner) → final agg. Empty tokens
    // dropped on both engines (FIXTURES.md gotcha 4).
    "q_wordcount" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))),

    // Exact dedup: keep min(doc_id) per content digest.
    "q_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy("h")),

    // Near-dup candidates: docs sharing a (lang, md5-of-first-3-tokens)
    // blocking key; pairs emitted only within a block, via the salted
    // self-pairing so a hot blocking key (boilerplate headers, empty
    // docs) spreads over 8 tasks instead of stalling one — the
    // quadratic-block guard AQE cannot provide. Output is identical to
    // the plain within-block join (SaltingSpec proves it under a
    // planted hot block).
    "q_dedup_near" -> ((s, d) => {
      val keyed = Tables.documents(s, d).select(
        col("doc_id"), col("lang"), DedupExtras.blockingKey.as("bk"))
      Salting.saltedSelfPairs(keyed, Seq("lang", "bk"), "doc_id", 8)
        .select(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"))
        .orderBy("doc_id1", "doc_id2")
    }),

    // Top-10 cosine neighbors of probe vec_id=0. Probe side is 1 row →
    // broadcast; big side never shuffles; top-k is TakeOrderedAndProject.
    "q_sim_cosine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("e", col("embedding").cast("array<double>"))
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("e").as("p"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"),
          round(dot(col("e"), col("p")) / (norm(col("e")) * norm(col("p"))), 4)
            .as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Text analysis: per-language doc count / char volume / mean length.
    "q_text_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          round(sum(col("n_chars")).cast(DoubleType) / count(lit(1)), 2)
            .as("avg_chars"))
        .orderBy("lang")),

    // Deterministic train/val/test assignment by md5 bucket — the
    // held-out-split primitive of a training-data pipeline. The split
    // is a pure function of the stable doc_id (no RNG, no sampling
    // nondeterminism), so it is reproducible across runs, engines, and
    // partitionings, and any doc keeps its split as the corpus grows.
    // Lexicographic thresholds on the hex digest give ~80/10/10
    // ('cc'/256 ≈ .797, 'e6' ≈ .898). Single scan + one hash agg.
    "q_sample_split" -> ((s, d) => {
      val h = md5(col("doc_id").cast("string").cast("binary"))
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"),
          when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
            .as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang", "split")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_wordcount" ->
      """SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_dups
        |FROM documents GROUP BY h ORDER BY h""".stripMargin,
    "q_dedup_near" ->
      """WITH keyed AS (
        |  SELECT doc_id, lang,
        |    md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS bk
        |  FROM documents)
        |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2
        |FROM keyed a JOIN keyed b
        |  ON a.lang = b.lang AND a.bk = b.bk AND a.doc_id < b.doc_id
        |ORDER BY doc_id1, doc_id2""".stripMargin,
    "q_sim_cosine" ->
      """WITH probe AS (
        |  SELECT embedding FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT b.vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE))) AS dot,
        |    sqrt(list_sum(list_transform(b.embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb,
        |    sqrt(list_sum(list_transform(p.embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS np
        |  FROM embeddings b, probe p WHERE b.vec_id <> 0)
        |SELECT vec_id, ROUND(dot / (nb * np), 4) AS sim
        |FROM pairs ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  ROUND(SUM(n_chars) * 1.0 / COUNT(*), 2) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_sample_split" ->
      """WITH tagged AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
        |         WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM tagged GROUP BY lang, split ORDER BY lang, split""".stripMargin
  )
}

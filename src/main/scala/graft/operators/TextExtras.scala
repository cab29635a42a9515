package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline (SURVEY.md
  * §2.12): language identification, quality scoring, token counting,
  * and document fingerprinting over `documents`.
  *
  * All single-scan + one-shuffle shapes: per-doc features are computed
  * with codegen-friendly builtins / native higher-order expressions
  * (never a UDF), and only small derived columns ever shuffle.
  */
object TextExtras {

  /** Marker lexicon for the n-gram/keyword language-ID heuristic. The
    * synthetic corpus shares one vocabulary across languages, so the
    * lexicon is a deterministic demonstration dictionary; swap in real
    * per-language stopword lists for natural text.
    */
  private[operators] val langMarkers: Seq[(String, String, String)] = Seq(
    ("en", "the", "scan"), ("es", "table", "sort"), ("de", "merge", "window"),
    ("fr", "key", "order"), ("zh", "column", "part"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Language-ID: score each candidate language by marker-token
    // occurrences, pick argmax (deterministic tiebreak on language
    // code), report the confusion matrix against the labeled lang.
    "q_text_langid" -> ((s, d) => {
      import s.implicits._
      val dict = langMarkers.toDF("cand", "w1", "w2")
      val scored = Tables.documents(s, d)
        .crossJoin(broadcast(dict))
        .select(col("doc_id"), col("lang"), col("cand"),
          expr("size(filter(split(text, ' '), t -> t = w1 OR t = w2))")
            .as("score"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("cand"))
      scored
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("lang"), col("cand").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred_lang")
    }),

    // Quality score: length saturation + stopword ratio + char-count
    // band, rounded to 4 dp. Pure per-row arithmetic — no shuffle at
    // all except the output sort.
    "q_text_quality" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          expr("size(split(text, ' '))").cast("long").as("n_toks"),
          expr("size(filter(split(text, ' '), t -> t in ('the','scan','table')))")
            .as("n_stop"),
          col("n_chars"))
        .select(col("doc_id"), col("n_toks"),
          round(
            least(col("n_toks") / 400.0, lit(1.0)) * 0.5 +
              (col("n_stop") * lit(1.0) / col("n_toks")) * 0.3 +
              when(col("n_chars").between(200, 400), 0.2).otherwise(0.0),
            4).as("score"))
        .orderBy("doc_id")),

    // Token counting per source: whitespace tokens and a regex ("BPE-ish
    // pre-tokenizer") token count, plus mean tokens per doc.
    "q_text_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(expr("size(filter(split(text, ' '), t -> t <> ''))"))
            .as("ws_tokens"),
          sum(size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))))
            .as("re_tokens"),
          round(
            sum(expr("size(filter(split(text, ' '), t -> t <> ''))")) * lit(1.0)
              / count(lit(1)), 2).as("avg_tokens"))
        .orderBy("source")),

    // Top-20 token bigrams — n-gram frequency analysis (explode once,
    // hash agg, TakeOrderedAndProject). The token array is computed
    // BEFORE the exchange so the pairing below consumes an attribute:
    // with the split inlined, the per-position lambda would re-split
    // the text once per token — O(T²) char work per doc (this query
    // was the slowest in the round-2 bench for exactly that reason).
    // zip_with(toks, tail(toks)) then pairs all bigrams in one pass.
    "q_text_ngrams" -> ((s, d) =>
      Tables.documents(s, d)
        .select(split(col("text"), " ").as("toks"), col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          """zip_with(slice(toks, 1, size(toks) - 1),
            |  slice(toks, 2, size(toks) - 1),
            |  (x, y) -> concat(x, ' ', y))""".stripMargin))
          .as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(20)),

    // Exact heavy hitters — tokens with > 0.5% corpus share — via
    // per-partition Misra–Gries candidate summaries + exact recount
    // (HeavyHitters scaladoc has the n/(k+1) superset bound; k = 512
    // comfortably covers den = 200). Pass-1 shuffle is ≤ k rows per
    // partition no matter the vocabulary size; pass 2 recounts only
    // the broadcast candidates. The oracle spells the exact semantics
    // as the direct group-count-filter.
    "q_text_heavyhitters" -> ((s, d) => {
      import s.implicits._
      HeavyHitters.frequentItems(
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "").as[String],
        k = 512, den = 200)
    }),

    // Chained pipeline (the reference's multi-job chain as ONE plan):
    // quality-filter → exact dedup per (digest, lang) → per-lang stats.
    // Catalyst fuses the stages; only the dedup groupBy and final agg
    // shuffle, and only tiny derived columns move.
    "q_pipeline_chain" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          md5(col("text").cast("binary")).as("h"),
          expr("size(filter(split(text, ' '), t -> t <> ''))").as("n_toks"))
        .filter(col("n_toks") >= 30)
        .groupBy("h", "lang")
        .agg(min(col("doc_id")).as("keep_id"), min(col("n_toks")).as("n_toks"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
        .orderBy("lang")),

    // Document fingerprint: min-sampled digest over the rolling window
    // of token 4-grams (winnowing with w = document length). Identical
    // fingerprints ⇒ shared minimal shingle ⇒ near/exact dup group.
    "q_text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        // tokenize BEFORE the exchange: downstream the lambda slices a
        // materialized attribute instead of re-splitting the text per
        // 4-gram position (O(T²) otherwise). The repartition doubles as
        // the CPU spread for the digest (explicit count so AQE's
        // size-based coalesce cannot re-serialize it).
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), expr(
          """array_min(transform(
            |  sequence(1, greatest(size(toks) - 3, 1)),
            |  i -> md5(cast(concat_ws(' ', slice(toks, i, 4)) as binary))))"""
            .stripMargin).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
        .filter(col("n_docs") > 1)
        .orderBy("fp")),

    // Context-window chunking (training-prep: long docs → overlapping
    // token windows of 16, stride 12). Tokenize once, explode the
    // stride sequence, slice per chunk — one Generate over a
    // materialized token array, no shuffle except the output sort.
    // Chunk count per doc is ceil(n_toks/stride): data-proportional
    // fan-out, so the stage scales like the corpus, not like a join.
    "q_text_chunk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - 1, lit(12)))
            .as("st"))
        .select(col("doc_id"),
          (col("st") / 12).cast("long").as("chunk_idx"),
          col("st").cast("long").as("tok_start"),
          least(lit(16), size(col("toks")) - col("st")).cast("long")
            .as("n_toks"),
          array_join(slice(col("toks"), col("st") + 1, lit(16)), " ")
            .as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")),

    // Quality-filter manifest: keep/drop verdict per doc with the FIRST
    // failing rule as the reason (token-count band, then alphabetic
    // character ratio). Pure per-row arithmetic — the alpha ratio
    // divides two exact integer lengths as doubles, so both engines run
    // the identical IEEE division before the 4-dp round. A manifest
    // (not a filtered table) is the auditable shape at scale: the drop
    // reasons aggregate into the corpus-quality report for free.
    "q_quality_filter" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_toks"),
          (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
            length(col("text"))).as("ar"))
        .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
          round(col("ar"), 4).as("alpha_ratio"),
          when(col("n_toks") < 20, "too_short")
            .when(col("n_toks") > 90, "too_long")
            .when(col("ar") < 0.81, "low_alpha")
            .otherwise("keep").as("verdict"),
          when(col("n_toks") < 20 || col("n_toks") > 90 || col("ar") < 0.81,
            0L).otherwise(1L).as("kept"))
        .orderBy("doc_id")),

    // Corpus-trained bigram-LM cross-entropy per doc — the KenLM-shaped
    // quality signal that pairs with q_quality_filter's rule bands
    // (CCNet scores docs by LM perplexity; low-entropy ≈ fluent).
    // Model: Laplace-smoothed conditional P(w2|w1) = (c2+1)/(c1+V) with
    // c2/c1 the corpus bigram/prefix counts and V the corpus vocab —
    // every quantity an EXACT integer, so both engines run the
    // identical IEEE division before the one libm ln() per term.
    // Per-doc Σln accumulates doubles (same accepted risk + margin
    // argument as q_agg_theil; 4-dp round absorbs ~1e-13 spread).
    // Scale shape: the bigram frame is ONE corpus explode materialized
    // once for its three consumers (c2, c1, scoring pass); the model
    // (c2 ∪ c1 ∪ V) is the trained artifact and BROADCASTS — scoring is
    // map-side-only over the corpus, exactly how a shipped KenLM scores
    // 100 TB (a web-scale c2 that outgrows broadcast would shuffle-join
    // on (w1,w2) instead; the plan shape downstream is unchanged).
    "q_quality_lm" -> ((s, d) => {
      val tk = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val big = graft.Materialize.checkpoint(
        tk.filter(size(col("toks")) >= 2)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(toks) - 1),
              |  i -> struct(element_at(toks, i) as w1,
              |              element_at(toks, i + 1) as w2))""".stripMargin))
            .as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
      val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val c1 = big.groupBy("w1").agg(count(lit(1)).as("cu"))
      val v = tk.select(explode(col("toks")).as("tok"))
        .agg(countDistinct(col("tok")).as("vocab"))
      big.join(broadcast(c2), Seq("w1", "w2"))
        .join(broadcast(c1), Seq("w1"))
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          log((col("cb") + 1).cast("double") /
            (col("cu") + col("vocab")).cast("double")).as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(-sum(col("lp")) / count(lit(1)), 4).as("xent"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_text_langid" ->
      """WITH scores AS (
        |  SELECT d.doc_id, d.lang, m.lang AS cand,
        |    len(list_filter(string_split(d.text,' '), t -> t = m.w1 OR t = m.w2)) AS score
        |  FROM documents d CROSS JOIN (
        |    VALUES ('en','the','scan'), ('es','table','sort'), ('de','merge','window'),
        |           ('fr','key','order'), ('zh','column','part')) AS m(lang, w1, w2)),
        |pred AS (
        |  SELECT doc_id, lang, cand AS pred_lang,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        |  FROM scores)
        |SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM pred WHERE rn = 1 GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,
    "q_text_quality" ->
      """WITH q AS (
        |  SELECT doc_id, len(string_split(text,' ')) AS n_toks,
        |    len(list_filter(string_split(text,' '), t -> t IN ('the','scan','table'))) AS n_stop,
        |    n_chars
        |  FROM documents)
        |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
        |  ROUND(LEAST(n_toks/400.0, 1.0)*0.5 + (n_stop*1.0/n_toks)*0.3 +
        |    (CASE WHEN n_chars BETWEEN 200 AND 400 THEN 0.2 ELSE 0.0 END), 4) AS score
        |FROM q WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q_text_tokens" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(text,' '), t -> t <> ''))) AS BIGINT) AS ws_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS re_tokens,
        |  ROUND(SUM(len(list_filter(string_split(text,' '), t -> t <> '')))*1.0/COUNT(*), 2) AS avg_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_text_ngrams" ->
      """WITH grams AS (
        |  SELECT unnest(list_transform(range(1, len(string_split(text,' '))),
        |    i -> array_to_string(string_split(text,' ')[i:i+1], ' '))) AS bigram
        |  FROM documents WHERE len(string_split(text,' ')) >= 2)
        |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM grams GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,
    // Exact semantics of the two-pass Misra–Gries plan: plain
    // group-count against the total, integer threshold compare, one
    // IEEE division → 4 dp.
    "q_text_heavyhitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(text,' '), t -> t <> '')) AS word
        |  FROM documents),
        |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c)
        |SELECT word, cnt, ROUND(CAST(cnt AS DOUBLE)/n, 4) AS share
        |FROM c, t WHERE cnt*200 > n
        |ORDER BY cnt DESC, word""".stripMargin,
    "q_pipeline_chain" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, md5(text) AS h,
        |    len(list_filter(string_split(text,' '), t -> t <> '')) AS n_toks
        |  FROM documents),
        |quality AS (SELECT * FROM toks WHERE n_toks >= 30),
        |dedup AS (
        |  SELECT h, lang, MIN(doc_id) AS keep_id, MIN(n_toks) AS n_toks
        |  FROM quality GROUP BY h, lang)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        |FROM dedup GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_fingerprint" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    list_min(list_transform(range(1, greatest(len(string_split(text,' '))-2, 2)),
        |      i -> md5(array_to_string(string_split(text,' ')[i:i+3], ' ')))) AS fp
        |  FROM documents)
        |SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS keep_id
        |FROM f GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""".stripMargin,
    // DuckDB list slice [a:b] is 1-based INCLUSIVE of both ends
    // (CLAUDE.md): [st+1 : st+16] = 16 elements = Spark slice(toks,
    // st+1, 16); both clamp at the array end for the final short chunk
    "q_text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 12)) AS st
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id, CAST(st // 12 AS BIGINT) AS chunk_idx,
        |  CAST(st AS BIGINT) AS tok_start,
        |  CAST(LEAST(16, len(toks) - st) AS BIGINT) AS n_toks,
        |  array_to_string(toks[st+1 : st+16], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_quality_filter" ->
      """WITH f AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS ar
        |  FROM documents)
        |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
        |  ROUND(ar, 4) AS alpha_ratio,
        |  CASE WHEN n_toks < 20 THEN 'too_short'
        |       WHEN n_toks > 90 THEN 'too_long'
        |       WHEN ar < 0.81 THEN 'low_alpha'
        |       ELSE 'keep' END AS verdict,
        |  CAST(CASE WHEN n_toks < 20 OR n_toks > 90 OR ar < 0.81
        |       THEN 0 ELSE 1 END AS BIGINT) AS kept
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_quality_lm" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE length(text) > 0),
        |big AS (
        |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        |  FROM tk, UNNEST(range(1, len(toks))) AS t(i)),
        |v AS (SELECT COUNT(DISTINCT tok) AS vocab
        |      FROM (SELECT UNNEST(toks) AS tok FROM tk)),
        |c2 AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
        |c1 AS (SELECT w1, COUNT(*) AS cu FROM big GROUP BY 1)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  ROUND(-SUM(LN(CAST(cb + 1 AS DOUBLE) / CAST(cu + vocab AS DOUBLE)))
        |        / COUNT(*), 4) AS xent
        |FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}

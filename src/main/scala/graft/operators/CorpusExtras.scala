package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.sources.{Stats, Tables}

/** Corpus-level training-data-pipeline operators (SURVEY.md §2.12):
  * vocabulary building, repetition-based quality scoring, deterministic
  * stratified sampling, and benchmark-contamination checking over
  * `documents`.
  *
  * These are the corpus-curation steps that sit between raw crawl and
  * tokenizer in an LLM data pipeline; each is expressed as a declarative
  * plan whose shuffles carry only small derived columns (tokens,
  * digests, counts) — never document text — so every shape survives a
  * 100 TB corpus.
  */
object CorpusExtras {

  /** Deterministic md5 split tag shared with q_sample_split
    * (PipelineQueries): a pure function of the stable doc_id, so the
    * benchmark membership below is reproducible across engines/runs.
    */
  private def splitTag: Column = {
    val h = md5(col("doc_id").cast("string").cast("binary"))
    when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
  }

  /** Min-sampled 4-gram digest — the same winnowing fingerprint as
    * q_text_fingerprint (TextExtras); contamination below keys on it so
    * near-identical docs collide even when not byte-identical.
    */
  private val fingerprintSql =
    """array_min(transform(
      |  sequence(1, greatest(size(toks) - 3, 1)),
      |  i -> md5(cast(concat_ws(' ', slice(toks, i, 4)) as binary))))"""
      .stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Vocabulary building: document frequency + total term frequency
    // per token, min-df pruned, top-30. The df computation is the
    // scalable two-level shape: first aggregate (token, doc_id) so the
    // exploded token stream partial-aggregates map-side and df is then
    // a count of already-distinct pairs — never a distinct over the
    // raw token stream, never a collected posting list.
    "q_text_vocab" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
        .groupBy("token", "doc_id")
        .agg(count(lit(1)).as("n"))
        .groupBy("token")
        .agg(count(lit(1)).as("df"), sum(col("n")).as("tf"))
        .filter(col("df") >= 5)
        .orderBy(col("df").desc, col("tf").desc, col("token"))
        .limit(30)),

    // Lexical-diversity profile per language: vocabulary size,
    // type-token ratio, top-token share, and the Simpson
    // concentration index Σ(tf/N)² — the corpus-health gauge that
    // flags template/boilerplate floods (diversity collapses) before
    // they poison a training mix. Same two-level aggregate shape as
    // q_text_vocab: tokens collapse to (lang, token, tf) map-side,
    // then ≤ |langs|×|vocab| rows aggregate to one row per language —
    // no posting list and no token string survives the first
    // exchange. tf sums are exact integers; the three ratios are
    // single IEEE divisions of exact integers (tf² summed in DECIMAL
    // in case a 100 TB corpus pushes Σtf² past int64) → 4 dp.
    "q_text_diversity" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("tf"))
        .groupBy("lang")
        .agg(count(lit(1)).as("vocab"), sum(col("tf")).as("tokens"),
          max(col("tf")).as("top_tf"),
          sum(col("tf").cast("decimal(19,0)") * col("tf")).as("sq"))
        .select(col("lang"), col("vocab"), col("tokens"),
          round(col("vocab").cast("double") / col("tokens"), 4).as("ttr"),
          round(col("top_tf").cast("double") / col("tokens"), 4)
            .as("top_share"),
          round(col("sq").cast("double") /
            (col("tokens").cast("double") * col("tokens").cast("double")), 4)
            .as("simpson"))
        .orderBy("lang")),

    // Repetition-based quality: fraction of duplicate token 3-grams —
    // the "excessive repetition" filter of web-corpus curation. Gram
    // totals and distinct counts are exact integers, so per-lang sums
    // are engine-exact and the corpus ratio is one deterministic
    // division; the per-doc flag compares integers (u < t), never
    // floats. Single scan + one hash agg; only 3 ints shuffle per doc.
    "q_text_repetition" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
        // materialize `toks` behind the exchange: the per-position
        // lambda below would otherwise re-split the text per 3-gram
        // position — O(T²) char work per doc (same discipline as
        // q_text_fingerprint); explicit count so AQE cannot coalesce
        // the CPU-heavy stage.
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("lang"), expr(
          """transform(sequence(1, greatest(size(toks) - 2, 1)),
            |  i -> concat_ws(' ', slice(toks, i, 3)))""".stripMargin)
          .as("grams"))
        .select(col("lang"), size(col("grams")).as("t"),
          size(array_distinct(col("grams"))).as("u"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("t")).as("sum_grams"),
          sum(col("u")).as("sum_uniq"),
          round(lit(1.0) - sum(col("u")).cast(DoubleType) / sum(col("t")), 4)
            .as("corpus_rep"),
          sum(when(col("u") < col("t"), 1L).otherwise(0L)).as("n_flagged"))
        .orderBy("lang")),

    // Corpus boilerplate share: fraction of each doc's 3-gram
    // occurrences whose shingle sits in the top 1% of the corpus by
    // document frequency — the CCNet-style duplicated-paragraph signal
    // (headers, footers, licence blocks repeat VERBATIM across docs).
    // The percentile threshold is rank-selected from the df HISTOGRAM
    // (≤ max-df distinct values — the window runs over that bounded
    // relation, never the gram table), so the definition is
    // SF-adaptive with no tuned absolute cutoff. Corpus-scale work:
    // the (doc, gram) aggregate (checkpointed — the df aggregate and
    // the share join both consume it), the gram-df aggregate
    // (checkpointed — histogram, count, and join consume it), and one
    // key-partitioned join on gram; shuffles carry grams and counts,
    // never text.
    "q_text_boilerplate" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
        // materialize toks behind the exchange (q_text_repetition
        // discipline): the per-position lambda would otherwise
        // re-split text per gram position — O(T²) char work per doc.
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        // gram identity is xxhash64 of the window's joined string, not
        // the string itself: the gram text never reaches the output
        // (only per-lang counts do), so an 8-byte long key replaces an
        // ~15-25-byte string through BOTH corpus-scale aggregates and
        // the df join — fewer shuffle bytes, cheaper hash/compare —
        // exactly the SpanDedup.spanHashes trade (collision rate
        // ~2^-64 per pair, oracle-checked at the verify SFs).
        .select(col("doc_id"), col("lang"), explode(expr(
          """transform(sequence(1, greatest(size(toks) - 2, 1)),
            |  i -> xxhash64(concat_ws(' ', slice(toks, i, 3))))"""
            .stripMargin))
          .as("gram"))
      val dg = graft.Materialize.checkpoint(
        grams.groupBy("doc_id", "lang", "gram").agg(count(lit(1)).as("c")))
      val df = graft.Materialize.checkpoint(
        dg.groupBy("gram").agg(count(lit(1)).as("df")))
      val cw = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = df.groupBy(col("df").as("v")).agg(count(lit(1)).as("k"))
        .withColumn("cum", sum("k").over(cw))
        .crossJoin(broadcast(df.agg(count(lit(1)).as("ng"))))
        .filter(col("cum") >=
          ceil(col("ng").cast("double") * lit(0.99)).cast("long"))
        .agg(min("v").as("thr"))
      dg.join(df, "gram")
        .crossJoin(broadcast(thr))
        .groupBy("doc_id", "lang")
        .agg(sum("c").as("t"),
          sum(when(col("df") >= col("thr"), col("c")).otherwise(0L))
            .as("fr"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("t").as("total_grams"),
          sum("fr").as("boiler_grams"),
          round(sum("fr").cast("double") / sum("t"), 4).as("boiler_share"),
          sum(when(col("fr") * 10 > col("t"), 1L).otherwise(0L))
            .as("n_flagged"))
        .orderBy("lang")
    }),

    // Deterministic stratified sample: exactly ceil(10%) of each lang
    // stratum, chosen by md5-hash order — a reproducible per-stratum
    // quota with no RNG. Exact quotas need a per-stratum rank, and a
    // naive `row_number() over (partition by lang)` funnels the whole
    // corpus through |lang| sort tasks — the low-cardinality-key
    // scale-killer RankSelect exists to avoid (RankSelect.scala:7). So
    // the rank comes from RankSelect.withGlobalRank at (lang × bucket)
    // parallelism instead: the bucketable sort value is the first 60
    // bits of the md5 as a long (fixed-width lowercase hex compares
    // identically as string and as integer), ties broken by the full
    // hex + zero-padded doc_id — exactly the oracle's (md5, doc_id)
    // order. The integer quota `(n + 9) div 10` is computed from the
    // exact per-stratum count, never ceil(n·0.1) in doubles (IEEE
    // n·0.1 can land one ulp ABOVE n/10 at multiples of 10 and shift
    // the quota by one).
    "q_sample_stratified" -> ((s, d) => {
      val h = md5(col("doc_id").cast("string").cast("binary"))
      // A NULL lang is NOT a stratum: RankSelect's build drops
      // NULL-group rows, so the exclusion is made explicit here AND in
      // the oracle (WHERE lang IS NOT NULL) — fixtures have no NULL
      // langs today, but a regeneration with them must not silently
      // diverge the two engines.
      val docs = Tables.documents(s, d)
        .filter(col("lang").isNotNull)
        .select(col("lang"), col("n_chars"), col("doc_id"),
          conv(substring(h, 1, 15), 16, 10).cast("long").as("__hv"),
          concat(h, lit("|"),
            lpad(col("doc_id").cast("string"), 19, "0")).as("__tk"))
      RankSelect.withGlobalRank(docs, "lang", "__hv", "__tk",
          carry = Seq("n_chars", "doc_id"))
        .filter(expr("__rank <= (__n + 9) div 10"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"))
        .orderBy("lang")
    }),

    // Data-mixture materialization: per-source sampling rates turned
    // into actual training rows — integer epochs (upsampling) emit
    // floor(rate) copies, the fractional remainder is a deterministic
    // per-doc hash inclusion (a'la the md5 split: no RNG, exact rate
    // in expectation, stable across runs/engines). Rates 0.25/0.75/
    // 1.5/2.25 cycle by source index. The explode emits (doc, epoch)
    // PAIRS — document text is never replicated; at 100 TB the mix
    // manifest is ids + epochs, and the text joins in exactly once at
    // the consumer.
    "q_sample_mixture" -> ((s, d) => {
      val m = expr("cast(substring(source, 4) as int)") % 4
      val h = md5(concat(col("doc_id").cast("string"), lit(":mix"))
        .cast("binary"))
      val base = when(m === 2, 1).when(m === 3, 2).otherwise(0)
      val thr = when(m === 0, "40").when(m === 1, "c0")
        .when(m === 2, "80").otherwise("40")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          (base + when(h < thr, 1).otherwise(0)).as("n_copies"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          posexplode(expr("array_repeat(1, n_copies)")).as(Seq("epoch", "one")))
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs_used"),
          count(lit(1)).as("n_emitted"),
          sum(col("n_chars")).as("sum_chars_emitted"))
        .orderBy("source")
    }),

    // Per-language top terms by TF-IDF: language-local term frequency ×
    // inverse global document frequency — the keyword-extraction step
    // of corpus analysis. IDF is the exact integer ratio N/df (one
    // IEEE double division, identical in both engines) instead of the
    // usual log-IDF: ln() can differ in the last ulp across engines,
    // and for a FIXED tf the ranking under N/df and ln(N/df) is the
    // same monotone order. Both aggregates are the scalable two-level
    // shapes (map-side partial combine); the df side joins the tf side
    // token-to-token — no posting lists, no collect (N is the memoized
    // per-(dir, table) stats count, same class as the LSH width probe).
    "q_text_tfidf" -> ((s, d) => {
      val n = Stats.rowCount(s, d, "documents")
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
      val tfl = tok.groupBy("lang", "token").agg(count(lit(1)).as("tf"))
      val df = tok.select("token", "doc_id").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("lang")
        .orderBy(col("score_raw").desc, col("token"))
      tfl.join(df, "token")
        .select(col("lang"), col("token"),
          ((col("tf") * n).cast("double") / col("df")).as("score_raw"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("lang"), col("token"),
          round(col("score_raw"), 4).as("tfidf"))
        .orderBy(col("lang"), col("tfidf").desc, col("token"))
    }),

    // Per-document keyword extraction (round 9, wave 9): top-3 tokens
    // by TF-IDF per doc — the metadata-enrichment step that tags every
    // training document with its salient terms. Same integer-ratio IDF
    // as q_text_tfidf (N/df, no ln — ulp-portable and order-equivalent
    // for fixed tf). The rank window partitions by doc_id: parallelism
    // is |docs| (data-proportional, never a handful of tasks), each
    // partition is one doc's bounded vocabulary, and rn <= 3 compiles
    // to WindowGroupLimit so only 3 survivors per doc leave the window.
    // Shuffles carry (doc_id, token, counts) — never text.
    "q_text_keywords" -> ((s, d) => {
      val n = Stats.rowCount(s, d, "documents")
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tok.select("token", "doc_id").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_raw").desc, col("token"))
      tf.join(df, "token")
        .select(col("doc_id"), col("token"),
          ((col("tf") * n).cast("double") / col("df")).as("score_raw"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("token"),
          round(col("score_raw"), 4).as("tfidf"))
        .orderBy(col("doc_id"), col("tfidf").desc, col("token"))
    }),

    // Sequence packing: docs greedily packed into fixed-token-budget
    // (512) bins per source shard — the batch-prep step that turns a
    // ragged corpus into near-uniform training sequences. Deterministic
    // shard-local order (md5 of doc_id — no RNG, reproducible across
    // engines/partitionings), running token cumsum assigns each doc the
    // bin its predecessor total falls in (integer div — exact in both
    // engines). Packing is per-shard by construction, so the window
    // parallelizes across sources and never needs a global sort; a
    // shard larger than memory sort-spills.
    "q_sample_pack" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          expr("size(filter(split(text, ' '), t -> t <> ''))").cast("long")
            .as("n_toks"),
          md5(concat(col("doc_id").cast("string"), lit(":pack"))
            .cast("binary")).as("h"))
        .withColumn("cum", sum(col("n_toks")).over(w))
        .select(col("source"), expr("(cum - n_toks) div 512").as("bin"),
          col("n_toks"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("sum_toks"))
        .orderBy("source", "bin")
    }),

    // Benchmark-contamination check: training docs whose winnowing
    // fingerprint collides with any held-out (test-split) doc — the
    // n-gram-overlap decontamination step run before training. The
    // benchmark side reduces to DISTINCT fingerprints (small: the
    // held-out set), broadcasts, and the training side left-joins it —
    // at 100 TB the corpus never shuffles, only streams past the
    // broadcast digest set. Fingerprints are computed once
    // (Materialize.checkpoint) and feed both the benchmark and the
    // probe side.
    "q_dedup_contain" -> ((s, d) => {
      val f = graft.Materialize.checkpoint(
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("lang"), expr(fingerprintSql).as("fp"), splitTag.as("split")))
      val bench = f.filter(col("split") === "test")
        .select(col("fp")).distinct().withColumn("hit", lit(1))
      f.filter(col("split") === "train")
        .join(broadcast(bench), Seq("fp"), "left_outer")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_train"),
          count(col("hit")).as("n_contaminated"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_clean"))
        .orderBy("lang")
    }),

    // Within-document token co-occurrence with lift — the phrase-mining
    // / word-association primitive (what PMI tables and word2vec
    // negative-sampling stats are built from). Scale discipline:
    //  (1) per-doc token DEDUP is local (`array_distinct` on the
    //      carried split array — never a corpus-wide DISTINCT shuffle),
    //      so doc frequencies need one hash agg over exploded sets;
    //  (2) the vocabulary is df-thresholded (df ≥ |docs|/20), collapsed
    //      to a ONE-ROW sorted array, and returned to the corpus as a
    //      broadcast cross join; `array_intersect` restricts each doc
    //      to vocab tokens locally — no semi-join, no groupBy(doc_id):
    //      pairs are generated straight off the intersected SORTED
    //      array by i<j index walk, and the only remaining exchange is
    //      the pair-count agg, which partial-combines;
    //  (3) lift = |docs|·c(x,y) / (df(x)·df(y)) is one IEEE division
    //      of exact integer counts → 4 dp (products stay < 2⁶³ up to
    //      ~10⁹ docs). Thresholds scale with the memoized corpus row
    //      count, so the query is SF-invariant by construction.
    "q_text_cooccur" -> ((s, d) => {
      val nDocs = Stats.rowCount(s, d, "documents")
      val minDf = nDocs / 20L
      val minPair = nDocs / 50L
      val docSets = graft.Materialize.checkpoint(
        Tables.documents(s, d).select(
          expr("array_distinct(filter(split(text, ' '), t -> t <> ''))")
            .as("toks")))
      val vocab = docSets
        .select(explode(col("toks")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("df"))
        .filter(col("df") >= minDf)
      // r19 (guide §2.3 — shuffle keys instead of payloads): pairs
      // travel as ONE packed long of the two VOCAB INDICES, never as a
      // (string, string) struct. The broadcast vocab row carries the
      // lexicographically sorted token array `v` plus the POSITIONALLY
      // ALIGNED df array, so index order == output order, the pair
      // stream's struct build + string hashing/compare disappear
      // (profiled: the pair stage was ~2.0 s cpu of the query's 3.3 s
      // taskTime building ~253 string pairs per doc), and both former
      // re-attach joins collapse into element_at lookups on the
      // broadcast arrays. Indices are positions, not hashes — exact,
      // no collision trade. |vocab| is bounded by the df threshold
      // (df ≥ n/20 ⟹ |vocab| ≤ 20 · avg distinct tokens/doc), so the
      // index walk per doc and the 2^32 packing hold at any corpus
      // scale.
      val vstats = vocab
        .agg(sort_array(collect_list(struct(col("token"), col("df"))))
          .as("tv"))
        .select(expr("transform(tv, s -> s.token)").as("v"),
          expr("transform(tv, s -> s.df)").as("dfs"))
      val pairs = docSets
        .crossJoin(broadcast(vstats))
        // ascending vocab-index walk: sorted and distinct by
        // construction (toks is array_distinct'd)
        .select(expr(
          "filter(sequence(0, size(v) - 1), i -> array_contains(toks, v[i]))")
          .as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
            |  transform(slice(ids, i + 2, size(ids)),
            |    y -> x * 4294967296L + y)))""".stripMargin)).as("p"))
        .groupBy(col("p"))
        .agg(count(lit(1)).as("c_xy"))
        .filter(col("c_xy") >= minPair)
      pairs
        .crossJoin(broadcast(vstats))
        // 1-based element_at; `div` (never `/`, which is double
        // division on longs) recovers the 0-based indices exactly
        .withColumn("__ix", expr("cast(p div 4294967296L as int) + 1"))
        .withColumn("__iy", expr("cast(pmod(p, 4294967296L) as int) + 1"))
        .select(
          element_at(col("v"), col("__ix")).as("x"),
          element_at(col("v"), col("__iy")).as("y"),
          col("c_xy"),
          round((lit(nDocs) * col("c_xy")).cast("double") /
            (element_at(col("dfs"), col("__ix")) *
              element_at(col("dfs"), col("__iy"))).cast("double"), 4)
            .as("lift"))
        .orderBy("x", "y")
    }),

    // Corpus readability profile per language (round 9 wave 22) — the
    // fluency-screening cousin of q_text_quality: corpus-level
    // words-per-sentence and chars-per-word ratios from exact integer
    // token/sentence/char counts. All per-row counts are computed in
    // one projection (no shuffle) and the finish is a ≤|langs|-group
    // partial-combining aggregate; each ratio is ONE IEEE division of
    // exact integer sums → 4 dp, so both engines agree bit-for-bit.
    // Sentence proxy = '.' count clamped to ≥ 1 (a prose-less doc is
    // one sentence), word chars = length minus spaces — both exact
    // string arithmetic, no tokenizer model needed at 100 TB.
    "q_text_readability" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          size(expr("filter(split(text, ' '), t -> t <> '')"))
            .cast("long").as("nw"),
          greatest(lit(1L), (length(col("text")) -
            length(regexp_replace(col("text"), "\\.", ""))).cast("long"))
            .as("ns"),
          length(regexp_replace(col("text"), " ", "")).cast("long")
            .as("nc"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("nw").as("words"),
          round(sum("nw").cast("double") / sum("ns").cast("double"), 4)
            .as("words_per_sent"),
          round(sum("nc").cast("double") / sum("nw").cast("double"), 4)
            .as("chars_per_word"))
        .orderBy("lang")),

    // Hashing-trick feature buckets (round 9 wave 22) — the
    // fixed-width featurization step (Vowpal-Wabbit-style) that lets
    // downstream models consume unbounded vocabularies: tokens land in
    // 16 buckets by an ENGINE-PORTABLE hash (first md5 hex nibble —
    // both engines md5 identical bytes, so bucketing is identical;
    // never the engines' incompatible native hash()). One explode +
    // one two-phase distinct-aggregate; the shuffle carries (lang,
    // bucket, token), never text, and the output is the bounded
    // |langs|×16 feature table | explode + md5-nibble bucket + hash
    // agg with countDistinct.
    "q_ml_feature_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
        .select(col("lang"), col("tok"),
          (instr(lit("0123456789abcdef"),
            substring(md5(col("tok").cast("binary")), 1, 1)) - 1)
            .cast("long").as("bucket"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_toks"),
          countDistinct("tok").as("n_distinct"))
        .orderBy("lang", "bucket")),

    // Deterministic k-fold cross-validation assignment (round 9 wave
    // 23) — the evaluation-split step completing the sampling family
    // (train/val/test = q_sample_split): fold = md5-nibble(doc_id)
    // mod 5, RNG-free and engine-portable (the q_sample_split idiom),
    // so every engine — and every re-run at any parallelism — deals
    // the same docs to the same folds. One projection + one
    // partial-combining hash agg; the fold × lang occupancy table is
    // the auditable artifact a CV pipeline logs.
    "q_ml_kfold" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"),
          ((instr(lit("0123456789abcdef"),
            substring(md5(col("doc_id").cast("string").cast("binary")),
              1, 1)) - 1).cast("long") % 5).as("fold"))
        .groupBy("fold", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("fold", "lang")),

    // RAKE-style keyphrase extraction (round 9 wave 25) — the
    // unsupervised keyword miner: candidate phrases are maximal
    // stopword-free token runs (split on the stopword boundary
    // regex), scored by Σ word-degree / Σ word-frequency — the
    // ratio-of-sums RAKE variant, which keeps scoring a SINGLE IEEE
    // division of exact integer sums (canonical sum-of-ratios would
    // accumulate doubles in engine-dependent order). Phrase splitting
    // and token explosion are map-side; the two corpus-scale shuffles
    // are the word-stats aggregate and the phrase-score aggregate,
    // both partial-combining; the w-join's per-key fan-in is the
    // word's phrase-occurrence count (vocab-bounded). Top-20 plans as
    // TakeOrderedAndProject (per-partition heap, no global sort).
    "q_text_rake" -> ((s, d) => {
      val ph = Tables.documents(s, d)
        .select(explode(split(
          concat(lit(" "), col("text"), lit(" ")), " (?:the|a) "))
          .as("p"))
        .select(trim(col("p")).as("phrase"))
        .filter(col("phrase") =!= "")
      val pw = ph.select(col("phrase"),
          explode(split(col("phrase"), " ")).as("w"),
          size(split(col("phrase"), " ")).cast("long").as("plen"))
      val ws = pw.groupBy("w")
        .agg(count(lit(1)).as("freq"), sum(col("plen") - 1).as("deg"))
      pw.join(ws, "w")
        .groupBy("phrase")
        .agg(sum("deg").as("sum_deg"), sum("freq").as("sum_freq"))
        .filter(size(split(col("phrase"), " ")).between(2, 4))
        .select(col("phrase"), col("sum_deg"), col("sum_freq"),
          round(col("sum_deg").cast("double") /
            col("sum_freq").cast("double"), 4).as("score"))
        .orderBy(col("score").desc, col("phrase"))
        .limit(20)
    }),

    // End-to-end curation accounting: CorpusPipeline.curate's
    // per-stage (remaining, dropped) report — exact dedup → canonical
    // (sorted-distinct-tokens) dedup → MinHash-signature dedup →
    // quality filter, every verdict from ONE materialized flags pass
    // (the rank-1-among-prior-survivors window trick; see
    // operators/CorpusPipeline.scala). This puts the flagship composed
    // pipeline itself — not just its constituent operators — under the
    // DuckDB hash gate: the oracle recomputes all four stages as a CTE
    // chain and must land on identical integers.
    "q_pipeline_curate" -> ((s, d) => CorpusPipeline.curate(s, d)._2
      .orderBy("stage")),

    // Sequence-packing layout under the gate (round 13): the corpus as
    // ONE token stream (per-doc token ids + EOS, ascending doc_id) cut
    // into exact 64-slot chunks — Packing.packTokens' PrefixSum-offset
    // + single chunk-keyed hash-agg shuffle, no global sort. Token ids
    // here are a DuckDB-expressible stand-in (token length, EOS 0) so
    // the oracle can rebuild the identical stream; each chunk reports
    // scalar layout invariants (count, sum, boundary tokens) instead
    // of the array so the hash compare stays dtype-exact.
    "q_pack_stream" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("transform(filter(split(text,' '), t -> t <> '')," +
            " t -> cast(length(t) as int))").as("tk"))
      Packing.packTokens(toks, "doc_id", "tk", 64, 0)
        .select(col("seq_id"), col("n_tokens"),
          expr("aggregate(token_ids, cast(0 as bigint), (a, x) -> a + x)")
            .as("sum_tok"),
          expr("token_ids[0]").as("first_tok"),
          expr("element_at(token_ids, -1)").as("last_tok"))
        .orderBy("seq_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_pack_stream" ->
      """WITH ids AS (
        |  SELECT doc_id,
        |    list_append(list_transform(list_filter(string_split(text,' '), t -> t <> ''),
        |      t -> CAST(length(t) AS INT)), 0) AS tk
        |  FROM documents),
        |off AS (
        |  SELECT doc_id, tk,
        |    sum(len(tk)) OVER (ORDER BY doc_id) - len(tk) AS start FROM ids),
        |tok AS (
        |  SELECT (start + u.i - 1) AS abs, tk[u.i] AS t
        |  FROM off, unnest(range(1, len(tk) + 1)) AS u(i))
        |SELECT CAST(abs // 64 AS BIGINT) AS seq_id,
        |  CAST(count(*) AS INT) AS n_tokens,
        |  CAST(sum(t) AS BIGINT) AS sum_tok,
        |  CAST(arg_min(t, abs) AS INT) AS first_tok,
        |  CAST(arg_max(t, abs) AS INT) AS last_tok
        |FROM tok GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pipeline_curate" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' '))::BIGINT AS n_toks,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS alpha_ratio,
        |    md5(text) AS digest,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS norm_sig,
        |    array_to_string(list_transform(range(0,8), j -> list_min(list_transform(
        |      list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 2)),
        |        i -> array_to_string(string_split(text,' ')[i:i+2], ' '))), s -> md5(j || ':' || s)))), '|') AS sg
        |  FROM documents),
        |f1 AS (SELECT *, (row_number() OVER (PARTITION BY digest ORDER BY doc_id) = 1) AS k_exact FROM base),
        |f2 AS (SELECT *, (k_exact AND row_number() OVER (PARTITION BY norm_sig
        |    ORDER BY (CASE WHEN k_exact THEN 0 ELSE 1 END), doc_id) = 1) AS k_norm FROM f1),
        |f3 AS (SELECT *, (k_norm AND row_number() OVER (PARTITION BY sg
        |    ORDER BY (CASE WHEN k_norm THEN 0 ELSE 1 END), doc_id) = 1) AS k_near FROM f2),
        |f4 AS (SELECT *, (k_near AND n_toks BETWEEN 20 AND 90 AND alpha_ratio >= 0.81) AS quality_ok FROM f3),
        |c AS (SELECT count(*)::BIGINT AS total,
        |  CAST(sum(CASE WHEN k_exact THEN 1 ELSE 0 END) AS BIGINT) AS a1,
        |  CAST(sum(CASE WHEN k_norm THEN 1 ELSE 0 END) AS BIGINT) AS a2,
        |  CAST(sum(CASE WHEN k_near THEN 1 ELSE 0 END) AS BIGINT) AS a3,
        |  CAST(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT) AS a4 FROM f4)
        |SELECT s.stage, s.docs_remaining, s.docs_dropped FROM (
        |  SELECT '00_input' AS stage, total AS docs_remaining, 0::BIGINT AS docs_dropped FROM c
        |  UNION ALL SELECT '01_exact_dedup', a1, total - a1 FROM c
        |  UNION ALL SELECT '02_norm_dedup', a2, a1 - a2 FROM c
        |  UNION ALL SELECT '03_minhash_dedup', a3, a2 - a3 FROM c
        |  UNION ALL SELECT '04_quality_filter', a4, a3 - a4 FROM c) s
        |ORDER BY s.stage""".stripMargin,

    "q_text_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text,' '), t -> t <> '')) AS token
        |  FROM documents),
        |per_doc AS (
        |  SELECT token, doc_id, COUNT(*) AS n FROM toks GROUP BY token, doc_id)
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(n) AS BIGINT) AS tf
        |FROM per_doc GROUP BY token HAVING COUNT(*) >= 5
        |ORDER BY df DESC, tf DESC, token LIMIT 30""".stripMargin,

    "q_text_diversity" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(string_split(text, ' '),
        |    t -> t <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY lang, token),
        |tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab,
        |    CAST(SUM(tf) AS BIGINT) AS tokens,
        |    CAST(MAX(tf) AS BIGINT) AS top_tf,
        |    SUM(CAST(tf AS HUGEINT) * tf) AS sq
        |  FROM tf GROUP BY lang)
        |SELECT lang, vocab, tokens,
        |  ROUND(CAST(vocab AS DOUBLE) / tokens, 4) AS ttr,
        |  ROUND(CAST(top_tf AS DOUBLE) / tokens, 4) AS top_share,
        |  ROUND(CAST(sq AS DOUBLE) /
        |    (CAST(tokens AS DOUBLE) * CAST(tokens AS DOUBLE)), 4) AS simpson
        |FROM tot ORDER BY lang""".stripMargin,
    "q_text_repetition" ->
      """WITH g AS (
        |  SELECT lang,
        |    list_transform(range(1, greatest(len(string_split(text,' '))-1, 2)),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' ')) AS grams
        |  FROM documents),
        |d AS (
        |  SELECT lang, len(grams) AS t, len(list_distinct(grams)) AS u FROM g)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS sum_grams,
        |  CAST(SUM(u) AS BIGINT) AS sum_uniq,
        |  ROUND(1.0 - CAST(SUM(u) AS DOUBLE) / SUM(t), 4) AS corpus_rep,
        |  CAST(COUNT(*) FILTER (u < t) AS BIGINT) AS n_flagged
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_boilerplate" ->
      """WITH g AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(
        |      range(1, greatest(len(string_split(text,' '))-1, 2)),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
        |      AS gram
        |  FROM documents),
        |dg AS (SELECT doc_id, lang, gram, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM g GROUP BY 1, 2, 3),
        |df AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM dg
        |       GROUP BY gram),
        |h AS (SELECT df AS v, CAST(COUNT(*) AS BIGINT) AS k FROM df
        |      GROUP BY df),
        |ng AS (SELECT CAST(COUNT(*) AS BIGINT) AS ng FROM df),
        |thr AS (SELECT MIN(v) AS thr FROM
        |    (SELECT v, SUM(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |       PRECEDING AND CURRENT ROW) AS cum FROM h) CROSS JOIN ng
        |  WHERE cum >= CAST(CEIL(CAST(ng AS DOUBLE) * CAST(0.99 AS DOUBLE))
        |    AS BIGINT)),
        |pd AS (SELECT dg.doc_id, dg.lang, SUM(dg.c) AS t,
        |    SUM(CASE WHEN df.df >= (SELECT thr FROM thr) THEN dg.c
        |        ELSE 0 END) AS fr
        |  FROM dg JOIN df USING (gram) GROUP BY 1, 2)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS total_grams,
        |  CAST(SUM(fr) AS BIGINT) AS boiler_grams,
        |  ROUND(CAST(SUM(fr) AS DOUBLE) / SUM(t), 4) AS boiler_share,
        |  CAST(COUNT(*) FILTER (10*fr > t) AS BIGINT) AS n_flagged
        |FROM pd GROUP BY lang ORDER BY lang""".stripMargin,
    "q_sample_stratified" ->
      """WITH ranked AS (
        |  SELECT lang, n_chars, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS cnt
        |  FROM documents WHERE lang IS NOT NULL)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars, MIN(doc_id) AS min_doc
        |FROM ranked WHERE rn <= (cnt + 9) // 10
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_sample_mixture" ->
      """WITH rated AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(substr(source, 4) AS INT) % 4 AS m,
        |    md5(CAST(doc_id AS VARCHAR) || ':mix') AS h
        |  FROM documents),
        |copies AS (
        |  SELECT doc_id, source, n_chars,
        |    (CASE m WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 1 ELSE 2 END) +
        |    (CASE WHEN h < (CASE m WHEN 0 THEN '40' WHEN 1 THEN 'c0'
        |                           WHEN 2 THEN '80' ELSE '40' END)
        |          THEN 1 ELSE 0 END) AS n_copies
        |  FROM rated),
        |emitted AS (
        |  SELECT doc_id, source, n_chars, e AS epoch
        |  FROM copies, unnest(range(0, n_copies)) AS t(e))
        |SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_used,
        |  CAST(COUNT(*) AS BIGINT) AS n_emitted,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars_emitted
        |FROM emitted GROUP BY source ORDER BY source""".stripMargin,
    "q_text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(list_filter(string_split(text,' '), t -> t <> '')) AS token
        |  FROM documents),
        |tfl AS (
        |  SELECT lang, token, COUNT(*) AS tf FROM tok GROUP BY lang, token),
        |df AS (
        |  SELECT token, COUNT(*) AS df FROM (
        |    SELECT DISTINCT token, doc_id FROM tok) GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT lang, tfl.token,
        |    CAST(tf * (SELECT n_docs FROM n) AS DOUBLE) / df.df AS score_raw,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY CAST(tf * (SELECT n_docs FROM n) AS DOUBLE) / df.df DESC,
        |               tfl.token) AS rn
        |  FROM tfl JOIN df ON tfl.token = df.token)
        |SELECT lang, token, ROUND(score_raw, 4) AS tfidf
        |FROM scored WHERE rn <= 5 ORDER BY lang, tfidf DESC, token""".stripMargin,
    "q_text_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text,' '), t -> t <> '')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (
        |  SELECT token, COUNT(*) AS df FROM (
        |    SELECT DISTINCT token, doc_id FROM tok) GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.token,
        |    CAST(tf * (SELECT n_docs FROM n) AS DOUBLE) / df.df AS score_raw,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf * (SELECT n_docs FROM n) AS DOUBLE) / df.df DESC,
        |               tf.token) AS rn
        |  FROM tf JOIN df ON tf.token = df.token)
        |SELECT doc_id, token, ROUND(score_raw, 4) AS tfidf
        |FROM scored WHERE rn <= 3 ORDER BY doc_id, tfidf DESC, token""".stripMargin,
    "q_sample_pack" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split(text,' '), t -> t <> '')) AS n_toks,
        |    md5(CAST(doc_id AS VARCHAR) || ':pack') AS h
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, source, n_toks,
        |    (SUM(n_toks) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks) // 512
        |      AS bin
        |  FROM toks)
        |SELECT source, CAST(bin AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS sum_toks
        |FROM packed GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    "q_dedup_contain" ->
      """WITH f AS (
        |  SELECT lang,
        |    list_min(list_transform(range(1, greatest(len(string_split(text,' '))-2, 2)),
        |      i -> md5(array_to_string(string_split(text,' ')[i:i+3], ' ')))) AS fp,
        |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
        |         WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |bench AS (SELECT DISTINCT fp FROM f WHERE split = 'test')
        |SELECT t.lang, CAST(COUNT(*) AS BIGINT) AS n_train,
        |  CAST(COUNT(*) FILTER (b.fp IS NOT NULL) AS BIGINT) AS n_contaminated,
        |  CAST(COUNT(*) FILTER (b.fp IS NULL) AS BIGINT) AS n_clean
        |FROM f t LEFT JOIN bench b ON t.fp = b.fp
        |WHERE t.split = 'train'
        |GROUP BY t.lang ORDER BY t.lang""".stripMargin,
    // pair enumeration via self-join — the oracle need not share the
    // array-walk plan, only the result; thresholds use the same
    // integer divisions of the corpus row count as the Spark side
    "q_text_cooccur" ->
      """WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |toks AS (SELECT DISTINCT doc_id,
        |    unnest(list_filter(string_split(text,' '), t -> t <> '')) AS token
        |  FROM documents),
        |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY 1),
        |v AS (SELECT token, df FROM df
        |      WHERE df >= (SELECT n FROM nd) // 20),
        |pairs AS (
        |  SELECT a.token AS x, b.token AS y, CAST(COUNT(*) AS BIGINT) AS c_xy
        |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.token < b.token
        |  WHERE a.token IN (SELECT token FROM v)
        |    AND b.token IN (SELECT token FROM v)
        |  GROUP BY 1, 2)
        |SELECT x, y, c_xy,
        |  ROUND(CAST(nd.n * c_xy AS DOUBLE) / CAST(dx.df * dy.df AS DOUBLE), 4) AS lift
        |FROM pairs
        |JOIN v dx ON pairs.x = dx.token
        |JOIN v dy ON pairs.y = dy.token
        |CROSS JOIN nd
        |WHERE c_xy >= nd.n // 50
        |ORDER BY x, y""".stripMargin,
    "q_text_readability" ->
      """WITH d AS (SELECT lang,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS BIGINT) AS nw,
        |    CAST(GREATEST(1, length(text) - length(replace(text, '.', '')))
        |      AS BIGINT) AS ns,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS nc
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nw) AS BIGINT) AS words,
        |  ROUND(CAST(SUM(nw) AS DOUBLE) / CAST(SUM(ns) AS DOUBLE), 4)
        |    AS words_per_sent,
        |  ROUND(CAST(SUM(nc) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE), 4)
        |    AS chars_per_word
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // strpos on the hex-nibble alphabet is the engine-portable bucket:
    // both engines md5 the same bytes to the same hex string
    "q_ml_feature_hash" ->
      """WITH toks AS (SELECT lang,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        |  FROM documents),
        |b AS (SELECT lang, tok,
        |    CAST(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1
        |      AS BIGINT) AS bucket
        |  FROM toks)
        |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_toks,
        |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_ml_kfold" ->
      """WITH f AS (SELECT lang, n_chars,
        |    CAST(strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      % 5 AS fold
        |  FROM documents)
        |SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_text_rake" ->
      """WITH ph AS (
        |  SELECT trim(p) AS phrase FROM (
        |    SELECT unnest(string_split_regex(' ' || text || ' ',
        |      ' (?:the|a) ')) AS p
        |    FROM documents)
        |  WHERE trim(p) <> ''),
        |pw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS w,
        |    CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen
        |  FROM ph),
        |ws AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
        |    CAST(SUM(plen - 1) AS BIGINT) AS deg
        |  FROM pw GROUP BY 1),
        |ps AS (SELECT pw.phrase,
        |    CAST(SUM(ws.deg) AS BIGINT) AS sum_deg,
        |    CAST(SUM(ws.freq) AS BIGINT) AS sum_freq
        |  FROM pw JOIN ws USING (w) GROUP BY 1)
        |SELECT phrase, sum_deg, sum_freq,
        |  ROUND(CAST(sum_deg AS DOUBLE) / CAST(sum_freq AS DOUBLE), 4)
        |    AS score
        |FROM ps
        |WHERE len(string_split(phrase, ' ')) BETWEEN 2 AND 4
        |ORDER BY score DESC, phrase LIMIT 20""".stripMargin
  )
}

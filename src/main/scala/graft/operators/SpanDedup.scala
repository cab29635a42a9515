package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Exact-substring (span-level) duplication analysis — the
  * "deduplicating training data" discipline of Lee et al. (2022):
  * find every w-token span that occurs more than once ACROSS OR WITHIN
  * documents, and report per document how much of its token stream is
  * covered by duplicated spans. Paragraph- and doc-level dedup miss
  * exactly this (boilerplate sentences, quoted passages, templated
  * fragments inside otherwise-unique documents); span coverage is the
  * signal a curation pass thresholds on.
  *
  * Scale shape:
  *  - span hashing is MAP-SIDE: each doc emits its (offset, hash)
  *    windows via HOFs (`transform`/`slice`/`xxhash64`) — corpus-token-
  *    sized output is inherent (every token participates in w spans);
  *  - duplicate detection is one partial-combining `groupBy(hash)` —
  *    NEVER a window over hash partitions, because a boilerplate span
  *    repeated a billion times is precisely the hot key the partial
  *    combine absorbs and a window would funnel into one task;
  *  - the duplicated-hash set joins back to the span stream on the
  *    same key (one co-hashed shuffle pair), and per-doc coverage is
  *    an interval-union fold over each doc's OWN sorted offsets — an
  *    `aggregate` HOF over a doc-length-bounded array, no shuffle.
  *
  * Hash collisions: spans compare by xxhash64 of the joined window, so
  * two different spans can collide (rate ~2^-64 per pair) — the
  * standard trade every suffix-array/minhash pipeline makes; the spec
  * pins exactness on crafted corpora.
  */
object SpanDedup {

  /** Tokenization shared with the wordcount/text-stats family. */
  private def toks(textCol: String) =
    expr(s"filter(split($textCol, ' '), t -> t <> '')")

  /** (doc_id, off, h): every w-token window's offset and hash. Docs
    * shorter than `w` emit nothing. The short-doc guard lives INSIDE
    * the expression (`if(size >= w, transform(...), array())`), not
    * only in the preceding filter: InferFiltersFromGenerate derives a
    * `size(<generator input>) > 0` predicate from the explode and
    * CollapseProject inlines the whole span expression into it, where
    * it can evaluate on pre-filter rows — an unconditional
    * `sequence(0, size - w)` then runs DESCENDING for short docs and
    * `slice(_, 0, _)` throws (bit round 13's fixpoint over rewritten
    * lineage). The total form is safe to evaluate on any row; the
    * filter stays for row pruning.
    *
    * The explode is OUTER for cost, not semantics:
    * InferFiltersFromGenerate fires only on inner generates, and the
    * predicate it derives here is `size(spans) > 0 AND isnotnull
    * (spans)` with the WHOLE span construction (transform + slice +
    * concat_ws + xxhash64 per window, tokenizer re-inlined) copied
    * into BOTH conjuncts — the r18 plan audit showed every doc paying
    * the span build three times (twice in the derived Filter, once in
    * the real Project). With explode_outer no filter is derived and
    * the build runs once; the trailing `isnotnull(__s)` keeps the
    * row contract identical (the size-≥-w filter already guarantees a
    * non-empty array, so the outer explode emits no null rows to
    * drop — the guard is for callers that relax that filter).
    * A/B at sf0.1 (graft.Profile, paired control): see
    * OPTIMIZATION_r18.md.
    */
  def spanHashes(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"span width $w: single-token spans are just tokens")
    docs
      .select(col(idCol).as("doc_id"), toks(textCol).as("__t"))
      .filter(size(col("__t")) >= w)
      .select(col("doc_id"),
        expr(s"""if(size(__t) >= $w,
                 transform(sequence(0, size(__t) - $w),
                   i -> named_struct(
                     'off', i,
                     'h', xxhash64(concat_ws(' ', slice(__t, i + 1, $w))))),
                 array())""")
          .as("__spans"))
      .select(col("doc_id"), explode_outer(col("__spans")).as("__s"))
      .filter(col("__s").isNotNull)
      .select(col("doc_id"), col("__s.off").as("off"), col("__s.h").as("h"))
  }

  /** Exact token mass covered by the w-token spans whose ASCENDING
    * start offsets sit in an `__offs` array column — the interval
    * union of [off, off+w): each span adds
    * max(0, off + w − max(prevEnd, off)) covered tokens. A per-row
    * `aggregate` fold over the doc's own bounded offset array — no
    * shuffle. Shared by [[coverageReport]] and
    * [[Decontaminate.report]].
    */
  private[operators] def coveredTokensFold(w: Int) =
    expr(s"""aggregate(__offs,
              named_struct('e', -1, 't', cast(0 as long)),
              (a, o) -> named_struct(
                'e', greatest(a.e, o + $w),
                't', a.t + greatest(0, o + $w - greatest(a.e, o))),
              a -> a.t)""")

  /** Tokenizer shared with [[Decontaminate]] (whitespace split, empty
    * tokens dropped — the wordcount family's convention).
    */
  private[operators] def tokensOf(textCol: String) = toks(textCol)

  /** Span hashes occurring more than once corpus-wide: (h, n_occ). */
  def duplicatedSpans(spans: DataFrame): DataFrame =
    spans.groupBy("h").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)

  /** Per-document duplication report: token count, duplicated-span
    * occurrence count, tokens covered by ≥1 duplicated span (exact
    * interval union of the doc's own sorted dup offsets), and the
    * covered fraction. Docs with no duplicated span report zeros.
    */
  def coverageReport(spark: SparkSession, dir: String, w: Int): DataFrame =
    coverageReport(Tables.documents(spark, dir), "doc_id", "text", w)

  /** The ACTION half of exact-substring dedup: rewrite the corpus with
    * every repeat occurrence of a duplicated w-token span removed,
    * keeping the globally-first occurrence (minimum (doc_id, off) per
    * span hash — deterministic, partitioning-independent). A token is
    * cut iff some NON-KEEPER duplicated span covers it; the keeper
    * document keeps its text. Output: (doc_id, text, n_toks,
    * n_removed) with `text` rebuilt from the kept tokens.
    *
    * Same scale shape as [[coverageReport]] plus one |dup hashes|-row
    * argmin aggregate (partial-combining, hot-key safe) — the cut
    * positions fold per doc over its own bounded offset array, and the
    * token filter is a per-row HOF (O(len · cuts) worst case, the
    * standard exact-substring rewrite cost).
    *
    * NOT idempotent by design: removing a span can make previously
    * separated tokens adjacent, forming new w-grams — use
    * [[removeDuplicatedSpansFixpoint]] if the corpus demands full
    * convergence (the Lee et al. pipeline runs one pass).
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String,
      textCol: String, w: Int): DataFrame =
    removeWithSpansHandle(docs, idCol, textCol, w)._1

  /** [[removeDuplicatedSpans]] exposing the materialized span frame so
    * iterative callers ([[removeDuplicatedSpansFixpoint]]) can release
    * it round-by-round instead of letting rounds accumulate persisted
    * span streams until the session's releaseAll.
    */
  private def removeWithSpansHandle(docs: DataFrame, idCol: String,
      textCol: String, w: Int): (DataFrame, DataFrame) = {
    // Materialized ONCE: three consumers below (the dup aggregate, the
    // keeper argmin, the cut join) would otherwise each re-run the
    // span-hash explode — plan inspection shows ReuseExchange dedupes
    // only the scan UNDER the explode, not the explode itself (the
    // aggregate's partial phase and the join sides wrap it in
    // different exchange subtrees). The cache preserves map-side
    // partial combining for the dup aggregate, so the hot-key
    // discipline in the scaladoc above still holds.
    val spans = graft.Materialize.checkpoint(
      spanHashes(docs, idCol, textCol, w))
    val dups = duplicatedSpans(spans)
    // keeper per duplicated hash: global argmin over (doc_id, off)
    val keepers = spans.join(dups, Seq("h"))
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("off"))).as("__k"))
      .select(col("h"), col("__k.doc_id").as("__kdoc"),
        col("__k.off").as("__koff"))
    val cuts = spans.join(dups, Seq("h"))
      .join(keepers, Seq("h"))
      .filter(!(col("doc_id") === col("__kdoc") && col("off") === col("__koff")))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("off"))).as("__cuts"))
    val out = docs
      .select(col(idCol).as("doc_id"), toks(textCol).as("__t"))
      .join(cuts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("__cuts").isNull, col("__t"))
          .otherwise(expr(s"""filter(__t, (t, i) ->
              NOT exists(__cuts, o -> o <= i AND i < o + $w))"""))
          .as("__kept"),
        size(col("__t")).cast("long").as("n_toks"))
      .select(col("doc_id"),
        array_join(col("__kept"), " ").as("text"),
        col("n_toks"),
        (col("n_toks") - size(col("__kept"))).cast("long").as("n_removed"))
      .orderBy("doc_id")
    (out, spans)
  }

  /** Rerun [[removeDuplicatedSpans]] to a FIXPOINT: a single pass is
    * not idempotent (removing a span can make previously separated
    * tokens adjacent, forming new duplicated w-grams), so iterate until
    * a pass removes nothing or `maxRounds` is hit. Returns the final
    * per-doc frame — (doc_id, text, n_toks, n_removed) with n_toks the
    * ORIGINAL token count and n_removed the cumulative removal across
    * all rounds — and the number of rewrite passes executed.
    *
    * Scale shape: each round is one [[removeDuplicatedSpans]] (its
    * span frame released as soon as the round's output materializes);
    * convergence is a 1-row sum over the round output, and rounds are
    * bounded both by `maxRounds` and by the monotone shrink (every
    * round strictly removes tokens or terminates).
    */
  def removeDuplicatedSpansFixpoint(docs: DataFrame, idCol: String,
      textCol: String, w: Int, maxRounds: Int = 8): (DataFrame, Int) = {
    require(maxRounds >= 1, s"maxRounds=$maxRounds")
    var cur = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    var prev: DataFrame = null
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val (roundOut, spansHandle) =
        removeWithSpansHandle(cur, "doc_id", "text", w)
      val next = graft.Materialize.checkpoint(roundOut)
      graft.Materialize.release(spansHandle)
      val removed =
        next.agg(coalesce(sum(col("n_removed")), lit(0L))).head.getLong(0)
      if (prev != null) graft.Materialize.release(prev)
      prev = next
      cur = next.select("doc_id", "text")
      rounds += 1
      converged = removed == 0L
    }
    // report against the ORIGINAL corpus: cumulative removals are the
    // original token count minus what survived all rounds
    val out = docs
      .select(col(idCol).as("doc_id"),
        size(toks(textCol)).cast("long").as("n_toks"))
      .join(cur, Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("n_toks"),
        (col("n_toks") -
          when(col("text") === "", lit(0))
            .otherwise(size(split(col("text"), " "))).cast("long"))
          .as("n_removed"))
      .orderBy("doc_id")
    (out, rounds)
  }

  def coverageReport(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    // same 2-consumer shape as the removal path: materialize the span
    // stream once (dup aggregate + the per-doc join both read it)
    val spans = graft.Materialize.checkpoint(
      spanHashes(docs, idCol, textCol, w))
    val dups = duplicatedSpans(spans)
    val perDoc = spans.join(dups, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        array_sort(collect_list(col("off"))).as("__offs"))
      .select(col("doc_id"), col("n_dup_spans"),
        coveredTokensFold(w).as("dup_tokens"))
    docs
      .select(col(idCol).as("doc_id"),
        size(toks(textCol)).cast("long").as("n_toks"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) * lit(1.0) /
          greatest(col("n_toks"), lit(1L)), 4).as("dup_fraction"))
      .orderBy("doc_id")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Large-scale dedup operators beyond the exact/blocking contract pair:
  * MinHash+LSH, SimHash, and n-gram Jaccard (SURVEY.md §2.12).
  *
  * All three are MapReduce-shaped and 100 TB-safe:
  *  - signatures/fingerprints are computed per row in a single scan
  *    (no shuffle), as native higher-order expressions — no UDF;
  *  - candidate generation shuffles only (doc_id, band/bucket key)
  *    pairs, never document text;
  *  - pair enumeration happens strictly within a band/bucket/block —
  *    the O(n²) all-pairs product is never formed.
  *
  * Hash functions are engine-portable on purpose (md5 hex strings with
  * lexicographic min instead of integer mixing): the DuckDB oracle must
  * reproduce every signature bit-for-bit (SURVEY.md §7.4).
  */
object DedupExtras {

  /** Distinct token 3-shingles over a pre-tokenized `toks` column.
    * Matches DuckDB `list_distinct(list_transform(range(1, greatest(len-1,2)),
    * i -> toks[i:i+2]))` — both produce shingles at positions
    * 1..max(len-2,1).
    *
    * Deliberately over an ATTRIBUTE, not over `split(text, ' ')`
    * inline: an expression referenced inside the per-position lambda
    * is re-evaluated per element, so inlining the split costs O(T²)
    * char work per doc. Callers project `toks` and put an exchange
    * between the tokenize and this expression (CollapseProject would
    * otherwise substitute the split back in).
    */
  private[operators] val shinglesSql =
    """array_distinct(transform(
      |  sequence(1, greatest(size(toks) - 2, 1)),
      |  i -> concat_ws(' ', slice(toks, i, 3))))""".stripMargin

  /** The (lang, first-3-tokens digest) blocking key shared by
    * q_dedup_near (PipelineQueries) and q_dedup_jaccard — candidate
    * generation and its verify step must block identically, so the
    * definition lives once.
    */
  private[operators] def blockingKey: Column =
    md5(concat_ws(" ", slice(split(col("text"), " "), 1, 3)).cast("binary"))

  /** (doc_id, sg, band_id, bk) band rows. The signature table is
    * materialized once via [[graft.Materialize.checkpoint]] (persist
    * with an explicit release point) — the local-mode analog of
    * persisting the signature table before the band join, which at
    * scale you would write out rather than recompute on both sides of
    * the self-join. The session driver unpersists it after the
    * consuming action, so signature blocks never outlive their query.
    */
  private def minhashBands(s: SparkSession, d: String): DataFrame =
    minhashBandsWithSig(s, d)._1

  /** [[minhashBands]] plus the handle of the checkpointed signature
    * frame, for callers (q_dedup_cluster) that re-materialize a
    * projection of the bands and can release the signature blocks
    * early instead of holding them to query end.
    */
  /** `materializeSig = false` skips the signature checkpoint — for
    * callers that consume the bands exactly ONCE (q_dedup_cluster's
    * membership build: no band self-join, no similarity re-join), where
    * the blocking count and the corpus-scale cache of the 8-component
    * array buy nothing. The signature expression still evaluates once
    * per doc: it sits below the band explode, and the generate boundary
    * keeps CollapseProject from inlining it into the per-band
    * projection.
    */
  private def minhashBandsWithSig(s: SparkSession,
      d: String, materializeSig: Boolean = true): (DataFrame, DataFrame) = {
    // Native signature expression (graft.plans.MinHashSignature): one
    // JVM digest loop instead of 8×|shingles| interpreted HOF lambdas.
    // Bit-identical to the md5-min HOF formulation the oracle mirrors
    // (NativeEquivalenceSpec proves it).
    graft.plans.MinHashSignature.register(s)
    val sig = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      // Spread BEFORE the expensive signature: the source parquet is a
      // handful of input splits, and without this exchange the whole
      // md5 workload would run at input-split parallelism. The explicit
      // partition count matters — AQE's size-based coalesce would fold
      // this tiny-bytes/heavy-CPU stage back to one partition. The
      // exchange also materializes `toks` (see shinglesSql).
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), expr(shinglesSql).as("sh"))
      .select(col("doc_id"), expr("minhash_sig(sh)").as("sg"))
      .transform(df =>
        if (materializeSig) graft.Materialize.checkpoint(df) else df)
    val bands = sig
      .select(col("doc_id"), col("sg"),
        explode(sequence(lit(0), lit(3))).as("band_id"))
      .select(col("doc_id"), col("sg"), col("band_id"),
        md5(concat(
          element_at(col("sg"), col("band_id") * 2 + 1), lit("|"),
          element_at(col("sg"), col("band_id") * 2 + 2)).cast("binary"))
          .as("bk"))
    (bands, sig)
  }

  /** Distinct candidate pairs with signature-agreement similarity. */
  private def minhashPairs(bands: DataFrame): DataFrame =
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"),
        round(expr(
          "size(filter(sequence(1, 8), i -> element_at(a.sg, i) = element_at(b.sg, i))) / cast(8 as double)"),
          4).as("minhash_sim"))
      .distinct()

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // MinHash + LSH banding (4 bands × 2 rows): candidate pairs are docs
    // agreeing on both signature components of at least one band.
    //
    // Plan shape matters: the signature is the expensive part (8 md5
    // per shingle), so it is materialized ONCE behind an explicit
    // exchange (repartition barrier — stops Catalyst from inlining the
    // expression into every band branch), the array is CARRIED through
    // the band explode and the self-join (so similarity needs no
    // re-join against a recomputed signature), and the two sides of
    // the band join are identical subplans that ReuseExchange
    // deduplicates. 26s → ~2s at sf0.1.
    "q_dedup_minhash" -> ((s, d) => {
      val bands = minhashBands(s, d)
      minhashPairs(bands).orderBy("doc_id1", "doc_id2")
    }),

    // Dedup SURVIVORS: drop every doc that full-signature-agrees
    // (minhash_sim = 1.0) with a lower doc_id — the removal step that
    // turns candidate pairs into a deduplicated corpus.
    //
    // sim = 1.0 ⟺ all 8 signature components agree ⟺ identical `sg`,
    // and identical signatures always share every band, so the dup set
    // is exactly the non-minimum members of each signature group. That
    // makes the banded pair self-join unnecessary: one hash aggregate
    // on `sg` (min(struct(doc_id, lang)) picks the lowest doc's row)
    // computes the survivors directly. The only shuffle carries the
    // 8-component signature per doc — no pair product, no join, no
    // materialization; the shape that survives 100 TB.
    "q_dedup_minhash_keep" -> ((s, d) => {
      graft.plans.MinHashSignature.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("lang"), expr(shinglesSql).as("sh"))
        .select(col("doc_id"), col("lang"), expr("minhash_sig(sh)").as("sg"))
        // NULL-signature guard: the pair formulation (and its oracle)
        // never matched NULL signatures, so every null-sg doc survives.
        // A plain groupBy would collapse them into ONE null group and
        // drop all but the min — the extra per-doc key keeps each
        // null-sg doc in its own group. (No fixture row is null today;
        // this pins the semantics against regeneration.)
        .groupBy(col("sg"),
          when(col("sg").isNull, col("doc_id")).as("_nullkey"))
        .agg(min(struct(col("doc_id"), col("lang"))).as("keep"))
        .select(col("keep.doc_id").as("doc_id"), col("keep.lang").as("lang"))
        .orderBy("doc_id")
    }),

    // SimHash over 32 nibble-dimensions of per-token md5: fingerprint
    // bit j is the sign of the token-weighted ±1 sum in dimension j.
    // Buckets (= identical fingerprints) with >1 doc are near-dup sets.
    // Token hashes are hoisted out of the 32-dimension loop (md5 once
    // per token, not 32×) behind a repartition barrier so Catalyst
    // cannot collapse the projection back into the per-dim lambda.
    "q_dedup_simhash" -> ((s, d) => {
      // Native one-pass fingerprint (graft.plans.SimHashFingerprint) —
      // bit-identical to the per-dimension HOF formulation the oracle
      // mirrors (NativeEquivalenceSpec proves it).
      graft.plans.SimHashFingerprint.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("transform(split(text, ' '), t -> md5(cast(t as binary)))")
            .as("hs"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), expr("simhash_fp(hs)").as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
        .filter(col("n_docs") > 1)
        .orderBy("fp")
    }),

    // Dup-GRAPH clustering: connected components over band-bucket
    // co-membership (docs sharing ANY LSH band bucket are one near-dup
    // cluster, transitively) — the step that turns pairwise candidates
    // into dedup groups in a production pipeline. Computed as iterative
    // hash-to-min label propagation on the BIPARTITE (doc, bucket)
    // membership relation: each round a bucket takes the min label of
    // its members and each doc takes the min label of its buckets, so
    // a label never travels through an enumerated pair product — the
    // shuffle carries only (id, bucket, label) triples, memberships
    // are materialized once, and rounds are bounded by component
    // diameter (monotone min ⇒ unique fixpoint, so the result is
    // independent of partitioning and iteration interleaving). The
    // only driver-side values are the per-round scalar convergence
    // counts, never data. The oracle computes the same components by
    // recursive-CTE transitive closure — tractable at oracle SF, while
    // the propagation form is the one that survives 100 TB.
    "q_dedup_cluster" -> ((s, d) => {
      // materializeSig = false (r19): this query consumes the bands
      // exactly once (m's build) — the signature checkpoint's blocking
      // count and corpus-scale cache served only the band self-join
      // queries. One fewer driver round-trip; the signature pass now
      // runs inside m's materializing window pass.
      val (bands, sig) = minhashBandsWithSig(s, d, materializeSig = false)
      // bucket identity = the (band_id, bk) PAIR, grouped/joined as two
      // columns — no concat_ws string build, no hash-collision risk, and
      // the shuffle key stays the raw 4-byte int + binary digest.
      //
      // Singleton-bucket pruning: a bucket with ONE member can only hand
      // a doc its own label back — it never propagates anything — so the
      // fixpoint runs on multi-member buckets only. In a mostly-unique
      // corpus that is a 10-100× cut in the relation every hop shuffles,
      // and it's exactly the docs the output keeps (docs absent from
      // every multi bucket are singleton clusters, filtered by the final
      // n_docs > 1 anyway). One window pass (per-bucket groups are small
      // by LSH design) prices the prune.
      val m = graft.Materialize.checkpoint(
        bands.select(col("doc_id"), col("band_id"), col("bk"))
          .withColumn("__n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("band_id", "bk")))
          .filter(col("__n") > 1)
          .drop("__n"))
      val bcols = Seq("band_id", "bk")
      // sig is unmaterialized here (release is identity-checked, so
      // this is a no-op kept for shape parity with the banded callers)
      graft.Materialize.release(sig)
      // One doc→bucket→doc propagation hop: bucket takes the min label
      // of its members, doc takes the min over its buckets. A doc is a
      // member of every one of its buckets, so the result is pointwise
      // ≤ the input labels (monotone min).
      def hop(lab: DataFrame): DataFrame =
        m.join(m.join(lab, "doc_id")
            .groupBy(bcols.head, bcols.tail: _*)
            .agg(min(col("lab")).as("bl")), bcols)
          .groupBy("doc_id").agg(min(col("bl")).as("lab"))
      // Hop 1 folded into initialization: under identity labels the
      // bucket minimum IS the minimum member doc_id, so the first
      // propagation needs no label join. Each round's frame carries
      // its own change flag (`__chg`), so ONE job — the convergence
      // count, which scans every partition — both materializes the
      // cache (checkpointLazy) and answers the driver's only question.
      //
      // TWO propagation hops per materialized frame: the intermediate
      // hop's labels ride inside the cached lineage (no checkpoint, no
      // driver round-trip), halving the fixpoint's driver-synchronized
      // counts — at 100 TB each count is a full cluster barrier, so
      // rounds, not hops, dominate wall time. `__chg` compares the
      // double hop against the SINGLE-hop-ago labels h1 *inside the
      // same lineage* — not against the frame from two hops ago — so a
      // graph that converges on an odd hop exits without a whole extra
      // round (the r11 `lab < doc_id` init flag fired whenever any
      // cluster existed at all, always buying one dead round).
      // Detection is threaded, not a diff join: h1's label is renamed
      // `__old` and carried through the second hop's own
      // joins/aggregates (every row of a doc carries the same `__old`,
      // so min(__old) per doc is just __old) — one extra long column
      // plus the withOld join evaluated for both consumers. Same-window
      // jobWall A/B at sf0.1 (wall was ambient-confounded that day):
      // blind r11 flag 1.14 s / this 1.31 s / separate hop(h1)⨝h1 diff
      // join 1.61 s. The ~0.1 s/round detection price buys skipping an
      // ENTIRE 10-job propagation round whenever the graph converges on
      // an odd hop — at 100 TB a round is a cluster-wide barrier plus a
      // full label shuffle, the one cost this fixpoint must minimize.
      // Convergence stays sound: hops are pointwise monotone
      // (hop(h1) ≤ h1), so `__chg` nowhere-true means h1 is a fixpoint
      // and labels == h1.
      val init =
        m.join(m.groupBy(bcols.head, bcols.tail: _*)
            .agg(min(col("doc_id")).as("bl")), bcols)
          .groupBy("doc_id").agg(min(col("bl")).as("lab"))
      def doubleHop(lab: DataFrame): DataFrame = {
        val withOld = m.join(hop(lab).withColumnRenamed("lab", "__old"),
          "doc_id")
        withOld
          .join(withOld.groupBy(bcols.head, bcols.tail: _*)
            .agg(min(col("__old")).as("bl")), bcols)
          .groupBy("doc_id")
          .agg(min(col("bl")).as("lab"), min(col("__old")).as("__old"))
          .withColumn("__chg", col("lab") < col("__old"))
          .select("doc_id", "lab", "__chg")
      }
      // THREE propagation hops per materialized frame (r19): the first
      // round's frame is doubleHop(hop(init)) = hops 2-4 riding one
      // lineage, so a graph whose labels fix by hop 3 — this fixture's
      // case, and the common case once the singleton prune has thinned
      // the relation — converges in ONE driver round-trip instead of
      // two (rounds 2 → 1 at sf0.1, jobs 40 → 25, wall 1.9 → 1.3 s
      // paired Profile). Detection unchanged and still sound: __chg
      // compares the frame's last hop against the hop before it inside
      // the same lineage (hops are pointwise monotone, so last == prev
      // ⟹ prev is a fixpoint); an extra in-lineage hop never changes
      // the fixpoint, only how far each frame travels toward it. Worst
      // case (fixpoint exactly at an even hop) pays one extra
      // in-lineage hop per round but never an extra round.
      def tripleHop(lab: DataFrame): DataFrame = doubleHop(hop(lab))
      var labels = graft.Materialize.checkpointLazy(tripleHop(init))
      var changed = labels.filter(col("__chg")).count()
      var rounds = 1
      while (changed > 0 && rounds < 20) {
        val nxt = graft.Materialize.checkpointLazy(tripleHop(labels))
        changed = nxt.filter(col("__chg")).count()
        // the old frame's last consumer is nxt's materialization above —
        // release it NOW, not at query end, or a long fixpoint holds
        // many dead corpus-scale frames persisted simultaneously
        graft.Materialize.release(labels)
        labels = nxt
        rounds += 1
      }
      if (sys.env.contains("SPARK_GRAFT_DEBUG_ROUNDS"))
        System.err.println(s"[q_dedup_cluster] rounds=$rounds")
      labels.groupBy("lab")
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
        .select(col("lab").as("cluster_id"), col("n_docs"))
        .orderBy("cluster_id")
    }),

    // Exact 3-shingle Jaccard, but only over blocking-key candidate
    // pairs (same (lang, first-3-token digest) as q_dedup_near) — the
    // verify step of a blocked near-dup pipeline.
    //
    // Skew + payload discipline: pair ENUMERATION runs over the slim
    // (doc_id, lang, bk) projection through the salted self-pairing
    // (hot blocks spread over 8 tasks; only ids are replicated), and
    // the shingle arrays — the heavy payload — are fetched afterwards
    // by two hash joins against a once-materialized signature table.
    // Replicating shingles nSalts× through the salted join would move
    // payload bytes 8×; this shape moves them once per side.
    "q_dedup_jaccard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val slim = docs.select(col("doc_id"), col("lang"), blockingKey.as("bk"))
      val pairs = Salting.saltedSelfPairs(slim, Seq("lang", "bk"), "doc_id", 8)
        .select(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"))
      val sh = graft.Materialize.checkpoint(
        docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), expr(shinglesSql).as("sh")))
      pairs
        .join(sh.as("s1"), col("doc_id1") === col("s1.doc_id"))
        .join(sh.as("s2"), col("doc_id2") === col("s2.doc_id"))
        .select(col("doc_id1"), col("doc_id2"),
          round(
            expr("size(filter(s1.sh, x -> array_contains(s2.sh, x)))") * lit(1.0) /
              expr("size(array_distinct(concat(s1.sh, s2.sh)))"),
            4).as("jaccard"))
        .orderBy("doc_id1", "doc_id2")
    }),

    // Edit-distance near-dup verify: exact Levenshtein over a 60-char
    // normalized head, for candidate pairs blocked by
    // (lang, length-bucket, first character) — the fuzzy-match verify
    // stage (OCR noise, diff-level edits) that set-based similarity
    // (Jaccard/MinHash) under-scores because single-character edits
    // break whole shingles. Same scale discipline as q_dedup_jaccard:
    // pair ENUMERATION runs over the slim projection through the
    // salted self-pairing (hot blocks spread over 8 tasks), and the
    // head strings — the payload — join in once per side from a
    // checkpointed projection afterwards. Two cost bounds beyond the
    // jaccard shape, because the DP is ~1000× a hash probe: the
    // first-char block key cuts candidate pairs ~12× without losing a
    // single ≤20-edit survivor on any fixture, and the DP itself runs
    // THRESHOLDED (Spark's 3-arg levenshtein early-exits past 20 edits
    // and returns -1; the oracle computes the full distance and
    // filters — identical surviving rows and values).
    "q_dedup_editdist" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val slim = docs.select(col("doc_id"), col("lang"),
        expr("n_chars div 20").as("lb"),
        substring(col("text"), 1, 1).as("c1"))
      val pairs = Salting.saltedSelfPairs(slim, Seq("lang", "lb", "c1"),
          "doc_id", 8)
        .select(col("a.lang").as("lang"), col("a.doc_id").as("doc1"),
          col("b.doc_id").as("doc2"))
      val heads = graft.Materialize.checkpoint(
        docs.select(col("doc_id"), substring(col("text"), 1, 60).as("head")))
      pairs
        .join(heads.as("h1"), col("doc1") === col("h1.doc_id"))
        .join(heads.as("h2"), col("doc2") === col("h2.doc_id"))
        // explicit count: the DP stage is CPU-heavy over tiny bytes,
        // and AQE's size-based coalesce would serialize it (the
        // q_text_repetition pitfall — CLAUDE.md parity rules)
        .repartition(s.sparkContext.defaultParallelism, col("doc1"),
          col("doc2"))
        .select(col("lang"), col("doc1"), col("doc2"),
          levenshtein(col("h1.head"), col("h2.head"), 20).cast("long")
            .as("dist"))
        .filter(col("dist") >= 0)
        .orderBy("lang", "doc1", "doc2")
    }),

    // Canonical-form (fingerprint) dedup: docs whose SORTED DISTINCT
    // token set agrees are near-dups regardless of word order or
    // repetition — the OpenRefine-style normalize-then-group step that
    // catches shuffled/re-worded boilerplate exact hashing misses. One
    // projection computes the 16-byte canonical digest per doc, one
    // hash aggregate groups on it — the shuffle carries (digest,
    // doc_id), never text, and there is no pair product at all; the
    // cheapest near-dup the engine offers at 100 TB.
    "q_dedup_norm" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(array_join(array_sort(array_distinct(split(col("text"), " "))),
            " ").cast("binary")).as("norm_sig"))
        .groupBy("norm_sig")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper_id"))
        .filter(col("n_docs") > 1)
        .orderBy("norm_sig"))
  ) ++ paragraphQueries

  // SUB-document dedup (CCNet's duplicated-paragraph step): every other
  // dedup here is doc-granularity; this one segments each doc into
  // fixed 10-token chunks (the fixture has no newline paragraph marks —
  // the chunk spine reuses q_text_chunk's sequence-explode), md5s each
  // segment, and reports the per-doc drop manifest — how many of a
  // doc's segments also appear verbatim in ANOTHER doc. Same-doc
  // repeats don't count (COUNT(DISTINCT doc) ≥ 2 defines a shared
  // segment). Discipline matches q_dedup_norm: segment TEXT dies at the
  // md5 projection — both shuffles (distinct-pair aggregate, dup-set
  // join) carry 16-byte digests + ids only. The segment frame feeds two
  // consumers (dup-set build, manifest join), so it materializes once.
  private def paragraphQueries
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_paragraph" -> ((s, d) => {
      val segs = graft.Materialize.checkpoint(
        Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"),
            explode(sequence(lit(0), size(col("toks")) - 1, lit(10)))
              .as("st"),
            col("toks"))
          .select(col("doc_id"),
            md5(array_join(slice(col("toks"), col("st") + 1, lit(10)), " ")
              .cast("binary")).as("h")))
      val dup = segs.select("doc_id", "h").distinct()
        .groupBy("h").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("h"), lit(1).as("__dup"))
      segs.join(dup, Seq("h"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("__dup").isNotNull, 1L).otherwise(0L))
            .as("n_dup_segs"))
        .select(col("doc_id"), col("n_segs"), col("n_dup_segs"),
          round(col("n_dup_segs").cast("double") / col("n_segs"), 4)
            .as("dup_share"))
        .orderBy("doc_id")
    }),

    // Exact-substring SPAN coverage (Lee et al. 2022, round 13): how
    // much of each doc's token stream is covered by 6-token spans that
    // occur more than once corpus-wide — the signal span-level dedup
    // thresholds on, finer than both doc- and paragraph-granularity.
    // Delegates to SpanDedup.coverageReport: map-side HOF span hashing,
    // ONE materialized span frame feeding the hot-key-safe
    // groupBy(hash) dup aggregate and the per-doc join, interval-union
    // fold over each doc's own bounded offset array. The oracle
    // recomputes with span STRINGS as keys (DuckDB has no xxhash64) —
    // hash-grouping must agree with string-grouping or the gate fails,
    // which doubles as a standing collision check at fixture scale.
    "q_span_coverage" -> ((s, d) =>
      SpanDedup.coverageReport(Tables.documents(s, d), "doc_id", "text", 6)),

    // The ACTION half (round 13): rewrite the corpus with every repeat
    // occurrence of a duplicated 6-token span removed, keeping the
    // globally-first (min (doc_id, off)) occurrence — SpanDedup.
    // removeDuplicatedSpans' one materialized span frame + dup
    // aggregate + keeper argmin + per-doc cut fold. The oracle rebuilds
    // the kept text independently (span strings as keys, a window-rank
    // keeper, position anti-join against cut intervals) and must match
    // the rewritten text byte-for-byte.
    "q_span_removal" -> ((s, d) =>
      SpanDedup.removeDuplicatedSpans(Tables.documents(s, d), "doc_id",
        "text", 6))
  )

  val oracle: Map[String, String] = Map(
    "q_span_removal" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS tk FROM documents),
        |spans AS (
        |  SELECT doc_id, u.i - 1 AS off, array_to_string(tk[u.i : u.i + 5], ' ') AS s
        |  FROM toks, unnest(range(1, greatest(len(tk) - 6 + 1, 0) + 1)) AS u(i)),
        |dups AS (SELECT s FROM spans GROUP BY s HAVING count(*) > 1),
        |dsp AS (SELECT sp.doc_id, sp.off, sp.s FROM spans sp JOIN dups USING (s)),
        |cuts AS (
        |  SELECT doc_id, off FROM (
        |    SELECT *, row_number() OVER (PARTITION BY s ORDER BY doc_id, off) AS rn
        |    FROM dsp) WHERE rn > 1),
        |pos AS (
        |  SELECT t.doc_id, tk[u.i] AS tok, CAST(u.i - 1 AS BIGINT) AS p
        |  FROM toks t, unnest(range(1, len(tk) + 1)) AS u(i)),
        |keptpos AS (
        |  SELECT p.doc_id, p.tok, p.p FROM pos p
        |  WHERE NOT EXISTS (SELECT 1 FROM cuts c
        |    WHERE c.doc_id = p.doc_id AND c.off <= p.p AND p.p < c.off + 6)),
        |rebuilt AS (
        |  SELECT doc_id, coalesce(string_agg(tok, ' ' ORDER BY p), '') AS text,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM keptpos GROUP BY doc_id)
        |SELECT t.doc_id,
        |  coalesce(r.text, '') AS text,
        |  CAST(len(t.tk) AS BIGINT) AS n_toks,
        |  CAST(len(t.tk) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
        |FROM toks t LEFT JOIN rebuilt r USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "q_span_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS tk FROM documents),
        |spans AS (
        |  SELECT doc_id, u.i - 1 AS off, array_to_string(tk[u.i : u.i + 5], ' ') AS s
        |  FROM toks, unnest(range(1, greatest(len(tk) - 6 + 1, 0) + 1)) AS u(i)),
        |dups AS (SELECT s FROM spans GROUP BY s HAVING count(*) > 1),
        |dsp AS (SELECT doc_id, off FROM spans JOIN dups USING (s)),
        |cov AS (
        |  SELECT doc_id, off,
        |    greatest(0, off + 6 - greatest(coalesce(max(off + 6) OVER (
        |      PARTITION BY doc_id ORDER BY off
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), off)) AS add
        |  FROM dsp),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |    CAST(sum(add) AS BIGINT) AS dup_tokens
        |  FROM cov GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_toks,
        |  coalesce(p.n_dup_spans, 0)::BIGINT AS n_dup_spans,
        |  coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
        |  round(coalesce(p.dup_tokens, 0) * 1.0 / greatest(len(t.tk), 1), 4) AS dup_fraction
        |FROM toks t LEFT JOIN per p USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "q_dedup_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 2)),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS shingles
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    list_transform(range(0,8), j -> list_min(list_transform(shingles, s -> md5(j || ':' || s)))) AS sg
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b AS band_id, md5(sg[2*b+1] || '|' || sg[2*b+2]) AS bk
        |  FROM sig, unnest(range(0,4)) AS t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_id1, b.doc_id AS doc_id2
        |  FROM bands a JOIN bands b ON a.band_id=b.band_id AND a.bk=b.bk AND a.doc_id<b.doc_id)
        |SELECT c.doc_id1, c.doc_id2,
        |  ROUND(len(list_filter(range(1,9), i -> s1.sg[i] = s2.sg[i])) / 8.0, 4) AS minhash_sim
        |FROM cand c JOIN sig s1 ON c.doc_id1=s1.doc_id JOIN sig s2 ON c.doc_id2=s2.doc_id
        |ORDER BY doc_id1, doc_id2""".stripMargin,
    "q_dedup_minhash_keep" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 2)),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS shingles
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    list_transform(range(0,8), j -> list_min(list_transform(shingles, s -> md5(j || ':' || s)))) AS sg
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b AS band_id, md5(sg[2*b+1] || '|' || sg[2*b+2]) AS bk
        |  FROM sig, unnest(range(0,4)) AS t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_id1, b.doc_id AS doc_id2
        |  FROM bands a JOIN bands b ON a.band_id=b.band_id AND a.bk=b.bk AND a.doc_id<b.doc_id),
        |dups AS (
        |  SELECT DISTINCT c.doc_id2 AS doc_id
        |  FROM cand c JOIN sig s1 ON c.doc_id1=s1.doc_id JOIN sig s2 ON c.doc_id2=s2.doc_id
        |  WHERE len(list_filter(range(1,9), i -> s1.sg[i] = s2.sg[i])) / 8.0 = 1.0)
        |SELECT d.doc_id, d.lang FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM dups u WHERE u.doc_id = d.doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q_dedup_cluster" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 2)),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS shingles
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    list_transform(range(0,8), j -> list_min(list_transform(shingles, s -> md5(j || ':' || s)))) AS sg
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, b AS band_id, md5(sg[2*b+1] || '|' || sg[2*b+2]) AS bk
        |  FROM sig, unnest(range(0,4)) AS t(b)),
        |edges AS (
        |  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        |  FROM bands a JOIN bands b ON a.band_id=b.band_id AND a.bk=b.bk AND a.doc_id <> b.doc_id),
        |reach AS (
        |  SELECT doc_id AS doc, doc_id AS lab FROM documents
        |  UNION
        |  SELECT e.v AS doc, r.lab FROM reach r JOIN edges e ON e.u = r.doc),
        |comp AS (SELECT doc, MIN(lab) AS cluster_id FROM reach GROUP BY doc)
        |SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM comp GROUP BY cluster_id HAVING COUNT(*) > 1 ORDER BY cluster_id""".stripMargin,
    "q_dedup_simhash" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(1,33), j ->
        |      CASE WHEN list_sum(list_transform(string_split(text,' '),
        |        t -> CASE WHEN strpos('0123456789abcdef', substr(md5(t), j, 1)) >= 9 THEN 1 ELSE -1 END)) >= 0
        |      THEN '1' ELSE '0' END), '') AS f
        |  FROM documents)
        |SELECT f AS fp, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS keep_id
        |FROM fp GROUP BY f HAVING COUNT(*) > 1 ORDER BY fp""".stripMargin,
    "q_dedup_jaccard" ->
      """WITH keyed AS (
        |  SELECT doc_id, lang, md5(array_to_string(string_split(text,' ')[1:3],' ')) AS bk,
        |    list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 2)),
        |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
        |  ROUND(len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0 /
        |        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
        |FROM keyed a JOIN keyed b ON a.lang=b.lang AND a.bk=b.bk AND a.doc_id<b.doc_id
        |ORDER BY doc_id1, doc_id2""".stripMargin,
    "q_dedup_editdist" ->
      """WITH b AS (SELECT doc_id, lang, n_chars // 20 AS lb,
        |    substr(text, 1, 60) AS head FROM documents),
        |p AS (SELECT a.lang, a.doc_id AS doc1, c.doc_id AS doc2,
        |    CAST(levenshtein(a.head, c.head) AS BIGINT) AS dist
        |  FROM b a JOIN b c ON a.lang = c.lang AND a.lb = c.lb
        |    AND substr(a.head, 1, 1) = substr(c.head, 1, 1)
        |    AND a.doc_id < c.doc_id)
        |SELECT lang, doc1, doc2, dist FROM p WHERE dist <= 20
        |ORDER BY lang, doc1, doc2""".stripMargin,
    "q_dedup_norm" ->
      """WITH n AS (SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS norm_sig
        |  FROM documents)
        |SELECT norm_sig, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(doc_id) AS keeper_id
        |FROM n GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY norm_sig""".stripMargin,

    // NB DuckDB list slice [a:b] is INCLUSIVE of both ends (10 elements
    // here), matching Spark slice(toks, st+1, 10).
    "q_dedup_paragraph" ->
      """WITH segs AS (
        |  SELECT doc_id, md5(array_to_string(toks[st+1 : st+10], ' ')) AS h
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents WHERE length(text) > 0),
        |       UNNEST(range(0, len(toks), 10)) AS t(st)),
        |dup AS (
        |  SELECT h FROM (
        |    SELECT h, COUNT(DISTINCT doc_id) AS nd FROM segs GROUP BY h)
        |  WHERE nd >= 2)
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
        |  CAST(COUNT(*) FILTER (d.h IS NOT NULL) AS BIGINT) AS n_dup_segs,
        |  ROUND(CAST(COUNT(*) FILTER (d.h IS NOT NULL) AS DOUBLE)
        |        / COUNT(*), 4) AS dup_share
        |FROM segs s LEFT JOIN dup d USING (h)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin
  )
}

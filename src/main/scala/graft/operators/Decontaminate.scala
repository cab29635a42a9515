package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set DECONTAMINATION — the n-gram overlap scrub every serious
  * LLM data pipeline runs before training (GPT-3 appendix C, Dolma,
  * The Pile): a training document that shares a w-token span with a
  * held-out benchmark leaks the benchmark into the weights, so such
  * docs are flagged (and usually dropped) with w = 13 as the
  * published default.
  *
  * Shape: this is [[SpanDedup]]'s exact-substring machinery pointed
  * at an ASYMMETRIC pair — the corpus side emits its span hashes
  * map-side (every token sits in w spans; corpus-token-sized output
  * is inherent), the EVAL side is small by nature (benchmarks are
  * thousands of docs, not billions) and its distinct span-hash set
  * BROADCASTS, so contamination detection is one broadcast semi-join
  * on the span stream — the corpus never shuffles at all — followed
  * by a per-doc hash aggregate and the same per-row interval-union
  * fold [[SpanDedup.coverageReport]] uses for covered-token mass.
  * Pass `broadcastEval = false` for an unusually large eval union;
  * the join then shuffles both sides on the 8-byte hash (never
  * span text).
  *
  * Hash note: spans compare by xxhash64 (collision ~2^-64 per pair) —
  * a collision can only OVER-flag (drop a clean training doc), never
  * leak contamination through, which is the safe direction for this
  * operator.
  */
object Decontaminate {

  /** Per-training-doc contamination report against `evalSet`:
    * (doc_id, n_toks, n_hits — contaminated span occurrences,
    * contaminated_tokens — exact token mass under ≥1 eval-shared
    * span, contamination — 4-dp fraction). Clean docs report zeros.
    * Both frames need (`idCol`, `textCol`).
    */
  def report(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, w: Int = 13,
      broadcastEval: Boolean = true): DataFrame = {
    val evalHashes0 = SpanDedup.spanHashes(evalSet, idCol, textCol, w)
      .select("h").distinct()
    val evalHashes =
      if (broadcastEval) broadcast(evalHashes0) else evalHashes0
    val hits = SpanDedup.spanHashes(train, idCol, textCol, w)
      .join(evalHashes, Seq("h"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        array_sort(collect_list(col("off"))).as("__offs"))
      .select(col("doc_id"), col("n_hits"),
        SpanDedup.coveredTokensFold(w).as("contaminated_tokens"))
    train
      .select(col(idCol).as("doc_id"),
        size(SpanDedup.tokensOf(textCol)).cast("long").as("n_toks"))
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("contaminated_tokens"), lit(0L))
          .as("contaminated_tokens"),
        round(coalesce(col("contaminated_tokens"), lit(0L)) * lit(1.0) /
          greatest(col("n_toks"), lit(1L)), 4).as("contamination"))
  }

  /** The scrub itself: training docs whose contaminated-token fraction
    * is ≤ `maxFraction` (the published recipes use 0.0 — any 13-gram
    * hit drops the doc; a small positive tolerance keeps long docs
    * that merely quote a benchmark line). Column set = `train`'s.
    * The threshold compares the EXACT token masses, not the 4-dp
    * display fraction: round-then-compare would pass a >260k-token doc
    * with one 13-gram hit through the any-hit rule (round(13/n, 4) =
    * 0.0), quietly leaking eval data on exactly the longest docs.
    */
  def clean(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, w: Int = 13,
      maxFraction: Double = 0.0): DataFrame = {
    val contaminated = report(train, evalSet, idCol, textCol, w)
      .filter(col("contaminated_tokens").cast("double") >
        lit(maxFraction) * col("n_toks"))
      .select(col("doc_id").as(idCol))
    train.join(contaminated, Seq(idCol), "left_anti")
  }
}

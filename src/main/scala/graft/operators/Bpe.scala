package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.BpeEncode
import graft.sources.Tables

/** Byte-pair-encoding tokenizer: distributed training-corpus statistics
  * + exact greedy merge learning + map-side encoding — the real
  * subword tokenizer an LLM data pipeline runs over its corpus, where
  * `q_text_tokens`' regex count is only the pre-tokenizer.
  *
  * Scale shape (the part that must survive 100 TB):
  *
  *  - The ONLY corpus-proportional work is [[wordHistogram]] — one
  *    explode + hash-aggregate shuffle whose output is VOCABULARY-sized
  *    (distinct words), not corpus-sized. This is the classic Sennrich
  *    formulation: BPE never trains on the token stream, it trains on
  *    the (word, frequency) table, so 100 TB of text reduces to a few
  *    hundred MB of histogram before any iteration starts.
  *  - Training iterates over that bounded histogram driver-side (same
  *    discipline as [[IvfIndex]]'s seeding: an explicit `maxVocab` cap
  *    + a `require`, with the truncated mass reported as `coverage`
  *    so the cut is visible, never silent — Zipf's law makes the top
  *    64k words cover ≳99% of natural-language token mass). The merge
  *    loop is the standard INCREMENTAL algorithm: a pair→words inverted
  *    index confines each merge's recount to the words that actually
  *    contain the winning pair, not the whole vocabulary.
  *  - Encoding ([[encode]]) is one map-side pass: the ranked merge
  *    table rides in the [[graft.plans.BpeEncode]] expression through
  *    Spark's task-binary broadcast — zero shuffles, zero driver
  *    round-trips, memoized per task. Decoding ([[decodeCol]]) is pure
  *    built-ins (`array_join` + `replace`).
  *
  * Determinism: merges are picked by (max weighted count, then
  * lexicographically smallest pair) — no RNG, so two trainings of the
  * same histogram produce byte-identical merge tables regardless of
  * partitioning (BpeSpec pins this plus the hand-computed Sennrich
  * merge sequence on the paper's own example).
  */
object Bpe {

  /** A trained tokenizer: merge i was learned at rank i (lower rank =
    * merged earlier = higher priority at encode time); `coverage` is
    * the fraction of total word mass the (possibly capped) training
    * histogram retained.
    */
  final case class BpeModel(merges: Array[(String, String)], coverage: Double) {
    /** Subword vocabulary implied by the merges (single characters and
      * the `</w>` sentinel are always implicitly present).
      */
    def vocab: Set[String] = merges.map { case (a, b) => a + b }.toSet

    /** token → id: 0–25 = 'a'–'z', 26 = `</w>`, then merge products in
      * rank order, deduplicated (two rules can build the same string;
      * the token keeps its first id). Mirrors the id scheme inside
      * [[graft.plans.BpeEncode]] — BpeSpec pins the two equal.
      */
    def vocabIds: Map[String, Int] = {
      val base = ('a' to 'z').map(c => String.valueOf(c) -> (c - 'a')).toMap +
        ("</w>" -> 26)
      merges.foldLeft((base, 27)) { case ((m, next), (a, b)) =>
        val tok = a + b
        if (m.contains(tok)) (m, next) else (m + (tok -> next), next + 1)
      }._1
    }
  }

  /** Corpus word histogram — the one corpus-proportional job. Output is
    * (word, cnt), distinct-word-sized. Pre-tokenization is the same
    * maximal `[a-z]+` regex as `q_text_tokens` / [[graft.plans.BpeEncode]].
    */
  def wordHistogram(spark: SparkSession, dir: String): DataFrame =
    wordHistogram(Tables.documents(spark, dir), "text")

  /** Histogram over any frame's text column (e.g. a CURATED corpus —
    * train the tokenizer on what survives curation, not the raw dump).
    */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `numMerges` merges from the corpus under `dir`. */
  def train(spark: SparkSession, dir: String, numMerges: Int,
      maxVocab: Int = 1 << 16): BpeModel =
    trainOnDocs(Tables.documents(spark, dir), "text", numMerges, maxVocab)

  /** Learn `numMerges` merges from any document frame. */
  def trainOnDocs(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1 << 16): BpeModel = {
    require(maxVocab <= (1 << 20),
      s"BPE maxVocab=$maxVocab: the driver-side merge loop is bounded by " +
        "the histogram cap; raise deliberately, not by accident")
    val hist = wordHistogram(docs, textCol)
    // One scalar total + the top-maxVocab slice (TakeOrdered — never a
    // global sort). Deterministic order: count desc, then word.
    // coalesce: sum over an EMPTY histogram is null — a corpus with no
    // pre-tokenizer matches must yield an empty model, not an NPE.
    val total = hist.agg(coalesce(sum(col("cnt")), lit(0L))).head.getLong(0)
    val kept = hist.orderBy(col("cnt").desc, col("word"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val coverage =
      if (total == 0L) 1.0 else kept.map(_._2).sum.toDouble / total
    trainFromHistogram(kept, numMerges).copy(coverage = coverage)
  }

  /** Exact greedy BPE over an in-memory (word, freq) histogram — the
    * Sennrich (2016) learner with the standard incremental pair-count
    * maintenance: counts and a pair→words index are built once, and
    * each merge touches only the words containing the winning pair.
    */
  def trainFromHistogram(histogram: Seq[(String, Long)],
      numMerges: Int): BpeModel = {
    val words: Array[Array[String]] = histogram.map { case (w, _) =>
      val a = new Array[String](w.length + 1)
      var i = 0
      while (i < w.length) { a(i) = String.valueOf(w.charAt(i)); i += 1 }
      a(w.length) = "</w>"
      a
    }.toArray
    val freqs: Array[Long] = histogram.map(_._2).toArray

    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val s = words(wi)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(wi)
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0) index.getOrElseUpdate(p, mutable.Set.empty) += wi
        j += 1
      }
    }
    var wi = 0
    while (wi < words.length) { addWordPairs(wi, 1L); wi += 1 }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      // Deterministic argmax: highest weighted count, ties to the
      // lexicographically smallest pair. A linear scan per merge is
      // O(|pairs|) — fine at histogram scale; the expensive part
      // (per-word remerge) is confined by the inverted index.
      var best: (String, String) = null
      var bestCnt = 0L
      counts.foreach { case (p, c) =>
        if (c > bestCnt || (c == bestCnt && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestCnt = c
        }
      }
      if (best == null || bestCnt < 1L) exhausted = true
      else {
        merges += best
        val touched = index.getOrElse(best, mutable.Set.empty).toArray
        java.util.Arrays.sort(touched)
        touched.foreach { ti =>
          val s = words(ti)
          // Words listed under stale pairs may no longer contain it;
          // re-check before paying the remerge.
          var contains = false
          var j = 0
          while (!contains && j < s.length - 1) {
            if (s(j) == best._1 && s(j + 1) == best._2) contains = true
            j += 1
          }
          if (contains) {
            addWordPairs(ti, -1L)
            val out = new Array[String](s.length)
            var src = 0
            var dst = 0
            while (src < s.length) {
              if (src < s.length - 1 && s(src) == best._1 &&
                  s(src + 1) == best._2) {
                out(dst) = best._1 + best._2; src += 2
              } else { out(dst) = s(src); src += 1 }
              dst += 1
            }
            words(ti) = java.util.Arrays.copyOf(out, dst)
            addWordPairs(ti, 1L)
          }
        }
        counts.remove(best)
        index.remove(best)
        m += 1
      }
    }
    BpeModel(merges.toArray, coverage = 1.0)
  }

  /** Add a `tokens` (array<string>) column encoding `textCol` under the
    * model — pure map-side (BpeSpec pins the exchange-free plan).
    * Registers `bpe_encode` bound to this model's merge table as a side
    * effect (same registry discipline as `minhash_sig`/`cosine_sim`).
    */
  def encode(df: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    BpeEncode.register(df.sparkSession, model.merges)
    df.withColumn("tokens", expr(s"bpe_encode($textCol)"))
  }

  /** Like [[encode]] but emits vocabulary IDS (`token_ids`:
    * array<int>) — the column a training pipeline actually
    * materializes to its shard files. Same map-side plan.
    */
  def encodeIds(df: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    BpeEncode.register(df.sparkSession, model.merges)
    df.withColumn("token_ids", expr(s"bpe_encode_ids($textCol)"))
  }

  /** Invert [[encode]] back to the pre-tokenized normal form (words
    * joined by single spaces) — built-ins only.
    */
  def decodeCol(tokens: Column): Column =
    trim(regexp_replace(array_join(tokens, ""), "</w>", " "))

  /** Persist the model as a tiny parquet artifact (rank, left, right,
    * coverage) — the tokenizer file every downstream job loads. One
    * file: the table is merge-table-sized, never data-sized.
    */
  def save(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b, model.coverage) }.toSeq
      .toDF("rank", "left", "right", "coverage")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a model saved by [[save]] — exact roundtrip (BpeSpec). */
  def load(spark: SparkSession, path: String): BpeModel = {
    val rows = spark.read.parquet(path)
      .orderBy("rank")
      .select("left", "right", "coverage")
      .collect()
    BpeModel(
      rows.map(r => (r.getString(0), r.getString(1))),
      if (rows.isEmpty) 1.0 else rows.head.getDouble(2))
  }

  /** Per-source tokenizer report over the corpus: BPE token count vs
    * the regex pre-token count (fertility = BPE tokens per word) and
    * compression (characters per BPE token).
    */
  def encodeStats(spark: SparkSession, dir: String,
      model: BpeModel): DataFrame =
    encode(Tables.documents(spark, dir), "text", model)
      .select(col("source"), size(col("tokens")).as("n_bpe"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .as("n_words"),
        length(regexp_replace(lower(col("text")), "[^a-z]", ""))
          .as("n_chars"))
      .groupBy("source")
      .agg(sum(col("n_bpe")).as("bpe_tokens"),
        sum(col("n_words")).as("words"),
        round(sum(col("n_bpe")) * lit(1.0) / sum(col("n_words")), 4)
          .as("fertility"),
        round(sum(col("n_chars")) * lit(1.0) / sum(col("n_bpe")), 4)
          .as("chars_per_token"))
      .orderBy("source")
}

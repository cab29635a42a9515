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

  /** Pre-tokenizer modes. `Ascii` (the default everywhere) is the
    * original maximal-`[a-z]+` pre-tokenizer shared with
    * `q_text_tokens`: digits, punctuation, and non-Latin scripts are
    * DROPPED before the histogram, which is fine for ASCII prose but
    * silently lossy on a real corpus. `Unicode` pre-tokenizes the
    * lowercased text into maximal same-category runs — letters
    * (`\p{L}+`), digits (`\p{N}+`), and other non-whitespace
    * (`[^\s\p{L}\p{N}]+`) — so EVERY non-whitespace code point of the
    * input lands in exactly one unit and only whitespace (the decode
    * normal form's separator) is elided. Symbols are single code
    * points (surrogate pairs stay whole), the model carries its
    * observed alphabet, and ids gain a trailing `<unk>` slot for
    * encode-time characters the training corpus never saw.
    */
  val ModeAscii = "ascii"
  val ModeUnicode = "unicode"

  /** GPT-2-style BYTE-LEVEL mode: pre-tokenize the RAW text (no
    * lowercasing) with the GPT-2 pattern — whitespace included, so
    * every byte of the input lands in exactly one unit — and represent
    * each unit as its UTF-8 bytes mapped through the GPT-2
    * byte→printable-char bijection. The alphabet is always all 256
    * byte-chars (ids 0–255 in byte order), so encode can NEVER hit an
    * out-of-vocabulary symbol and decode∘encode is the IDENTITY on
    * arbitrary text (case, whitespace, emoji, any script) — the
    * property production tokenizers (GPT-2/RoBERTa/Llama BPE) are
    * built on. No `</w>` sentinel: word boundaries live in the
    * leading-space bytes, as in GPT-2.
    */
  val ModeBytes = "bytes"

  private val UnicodeUnits = "\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"

  /** The GPT-2 pre-tokenizer regex (Radford et al. 2019, public
    * encoder.py): contractions, optionally-space-led letter/number/
    * punctuation runs, and whitespace runs (split so trailing
    * whitespace before a token keeps its last char with the token).
    */
  private[graft] val Gpt2Units =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  private[graft] def preTokenPattern(mode: String): String = mode match {
    case ModeAscii => "[a-z]+"
    case ModeUnicode => UnicodeUnits
    case ModeBytes => Gpt2Units
    case m => throw new IllegalArgumentException(s"unknown BPE mode: $m")
  }

  /** Modes whose pre-tokenizer runs on lowercased text (bytes mode is
    * case-faithful by construction).
    */
  private[graft] def lowercases(mode: String): Boolean = mode != ModeBytes

  /** GPT-2 byte→char bijection: printable latin-1 bytes map to
    * themselves, the other 68 bytes to U+0100+n in discovery order —
    * every byte gets a PRINTABLE single-char spelling so merge tables
    * and token strings stay text.
    */
  private[graft] val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    val keep = (('!' to '~') ++ ('¡' to '¬') ++
      ('®' to 'ÿ')).map(_.toInt).toSet
    var next = 256
    (0 until 256).foreach { b =>
      if (keep(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
    }
    out
  }

  private[graft] val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** A pre-token's byte-level symbol sequence (one byte-char each). */
  private[graft] def byteSymbols(w: String): Array[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => String.valueOf(byteToChar(b & 0xff)))

  /** Invert a byte-mode token stream back to the exact original text. */
  private[graft] def decodeBytesLocal(tokens: Seq[String]): String = {
    val chars = tokens.mkString
    val bytes = new Array[Byte](chars.length)
    var i = 0
    while (i < chars.length) { bytes(i) = charToByte(chars.charAt(i)); i += 1 }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Split into single-code-point strings (surrogate-pair-safe). */
  private[graft] def codePoints(w: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** A trained tokenizer: merge i was learned at rank i (lower rank =
    * merged earlier = higher priority at encode time); `coverage` is
    * the fraction of total word mass the (possibly capped) training
    * histogram retained. `alphabet` is the model's single-code-point
    * base vocabulary in lexicographic order (always a–z in ascii mode;
    * the characters observed in the kept histogram in unicode mode).
    */
  final case class BpeModel(merges: Array[(String, String)], coverage: Double,
      alphabet: Array[String] = ('a' to 'z').map(String.valueOf(_)).toArray,
      mode: String = ModeAscii) {
    /** Subword vocabulary implied by the merges (single characters and
      * the `</w>` sentinel are always implicitly present).
      */
    def vocab: Set[String] = merges.map { case (a, b) => a + b }.toSet

    /** token → id: alphabet chars in order (ascii: 0–25 = 'a'–'z'),
      * then `</w>`, then merge products in rank order, deduplicated
      * (two rules can build the same string; the token keeps its first
      * id); unicode mode appends a final `<unk>` id for encode-time
      * characters outside the alphabet. Mirrors the id scheme inside
      * [[graft.plans.BpeEncode]] — BpeSpec pins the two equal.
      */
    def vocabIds: Map[String, Int] = {
      // bytes mode: no </w> sentinel (boundaries are space bytes) and
      // no <unk> (all 256 byte symbols are the alphabet — OOV cannot
      // exist); word modes: </w> after the alphabet, unicode adds a
      // trailing <unk> for out-of-alphabet encode-time characters.
      val base =
        if (mode == ModeBytes) alphabet.zipWithIndex.toMap
        else alphabet.zipWithIndex.toMap + ("</w>" -> alphabet.length)
      val start = if (mode == ModeBytes) alphabet.length else alphabet.length + 1
      val withMerges =
        merges.foldLeft((base, start)) {
          case ((m, next), (a, b)) =>
            val tok = a + b
            if (m.contains(tok)) (m, next) else (m + (tok -> next), next + 1)
        }
      if (mode == ModeUnicode) withMerges._1 + ("<unk>" -> withMerges._2)
      else withMerges._1
    }
  }

  /** Corpus word histogram — the one corpus-proportional job. Output is
    * (word, cnt), distinct-word-sized. Pre-tokenization matches
    * [[graft.plans.BpeEncode]] for the same mode (ascii = the same
    * maximal `[a-z]+` regex as `q_text_tokens`).
    */
  def wordHistogram(spark: SparkSession, dir: String,
      mode: String = ModeAscii): DataFrame =
    wordHistogram(Tables.documents(spark, dir), "text", mode)

  /** Histogram over any frame's text column (e.g. a CURATED corpus —
    * train the tokenizer on what survives curation, not the raw dump).
    */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    wordHistogram(docs, textCol, ModeAscii)

  def wordHistogram(docs: DataFrame, textCol: String,
      mode: String): DataFrame = {
    val src = if (lowercases(mode)) lower(col(textCol)) else col(textCol)
    docs
      .select(explode(
        regexp_extract_all(src, lit(preTokenPattern(mode)), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
  }

  /** Learn `numMerges` merges from the corpus under `dir`. */
  def train(spark: SparkSession, dir: String, numMerges: Int,
      maxVocab: Int = 1 << 16, mode: String = ModeAscii): BpeModel =
    trainOnDocs(Tables.documents(spark, dir), "text", numMerges, maxVocab,
      mode)

  /** Learn `numMerges` merges from any document frame. */
  def trainOnDocs(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1 << 16, mode: String = ModeAscii): BpeModel = {
    require(maxVocab <= (1 << 20),
      s"BPE maxVocab=$maxVocab: the driver-side merge loop is bounded by " +
        "the histogram cap; raise deliberately, not by accident")
    val hist = wordHistogram(docs, textCol, mode)
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
    val alphabet = mode match {
      case ModeAscii => ('a' to 'z').map(String.valueOf(_)).toArray
      case ModeBytes =>
        // always ALL 256 byte-chars, in byte order (GPT-2 id layout) —
        // independence from the corpus is what makes OOV impossible
        byteToChar.map(String.valueOf(_))
      case _ => kept.iterator.flatMap(kv => codePoints(kv._1))
        .toArray.distinct.sorted
    }
    trainFromHistogram(kept, numMerges, mode)
      .copy(coverage = coverage, alphabet = alphabet, mode = mode)
  }

  /** Exact greedy BPE over an in-memory (word, freq) histogram — the
    * Sennrich (2016) learner with the standard incremental pair-count
    * maintenance: counts and a pair→words index are built once, and
    * each merge touches only the words containing the winning pair.
    */
  def trainFromHistogram(histogram: Seq[(String, Long)],
      numMerges: Int): BpeModel =
    trainFromHistogram(histogram, numMerges, ModeAscii)

  def trainFromHistogram(histogram: Seq[(String, Long)],
      numMerges: Int, mode: String): BpeModel = {
    val words: Array[Array[String]] = histogram.map { case (w, _) =>
      // byte mode: byte-char symbols, no sentinel (GPT-2); word modes:
      // single-code-point symbols (surrogate-pair-safe) + the sentinel
      if (mode == ModeBytes) byteSymbols(w) else codePoints(w) :+ "</w>"
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
    BpeEncode.register(df.sparkSession, model)
    df.withColumn("tokens", expr(s"bpe_encode($textCol)"))
  }

  /** Like [[encode]] but emits vocabulary IDS (`token_ids`:
    * array<int>) — the column a training pipeline actually
    * materializes to its shard files. Same map-side plan.
    */
  def encodeIds(df: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    BpeEncode.register(df.sparkSession, model)
    df.withColumn("token_ids", expr(s"bpe_encode_ids($textCol)"))
  }

  /** Invert [[encode]] back to the pre-tokenized normal form (words
    * joined by single spaces) — built-ins only. Word modes only; byte
    * mode decodes with [[decodeCol(tokens:Column,model:Bpe\.BpeModel)*]].
    */
  def decodeCol(tokens: Column): Column =
    trim(regexp_replace(array_join(tokens, ""), "</w>", " "))

  /** Mode-aware decode: byte mode inverts the byte-char bijection back
    * to the EXACT original text (decode∘encode = identity — no normal
    * form involved) via the native `bpe_decode_bytes` expression; word
    * modes fall back to the normal-form decode above.
    */
  def decodeCol(tokens: Column, model: BpeModel): Column =
    if (model.mode == ModeBytes) {
      // registered by encode()/encodeIds(); call_function resolves it
      call_function("bpe_decode_bytes", tokens)
    } else decodeCol(tokens)

  /** Persist the model as a tiny parquet artifact (rank, left, right,
    * coverage) — the tokenizer file every downstream job loads. One
    * file: the table is merge-table-sized, never data-sized.
    */
  def save(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    // alphabet rides as one concatenated string (entries are single
    // code points, so splitting back by code point is exact); model
    // metadata repeats per row — the table is merge-table-sized.
    val alpha = model.alphabet.mkString
    model.merges.zipWithIndex
      .map { case ((a, b), r) =>
        (r, a, b, model.coverage, alpha, model.mode)
      }.toSeq
      .toDF("rank", "left", "right", "coverage", "alphabet", "mode")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a model saved by [[save]] — exact roundtrip (BpeSpec).
    * Artifacts written before the alphabet/mode columns existed
    * (v1: rank,left,right,coverage only) load with the historical
    * defaults (a–z alphabet, ascii mode) instead of throwing.
    */
  def load(spark: SparkSession, path: String): BpeModel = {
    val df = spark.read.parquet(path)
    val v2 = df.columns.contains("alphabet") && df.columns.contains("mode")
    val rows =
      if (v2) df.orderBy("rank").select("left", "right", "coverage", "alphabet", "mode").collect()
      else df.orderBy("rank").select("left", "right", "coverage").collect()
    if (rows.isEmpty) BpeModel(Array.empty, 1.0)
    else if (v2) BpeModel(
      rows.map(r => (r.getString(0), r.getString(1))),
      rows.head.getDouble(2),
      codePoints(rows.head.getString(3)),
      rows.head.getString(4))
    else BpeModel(
      rows.map(r => (r.getString(0), r.getString(1))),
      rows.head.getDouble(2))
  }

  /** Per-source tokenizer report over the corpus: BPE token count vs
    * the regex pre-token count (fertility = BPE tokens per word) and
    * compression (characters per BPE token).
    */
  def encodeStats(spark: SparkSession, dir: String,
      model: BpeModel): DataFrame =
    encode(Tables.documents(spark, dir), "text", model)
      .select(col("source"), size(col("tokens")).as("n_bpe"),
        size(regexp_extract_all(
          if (lowercases(model.mode)) lower(col("text")) else col("text"),
          lit(preTokenPattern(model.mode)), lit(0))).as("n_words"),
        aggregate(
          regexp_extract_all(
            if (lowercases(model.mode)) lower(col("text")) else col("text"),
            lit(preTokenPattern(model.mode)), lit(0)),
          lit(0L), (acc, w) => acc + length(w)).as("n_chars"))
      .groupBy("source")
      .agg(sum(col("n_bpe")).as("bpe_tokens"),
        sum(col("n_words")).as("words"),
        round(sum(col("n_bpe")) * lit(1.0) / sum(col("n_words")), 4)
          .as("fertility"),
        round(sum(col("n_chars")) * lit(1.0) / sum(col("n_bpe")), 4)
          .as("chars_per_token"))
      .orderBy("source")
}

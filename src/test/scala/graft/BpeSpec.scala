package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE tokenizer invariants the hash gate cannot see: the exact
  * Sennrich merge sequence on the paper's own example (hand-computed
  * literals — writer and learner cannot collude), greedy-argmax
  * agreement with an independently Spark-computed pair count,
  * encode/decode inversion, vocabulary closure, determinism, and the
  * map-side (exchange-free) encode plan.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.sf0001

  // Sennrich et al. (2016) running example: {low:5, lower:2, newest:6,
  // widest:3}. The first six merges, hand-derived (tie-break = max
  // count then lexicographically smallest pair): the 9-count tie
  // (e,s)/(s,t)/(t,</w>) resolves left-to-right by first element;
  // after (est,</w>) the 7-count tie (l,o)/(o,w) picks (l,o); after
  // (lo,w) the 6-count three-way tie (e,w)/(n,e)/(w,est</w>) resolves
  // to (e,w) because "e" < "n" < "w".
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("hand-computed Sennrich merge sequence") {
    val model = Bpe.trainFromHistogram(sennrich, 6)
    assert(model.merges.toSeq === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("training is deterministic and exhausts gracefully") {
    val a = Bpe.trainFromHistogram(sennrich, 100)
    val b = Bpe.trainFromHistogram(sennrich.reverse, 100)
    assert(a.merges.toSeq === b.merges.toSeq,
      "input order must not change the learned merges")
    // 100 requested but the corpus runs out of pairs first: every word
    // must have collapsed to a single symbol.
    val m = a
    val enc = Bpe.encode(
      spark.createDataFrame(sennrich).toDF("text", "f"), "text", m)
    assert(enc.select(max(size(col("tokens")))).head.getInt(0) === 1,
      "fully-trained BPE encodes every training word as one token")
  }

  test("first merge equals the independently computed best pair") {
    // Argmax recomputed through an independent path: a one-shot local
    // pair count over the collected histogram (no inverted index, no
    // incremental maintenance), weighted by word frequency.
    val hist = Bpe.wordHistogram(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    hist.foreach { case (w, f) =>
      val syms = w.map(String.valueOf(_)) :+ "</w>"
      syms.zip(syms.tail).foreach { p =>
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
      }
    }
    val expected = pairCounts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
    val model = Bpe.train(spark, sf0001, 1)
    assert(model.merges.head === expected)
    assert(model.coverage === 1.0,
      "fixture vocabulary is far below the cap — nothing truncated")
  }

  test("vocab cap: coverage reports exactly the kept mass") {
    val hist = Bpe.wordHistogram(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val capped = Bpe.train(spark, sf0001, 5, maxVocab = 10)
    val total = hist.map(_._2).sum.toDouble
    val kept = hist.sortBy { case (w, c) => (-c, w) }.take(10).map(_._2).sum
    assert(math.abs(capped.coverage - kept / total) < 1e-12)
    assert(capped.coverage < 1.0,
      "the fixture vocabulary exceeds 10 words, so the cap must bite")
  }

  test("histogram matches an exact recount") {
    val viaModule = Bpe.wordHistogram(spark, sf0001)
      .orderBy(col("cnt").desc, col("word")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = sources.Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaModule === exact)
  }

  test("encode/decode round-trips to the pre-tokenized normal form") {
    val model = Bpe.train(spark, sf0001, 50)
    val docs = sources.Tables.documents(spark, sf0001).limit(50)
    val bad = Bpe.encode(docs, "text", model)
      .select(
        Bpe.decodeCol(col("tokens")).as("back"),
        trim(regexp_replace(lower(col("text")), "[^a-z]+", " ")).as("norm"))
      .filter(col("back") =!= col("norm"))
      .count()
    assert(bad === 0L)
  }

  test("every emitted token is in the merge-implied vocabulary") {
    val model = Bpe.train(spark, sf0001, 50)
    val legal = model.vocab ++ ('a' to 'z').map(String.valueOf(_)) + "</w>"
    val toks = Bpe.encode(
      sources.Tables.documents(spark, sf0001).limit(100), "text", model)
      .select(explode(col("tokens")).as("t")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(toks.subsetOf(legal), s"illegal tokens: ${toks -- legal}")
    // And merges actually fire: some multi-char token must appear.
    assert(toks.exists(t => t != "</w>" && t.length > 1))
  }

  test("encode is map-side: no exchange in the plan") {
    val model = Bpe.train(spark, sf0001, 20)
    val plan = Bpe.encode(
      sources.Tables.documents(spark, sf0001), "text", model)
      .select(col("doc_id"), col("tokens"))
      .queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty,
      s"BPE encode must not shuffle:\n$plan")
  }

  test("encodeIds mirrors encode through the model's vocab id map") {
    val model = Bpe.train(spark, sf0001, 40)
    val ids = model.vocabIds
    val docs = sources.Tables.documents(spark, sf0001).limit(40)
    val both = Bpe.encodeIds(Bpe.encode(docs, "text", model), "text", model)
      .select(col("tokens"), col("token_ids"))
      .collect()
    both.foreach { r =>
      val toks = r.getSeq[String](0)
      val got = r.getSeq[Int](1)
      assert(got === toks.map(ids), s"id mismatch for $toks")
    }
    // the id space is dense: 27 primitives + deduped merge products
    assert(ids.values.toSeq.sorted === (0 until ids.size))
  }

  test("save/load roundtrips the model exactly") {
    val model = Bpe.train(spark, sf0001, 30)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.save(spark, model, path)
    val back = Bpe.load(spark, path)
    assert(back.merges.toSeq === model.merges.toSeq)
    assert(back.coverage === model.coverage)
    // and the artifact is the intended single tiny file
    val files = new java.io.File(path).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length === 1)
  }

  // ---- unicode mode: digits, punctuation, CJK ----------------------

  /** Mixed-script corpus: ASCII prose, digits, punctuation, accented
    * Latin, and CJK — everything the ascii pre-tokenizer silently
    * drops. Lowercase already (encode lowercases; keeping the fixture
    * pre-lowered sidesteps locale-mapping edge cases that are not the
    * point of these tests).
    */
  private def unicodeDocs = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val texts = Seq(
      "the cafe sold 42 croissants, 42 more tomorrow!",
      "price: 1,234.56 (up 7%) — see page 42",
      "日本語のテキストと漢字 2024 年",
      "résumé naïve café — déjà vu, déjà vu",
      "mixed 日本語 and english with 123 numbers!!!",
      "the the the 42 42 日本語 café café café")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  test("unicode mode: every non-whitespace character reaches the histogram") {
    // The pre-tokenizer's three unit classes partition non-whitespace:
    // unit lengths must sum to the non-whitespace char count, doc by doc
    // (the ascii mode drops digits/punct/CJK; unicode must drop NOTHING).
    val bad = unicodeDocs.select(
      aggregate(
        regexp_extract_all(lower(col("text")),
          lit("\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"), lit(0)),
        lit(0), (acc, w) => acc + length(w)).as("unit_chars"),
      length(regexp_replace(lower(col("text")), "\\s", "")).as("content_chars"))
      .filter(col("unit_chars") =!= col("content_chars"))
      .count()
    assert(bad === 0L)
  }

  test("unicode mode: encode/decode round-trips digits, punct, and CJK") {
    val model = Bpe.trainOnDocs(unicodeDocs, "text", 30, mode = Bpe.ModeUnicode)
    // merges must actually fire on non-ascii material: the corpus
    // repeats 日本語, 42, and café enough for them to win merges.
    assert(model.vocab.exists(t => t.exists(_ > 'z')),
      s"no non-ascii merge product in ${model.vocab}")
    val bad = Bpe.encode(unicodeDocs, "text", model)
      .select(
        Bpe.decodeCol(col("tokens")).as("back"),
        array_join(regexp_extract_all(lower(col("text")),
          lit("\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"), lit(0)), " ").as("norm"))
      .filter(col("back") =!= col("norm"))
      .count()
    assert(bad === 0L)
  }

  test("unicode mode: dense id space with <unk> last; OOV maps to <unk>") {
    val model = Bpe.trainOnDocs(unicodeDocs, "text", 20, mode = Bpe.ModeUnicode)
    val ids = model.vocabIds
    assert(ids.values.toSeq.sorted === (0 until ids.size),
      "id space must be dense")
    assert(ids("<unk>") === ids.size - 1, "<unk> takes the last id")
    assert(ids("</w>") === model.alphabet.length)
    // ids mirror tokens through the map, with OOV (ω — absent from the
    // corpus) hitting <unk>
    val oov = spark.createDataFrame(
      unicodeDocs.sparkSession.sparkContext.parallelize(
        Seq(org.apache.spark.sql.Row(99L, "café ωmega 42")), 1),
      unicodeDocs.schema)
    val r = Bpe.encodeIds(Bpe.encode(oov, "text", model), "text", model)
      .select(col("tokens"), col("token_ids")).head
    val toks = r.getSeq[String](0)
    val got = r.getSeq[Int](1)
    assert(got === toks.map(t => ids.getOrElse(t, ids("<unk>"))))
    assert(got.contains(ids("<unk>")), s"ω must map to <unk> in $toks → $got")
    assert(toks.contains("ω"), "string mode keeps the OOV char itself")
  }

  test("unicode mode: model save/load round-trips alphabet and mode") {
    val model = Bpe.trainOnDocs(unicodeDocs, "text", 15, mode = Bpe.ModeUnicode)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe-u").toString
    Bpe.save(spark, model, path)
    val back = Bpe.load(spark, path)
    assert(back.merges.toSeq === model.merges.toSeq)
    assert(back.alphabet.toSeq === model.alphabet.toSeq)
    assert(back.mode === Bpe.ModeUnicode)
    assert(back.vocabIds === model.vocabIds)
  }

  test("unicode mode: ascii-only corpora still train ascii-compatible merges") {
    // On text the ascii pre-tokenizer fully covers, the two modes see
    // the same words except unicode also units digits/punct — so the
    // LETTER-only merge sequences must agree when the corpus is pure
    // [a-z ] (the regression guard for defaulting everything to ascii).
    val az = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val a = Bpe.trainFromHistogram(az, 6)
    assert(a.merges.toSeq === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  // ---- bytes mode: GPT-2 byte-level ---------------------------------

  /** Case, punctuation, digits, unicode, emoji (astral plane), tabs,
    * newlines, double spaces, and leading/trailing whitespace — byte
    * mode must reproduce ALL of it exactly.
    */
  private def byteDocs = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val texts = Seq(
      "The CAFE sold 42 croissants, 42 MORE tomorrow!",
      "  leading spaces\tand\ttabs\nand newlines  ",
      "emoji 😀😀 and 日本語 mixed",
      "it's the tokenizer's job — don't lowercase",
      "the the the cafe cafe cafe 42 42 42",
      "repeat repeat repeat to force merges merges merges")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  test("bytes mode: decode∘encode is the IDENTITY on arbitrary text") {
    val model = Bpe.trainOnDocs(byteDocs, "text", 30, mode = Bpe.ModeBytes)
    assert(model.merges.nonEmpty, "merges must fire")
    val bad = Bpe.encode(byteDocs, "text", model)
      .select(col("text"), Bpe.decodeCol(col("tokens"), model).as("back"))
      .filter(col("back") =!= col("text"))
      .count()
    assert(bad === 0L,
      "byte-level BPE must reproduce case, whitespace, emoji, everything")
  }

  test("bytes mode: alphabet is all 256 byte-chars, ids dense, no unk") {
    val model = Bpe.trainOnDocs(byteDocs, "text", 20, mode = Bpe.ModeBytes)
    assert(model.alphabet.length === 256)
    assert(model.alphabet.distinct.length === 256)
    val ids = model.vocabIds
    assert(!ids.contains("<unk>") && !ids.contains("</w>"))
    assert(ids.values.toSeq.sorted === (0 until ids.size))
    // GPT-2 layout: byte value IS the id for single-byte tokens
    assert(ids(String.valueOf('A')) === 'A'.toInt)
    assert(ids(String.valueOf('!')) === '!'.toInt)
    // encodeIds mirrors encode through the map — and NEVER misses,
    // even on bytes the training corpus never contained
    import org.apache.spark.sql.Row
    val oov = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(99L, "ЖЗИ unseen script    odd spaces")), 1),
      byteDocs.schema)
    val r = Bpe.encodeIds(Bpe.encode(oov, "text", model), "text", model)
      .select(col("tokens"), col("token_ids")).head
    val toks = r.getSeq[String](0)
    val got = r.getSeq[Int](1)
    assert(got === toks.map(ids), "every byte token must have an id")
    // and the identity round-trip holds for the unseen text too
    assert(Bpe.decodeBytesLocal(toks) === "ЖЗИ unseen script    odd spaces")
  }

  test("bytes mode: GPT-2 pattern covers every character of the input") {
    // units concatenated == the raw text, doc by doc (nothing elided,
    // not even whitespace — unlike the word modes' normal form)
    val bad = byteDocs.select(
      array_join(regexp_extract_all(col("text"), lit(
        "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"),
        lit(0)), "").as("units"),
      col("text"))
      .filter(col("units") =!= col("text"))
      .count()
    assert(bad === 0L)
  }

  test("bytes mode: model round-trips through save/load") {
    val model = Bpe.trainOnDocs(byteDocs, "text", 15, mode = Bpe.ModeBytes)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe-b").toString
    Bpe.save(spark, model, path)
    val back = Bpe.load(spark, path)
    assert(back.mode === Bpe.ModeBytes)
    assert(back.alphabet.toSeq === model.alphabet.toSeq)
    assert(back.merges.toSeq === model.merges.toSeq)
    assert(back.vocabIds === model.vocabIds)
  }

  test("bytes mode: byte↔char bijection is exact and GPT-2-shaped") {
    // bijective over all 256 byte values
    assert(Bpe.charToByte.size === 256)
    (0 until 256).foreach { b =>
      assert((Bpe.charToByte(Bpe.byteToChar(b)) & 0xff) === b)
    }
    // printable latin-1 maps to itself; control bytes land at U+0100+
    assert(Bpe.byteToChar('A'.toInt) === 'A')
    assert(Bpe.byteToChar(' '.toInt).toInt >= 0x100)
    assert(Bpe.byteToChar(0).toInt >= 0x100)
  }

  test("encodeStats: fertility and compression are coherent") {
    val model = Bpe.train(spark, sf0001, 100)
    val rows = Bpe.encodeStats(spark, sf0001, model).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fert = r.getAs[Double]("fertility")
      val cpt = r.getAs[Double]("chars_per_token")
      // ≥1 token per word by construction; trained merges must beat
      // character-level (< chars+1 per word ⇒ > 1 char per token).
      assert(fert >= 1.0, s"fertility $fert < 1")
      assert(cpt > 1.0, s"chars/token $cpt: merges never fired")
    }
  }
}

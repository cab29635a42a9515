package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPipeline, CorpusRefresh}

/** Incremental corpus refresh ≡ full curate, pinned per document after
  * every arrival batch. The fixture deliberately exercises every
  * cascade edge the refresh must get right: an exact dup that changes
  * nothing, an exact dup with a SMALLER doc_id that steals keepership
  * (demoting a previously-kept doc), a norm-canonical dup, a crafted
  * MinHash-signature collision (near-dup caught at the sg stage), a
  * quality-failing arrival, and a keeper steal inside an
  * already-quality-failing group (verdicts move, kept-set does not).
  */
class CorpusRefreshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // ---- fixture vocabulary: 5-letter lowercase pseudo-words ----------
  // (alpha ratio 5n/(6n−1) ≈ 0.833 ≥ the 0.81 band for any n)
  private lazy val vocab: IndexedSeq[String] = {
    val ls = "abcdefghij"
    for (a <- ls; b <- ls; c <- ls; d <- ls; e <- ls)
      yield s"$a$b$c$d$e"
  }
  private def txt(toks: Seq[String]) = toks.mkString(" ")

  private lazy val textA = txt(vocab.slice(200, 224))            // 24 toks
  private lazy val textArev = txt(vocab.slice(200, 224).reverse) // norm dup
  // crafted offline: replacing token 2 of B with "aafaa" changes the
  // digest AND the sorted-distinct-token norm_sig but leaves all 8
  // md5-MinHash components identical — a true sg-stage near-dup
  private lazy val textB = txt(vocab.slice(100, 140))            // 40 toks
  private lazy val textB2 = txt(
    vocab.slice(100, 140).updated(2, "aafaa"))
  private lazy val textC = txt(vocab.slice(300, 322))            // 22 toks
  private lazy val textDshort = txt(vocab.slice(400, 405))       // 5 → fail
  private lazy val textE = txt(vocab.slice(700, 725))            // 25 toks
  private lazy val textF = txt(                                  // 100 → fail
    Seq.fill(5)(vocab.slice(800, 820)).flatten)
  private lazy val textG = txt(vocab.slice(900, 925))            // 25 toks

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")
  }

  private def flagsRows(df: DataFrame) =
    df.select("doc_id", "digest", "norm_sig", "sg_key",
        "k_exact", "k_norm", "k_near", "quality_ok")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7)))
      .sortBy(_._1).toSeq

  test("refresh equals full curate across arrival batches") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-refresh").toString + "/state"
    val nB = 8

    val initial = Seq(
      10L -> textA, 11L -> textA,   // exact group, 10 keeper
      12L -> textArev,              // same distinct tokens → norm dup
      20L -> textB, 21L -> textB2,  // crafted sg collision, 20 keeper
      30L -> textC,                 // unique, kept
      40L -> textDshort)            // unique but out of band
    CorpusRefresh.initialize(spark, docsDF(initial), root, nB)

    def checkAgainstFull(corpus: Seq[(Long, String)]): Unit = {
      val full = flagsRows(CorpusRefresh.fullFlags(spark, docsDF(corpus)))
      val state = flagsRows(CorpusRefresh.currentFlags(spark, root))
      assert(state === full)
    }
    checkAgainstFull(initial)

    // the fixture really exercises each stage
    val init = flagsRows(CorpusRefresh.currentFlags(spark, root))
      .map(r => r._1 -> r).toMap
    assert(init(11L)._5 === false, "11 must fall at the exact stage")
    assert(init(12L)._5 && !init(12L)._6, "12 must fall at the norm stage")
    assert(init(21L)._6 && !init(21L)._7,
      "21 must fall at the sg stage — the crafted MinHash collision")
    assert(init(40L)._7 && !init(40L)._8, "40 must fall only on quality")
    assert(init(10L)._8 && init(20L)._8 && init(30L)._8)

    // ---- batch 1: new survivor, harmless dup, keeper STEAL, junk ----
    val b1 = Seq(
      50L -> textE,      // new unique survivor
      51L -> textA,      // exact dup, larger id: no verdict moves
      5L -> textC,       // exact dup with SMALLER id: steals from 30
      52L -> textF)      // new quality-failing doc
    val delta1 = CorpusRefresh.refresh(spark, root, docsDF(b1), 1L, nB)
    val d1 = delta1.select("doc_id", "was_kept", "now_kept", "is_delta")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_ == true), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    Materialize.releaseAll()

    val afterB1 = initial ++ b1
    checkAgainstFull(afterB1)

    // demotion is visible in the returned delta
    assert(d1(30L) === ((Some(true), false, false)),
      "30 must be demoted by the smaller-id duplicate")
    assert(d1(5L) === ((None, true, true)))
    assert(d1(50L) === ((None, true, true)))
    assert(d1(51L) === ((None, false, true)))
    assert(d1(52L) === ((None, false, true)))
    // unaffected docs are not even touched by the refresh
    assert(!d1.contains(20L) && !d1.contains(21L) && !d1.contains(40L),
      s"untouched groups must stay out of the delta: ${d1.keySet}")

    // ---- batch 2: keeper steal inside a quality-failing group, a dup
    // of a NON-keeper, and another survivor --------------------------
    val b2 = Seq(
      6L -> textDshort,  // steals exact keepership from 40 (both junk)
      60L -> textB2,     // exact dup of 21 (itself a non-keeper)
      61L -> textG)      // new unique survivor
    val delta2 = CorpusRefresh.refresh(spark, root, docsDF(b2), 2L, nB)
    val d2 = delta2.select("doc_id", "was_kept", "now_kept")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_ == true), r.getBoolean(2)))
      .toMap
    Materialize.releaseAll()

    val afterB2 = afterB1 ++ b2
    checkAgainstFull(afterB2)

    // verdicts moved inside the junk group without flipping kept-ness
    val now = flagsRows(CorpusRefresh.currentFlags(spark, root))
      .map(r => r._1 -> r).toMap
    assert(now(6L)._5 && now(6L)._7 && !now(6L)._8,
      "6 must take the keeper chain but stay out of band")
    assert(!now(40L)._5 && !now(40L)._8, "40 must lose exact keepership")
    assert(d2(40L) === ((Some(false), false)))
    assert(now(60L)._5 === false, "60 falls at exact against 21")
    assert(now(21L)._6 && !now(21L)._7, "21's own verdicts must not move")
    assert(d2(61L) === ((None, true)))
    // 10/11/12/30/5/50/52 untouched by batch 2
    assert(!d2.contains(10L) && !d2.contains(30L) && !d2.contains(5L),
      s"batch-2 delta leaked into unrelated groups: ${d2.keySet}")

    // ---- the state agrees with the REAL contract pipeline ----------
    // stage the combined corpus as a documents table and compare
    // CorpusPipeline.curate's final stage count + kept ids against the
    // refreshed state — ties the refresh to the driver-gated path, not
    // just to fullFlags
    val dir = java.nio.file.Files
      .createTempDirectory("graft-refresh-dir").toString
    docsDF(afterB2).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val (corpus, report) = CorpusPipeline.curate(spark, dir)
    val keptPipeline = corpus.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val lastStage = report.collect().map(r =>
      (r.getString(0), r.getLong(1))).toMap.apply("04_quality_filter")
    Materialize.releaseAll()
    val keptState = now.values.filter(_._8).map(_._1).toSet
    assert(keptState === keptPipeline)
    assert(lastStage.toInt === keptState.size)

    // ---- partial-failure replay: projections converge ---------------
    // batch 3 commits, then we simulate a crash that lost the by_norm
    // and by_sg commits (markers deleted → their bucket versions are
    // invisible, exactly the torn state a died writer leaves); the
    // replayed refresh must no-op on by_digest and bring the other two
    // projections to the identical state
    val b3 = Seq(70L -> txt(vocab.slice(950, 972)))
    CorpusRefresh.refresh(spark, root, docsDF(b3), 3L, nB)
    Materialize.releaseAll()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$root/by_norm/_commits/3"), false)
    f.delete(new org.apache.hadoop.fs.Path(s"$root/by_sg/_commits/3"), false)
    CorpusRefresh.refresh(spark, root, docsDF(b3), 3L, nB)
    Materialize.releaseAll()
    checkAgainstFull(afterB2 ++ b3)
    // all three projections hold identical rows again
    val byNormRows = flagsRows(graft.streaming.UpsertFileSink
      .readSnapshotBucketed(spark, s"$root/by_norm",
        CorpusRefresh.stateSchema))
    val bySgRows = flagsRows(graft.streaming.UpsertFileSink
      .readSnapshotBucketed(spark, s"$root/by_sg",
        CorpusRefresh.stateSchema))
    val byDigestRows = flagsRows(CorpusRefresh.currentFlags(spark, root))
    assert(byNormRows === byDigestRows && bySgRows === byDigestRows)

    // ---- time travel + drift gate -----------------------------------
    // the state as of each refresh batch reproduces the corresponding
    // full curate, and the drift report between two versions reads the
    // kept-set quality inputs through Drift's PSI machinery
    assert(flagsRows(CorpusRefresh.stateAsOf(spark, root, 0L)) ===
      flagsRows(CorpusRefresh.fullFlags(spark, docsDF(initial))))
    assert(flagsRows(CorpusRefresh.stateAsOf(spark, root, 1L)) ===
      flagsRows(CorpusRefresh.fullFlags(spark, docsDF(afterB1))))
    val drift = CorpusRefresh.driftReport(spark, root, 0L, 2L)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    // heuristic state stores no scores → the score dimension is
    // (correctly) absent; the learned-refresh test covers the 3-col case
    assert(drift.keySet === Set("n_toks", "alpha_ratio"))
    val kept0 = flagsRows(CorpusRefresh.stateAsOf(spark, root, 0L))
      .count(_._8)
    val kept2 = flagsRows(CorpusRefresh.stateAsOf(spark, root, 2L))
      .count(_._8)
    drift.values.foreach { case (psi, nRef, nCur) =>
      assert(psi >= 0.0 && nRef === kept0.toLong && nCur === kept2.toLong)
    }
  }

  test("learned refresh: frozen-scorer verdicts track full curate-learned flags") {
    import graft.operators.QualityClassifier
    val root = java.nio.file.Files
      .createTempDirectory("graft-refresh-learned").toString + "/state"
    val nB = 8

    val initial = Seq(10L -> textA, 11L -> textA, 20L -> textB,
      30L -> textC, 40L -> textDshort)
    // the FROZEN classifier: trained once on the initial corpus's weak
    // labels; every later batch is judged by this exact model
    val model = QualityClassifier.train(
      docsDF(initial).withColumn("label",
        QualityClassifier.heuristicLabel("text")),
      "text", "label", numFeatures = 1 << 9)
    val scorer: graft.operators.CorpusRefresh.Scorer = docs =>
      QualityClassifier.score(docs, "text", model)
        .select("doc_id", "quality_score")
    val tau = Some(0.5)

    CorpusRefresh.initialize(spark, docsDF(initial), root, nB,
      Some(scorer), tau)
    def stateRows() =
      CorpusRefresh.currentFlags(spark, root).collect()
        .map(r => (r.getLong(0), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9), r.getBoolean(10),
          math.rint(r.getDouble(11) * 1e9)))
        .sortBy(_._1).toSeq
    def fullRows(corpus: Seq[(Long, String)]) =
      CorpusRefresh.fullFlags(spark, docsDF(corpus), Some(scorer), tau)
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9), r.getBoolean(10),
          math.rint(r.getDouble(11) * 1e9)))
        .sortBy(_._1).toSeq
    assert(stateRows() === fullRows(initial))

    // arrivals: a new survivor, a keeper steal, junk — all judged by
    // the frozen model, never a retrain
    val b1 = Seq(50L -> textE, 5L -> textC, 52L -> textF)
    val refreshed = CorpusRefresh.refresh(spark, root, docsDF(b1), 1L, nB,
      scorer = Some(scorer), tau = tau)
    val demoted = refreshed
      .filter(col("was_kept") === true && !col("now_kept"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    Materialize.releaseAll()
    assert(stateRows() === fullRows(initial ++ b1))
    assert(demoted === Set(30L), "the smaller-id dup must demote 30")

    // a learned state carries scores, so the drift gate reports the
    // score dimension too
    val drift = CorpusRefresh.driftReport(spark, root, 0L, 1L)
      .select("column").collect().map(_.getString(0)).toSet
    assert(drift === Set("n_toks", "alpha_ratio", "quality_score"))
  }

  test("corpusDelta emits curate-shaped adds and removals") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-refresh-delta").toString + "/state"
    val initial = Seq(10L -> textA, 11L -> textA, 30L -> textC,
      40L -> textDshort)
    CorpusRefresh.initialize(spark, docsDF(initial), root, 8)

    val b1 = Seq(50L -> textE, 5L -> textC, 52L -> textF)
    val refreshed = CorpusRefresh.refresh(spark, root, docsDF(b1), 1L, 8,
      checkpointEvery = 1)
    val (adds, removals) = CorpusRefresh.corpusDelta(
      spark, refreshed, docsDF(initial ++ b1))
    val addRows = adds.collect().map(_.toString).sorted.toSeq
    val removedIds = removals.collect().map(_.getLong(0)).toSet
    Materialize.releaseAll()

    // 5 steals textC's keepership (smaller id), 50 is a new survivor,
    // 30 is demoted out; 52 fails quality, 10/11 unchanged
    assert(removedIds === Set(30L))

    // adds match the REAL pipeline's corpus rows for exactly those ids
    val dir = java.nio.file.Files
      .createTempDirectory("graft-refresh-delta-dir").toString
    docsDF(initial ++ b1).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val (corpus, _) = CorpusPipeline.curate(spark, dir)
    val expected = corpus.filter(col("doc_id").isin(5L, 50L))
      .collect().map(_.toString).sorted.toSeq
    Materialize.releaseAll()
    assert(addRows === expected)

    // checkpointEvery=1 really rolled the state manifests up
    Seq("by_digest", "by_norm", "by_sg").foreach { p =>
      val names = new java.io.File(s"$root/$p/_commits").listFiles()
        .map(_.getName).toSeq
      assert(names.exists(_.startsWith("checkpoint.")),
        s"$p missing its manifest checkpoint: $names")
    }
  }

  test("continuous ingest: landing zone, curation state and index track a doc stream") {
    // The full production loop in one foreachBatch body: raw docs land
    // exactly-once in an UpsertFileSink table, curation verdicts
    // refresh delta-bounded (refresh bootstraps uniformly from empty
    // state — batch 0 needs no special case), the inverted index
    // absorbs the same batch incrementally, and each doc's embedding
    // lands in the incremental IVF index (quantizer bootstrapped from
    // a training sample before the stream — the FAISS discipline).
    // After the stream drains, all SIX stores (landing zone, curation
    // state, inverted index, IVF, text-LSH, embedding-LSH) must agree
    // with their from-scratch twins over the union of everything that
    // arrived.
    import spark.implicits._
    import graft.streaming.{StreamingWindows, UpsertFileSink}
    import graft.operators.{IncrementalEmbedLsh, IncrementalIndex,
      IncrementalIvf, IncrementalLsh, InvertedIndex, IvfIndex}

    val base = java.nio.file.Files
      .createTempDirectory("graft-ingest").toString
    val stateRoot = s"$base/state"
    val landingRoot = s"$base/landing"
    val vecRoot = s"$base/vectors"
    val indexRoot = s"$base/index"
    val ivfRoot = s"$base/ivf"
    val lshRoot = s"$base/lsh"
    val elshRoot = s"$base/elsh"
    val streamDir = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$base/stream"))
    val docSchema = docsDF(Seq(1L -> "x")).schema
    val vecSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("e",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))

    // deterministic stand-in embedding — the encode step is upstream
    // of this pipeline. Distinct ids land well-separated directions of
    // R^4 EXCEPT the designed pair 70/71 (71 embeds within 0.01 rad of
    // 70: a re-encode/translation stand-in whose TEXT shares nothing)
    def embedCol = {
      val a = when(col("doc_id") === 71L, lit(70.01))
        .otherwise(col("doc_id").cast("double"))
      array(cos(a * 0.7), sin(a * 0.7), cos(a * 1.3), sin(a * 1.3))
    }

    // 60/61: a cross-batch BANDED pair (1 of 4 bands agree, full
    // signatures differ — see the banded-verify test) the sg cascade
    // cannot couple; the LSH store routes it into the verdicts.
    // 70/71: a cross-batch EMBEDDING pair (unrelated texts, near-
    // identical vectors) only the embed-LSH store can couple.
    val bandedBase = vocab.slice(500, 524)
    val batch0 = Seq(10L -> textA, 11L -> textA, 30L -> textC,
      40L -> textDshort, 60L -> txt(bandedBase),
      70L -> txt(vocab.slice(600, 624)))
    val batch1 = Seq(50L -> textE, 5L -> textC, 52L -> textF,
      61L -> txt(bandedBase.updated(22, "aajfd")),
      71L -> txt(vocab.slice(650, 674)))
    def stage(name: String, mtime: Long, rows: Seq[(Long, String)]): Unit = {
      val tmp = s"$base/_$name"
      docsDF(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = streamDir.resolve(name)
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    stage("b0.parquet", 1000000000000L, batch0)
    stage("b1.parquet", 1000000060000L, batch1)

    // the quantizer trains ONCE, on a sample, before any batch lands
    IncrementalIvf.initializeQuantizer(spark,
      docsDF(batch0).select(col("doc_id").as("vec_id"), embedCol.as("e")),
      ivfRoot, k = 3, iters = 2)

    val q = StreamingWindows
      .tableStream(spark, streamDir.toString,
        s"$streamDir/b0.parquet")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        // everything keys off the micro-batch's own (cloned) session —
        // the same discipline as UpsertFileSink.upsertBatch
        val bs = df.sparkSession
        val staged = df.persist()
        try {
          staged.count()
          // docs AND vectors land in BUCKETED zones so the verify
          // stages below can fetch candidates id-pruned (the
          // production shape — fetch I/O ∝ candidates, never store)
          UpsertFileSink.upsertBatchBucketed(
            staged.withColumn("op", lit("U")).withColumn("seq", lit(0L)),
            id, landingRoot, Seq("doc_id"), nBuckets = 8)
          UpsertFileSink.upsertBatchBucketed(
            staged.select(col("doc_id").as("vec_id"), embedCol.as("e"))
              .withColumn("op", lit("U")).withColumn("seq", lit(0L)),
            id, vecRoot, Seq("vec_id"), nBuckets = 8)
          // dedup-at-ingest COMPOSED, both modalities: the refresh
          // probes the LSH stores AS OF the previous batch (replay-
          // deterministic — their own applies run below) and verifies
          // candidates via bucket-pruned as-of fetches from the
          // landed stores
          CorpusRefresh.refresh(bs, stateRoot, staged, id, nBuckets = 8,
            banded = Some(CorpusRefresh.BandedVerify(lshRoot,
              textStore = Some(UpsertFileSink.BucketedStore(
                landingRoot, docSchema)))),
            embed = Some(CorpusRefresh.EmbedVerify(elshRoot,
              probeVectors = staged.select(col("doc_id"),
                embedCol.as("e")),
              minSim = 0.95,
              vectorStore = Some(UpsertFileSink.BucketedStore(
                vecRoot, vecSchema, keyCols = Seq("vec_id"))))))
          IncrementalIndex.applyBatch(bs, indexRoot,
            staged.withColumn("op", lit("I")), id, nBuckets = 8)
          IncrementalIvf.applyBatch(bs, ivfRoot,
            staged.select(col("doc_id").as("vec_id"), embedCol.as("e"),
              lit("I").as("op")), id)
          IncrementalLsh.applyBatch(bs, lshRoot,
            staged.withColumn("op", lit("I")), id, nBuckets = 8)
          IncrementalEmbedLsh.applyBatch(bs, elshRoot,
            staged.select(col("doc_id").as("vec_id"), embedCol.as("e"),
              lit("I").as("op")), id, nBuckets = 8, bandBits = 4)
          Materialize.releaseAll()
        } finally staged.unpersist(blocking = false)
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val all = batch0 ++ batch1
    // landing zone holds every raw doc exactly once
    val landed = UpsertFileSink.readSnapshotBucketed(spark, landingRoot,
        docSchema)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(landed === all.sortBy(_._1))
    // curation state == full curate of the union (incl. the batch-1
    // demotion of doc 30 by the smaller-id duplicate 5), PLUS the two
    // verdicts only the composed out-of-band stages can produce: 61
    // is a cross-batch banded TEXT near-dup of kept 60 (full
    // signatures differ, so the cascade-only fullFlags keeps it) and
    // 71 is a cross-batch EMBEDDING near-dup of kept 70 (texts share
    // nothing at all) — both must come out demoted at the near stage
    val expected = flagsRows(CorpusRefresh.fullFlags(spark, docsDF(all)))
      .map(r => if (r._1 == 61L || r._1 == 71L)
        r.copy(_7 = false, _8 = false) else r)
    assert(flagsRows(CorpusRefresh.currentFlags(spark, stateRoot)) ===
      expected)
    val verdicts = flagsRows(CorpusRefresh.currentFlags(spark, stateRoot))
      .map(r => r._1 -> r._8).toMap
    assert(verdicts(5L) && !verdicts(30L),
      "the streaming refresh must carry the cross-batch demotion")
    assert(verdicts(60L) && !verdicts(61L),
      "the LSH store must route the banded pair into the verdicts")
    assert(verdicts(70L) && !verdicts(71L),
      "the embed-LSH store must route the embedding pair into the verdicts")
    // index == from-scratch rebuild over the same corpus
    val inc = IncrementalIndex.currentPostings(spark, indexRoot)
      .select("token", "doc_id", "tf", "dl", "df").collect()
      .map(_.toString).sorted.toSeq
    val full = InvertedIndex.build(docsDF(all), "doc_id", "text")
      .select("token", "doc_id", "tf", "dl", "df").collect()
      .map(_.toString).sorted.toSeq
    assert(inc === full)
    // IVF store == from-scratch assignment of every arrived embedding
    // to the same fixed centroids
    val liveIvf = IncrementalIvf.liveMembers(spark, ivfRoot)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val fullIvf = IvfIndex.assignTo(
        docsDF(all).select(col("doc_id").as("vec_id"), embedCol.as("e")),
        spark.read.parquet(s"$ivfRoot/centroids"))
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(liveIvf === fullIvf && liveIvf.size === all.size)
    // LSH candidate index == a from-scratch one-batch index over the
    // union, probed with everything that arrived (the FIFTH store —
    // near-dup lookup stays batch-synchronous with the rest)
    def lshPairs(root: String) = IncrementalLsh
      .candidates(spark, root, docsDF(all).select("doc_id", "text"))
      .select(least(col("probe_id"), col("doc_id")),
        greatest(col("probe_id"), col("doc_id")), col("minhash_sim"))
      .distinct().collect().map(_.toString).toSet
    val scratchLsh = s"$base/lsh_scratch"
    IncrementalLsh.applyBatch(spark, scratchLsh,
      docsDF(all).select("doc_id", "text").withColumn("op", lit("I")),
      0L, nBuckets = 8)
    assert(lshPairs(lshRoot) === lshPairs(scratchLsh))
    assert(lshPairs(lshRoot).nonEmpty,
      "the fixture's exact dups must band together")
    // embedding near-dup candidates == a from-scratch one-batch embed
    // index over the union (the SIXTH store — embedding dedup stays
    // batch-synchronous too; verified against the landed embeddings)
    val allEmb = docsDF(all)
      .select(col("doc_id").as("vec_id"), embedCol.as("e"))
    def elshPairs(root: String) = IncrementalEmbedLsh
      .candidatesVerified(spark, root, allEmb, allEmb, 0.4)
      .select(least(col("probe_id"), col("vec_id")),
        greatest(col("probe_id"), col("vec_id")), col("sim"))
      .distinct().collect().map(_.toString).toSet
    val scratchElsh = s"$base/elsh_scratch"
    IncrementalEmbedLsh.applyBatch(spark, scratchElsh,
      allEmb.withColumn("op", lit("I")), 0L, nBuckets = 8, bandBits = 4)
    assert(elshPairs(elshRoot) === elshPairs(scratchElsh))
    assert(elshPairs(elshRoot).nonEmpty,
      "the near-identical 70/71 embeddings must collide in the bands")
    Materialize.releaseAll()
  }

  test("a mid-batch crash across the five stores converges on replay") {
    // The capstone body commits its five stores SEQUENTIALLY; a crash
    // mid-body leaves them at different batches. There is no
    // cross-store coordinator on purpose: every store's apply is
    // replay-idempotent (markers / changelog _SUCCESS / as-of state
    // pulls), so the at-least-once redelivery of the SAME batch
    // re-runs the whole body and every store converges — this pins
    // that end to end, not just per store.
    import spark.implicits._
    import graft.streaming.UpsertFileSink
    import graft.operators.{IncrementalIndex, IncrementalIvf,
      IncrementalLsh, InvertedIndex, IvfIndex}
    val base = java.nio.file.Files
      .createTempDirectory("graft-crash5").toString
    def embedCol = array((0 until 4).map(a =>
      when(pmod(col("doc_id"), lit(3)) === a, 1.0).otherwise(0.0)): _*)
    val batch0 = Seq(10L -> textA, 30L -> textC)
    val batch1 = Seq(50L -> textE, 5L -> textC)
    IncrementalIvf.initializeQuantizer(spark,
      docsDF(batch0).select(col("doc_id").as("vec_id"), embedCol.as("e")),
      s"$base/ivf", k = 2, iters = 1)

    def land(rows: Seq[(Long, String)], id: Long): Unit =
      UpsertFileSink.upsertsOnly(docsDF(rows), id, s"$base/landing",
        Seq("doc_id"))
    def refreshStep(rows: Seq[(Long, String)], id: Long): Unit = {
      CorpusRefresh.refresh(spark, s"$base/state", docsDF(rows), id,
        nBuckets = 8)
      Materialize.releaseAll()
    }
    def indexStep(rows: Seq[(Long, String)], id: Long): Unit =
      IncrementalIndex.applyBatch(spark, s"$base/index",
        docsDF(rows).withColumn("op", lit("I")), id, nBuckets = 8)
    def ivfStep(rows: Seq[(Long, String)], id: Long): Unit =
      IncrementalIvf.applyBatch(spark, s"$base/ivf",
        docsDF(rows).select(col("doc_id").as("vec_id"), embedCol.as("e"),
          lit("I").as("op")), id)
    def lshStep(rows: Seq[(Long, String)], id: Long): Unit =
      IncrementalLsh.applyBatch(spark, s"$base/lsh",
        docsDF(rows).withColumn("op", lit("I")), id, nBuckets = 8)
    def body(rows: Seq[(Long, String)], id: Long): Unit = {
      land(rows, id); refreshStep(rows, id); indexStep(rows, id)
      ivfStep(rows, id); lshStep(rows, id)
    }

    body(batch0, 0L)
    // CRASH: batch 1 dies after the landing zone and the refresh
    // committed — the three indexes never saw it
    land(batch1, 1L)
    refreshStep(batch1, 1L)
    // the redelivery re-runs the WHOLE body with the same id
    body(batch1, 1L)

    val all = batch0 ++ batch1
    assert(UpsertFileSink.readSnapshot(spark, s"$base/landing",
        docsDF(all).schema)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      all.map(_._1).sorted)
    assert(flagsRows(CorpusRefresh.currentFlags(spark, s"$base/state")) ===
      flagsRows(CorpusRefresh.fullFlags(spark, docsDF(all))))
    assert(IncrementalIndex.currentPostings(spark, s"$base/index")
      .collect().map(_.toString).sorted.toSeq ===
      InvertedIndex.build(docsDF(all), "doc_id", "text")
        .collect().map(_.toString).sorted.toSeq)
    assert(IncrementalIvf.liveMembers(spark, s"$base/ivf")
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq ===
      IvfIndex.assignTo(
          docsDF(all).select(col("doc_id").as("vec_id"), embedCol.as("e")),
          spark.read.parquet(s"$base/ivf/centroids"))
        .select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq)
    val scratchLsh = s"$base/lsh_scratch"
    IncrementalLsh.applyBatch(spark, scratchLsh,
      docsDF(all).select("doc_id", "text").withColumn("op", lit("I")),
      0L, nBuckets = 8)
    def pairs(root: String) = IncrementalLsh
      .candidates(spark, root, docsDF(all).select("doc_id", "text"))
      .select(least(col("probe_id"), col("doc_id")),
        greatest(col("probe_id"), col("doc_id")), col("minhash_sim"))
      .distinct().collect().map(_.toString).toSet
    assert(pairs(s"$base/lsh") === pairs(scratchLsh))
    Materialize.releaseAll()
  }

  test("a replayed refresh returns the identical delta after a partial commit") {
    // The delta is what a trainer APPLIES — if the first attempt
    // crashed after committing one projection, the replay must still
    // report the demotion (state pulls read AS OF the previous batch,
    // so the attempt's own half-committed writes are invisible and
    // was_kept reflects genuinely pre-batch verdicts).
    val root = java.nio.file.Files
      .createTempDirectory("graft-refresh-replay").toString + "/state"
    val nB = 8
    val initial = Seq(10L -> textA, 30L -> textC)
    CorpusRefresh.initialize(spark, docsDF(initial), root, nB)

    def deltaRows(df: DataFrame) =
      df.select("doc_id", "was_kept", "now_kept").collect()
        .map(r => (r.getLong(0),
          Option(r.get(1)).map(_ == true), r.getBoolean(2)))
        .sortBy(_._1).toSeq

    val b1 = Seq(5L -> textC) // smaller-id exact dup: steals from 30
    val first = deltaRows(CorpusRefresh.refresh(spark, root, docsDF(b1),
      1L, nB))
    Materialize.releaseAll()
    assert(first.contains((30L, Some(true), false)), "the demotion")

    // crash window: by_digest committed, the other two projections
    // lost their batch-1 markers (exactly what a died writer leaves)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$root/by_norm/_commits/1"), false)
    f.delete(new org.apache.hadoop.fs.Path(s"$root/by_sg/_commits/1"), false)

    val replay = deltaRows(CorpusRefresh.refresh(spark, root, docsDF(b1),
      1L, nB))
    Materialize.releaseAll()
    assert(replay === first,
      "a replay must reproduce the identical delta, demotion included")
    // and the state still converged to the full-curate truth
    assert(flagsRows(CorpusRefresh.currentFlags(spark, root)) ===
      flagsRows(CorpusRefresh.fullFlags(spark, docsDF(initial ++ b1))))

    // mis-numbered batches fail fast instead of silently judging
    // against stale or empty state
    intercept[IllegalArgumentException] { // stale: older than committed
      CorpusRefresh.refresh(spark, root, docsDF(Seq(90L -> textE)), 0L, nB)
    }
    intercept[IllegalArgumentException] { // id 0 on initialized state
      val r2 = java.nio.file.Files
        .createTempDirectory("graft-refresh-guard").toString + "/state"
      CorpusRefresh.initialize(spark, docsDF(initial), r2, nB)
      CorpusRefresh.refresh(spark, r2, docsDF(Seq(91L -> textE)), 0L, nB)
    }
    Materialize.releaseAll()
  }

  test("CDC refresh: updates and deletes track full curate, keeper deletion promotes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-refresh-cdc").toString + "/state"
    val nB = 8

    def cdcDF(rows: Seq[(Long, String, String)]): DataFrame = {
      import spark.implicits._
      rows.map { case (id, t, op) => (id, "en", t, op) }
        .toDF("doc_id", "lang", "text", "op")
    }
    def deltaMap(df: DataFrame) =
      df.select("doc_id", "was_kept", "now_kept", "is_delta", "op")
        .collect()
        .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_ == true),
          r.getBoolean(2), r.getBoolean(3), Option(r.getString(4)))))
        .toMap

    val initial = Seq(
      10L -> textA, 11L -> textA,   // exact group, 10 keeper
      12L -> textArev,              // norm dup of the A group
      20L -> textB,                 // untouched control group
      30L -> textC, 35L -> textC,   // exact group, 30 keeper
      40L -> textDshort)            // junk
    CorpusRefresh.initialize(spark, docsDF(initial), root, nB)

    def checkAgainstFull(corpus: Map[Long, String]): Unit = {
      val full = flagsRows(
        CorpusRefresh.fullFlags(spark, docsDF(corpus.toSeq.sortBy(_._1))))
      assert(flagsRows(CorpusRefresh.currentFlags(spark, root)) === full)
    }

    // ---- batch 1: keeper DELETION, two in-place updates, one add ----
    val b1 = Seq(
      (10L, null.asInstanceOf[String], "D"), // keeper deletion
      (30L, textG, "U"),                     // keeper re-crawled to new text
      (40L, textE, "U"),                     // junk doc becomes good
      (50L, textF, "I"))                     // plain junk add
    val d1 = deltaMap(CorpusRefresh.refreshCdc(spark, root, cdcDF(b1),
      1L, nB))
    Materialize.releaseAll()
    val corpus1 = initial.toMap - 10L ++ Map(30L -> textG, 40L -> textE,
      50L -> textF)
    checkAgainstFull(corpus1)

    // the deleted keeper's runner-up promotes, visible in the delta
    assert(d1(10L) === ((Some(true), false, true, Some("D"))),
      "the takedown row must report was-kept -> gone")
    assert(d1(11L) === ((Some(false), true, false, None)),
      "11 must be promoted by 10's deletion")
    assert(d1(35L) === ((Some(false), true, false, None)),
      "35 must be promoted when 30's update leaves the textC group")
    assert(d1(30L) === ((Some(true), true, true, Some("U"))))
    assert(d1(40L) === ((Some(false), true, true, Some("U"))),
      "an update can move a doc into the kept set")
    assert(d1(50L) === ((None, false, true, Some("I"))))
    assert(!d1.contains(20L), s"untouched groups leaked: ${d1.keySet}")
    // 12 re-ranks with the A norm group (defers to 11 now) but its
    // verdicts do not flip
    assert(d1.get(12L).forall { case (w, now, _, _) =>
      w === Some(false) && !now })

    // ---- batch 2: unchanged-text update, re-insert of a deleted id
    // that steals keepership, deletion emptying a group ---------------
    val b2 = Seq(
      (11L, textA, "U"),  // same text: digest unchanged, D+U collapse
      (10L, textB, "I"),  // re-insert after delete; 10 < 20 steals B
      (35L, null.asInstanceOf[String], "D")) // delete the promoted keeper
    val d2 = deltaMap(CorpusRefresh.refreshCdc(spark, root, cdcDF(b2),
      2L, nB))
    Materialize.releaseAll()
    val corpus2 = corpus1 - 35L ++ Map(11L -> textA, 10L -> textB)
    checkAgainstFull(corpus2)
    assert(d2(11L) === ((Some(true), true, true, Some("U"))),
      "an unchanged-text update must keep its verdicts")
    assert(d2(10L) === ((None, true, true, Some("I"))),
      "a re-inserted id is fresh (its old row was tombstoned)")
    assert(d2(20L) === ((Some(true), false, false, None)),
      "20 must be demoted by the re-inserted smaller id")
    assert(d2(35L) === ((Some(true), false, true, Some("D"))))

    // ---- replay after a partial commit reproduces the delta ---------
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$root/by_norm/_commits/2"), false)
    f.delete(new org.apache.hadoop.fs.Path(s"$root/by_sg/_commits/2"), false)
    val d2r = deltaMap(CorpusRefresh.refreshCdc(spark, root, cdcDF(b2),
      2L, nB))
    Materialize.releaseAll()
    assert(d2r === d2, "a replayed CDC refresh must reproduce its delta")
    checkAgainstFull(corpus2)

    // all four projections hold identical rows (by_id included)
    val expectRows = flagsRows(CorpusRefresh.currentFlags(spark, root))
    Seq("by_id", "by_norm", "by_sg").foreach { p =>
      val rows = flagsRows(graft.streaming.UpsertFileSink
        .readSnapshotBucketed(spark, s"$root/$p",
          CorpusRefresh.stateSchema))
      assert(rows === expectRows, s"projection $p diverged")
    }
    // corpusDelta turns takedowns and demotions into removals
    val (_, removals) = CorpusRefresh.corpusDelta(spark,
      CorpusRefresh.refreshCdc(spark, root, cdcDF(b2), 2L, nB),
      docsDF(corpus2.toSeq))
    assert(removals.collect().map(_.getLong(0)).toSet === Set(20L, 35L))
    Materialize.releaseAll()

    // a retention-guarded vacuum mid-replay keeps batch 2's replayed
    // recompute valid (its as-of-1 pulls still resolve), and the live
    // state never moves
    CorpusRefresh.vacuumState(spark, root, minRetainBatches = 1)
    val d2v = deltaMap(CorpusRefresh.refreshCdc(spark, root, cdcDF(b2),
      2L, nB))
    Materialize.releaseAll()
    assert(d2v === d2,
      "a retained-window vacuum must not break the replayed delta")
    checkAgainstFull(corpus2)
  }

  test("refresh under a frozen eval scrub drops contaminated arrivals") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-refresh-scrub").toString + "/state"
    val nB = 8
    // the frozen eval suite: one benchmark doc sharing its only
    // 3-gram with textE's first window (w=3 keeps the fixture small;
    // the published default 13 changes nothing structural)
    val scrub = CorpusRefresh.EvalScrub(
      docsDF(Seq(900L -> txt(vocab.slice(700, 703)))), w = 3)

    val initial = Seq(10L -> textA, 30L -> textC, 40L -> textDshort)
    CorpusRefresh.initialize(spark, docsDF(initial), root, nB,
      scrub = Some(scrub))
    def checkAgainstFull(corpus: Seq[(Long, String)]): Unit = {
      val full = flagsRows(
        CorpusRefresh.fullFlags(spark, docsDF(corpus), scrub = Some(scrub)))
      val state = flagsRows(CorpusRefresh.currentFlags(spark, root))
      assert(state === full)
    }
    checkAgainstFull(initial)

    // arrivals: a contaminated doc (in-band quality, unique — only the
    // scrub can reject it), a clean survivor, and a keeper steal to
    // prove the cascade recompute is unchanged under the scrub
    val b1 = Seq(50L -> textE, 60L -> textG, 5L -> textC)
    val refreshed = CorpusRefresh.refresh(spark, root, docsDF(b1), 1L, nB,
      scrub = Some(scrub))
    val kept = refreshed.filter(col("now_kept"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val demoted = refreshed
      .filter(col("was_kept") === true && !col("now_kept"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    Materialize.releaseAll()
    checkAgainstFull(initial ++ b1)
    assert(kept === Set(5L, 60L), "the contaminated arrival must not be kept")
    assert(demoted === Set(30L), "demotion still propagates under the scrub")

    // the verdict is explained by stored row-local state: 50 survives
    // every dedup stage and the quality band — only its contamination
    // fraction (3 of 25 tokens under the shared span) rejects it
    val row50 = CorpusRefresh.currentFlags(spark, root)
      .filter(col("doc_id") === 50L).head
    assert(row50.getBoolean(9), "50 passes the dedup cascade")
    assert(!row50.getBoolean(10), "50 fails only on contamination")
    assert(math.abs(row50.getDouble(12) - 0.12) < 1e-9)
    val row60 = CorpusRefresh.currentFlags(spark, root)
      .filter(col("doc_id") === 60L).head
    assert(row60.getDouble(12) === 0.0 && row60.getBoolean(10))
  }

  test("banded verify: LSH candidates demote a cross-batch near-dup the sg cascade misses") {
    import graft.operators.IncrementalLsh
    val nB = 8
    // crafted offline: replacing token 22 of the 24-token base with
    // "aajfd" changes 3 of the 8 MinHash components — the full sg_keys
    // DIFFER (the cascade's exact-signature stage cannot see the
    // pair), yet band 4 still agrees and the true shingle Jaccard is
    // 10/12 = 0.8333 — exactly the recall the banded index provides
    val baseToks = vocab.slice(500, 524)
    val keeperText = txt(baseToks)
    val nearDupText = txt(baseToks.updated(22, "aajfd"))

    val initial = Seq(10L -> keeperText, 30L -> textC)
    def mkRoot(tag: String) = java.nio.file.Files
      .createTempDirectory(s"graft-banded-$tag").toString + "/state"
    val ctl = mkRoot("ctl")
    val cmp = mkRoot("cmp")
    val hi = mkRoot("hi")
    Seq(ctl, cmp, hi).foreach(r =>
      CorpusRefresh.initialize(spark, docsDF(initial), r, nB))
    // the production loop feeds the banded index alongside the state
    val lshRoot = java.nio.file.Files
      .createTempDirectory("graft-banded-lsh").toString + "/lsh"
    IncrementalLsh.applyBatch(spark, lshRoot,
      docsDF(initial).select(col("doc_id"), col("text"))
        .withColumn("op", lit("I")), 0L)
    val texts = docsDF(initial).select("doc_id", "text")

    val arrivals = docsDF(Seq(200L -> nearDupText, 210L -> textE))
    def keptOf(d: DataFrame): Map[Long, Boolean] = {
      val m = d.filter(col("is_delta"))
        .select("doc_id", "now_kept").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      Materialize.releaseAll()
      m
    }

    // CONTROL: without the banded stage the exact-signature cascade
    // keeps the near-dup — the documented recall gap
    val k0 = keptOf(CorpusRefresh.refresh(spark, ctl, arrivals, 1L, nB))
    assert(k0 === Map(200L -> true, 210L -> true),
      s"the sg cascade alone must miss the banded pair: $k0")

    // COMPOSED: banded candidates + exact-Jaccard verify demote the
    // arrival; the unrelated arrival is untouched
    val d1 = CorpusRefresh.refresh(spark, cmp, arrivals, 1L, nB,
      banded = Some(CorpusRefresh.BandedVerify(lshRoot, texts,
        threshold = 0.5)))
    val row200 = d1.filter(col("doc_id") === 200L).head
    assert(!row200.getBoolean(d1.columns.indexOf("k_near")) &&
      !row200.getBoolean(d1.columns.indexOf("now_kept")),
      "the verified banded near-dup must lose k_near and the kept bit")
    assert(keptOf(d1) === Map(200L -> false, 210L -> true))
    // the sg_keys really differ (the cascade could not have done this)
    val keeperSg = CorpusRefresh.currentFlags(spark, cmp)
      .filter(col("doc_id") === 10L).select("sg_key").head.getString(0)
    assert(row200.getString(d1.columns.indexOf("sg_key")) !== keeperSg)
    // the demotion is PERSISTED state, not just a delta annotation
    val st200 = CorpusRefresh.currentFlags(spark, cmp)
      .filter(col("doc_id") === 200L).head
    assert(!st200.getBoolean(9) && !st200.getBoolean(10),
      "k_near=false / quality_ok=false must land in all projections")
    Materialize.releaseAll()

    // a threshold above the pair's true Jaccard (0.8333): the verify
    // stage rejects the candidate and the arrival stays kept — banded
    // recall never bypasses the exact verify
    val k2 = keptOf(CorpusRefresh.refresh(spark, hi, arrivals, 1L, nB,
      banded = Some(CorpusRefresh.BandedVerify(lshRoot, texts,
        threshold = 0.9))))
    assert(k2 === Map(200L -> true, 210L -> true),
      s"sub-threshold candidates must not demote: $k2")

    // DROP-ONLY survives group recomputes: batch 2 lands an exact
    // duplicate of the demoted doc 200, marking 200's digest (and
    // cascading) groups for re-rank — WITHOUT a BandedVerify
    // configured. The stored banded_dup flag alone must keep 200
    // demoted (a bare rank-1 re-rank would silently re-promote it —
    // the round-16 review catch), and 300, a dup of a demoted doc,
    // must not enter the kept set either.
    val d3 = CorpusRefresh.refresh(spark, cmp,
      docsDF(Seq(300L -> nearDupText)), 2L, nB)
    assert(keptOf(d3) === Map(300L -> false))
    val st200b = CorpusRefresh.currentFlags(spark, cmp)
      .filter(col("doc_id") === 200L).head
    assert(!st200b.getBoolean(9) && !st200b.getBoolean(10) &&
      st200b.getBoolean(13),
      "the banded demotion must survive its group's re-rank")
    val st300 = CorpusRefresh.currentFlags(spark, cmp)
      .filter(col("doc_id") === 300L).head
    assert(!st300.getBoolean(10),
      "an exact dup of a banded-demoted doc stays out of the kept set")
    Materialize.releaseAll()

    // DROP-ONLY under re-arrival (the round-16 ADVICE catch): delete
    // keeper 10, then re-arrive the demoted 200 as an op=U with its
    // byte-identical text and NO banded stage — a from-scratch
    // re-judge would find no kept candidate and silently re-promote;
    // the inherited banded_dup flag must keep it demoted
    CorpusRefresh.refreshCdc(spark, cmp,
      docsDF(Seq(10L -> keeperText)).withColumn("op", lit("D")), 3L, nB)
    Materialize.releaseAll()
    val d5 = CorpusRefresh.refreshCdc(spark, cmp,
      docsDF(Seq(200L -> nearDupText)).withColumn("op", lit("U")), 4L, nB)
    assert(keptOf(d5) === Map(200L -> false),
      "an op=U re-arrival must inherit the stored banded demotion")
    val st200c = CorpusRefresh.currentFlags(spark, cmp)
      .filter(col("doc_id") === 200L).head
    assert(!st200c.getBoolean(9) && !st200c.getBoolean(10) &&
      st200c.getBoolean(13),
      "the inherited flag must persist through the U re-arrival")

    // the SANCTIONED re-admission path: an explicit D tombstones the
    // flag with the row, and a fresh I re-judges from scratch — with
    // the keeper gone, the doc enters the kept set
    CorpusRefresh.refreshCdc(spark, cmp,
      docsDF(Seq(200L -> nearDupText)).withColumn("op", lit("D")), 5L, nB)
    Materialize.releaseAll()
    val d7 = CorpusRefresh.refreshCdc(spark, cmp,
      docsDF(Seq(200L -> nearDupText)).withColumn("op", lit("I")), 6L, nB)
    assert(keptOf(d7) === Map(200L -> true),
      "delete + fresh insert is the explicit re-admission decision")
    Materialize.releaseAll()
  }

  test("embed verify: banded embedding candidates demote a cross-batch near-dup") {
    import spark.implicits._
    import graft.operators.IncrementalEmbedLsh
    import graft.streaming.UpsertFileSink
    val nB = 8
    // texts are COMPLETELY unrelated (no shared shingles — every
    // cascade key differs and even a BandedVerify would find nothing);
    // only the embeddings couple the pair: e(200) is within 1e-4 rad
    // of e(10) — a re-encode/translation stand-in
    val initial = Seq(10L -> textA, 30L -> textC)
    def vecOf(id: Long): Seq[Double] = id match {
      case 10L => Seq(1.0, 0.0, 0.0, 0.0)
      case 200L => Seq(1.0, 0.02, 0.0, 0.0) // cos vs e(10) ≈ 0.9998
      case 30L => Seq(0.0, 1.0, 0.0, 0.0)
      case 210L => Seq(0.0, 0.0, 1.0, 0.0)
      case i => Seq(0.0, 0.0, 0.0, i.toDouble)
    }
    def vecsDF(ids: Seq[Long]) =
      ids.map(i => (i, vecOf(i))).toDF("doc_id", "e")

    def mkRoot(tag: String) = java.nio.file.Files
      .createTempDirectory(s"graft-embedv-$tag").toString + "/state"
    val ctl = mkRoot("ctl")
    val cmp = mkRoot("cmp")
    val hi = mkRoot("hi")
    Seq(ctl, cmp, hi).foreach(r =>
      CorpusRefresh.initialize(spark, docsDF(initial), r, nB))
    // the production loop feeds the embed index alongside the state
    val elshRoot = java.nio.file.Files
      .createTempDirectory("graft-embedv-elsh").toString + "/elsh"
    IncrementalEmbedLsh.applyBatch(spark, elshRoot,
      vecsDF(Seq(10L, 30L))
        .select(col("doc_id").as("vec_id"), col("e"))
        .withColumn("op", lit("I")), 0L, bandBits = 4)

    val arrivals = docsDF(Seq(200L -> textE, 210L -> textG))
    val probeVecs = vecsDF(Seq(200L, 210L))
    val allVecs = vecsDF(Seq(10L, 30L))
      .select(col("doc_id").as("vec_id"), col("e"))
    def keptOf(d: DataFrame): Map[Long, Boolean] = {
      val m = d.filter(col("is_delta"))
        .select("doc_id", "now_kept").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      Materialize.releaseAll()
      m
    }

    // CONTROL: the text cascade alone cannot couple the pair
    val k0 = keptOf(CorpusRefresh.refresh(spark, ctl, arrivals, 1L, nB))
    assert(k0 === Map(200L -> true, 210L -> true),
      s"the text cascade must miss the embedding pair: $k0")

    // COMPOSED: embed-LSH candidates + exact-cosine verify demote the
    // arrival; the unrelated arrival is untouched; the verdict
    // persists as first-class banded_dup state
    val d1 = CorpusRefresh.refresh(spark, cmp, arrivals, 1L, nB,
      embed = Some(CorpusRefresh.EmbedVerify(elshRoot, probeVecs,
        vectorSource = allVecs, minSim = 0.95)))
    assert(keptOf(d1) === Map(200L -> false, 210L -> true))
    val st200 = CorpusRefresh.currentFlags(spark, cmp)
      .filter(col("doc_id") === 200L).head
    assert(!st200.getBoolean(9) && !st200.getBoolean(10) &&
      st200.getBoolean(13),
      "the embed demotion must land in all projections as banded_dup")
    Materialize.releaseAll()

    // a threshold above the pair's true cosine: the verify stage
    // rejects the candidate — banded recall never bypasses the verify
    val k2 = keptOf(CorpusRefresh.refresh(spark, hi, arrivals, 1L, nB,
      embed = Some(CorpusRefresh.EmbedVerify(elshRoot, probeVecs,
        vectorSource = allVecs, minSim = 0.9999))))
    assert(k2 === Map(200L -> true, 210L -> true),
      s"sub-threshold candidates must not demote: $k2")

    // the BUCKETED vector-store handle produces the identical verdict
    // with an id-pruned fetch (the capstone's production shape)
    val vstore = java.nio.file.Files
      .createTempDirectory("graft-embedv-vstore").toString + "/vecs"
    UpsertFileSink.upsertBatchBucketed(
      vecsDF(Seq(10L, 30L)).select(col("doc_id").as("vec_id"), col("e"))
        .withColumn("op", lit("U")).withColumn("seq", lit(0L)),
      0L, vstore, Seq("vec_id"), nBuckets = 4)
    val handle = UpsertFileSink.BucketedStore(vstore,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("e",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))),
      keyCols = Seq("vec_id"))
    val cmp2 = mkRoot("cmp2")
    CorpusRefresh.initialize(spark, docsDF(initial), cmp2, nB)
    val d2 = CorpusRefresh.refresh(spark, cmp2, arrivals, 1L, nB,
      embed = Some(CorpusRefresh.EmbedVerify(elshRoot, probeVecs,
        minSim = 0.95, vectorStore = Some(handle))))
    assert(keptOf(d2) === Map(200L -> false, 210L -> true),
      "the bucketed-handle fetch must produce the identical verdict")
    Materialize.releaseAll()
  }
}

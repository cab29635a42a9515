package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HybridSearch, IncrementalIndex, IncrementalIvf,
  InvertedIndex}

/** PLAN-SHAPE pins for the TERM-ADDRESSABLE read path (round 17): a
  * BM25-shaped lookup against the incremental inverted index must do
  * I/O proportional to the probed terms' posting lists, never the
  * corpus. Concretely:
  *
  *  - every postings/df scan in a [[IncrementalIndex.postingsForTerms]]
  *    plan carries a `tb` PARTITION filter (the probed terms' token
  *    buckets reach the scan as partition pruning, on fresh segments
  *    AND the folded tree);
  *  - [[IncrementalIndex.statsFrame]] never scans postings at all —
  *    (N, Σdl) folds from the one-row-per-batch additive stats log;
  *  - [[HybridSearch.searchMaintained]]'s whole plan inherits both,
  *    plus the liveness-split pins (no window over `_compact`).
  *
  * These are the physical-plan encodings of round-16's "weak" scale
  * finding #1; value-level equivalences ride alongside.
  */
class TokenPrunedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def postingsScans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(p => p.toString.contains("postings") ||
          p.toString.contains("/df")) => f
    }

  private def tbPruned(f: FileSourceScanExec): Boolean =
    f.partitionFilters.exists(_.references.exists(_.name == "tb"))

  private def rows(df: DataFrame) =
    df.select("token", "doc_id", "tf", "dl", "df")
      .orderBy("token", "doc_id").collect().toSeq

  test("term lookups prune every postings/df scan to token buckets") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-tbprune").toString
    var corpus = Map.empty[Long, String]
    def apply(id: Long, batch: Seq[(Long, String, String)]): Unit = {
      IncrementalIndex.applyBatch(spark, root,
        batch.toDF("doc_id", "text", "op"), id)
      batch.foreach { case (d, t, op) =>
        corpus = if (op == "D") corpus - d else corpus + (d -> t)
      }
    }
    apply(0L, (1L to 20L).map(i =>
      (i, s"alpha w$i shared tail${i % 3}", "I")))
    IncrementalIndex.compact(spark, root, 0L)
    // fresh segments on top of the folded base: the mixed view
    apply(1L, Seq((21L, "alpha fresh beta", "I"), (3L, "", "D")))
    apply(2L, Seq((5L, "gamma alpha rewritten", "U")))

    val terms = Seq("alpha", "beta", "nosuchtoken")
    val pruned = IncrementalIndex.postingsForTerms(spark, root, terms)

    // value: identical to filtering the unpruned corpus view
    val oracle = IncrementalIndex.currentPostings(spark, root)
      .filter(col("token").isin(terms: _*))
    assert(rows(pruned) === rows(oracle))
    assert(rows(pruned).nonEmpty)

    // plan: every postings/df scan (fresh segments AND the folded
    // tree) carries the tb partition filter
    val scans = postingsScans(pruned)
    assert(scans.nonEmpty, "expected postings/df scans in the plan")
    scans.foreach(s => assert(tbPruned(s),
      s"unpruned postings/df scan: ${s.relation.location.rootPaths}"))

    // stats never touch postings: the additive one-row-per-batch log
    val sf = IncrementalIndex.statsFrame(spark, root)
    assert(postingsScans(sf).forall(f => !f.relation.location.rootPaths
        .exists(_.toString.contains("postings"))),
      "statsFrame must not scan postings")
    val (n, avgDl) = IncrementalIndex.stats(spark, root)
    assert(n === corpus.size.toLong)
    val dls = corpus.values.map(t =>
      t.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty))
    assert(math.abs(avgDl - dls.sum.toDouble / dls.size) < 1e-9)

    // bm25Search ≡ bm25Query over the unpruned view + the same stats
    val viaPruned = IncrementalIndex.bm25Search(spark, root,
      Seq("alpha", "beta"), k = 5)
    val viaFull = InvertedIndex.bm25Query(
      IncrementalIndex.currentPostings(spark, root), n, avgDl,
      Seq("alpha", "beta"), k = 5)
    assert(viaPruned.collect().toSeq === viaFull.collect().toSeq)

    // time travel prunes identically and answers the historical view
    val asOf = IncrementalIndex.postingsForTerms(spark, root,
      Seq("alpha"), asOf = Some(1L))
    val asOfOracle = IncrementalIndex.currentPostingsAsOf(spark, root, 1L)
      .filter(col("token") === "alpha")
    assert(rows(asOf) === rows(asOfOracle))
    postingsScans(asOf).foreach(s => assert(tbPruned(s)))

    // the other query shapes ride the same pruned read: andSearch and
    // rankedSearch equal their unpruned-view twins, scans tb-pruned
    val andP = IncrementalIndex.andSearch(spark, root,
      Seq("alpha", "shared"))
    val andO = InvertedIndex.andQuery(
      IncrementalIndex.currentPostings(spark, root),
      Seq("alpha", "shared"))
    assert(andP.collect().map(_.getLong(0)).sorted.toSeq ===
      andO.collect().map(_.getLong(0)).sorted.toSeq)
    postingsScans(andP).foreach(s => assert(tbPruned(s)))
    val rkP = IncrementalIndex.rankedSearch(spark, root,
      Seq("alpha", "beta"), 5)
    val rkO = InvertedIndex.rankedQuery(
      IncrementalIndex.currentPostings(spark, root), n,
      Seq("alpha", "beta"), 5)
    assert(rkP.collect().map(_.toString).toSeq ===
      rkO.collect().map(_.toString).toSeq)
    postingsScans(rkP).foreach(s => assert(tbPruned(s)))
    Materialize.releaseAll()
  }

  test("a pre-tb root refuses new batches until one compact migrates it") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-tb-legacy").toString
    // hand-build a LEGACY root the way pre-round-17 code laid it out:
    // db-only postings, flat df deltas, docs changelog, an _nbuckets
    // pin but NO _ntbuckets pin and NO stats log
    val corpus = Map(1L -> "alpha beta shared", 2L -> "gamma shared tail")
    val legacyPost = InvertedIndex.build(
        corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .select("token", "doc_id", "tf", "dl")
    legacyPost.withColumn("db", pmod(hash(col("doc_id")), lit(16)))
      .write.partitionBy("db").parquet(s"$root/postings/seq=0")
    legacyPost.select(col("token"), lit(1L).as("delta"))
      .write.parquet(s"$root/df/seq=0")
    corpus.keys.toSeq.toDF("doc_id").withColumn("op", lit("I"))
      .write.parquet(s"$root/docs/seq=0")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_nbuckets"),
      "16".getBytes("UTF-8"))

    // the legacy layout still answers reads, incl. the stats FALLBACK
    // (no stats log anywhere -> live-postings derivation, not a
    // silent N=0)
    val (n0, avg0) = IncrementalIndex.stats(spark, root)
    assert(n0 === 2L && math.abs(avg0 - 3.0) < 1e-9,
      "legacy roots must answer stats from live postings, never zeros")

    // a new-code batch REFUSES: a tb segment beside flat ones would
    // wedge partition discovery for every later read
    val e = intercept[IllegalArgumentException] {
      IncrementalIndex.applyBatch(spark, root,
        Seq((3L, "alpha fresh", "I")).toDF("doc_id", "text", "op"), 1L)
    }
    assert(e.getMessage.contains("token-bucket"))
    assert(!new java.io.File(s"$root/_ntbuckets").exists,
      "the refusal must not leave the pin behind")

    // ONE compact migrates the layout: folded tree gains tb, the
    // stats base derives from the live set, the pin lands — and the
    // feed resumes
    IncrementalIndex.compact(spark, root, 0L)
    assert(new java.io.File(s"$root/_ntbuckets").exists)
    IncrementalIndex.applyBatch(spark, root,
      Seq((3L, "alpha fresh", "I")).toDF("doc_id", "text", "op"), 1L)
    val all = corpus + (3L -> "alpha fresh")
    val expect = InvertedIndex.build(
        all.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .select("token", "doc_id", "tf", "dl", "df")
      .orderBy("token", "doc_id").collect().toSeq
    assert(rows(IncrementalIndex.currentPostings(spark, root)) === expect)
    val (n1, avg1) = IncrementalIndex.stats(spark, root)
    assert(n1 === 3L && math.abs(avg1 - 8.0 / 3.0) < 1e-9,
      "the migrated stats base must heal the pre-log history")
    // and the pruned lookup works on the migrated root
    val pruned = IncrementalIndex.postingsForTerms(spark, root,
      Seq("alpha"))
    assert(pruned.count() === 2L)
    postingsScans(pruned).foreach(s => assert(tbPruned(s)))

    // statsFrame's as-of view is bounded by compaction LOUDLY — a
    // silent zero would score every BM25 query with N=0
    val e2 = intercept[IllegalArgumentException] {
      IncrementalIndex.statsFrame(spark, root, asOf = Some(-1L))
    }
    assert(e2.getMessage.contains("folded away"))
    Materialize.releaseAll()
  }

  test("a delete-only pre-tb root (flat df, no postings) also refuses new batches") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-tb-legacy-df").toString
    // old code wrote df unconditionally — a delete-only history holds
    // flat df segments and a docs changelog but NO postings dir at
    // all; tb-partitioned df beside the flat segments would wedge
    // partition discovery exactly like mixed postings layouts
    Seq(("gone", -1L)).toDF("token", "delta")
      .write.parquet(s"$root/df/seq=0")
    Seq((1L, "D")).toDF("doc_id", "op")
      .write.parquet(s"$root/docs/seq=0")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_nbuckets"), "16".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      IncrementalIndex.applyBatch(spark, root,
        Seq((2L, "alpha fresh", "I")).toDF("doc_id", "text", "op"), 1L)
    }
    assert(e.getMessage.contains("token-bucket"))
    assert(!new java.io.File(s"$root/_ntbuckets").exists,
      "the refusal must not leave the pin behind")
    Materialize.releaseAll()
  }

  test("a marker predating the stats log fails statsFrame loudly, not path-not-found") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-legacy-marker").toString
    // a root compacted by pre-stats-log code: marker at 0, folded
    // postings/docs/df trees but NO folded stats — plus a fresh stats
    // segment from newer code. Summing only the fresh deltas would
    // silently miss the folded base; the raw readLog would throw an
    // opaque path-not-found. The documented loud guard must name the
    // remedy instead.
    Seq(("alpha", 1L, 5L, 7L)).toDF("token", "doc_id", "tf", "dl")
      .write.parquet(s"$root/_compact/0/postings")
    Seq((1L, "I")).toDF("doc_id", "op")
      .write.parquet(s"$root/_compact/0/docs")
    Seq(("alpha", 1L)).toDF("token", "delta")
      .write.parquet(s"$root/_compact/0/df")
    Seq((1L, 7L, 1L)).toDF("n_delta", "dl_delta", "seq")
      .write.parquet(s"$root/stats/seq=1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_compacted"), "0".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      IncrementalIndex.statsFrame(spark, root).collect()
    }
    assert(e.getMessage.contains("predates its 'stats' log"),
      s"expected the legacy-migration guard, got: ${e.getMessage}")
    Materialize.releaseAll()
  }

  test("searchMaintained's plan is term-pruned and stats-thin") {
    import spark.implicits._
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft-tbprune-hybrid").toString + "/idx"
    val ivfRoot = java.nio.file.Files
      .createTempDirectory("graft-tbprune-hybrid2").toString + "/ivf"
    def vec(i: Long): Seq[Double] =
      Seq(math.cos(i * 0.7), math.sin(i * 0.7), (i % 5).toDouble / 5.0)
    IncrementalIndex.applyBatch(spark, idxRoot,
      (1L to 30L).map(i => (i, s"alpha common w$i", "I"))
        .toDF("doc_id", "text", "op"), 0L)
    IncrementalIndex.compact(spark, idxRoot, 0L)
    IncrementalIndex.applyBatch(spark, idxRoot,
      Seq((31L, "alpha fresh", "I")).toDF("doc_id", "text", "op"), 1L)
    IncrementalIvf.initialize(spark,
      (1L to 31L).map(i => (i, vec(i))).toDF("vec_id", "e"),
      ivfRoot, k = 3, iters = 2)

    val fused = HybridSearch.searchMaintained(spark, idxRoot, ivfRoot,
      Seq("alpha", "fresh"), vec(7L), k = 5)
    // the answer is sane (both legs contribute)
    assert(fused.count() === 5L)
    // every postings/df scan in the WHOLE fused plan is tb-pruned —
    // i.e. neither the BM25 leg nor the stats fold reads the corpus
    val scans = postingsScans(fused)
    assert(scans.exists(_.relation.location.rootPaths
      .exists(_.toString.contains("postings"))),
      "expected a postings scan in the lexical leg")
    scans.filter(_.relation.location.rootPaths
        .exists(_.toString.contains("postings")))
      .foreach(s => assert(tbPruned(s),
        s"unpruned postings scan in searchMaintained: " +
          s"${s.relation.location.rootPaths}"))
    // liveness-split pin inherited: no UNBOUNDED window over the
    // folded tree — the only windows allowed above a `_compact` scan
    // are the RRF rank windows, whose input a TakeOrdered top-k
    // bounds (HybridSearch's MaxFuse contract); a corpus-sized rank
    // window would have no limit between it and the scan
    val foldedWindows = fused.queryExecution.sparkPlan.collect {
      case w: WindowExec if w.collect { case f: FileSourceScanExec => f }
        .exists(_.relation.location.rootPaths
          .exists(_.toString.contains("_compact"))) => w
    }
    foldedWindows.foreach { w =>
      assert(w.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty,
        "a window over the folded corpus must sit above a bounded " +
          "top-k, never the raw scan")
    }
    Materialize.releaseAll()
  }
}

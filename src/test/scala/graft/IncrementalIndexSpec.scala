package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalIndex, InvertedIndex}

/** The incremental index's single load-bearing contract: after ANY
  * sequence of CDC batches, currentPostings equals a from-scratch
  * InvertedIndex.build over the corpus state those batches produce —
  * inserts, updates that change a doc's token set, deletes, and
  * re-inserts after delete. If that holds, every query in
  * InvertedIndex (and the BM25/RRF stack) runs unchanged on the
  * incrementally maintained index.
  */
class IncrementalIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("token", "doc_id", "tf", "dl", "df")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sorted.toSeq

  test("incremental apply equals full rebuild after every batch") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-incidx").toString

    // live corpus state tracked alongside, as (doc_id -> text)
    var corpus = Map.empty[Long, String]
    def check(): Unit = {
      val full = InvertedIndex.build(
        corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      val inc = IncrementalIndex.currentPostings(spark, root)
      assert(rows(inc) === rows(full))
      // stats agree with the live corpus too
      val (n, avgDl) = IncrementalIndex.stats(spark, root)
      assert(n === corpus.size.toLong)
      val dls = corpus.values.map(t =>
        t.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty))
      assert(math.abs(avgDl - dls.sum.toDouble / dls.size) < 1e-9)
    }

    // batch 0: inserts — incl. shared vocabulary so df > 1 somewhere
    val b0 = Seq(
      (1L, "the quick brown fox", "I"),
      (2L, "the lazy dog sleeps", "I"),
      (3L, "quick dog runs fast", "I"),
      (4L, "a solitary unique document", "I"))
    IncrementalIndex.applyBatch(spark, root,
      b0.toDF("doc_id", "text", "op"), 0L)
    corpus = b0.map(r => r._1 -> r._2).toMap
    check()

    // batch 1: update doc 2 with a CHANGED token set (loses lazy/dog/
    // sleeps, keeps the, gains cat/purrs), delete doc 3, insert doc 5
    val b1 = Seq(
      (2L, "the cat purrs", "U"),
      (3L, "", "D"),
      (5L, "brown cat naps", "I"))
    IncrementalIndex.applyBatch(spark, root,
      b1.toDF("doc_id", "text", "op"), 1L)
    corpus = corpus - 3L + (2L -> "the cat purrs") + (5L -> "brown cat naps")
    check()

    // batch 2: update doc 2 AGAIN (second supersession), delete doc 5,
    // and RE-insert doc 3 with new text after its delete
    val b2 = Seq(
      (2L, "quick cat purrs loudly", "U"),
      (5L, "", "D"),
      (3L, "fox returns home", "I"))
    IncrementalIndex.applyBatch(spark, root,
      b2.toDF("doc_id", "text", "op"), 2L)
    corpus = corpus - 5L +
      (2L -> "quick cat purrs loudly") + (3L -> "fox returns home")
    check()

    // a token whose every carrier is gone must have df folded to 0 —
    // currentPostings drops it entirely ("dog" lived in docs 2 and 3,
    // both superseded/deleted)
    val toks = IncrementalIndex.currentPostings(spark, root)
      .select("token").distinct().as[String].collect().toSet
    assert(!toks.contains("dog"))
    assert(!toks.contains("lazy"))

    // queries run unchanged on the maintained index
    val idx = IncrementalIndex.currentPostings(spark, root)
    val (n, avgDl) = IncrementalIndex.stats(spark, root)
    val hits = InvertedIndex.bm25Query(idx, n, avgDl,
      Seq("cat", "fox"), k = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(hits.nonEmpty && hits.toSet.subsetOf(corpus.keySet))

    // segment layout really is bucketed per batch (pruning surface)
    val seg = new java.io.File(s"$root/postings/seq=0")
    assert(seg.isDirectory &&
      seg.listFiles().exists(_.getName.startsWith("db=")))
  }

  test("compaction folds the log without changing any answer") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-incidx-compact").toString

    var corpus = Map.empty[Long, String]
    def apply(id: Long, rows: Seq[(Long, String, String)]): Unit = {
      IncrementalIndex.applyBatch(spark, root,
        rows.toDF("doc_id", "text", "op"), id)
      rows.foreach { case (d, t, op) =>
        corpus = if (op == "D") corpus - d else corpus + (d -> t)
      }
    }
    def check(): Unit = {
      val full = InvertedIndex.build(
        corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      assert(rows(IncrementalIndex.currentPostings(spark, root)) ===
        rows(full))
    }

    apply(0L, Seq((1L, "the quick fox", "I"), (2L, "lazy dog", "I"),
      (3L, "quick dog", "I")))
    apply(1L, Seq((2L, "sly cat", "U"), (4L, "dog park", "I")))
    apply(2L, Seq((3L, "", "D"), (5L, "fox den", "I")))
    check()

    // compact mid-log: answers unchanged with a mixed view (folded
    // tree at seq=1 ∪ fresh seq=2 segments)
    IncrementalIndex.compact(spark, root, upTo = 1L)
    check()
    // re-compact to a later horizon after more batches
    apply(3L, Seq((4L, "", "D"), (6L, "quick cat naps", "I")))
    check()
    IncrementalIndex.compact(spark, root, upTo = 3L)
    check()
    // the old compact tree and every folded segment dir are gone
    assert(!new java.io.File(s"$root/_compact/1").exists,
      "superseded compact tree must be vacuumed")
    Seq("postings", "docs", "df").foreach { sub =>
      val segs = new java.io.File(s"$root/$sub").listFiles()
        .filter(_.getName.startsWith("seq=")).map(_.getName).toSeq
      assert(segs.isEmpty, s"$sub still holds folded segments: $segs")
    }

    // new batches land on top of the compacted base
    apply(4L, Seq((2L, "sly cat returns", "U"), (7L, "new dog", "I")))
    check()

    // queries + stats still agree with the live corpus
    val (n, avgDl) = IncrementalIndex.stats(spark, root)
    assert(n === corpus.size.toLong)
    val idx = IncrementalIndex.currentPostings(spark, root)
    val hits = InvertedIndex.bm25Query(idx, n, avgDl, Seq("dog"), k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(hits.subsetOf(corpus.keySet) && hits.nonEmpty)

    // a batch id at/below the compaction horizon is a PROVABLY
    // committed redelivery whose segment dirs (and _SUCCESS evidence)
    // cleanup removed: the apply absorbs it as a no-op (the landing
    // zone's checkpoint-head rule) — state untouched, nothing thrown
    IncrementalIndex.applyBatch(spark, root,
      Seq((9L, "too old", "I")).toDF("doc_id", "text", "op"), 2L)
    check()
    assert(!new java.io.File(s"$root/docs/seq=2").exists,
      "a below-horizon redelivery must not write a segment")

    // cleanup is idempotent and safe to re-run any time
    IncrementalIndex.cleanupCompacted(spark, root)
    check()
  }

  test("compactEvery folds the log inline at the configured cadence") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-incidx-auto").toString
    var corpus = Map.empty[Long, String]
    def apply(id: Long, batchRows: Seq[(Long, String, String)]): Unit = {
      IncrementalIndex.applyBatch(spark, root,
        batchRows.toDF("doc_id", "text", "op"), id, compactEvery = 2)
      batchRows.foreach { case (d, t, op) =>
        corpus = if (op == "D") corpus - d else corpus + (d -> t)
      }
      val full = InvertedIndex.build(
        corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      assert(rows(IncrementalIndex.currentPostings(spark, root)) ===
        rows(full), s"after batch $id")
    }
    def horizon(): Option[Long] = {
      val m = new java.io.File(s"$root/_compacted")
      if (!m.exists) None
      else Some(new String(java.nio.file.Files
        .readAllBytes(m.toPath), "UTF-8").trim.toLong)
    }
    // invariant: the log never holds more than compactEvery=2 fresh
    // segments, and the fold never reaches the in-flight batch
    apply(0L, Seq((1L, "the quick fox", "I"), (2L, "lazy dog", "I")))
    assert(horizon() === None)
    apply(1L, Seq((2L, "sly cat", "U"), (3L, "dog park", "I")))
    assert(horizon() === None, "2 fresh segments are within the bound")
    // batch 2 REPLACES prior versions (update + delete) and lands on
    // the cadence boundary: the fold vacuums the replaced versions
    apply(2L, Seq((2L, "sly cat again", "U"), (1L, "", "D")))
    assert(horizon() === Some(1L), "the 3rd fresh segment triggers the fold")

    // the hard redelivery case: replaying an UPDATE/DELETE batch AFTER
    // its own inline fold — the replaced versions are no longer in the
    // pre-batch view, so a rewrite would recompute the df deltas with
    // an empty −1 side and leave the folded +1s uncancelled; the
    // commit-marker no-op must make the replay change NOTHING
    apply(2L, Seq((2L, "sly cat again", "U"), (1L, "", "D")))
    assert(horizon() === Some(1L))

    apply(3L, Seq((4L, "fox den", "I")))
    assert(horizon() === Some(1L))
    // only post-horizon segments remain
    def segs(sub: String): Set[String] = {
      val d = new java.io.File(s"$root/$sub")
      if (!d.isDirectory) Set.empty
      else d.listFiles().map(_.getName).filter(_.startsWith("seq=")).toSet
    }
    assert(segs("docs") === Set("seq=2", "seq=3"))
    assert(segs("df") === Set("seq=2", "seq=3"))
    assert(segs("postings") === Set("seq=2", "seq=3"))
    // redelivery of the newest (un-folded) batch is likewise a no-op
    apply(3L, Seq((4L, "fox den", "I")))
    assert(horizon() === Some(1L))
  }

  test("torn df deltas and delete-only batches stay invisible") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-incidx-torn").toString

    var corpus = Map.empty[Long, String]
    def check(): Unit = {
      val full = InvertedIndex.build(
        corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      assert(rows(IncrementalIndex.currentPostings(spark, root)) ===
        rows(full))
    }
    IncrementalIndex.applyBatch(spark, root,
      Seq((1L, "the quick fox", "I"), (2L, "the lazy dog", "I"))
        .toDF("doc_id", "text", "op"), 0L)
    corpus = Map(1L -> "the quick fox", 2L -> "the lazy dog")
    check()

    // simulate the crash window between the df write and the docs
    // commit: a df segment exists with no changelog segment. An
    // ungated sum would take df("the") to 0 and drop its live
    // postings from every query; the committed-seq gate must hide it
    Seq(("the", -2L)).toDF("token", "delta")
      .withColumn("tb", pmod(hash(col("token")), lit(16)))
      .write.partitionBy("tb").parquet(s"$root/df/seq=9")
    check()

    // replaying the batch overwrites the torn segment; delete-only
    // batches write no postings segment at all (a zero-row partitionBy
    // leaves an unreadable husk) yet fold correctly
    IncrementalIndex.applyBatch(spark, root,
      Seq((2L, "", "D")).toDF("doc_id", "text", "op"), 9L)
    corpus -= 2L
    check()
    assert(!new java.io.File(s"$root/postings/seq=9").exists,
      "a delete-only batch must not leave a postings husk")

    // compaction over the delete-only tail, then emptying the index:
    // stats must not crash on the null mean length
    IncrementalIndex.compact(spark, root, upTo = 9L)
    check()
    IncrementalIndex.applyBatch(spark, root,
      Seq((1L, "", "D")).toDF("doc_id", "text", "op"), 10L)
    corpus -= 1L
    check()
    assert(IncrementalIndex.stats(spark, root) === ((0L, 0.0)))
  }

  test("blue/green reindex: the alias flip swaps generations atomically") {
    import spark.implicits._
    val parent = java.nio.file.Files
      .createTempDirectory("graft-incidx-bg").toString + "/index"

    IncrementalIndex.initializeAliased(spark, parent)
    IncrementalIndex.applyBatchActive(spark, parent,
      Seq((1L, "the quick fox", "I"), (2L, "the lazy dog", "I"))
        .toDF("doc_id", "text", "op"), 0L)
    IncrementalIndex.applyBatchActive(spark, parent,
      Seq((2L, "the calm cat", "U"), (3L, "fox and cat", "I"))
        .toDF("doc_id", "text", "op"), 1L)
    val corpus = Map(1L -> "the quick fox", 2L -> "the calm cat",
      3L -> "fox and cat")

    // a half-built rebuild that never flips must be invisible
    IncrementalIndex.applyBatch(spark, s"$parent/g9",
      Seq((99L, "garbage", "I")).toDF("doc_id", "text", "op"), 0L)
    assert(IncrementalIndex.activeRoot(spark, parent).endsWith("/g0"))
    assert(rows(IncrementalIndex.currentPostingsActive(spark, parent)) ===
      rows(InvertedIndex.build(corpus.toSeq.toDF("doc_id", "text"),
        "doc_id", "text")))

    // the cutover: rebuild from the authoritative doc store, flip —
    // the crashed g9 orphan just bumps the generation counter
    val newRoot = IncrementalIndex.rebuildCutover(spark, parent,
      corpus.toSeq.toDF("doc_id", "text"))
    assert(newRoot.endsWith("/g10") &&
      IncrementalIndex.activeRoot(spark, parent) === newRoot)
    assert(rows(IncrementalIndex.currentPostingsActive(spark, parent)) ===
      rows(InvertedIndex.build(corpus.toSeq.toDF("doc_id", "text"),
        "doc_id", "text")))
    // the rebuilt generation is one bulk segment, not the old log
    val f = new org.apache.hadoop.fs.Path(parent)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = f.listStatus(
        new org.apache.hadoop.fs.Path(s"$newRoot/docs")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("seq="))
    assert(segs === Seq("seq=1"),
      s"one bulk segment at the old head id expected, got $segs")

    // the feed continues with monotone ids across the flip
    IncrementalIndex.applyBatchActive(spark, parent,
      Seq((4L, "new dog", "I")).toDF("doc_id", "text", "op"), 2L)
    assert(rows(IncrementalIndex.currentPostingsActive(spark, parent)) ===
      rows(InvertedIndex.build(
        (corpus + (4L -> "new dog")).toSeq.toDF("doc_id", "text"),
        "doc_id", "text")))

    // generation GC reclaims only generations BELOW the active one —
    // a NEWER directory may be a concurrent rebuild in flight and must
    // survive (it is reclaimed after the next successful flip)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$parent/g11"))
    IncrementalIndex.cleanupGenerations(spark, parent)
    val gens = f.listStatus(new org.apache.hadoop.fs.Path(parent)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("g")).sorted
    assert(gens === Seq("g10", "g11"),
      "below-active reclaimed, in-flight newer build untouched")

    // a cutover on a never-fed aliased index REFUSES: it would claim
    // batch id 0 the feed never issued, and the feed's real first
    // batch would then no-op on the idempotence marker — an empty
    // generation has nothing stale, so the fix is to just feed it
    val virgin = java.nio.file.Files
      .createTempDirectory("graft-incidx-virgin").toString + "/index"
    IncrementalIndex.initializeAliased(spark, virgin)
    val e = intercept[IllegalArgumentException] {
      IncrementalIndex.rebuildCutover(spark, virgin,
        Seq((1L, "hello world")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("never received a batch"))
    IncrementalIndex.applyBatchActive(spark, virgin,
      Seq((1L, "hello world", "I")).toDF("doc_id", "text", "op"), 0L)
    assert(rows(IncrementalIndex.currentPostingsActive(spark, virgin)) ===
      rows(InvertedIndex.build(Seq((1L, "hello world"))
        .toDF("doc_id", "text"), "doc_id", "text")))
  }

  test("compact refuses to fold past a torn batch (redelivery would wedge)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-incidx-wedge").toString

    IncrementalIndex.applyBatch(spark, root,
      Seq((1L, "the quick fox", "I"), (2L, "the lazy dog", "I"))
        .toDF("doc_id", "text", "op"), 0L)

    // batch 5's first delivery died between the postings/df writes and
    // the docs commit — present but uncommitted. An out-of-band
    // compact(upTo >= 5) would exclude its rows from the fold, delete
    // them in cleanup, and move the horizon above 5: the at-least-once
    // redelivery then hits the horizon guard and the batch is lost
    Seq(("fox", 3L, 1L, 3L)).toDF("token", "doc_id", "tf", "dl")
      .withColumn("db", pmod(hash(col("doc_id")), lit(16)))
      .withColumn("tb", pmod(hash(col("token")), lit(16)))
      .write.partitionBy("db", "tb").parquet(s"$root/postings/seq=5")
    Seq(("fox", 1L)).toDF("token", "delta")
      .withColumn("tb", pmod(hash(col("token")), lit(16)))
      .write.partitionBy("tb").parquet(s"$root/df/seq=5")

    val e = intercept[IllegalArgumentException] {
      IncrementalIndex.compact(spark, root, upTo = 5L)
    }
    assert(e.getMessage.contains("torn"))
    intercept[IllegalArgumentException] {
      IncrementalIndex.compact(spark, root, upTo = 7L)
    }
    // strictly below the torn batch is fine
    IncrementalIndex.compact(spark, root, upTo = 0L)

    // after the redelivery commits batch 5, the fold proceeds and the
    // index still equals a from-scratch rebuild
    IncrementalIndex.applyBatch(spark, root,
      Seq((3L, "fox den", "I")).toDF("doc_id", "text", "op"), 5L)
    IncrementalIndex.compact(spark, root, upTo = 5L)
    val full = InvertedIndex.build(
      Seq((1L, "the quick fox"), (2L, "the lazy dog"), (3L, "fox den"))
        .toDF("doc_id", "text"), "doc_id", "text")
    assert(rows(IncrementalIndex.currentPostings(spark, root)) ===
      rows(full))
    // re-running compact AT the published horizon is the
    // crashed-cleanup retry: it must converge (finish cleanup), never
    // re-fold over the _compact tree the read plan resolves from
    IncrementalIndex.compact(spark, root, upTo = 5L)
    assert(rows(IncrementalIndex.currentPostings(spark, root)) ===
      rows(full))
    // the bucket count is frozen at creation: a mismatched BATCH fails
    // loudly instead of silently mis-pruning old postings...
    intercept[IllegalArgumentException] {
      IncrementalIndex.applyBatch(spark, root,
        Seq((9L, "x y", "I")).toDF("doc_id", "text", "op"), 9L,
        nBuckets = 64)
    }
    // ...while the FOLD inherits the root's pinned constant (a caller
    // with no knob — e.g. the Shell — must still be able to compact a
    // non-default-bucket root; the parameter is only a pre-pin
    // fallback)
    IncrementalIndex.applyBatch(spark, root,
      Seq((9L, "x y", "I")).toDF("doc_id", "text", "op"), 9L)
    IncrementalIndex.compact(spark, root, upTo = 9L, nBuckets = 64)
    val full2 = InvertedIndex.build(
      Seq((1L, "the quick fox"), (2L, "the lazy dog"), (3L, "fox den"),
        (9L, "x y")).toDF("doc_id", "text"), "doc_id", "text")
    assert(rows(IncrementalIndex.currentPostings(spark, root)) ===
      rows(full2),
      "a fold invoked with a mismatched parameter must use the pin")
  }
}

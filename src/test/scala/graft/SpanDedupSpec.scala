package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanDedup

/** Exact-substring dedup invariants on crafted corpora (where the
  * duplicated spans are known by construction) plus fixture-scale
  * sanity: cross-doc spans, within-doc self-repeats, interval-union
  * coverage vs an independent brute-force recompute, short-doc
  * handling, and partitioning invariance.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("cross-document shared span: exactly the shared window flags") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y c d e z")).toDF("doc_id", "text")
    val rep = SpanDedup.coverageReport(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // only "c d e" (offset 2 in both) repeats → 1 dup span, 3 covered
    // tokens, fraction 3/6
    assert(rep.toSeq === Seq(
      (1L, 6L, 1L, 3L, 0.5),
      (2L, 6L, 1L, 3L, 0.5)))
  }

  test("within-document self-repetition counts and unions correctly") {
    val docs = Seq((1L, "p q r s p q r s")).toDF("doc_id", "text")
    val rep = SpanDedup.coverageReport(docs, "doc_id", "text", 4)
      .head()
    // spans: offs 0..4; (p q r s) occurs at 0 and 4 → both occurrences
    // are dup spans; union [0,4)∪[4,8) covers all 8 tokens
    assert(rep.getLong(1) === 8L)
    assert(rep.getLong(2) === 2L)
    assert(rep.getLong(3) === 8L)
    assert(rep.getDouble(4) === 1.0)
  }

  test("overlapping dup spans union, never double-count") {
    // "a b a b a b": w=2 spans (a b),(b a),(a b),(b a),(a b) — ALL
    // five offsets are duplicated; union covers the whole doc (6), not
    // 5×2 = 10
    val docs = Seq((7L, "a b a b a b")).toDF("doc_id", "text")
    val rep = SpanDedup.coverageReport(docs, "doc_id", "text", 2).head()
    assert(rep.getLong(2) === 5L)
    assert(rep.getLong(3) === 6L)
    assert(rep.getDouble(4) === 1.0)
  }

  test("unique corpus reports zero; short docs survive with zeros") {
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "five six seven eight"),
      (3L, "tiny")).toDF("doc_id", "text")
    val rep = SpanDedup.coverageReport(docs, "doc_id", "text", 3)
      .collect()
    assert(rep.length === 3)
    rep.foreach { r =>
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L &&
        r.getDouble(4) === 0.0)
    }
  }

  test("removeDuplicatedSpans keeps the first occurrence, cuts the rest") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y c d e z")).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // "c d e" keeps its doc-1 occurrence; doc 2 loses those 3 tokens
    assert(out.toSeq === Seq(
      (1L, "a b c d e f", 0L),
      (2L, "x y z", 3L)))
  }

  test("removal conserves tokens: kept + removed == original, all docs") {
    val docs = sources.Tables.documents(spark, SparkTestBase.sf0001).limit(80)
    val w = 6
    val out = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", w)
    val bad = out.filter(
      size(split(col("text"), " ")) + col("n_removed") =!= col("n_toks") &&
        // empty kept text splits to one empty token — normalize
        !(col("text") === "" && col("n_removed") === col("n_toks")))
      .count()
    assert(bad === 0L)
    assert(out.count() === 80L)

    // every removed occurrence had a surviving keeper: re-running the
    // DETECTOR on the w-grams that were duplicated must still find each
    // hash at least once in the rewritten corpus... the cheap sound
    // check: total dup occurrences == removals + keepers
    val spans = SpanDedup.spanHashes(docs, "doc_id", "text", w)
    val dups = SpanDedup.duplicatedSpans(spans)
    val occ = dups.agg(sum(col("n_occ"))).head.getLong(0)
    val keepers = dups.count()
    // removals measured in spans ≠ tokens (overlaps), so compare docs'
    // removed occurrence count from the cut side instead:
    val cutOcc = spans.join(dups, Seq("h")).count() - keepers
    assert(occ - keepers === cutOcc)

    // determinism across partitionings
    val alt = SpanDedup.removeDuplicatedSpans(docs.repartition(9),
      "doc_id", "text", w).collect().map(_.toString).toSeq
    assert(alt === out.collect().map(_.toString).toSeq)
  }

  test("fixpoint: cascading adjacency converges; single pass does not") {
    // w=2: round 1 cuts "a b" out of doc 3 (keeper: doc 1), making
    // "p q" adjacent there; round 2 discovers "p q" now duplicates
    // doc 2 and empties doc 3; round 3 removes nothing and stops.
    val docs = Seq(
      (1L, "a b"),
      (2L, "p q"),
      (3L, "p a b q")).toDF("doc_id", "text")

    // the single pass leaves the newly-formed duplicate in place...
    val once = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(once(3L) === "p q", "one pass must expose the new adjacency")

    // ...the fixpoint drains it
    val (out, rounds) = SpanDedup.removeDuplicatedSpansFixpoint(
      docs, "doc_id", "text", 2)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1L, "a b", 2L, 0L),
      (2L, "p q", 2L, 0L),
      (3L, "", 4L, 4L)))
    assert(rounds === 3, s"expected 2 removing rounds + 1 empty, got $rounds")

    // fixpoint means idempotent: another pass removes nothing
    val again = SpanDedup.removeDuplicatedSpans(
      out.select("doc_id", "text"), "doc_id", "text", 2)
      .agg(sum("n_removed")).head.getLong(0)
    assert(again === 0L)
  }

  test("fixpoint: respects maxRounds and releases per-round frames") {
    val docs = Seq(
      (1L, "a b"),
      (2L, "p q"),
      (3L, "p a b q")).toDF("doc_id", "text")
    val before = graft.Materialize.activeCount
    val (out, rounds) = SpanDedup.removeDuplicatedSpansFixpoint(
      docs, "doc_id", "text", 2, maxRounds = 1)
    assert(rounds === 1)
    assert(out.filter(col("doc_id") === 3L).head.getString(1) === "p q",
      "maxRounds=1 must behave exactly like the single pass")
    // only the LAST round's frame may stay registered (the output's
    // lineage reads it); every span stream and superseded round frame
    // must already be released
    assert(graft.Materialize.activeCount <= before + 1)
    graft.Materialize.releaseAll()
  }

  test("fixture: coverage matches a brute-force recompute, any partitioning") {
    val docs = sources.Tables.documents(spark, SparkTestBase.sf0001).limit(120)
    val w = 6
    val got = SpanDedup.coverageReport(docs, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap

    // independent recompute: local maps over collected text
    val local = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val counts = scala.collection.mutable.HashMap.empty[Seq[String], Int]
    local.foreach { case (_, t) =>
      t.sliding(w).filter(_.size == w).foreach(s =>
        counts(s) = counts.getOrElse(s, 0) + 1)
    }
    local.foreach { case (id, t) =>
      val offs = t.sliding(w).zipWithIndex
        .filter { case (s, _) => s.size == w && counts(s) > 1 }
        .map(_._2).toSeq
      var end = -1
      var tot = 0L
      offs.foreach { o =>
        tot += math.max(0, o + w - math.max(end, o)); end = math.max(end, o + w)
      }
      assert(got.getOrElse(id, 0L) === tot, s"doc $id")
    }

    val alt = SpanDedup.coverageReport(docs.repartition(13), "doc_id",
      "text", w).collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(alt === got)
  }
}
